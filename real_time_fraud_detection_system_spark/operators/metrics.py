"""Reference-derived analytics: the fraud pipeline's query surface
re-expressed over the driver's ``events`` table (events stands in for the
``predictions`` stream sink -- FIXTURES.md section 5).

Column mapping used throughout: ts -> event_time, value -> amount,
user_id -> customer, event_type 'error' -> a flagged/suspicious event.

Reference parity (file:line cites are to /root/reference):
  * daily_metrics      -- airflow/dags/compute-daily-metrics.py:19-37 (A4):
                          per-day COUNT(*) + AVG x3 grouped by DATE(event_time).
  * freshness_check    -- airflow/dags/Data_quality_checks.py:20-29 (A1/T10):
                          row count in the trailing 15 minutes.
  * null_id_check      -- Data_quality_checks.py:31-34 (P14): null-id count.
  * windowed_rates     -- Data_quality_checks.py:36-40 + grafana last-1h
                          panels (A6): trailing-hour rate/avg.
  * hourly_timeseries  -- grafana predictions.json:18 (A5/O2): time-series agg.
  * recent_topk        -- grafana predictions.json:63 (O1): ORDER BY event_time
                          DESC LIMIT 50.
  * heuristic_score    -- fraud_service main.py:100-104,119-121,178 (P6/P7):
                          amount>1000 -> proba 1.0 else 0.05; label = proba>=0.5.
  * feature_extract    -- main.py:64,107 (P1/P3): JSON feature projection with
                          missing-key default 0.0.

"now" anchoring: the reference's NOW()-relative predicates are anchored to
max(ts) of the table so results are deterministic against static testdata.
The anchor is a 1-row aggregate cross-joined (broadcast) -- at 100 TB this
is a cheap scalar subquery on a partition-pruned column, not a full scan
(parquet max statistics answer it per file).

Scale notes: every query is scan -> pushed filter -> partial agg -> final
agg; the daily/hourly group-bys shuffle on low-cardinality keys (days,
hours) which AQE coalesces; no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import cents_sql, exact_sum


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _with_now(df: DataFrame) -> DataFrame:
    """Cross-join the deterministic 'now' anchor (max ts, broadcast)."""
    anchor = df.agg(F.max("ts").alias("now_ts"))
    return df.crossJoin(F.broadcast(anchor))


# --------------------------------------------------------------------------
def daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: SELECT DATE(event_time) day, COUNT(*), AVG(prediction),
    AVG(amount), AVG(proba) ... GROUP BY 1 -- compute-daily-metrics.py:19-37,
    with the heuristic score standing in for the model's outputs."""
    ev = _events(spark, sf_dir)
    proba = F.when(F.col("value") > 1000, 1.0).otherwise(0.05)
    pred = (proba >= 0.5).cast("int")
    return (
        ev.withColumn("proba", proba)
        .withColumn("prediction", pred)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("num_predictions"),
            F.round(F.avg("prediction"), 6).alias("fraud_rate"),
            F.round(F.avg("value"), 4).alias("avg_amount"),
            F.round(F.avg("proba"), 6).alias("avg_proba"),
        )
        .orderBy("day")
    )


DAILY_METRICS_SQL = """
SELECT CAST(ts AS DATE) AS day,
       count(*) AS num_predictions,
       round(avg(CASE WHEN value > 1000 THEN 1 ELSE 0 END), 6) AS fraud_rate,
       round(avg(value), 4) AS avg_amount,
       round(avg(CASE WHEN value > 1000 THEN 1.0 ELSE 0.05 END), 6) AS avg_proba
FROM events
GROUP BY 1
ORDER BY day
"""


# --------------------------------------------------------------------------
def freshness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/T10 freshness: COUNT(*) WHERE event_time > now - 15 minutes
    (Data_quality_checks.py:20-29), now = max(ts)."""
    ev = _with_now(_events(spark, sf_dir))
    return (
        ev.filter(F.col("ts") > F.col("now_ts") - F.expr("INTERVAL 15 MINUTES"))
        .agg(F.count("*").alias("recent_rows"))
        .withColumn("fresh", (F.col("recent_rows") >= 1).cast("int"))
    )


FRESHNESS_SQL = """
SELECT count(*) AS recent_rows,
       CAST(count(*) >= 1 AS INT) AS fresh
FROM events
WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 15 MINUTE
"""


# --------------------------------------------------------------------------
def null_id_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14/T10: null-id count must be zero (Data_quality_checks.py:31-34)."""
    ev = _events(spark, sf_dir)
    return ev.agg(
        F.sum(F.col("user_id").isNull().cast("bigint")).alias("null_ids"),
        F.sum(F.col("event_id").isNull().cast("bigint")).alias("null_event_ids"),
    )


NULL_ID_SQL = """
SELECT CAST(sum(CAST(user_id IS NULL AS BIGINT)) AS BIGINT) AS null_ids,
       CAST(sum(CAST(event_id IS NULL AS BIGINT)) AS BIGINT) AS null_event_ids
FROM events
"""


# --------------------------------------------------------------------------
def windowed_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: trailing-1-hour error rate + avg value (fraud-rate DQ check,
    Data_quality_checks.py:36-40; grafana last-1h stat panels)."""
    ev = _with_now(_events(spark, sf_dir))
    recent = ev.filter(
        F.col("ts") > F.col("now_ts") - F.expr("INTERVAL 1 HOUR")
    )
    return recent.agg(
        F.count("*").alias("n_events"),
        F.round(
            F.coalesce(F.avg((F.col("event_type") == "error").cast("int")), F.lit(0.0)),
            6,
        ).alias("error_rate"),
        F.round(F.coalesce(F.avg("value"), F.lit(0.0)), 4).alias("avg_value"),
    )


WINDOWED_RATES_SQL = """
SELECT count(*) AS n_events,
       round(coalesce(avg(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END), 0.0), 6)
         AS error_rate,
       round(coalesce(avg(value), 0.0), 4) AS avg_value
FROM events
WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 1 HOUR
"""


# --------------------------------------------------------------------------
def hourly_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/O2: time-series aggregation by hour bucket + type
    (grafana predictions.json:18, GROUP BY event_time ORDER BY 1).

    avg_value is computed ENTIRELY in integer fixed-point
    (functions/money.py rationale): ``round(avg(double), 4)`` was the
    one sf0.1 cross-engine mismatch this suite ever produced -- the
    order-dependent double sum lands half an ulp either side of a
    rounding boundary (51.51125 -> 51.5113 vs 51.5112). Summing exact
    1e-4 cents and rounding half-up with integer division cannot
    disagree. (Half-up integer div assumes non-negative sums -- value
    is a price-like positive column.)"""
    ev = _events(spark, sf_dir)
    avg4 = F.expr(
        f"CAST((sum({cents_sql('value')}) * 2 + count(*))"
        " DIV (2 * count(*)) AS DOUBLE) / 10000"
    )
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_bucket"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            avg4.alias("avg_value"),
        )
        .orderBy("hour_bucket", "event_type")
    )


HOURLY_TIMESERIES_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
       event_type,
       count(*) AS n,
       CAST((sum({cents_sql('value')}) * 2 + count(*))
            // (2 * count(*)) AS DOUBLE) / 10000 AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY hour_bucket, event_type
"""


# --------------------------------------------------------------------------
def tumbling_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: tumbling event-time windows (the batch twin of the streaming
    window() aggregation) -- 15-minute buckets via epoch flooring, which is
    exactly what window(ts, '15 minutes') assigns in streaming mode."""
    ev = _events(spark, sf_dir)
    bucket = F.to_timestamp(
        F.floor(F.unix_timestamp("ts") / 900) * 900
    )
    return (
        ev.groupBy(
            F.date_format(bucket, "yyyy-MM-dd HH:mm:ss").alias("window_start")
        )
        .agg(
            F.count("*").alias("n"),
            # order-independent fixed-point sum (same fragility class
            # as hourly_timeseries's avg; see that docstring)
            F.expr(exact_sum("value", 4)).alias("sum_value"),
        )
        .orderBy("window_start")
    )


TUMBLING_15MIN_SQL = f"""
SELECT strftime(to_timestamp(floor(epoch(ts) / 900) * 900), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       count(*) AS n,
       {exact_sum("value", 4)} AS sum_value
FROM events
GROUP BY 1
ORDER BY window_start
"""


# --------------------------------------------------------------------------
def recent_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: ORDER BY event_time DESC LIMIT 50 (grafana predictions.json:63).
    Catalyst plans TakeOrderedAndProject -- per-partition top-k then a
    k-row merge on the driver, no global sort (the 100 TB-safe plan)."""
    ev = _events(spark, sf_dir)
    return (
        ev.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(50)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            "user_id",
            "event_type",
            F.round("value", 4).alias("value"),
        )
    )


RECENT_TOPK_SQL = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       user_id, event_type,
       round(value, 4) AS value
FROM events
ORDER BY ts DESC, event_id DESC
LIMIT 50
"""


# --------------------------------------------------------------------------
def heuristic_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P7: the no-model fallback scorer applied per event
    (main.py:100-104: proba = 1.0 if amount > 1000 else 0.05;
    main.py:178: prediction = int(proba >= 0.5)). Pure JVM-side CASE
    expression inside whole-stage codegen -- no UDF."""
    ev = _events(spark, sf_dir)
    proba = F.when(F.col("value") > 1000, 1.0).otherwise(0.05)
    return ev.select(
        "event_id",
        F.round("value", 4).alias("amount"),
        F.round(proba, 2).alias("proba"),
        (proba >= 0.5).cast("int").alias("prediction"),
    )


HEURISTIC_SCORE_SQL = """
SELECT event_id,
       round(value, 4) AS amount,
       round(CASE WHEN value > 1000 THEN 1.0 ELSE 0.05 END, 2) AS proba,
       CAST(CASE WHEN value > 1000 THEN 1.0 ELSE 0.05 END >= 0.5 AS INT)
         AS prediction
FROM events
"""


# --------------------------------------------------------------------------
def feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P3: JSON feature projection with missing-key default 0.0
    (main.py:64,107: [features.get(k, 0.0) for k in FEATURE_ORDER]).
    props is the schemaless JSON column; 'k' exists, 'missing' does not."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.coalesce(
            F.get_json_object("props", "$.k").cast("double"), F.lit(0.0)
        ).alias("feat_k"),
        F.coalesce(
            F.get_json_object("props", "$.missing").cast("double"), F.lit(0.0)
        ).alias("feat_missing"),
    )


FEATURE_EXTRACT_SQL = """
SELECT event_id,
       coalesce(CAST(json_extract_string(props, '$.k') AS DOUBLE), 0.0) AS feat_k,
       coalesce(CAST(json_extract_string(props, '$.missing') AS DOUBLE), 0.0)
         AS feat_missing
FROM events
"""


# --------------------------------------------------------------------------
# Semi-structured path over REAL data: the events.props JSON column
# (the reference's features/raw_payload JSONB columns, init.sql:12,16,
# are this shape). Extraction stays JVM-side (get_json_object) and the
# grouped rollup shows the JSON -> typed -> aggregate pipeline.
def props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.round(F.avg("k"), 6).alias("k_avg"),
        )
        .orderBy("event_type")
    )


PROPS_JSON_SQL = """
SELECT event_type,
       count(CAST(json_extract(props, '$.k') AS INT)) AS n_with_k,
       min(CAST(json_extract(props, '$.k') AS INT)) AS k_min,
       max(CAST(json_extract(props, '$.k') AS INT)) AS k_max,
       round(avg(CAST(json_extract(props, '$.k') AS INT)), 6) AS k_avg
FROM events
GROUP BY 1
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Whole-table profiling: per-column null/distinct/min/max in ONE scan.
# The operational answer to "can I trust this predictions table?" -- the
# reference runs three hand-written DQ probes (Data_quality_checks.py:
# 20-40); a profile is the general form, and the first thing run against
# any new 100 TB table. min/max are emitted UNROUNDED: they are selection
# (not arithmetic) aggregates, so both engines return the identical
# stored bits and no decimal-rounding parity risk exists. Timestamps
# profile as exact integer microseconds (< 2^53, exact in DOUBLE).
PROFILE_COLS = [
    ("event_id", "num"),
    ("user_id", "num"),
    ("value", "num"),
    ("ts", "epoch_us"),
    ("event_type", None),
    ("props", None),
]


def predictions_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per column: n_rows, n_nulls, n_distinct, min/max (as
    DOUBLE; NULL for string columns).

    Scale: a single scan; the exact per-column distinct counts make
    Catalyst plan one Expand (row x |columns|) feeding partial aggs --
    the honest cost of exact multi-column NDV anywhere. At 100 TB swap
    ``countDistinct`` for ``approx_count_distinct`` (HLL++) and the plan
    collapses to one pass of mergeable sketches; the exact form is kept
    here because the oracle value-matches it."""
    ev = _events(spark, sf_dir)
    aggs = [F.count("*").alias("_n")]
    for c, kind in PROFILE_COLS:
        src = F.unix_micros(F.col(c)) if kind == "epoch_us" else F.col(c)
        aggs += [
            F.count(src).alias(f"{c}_nn"),
            F.countDistinct(src).alias(f"{c}_nd"),
        ]
        if kind is not None:
            aggs += [
                F.min(src).cast("double").alias(f"{c}_min"),
                F.max(src).cast("double").alias(f"{c}_max"),
            ]
    entries = []
    for c, kind in PROFILE_COLS:
        mn, mx = (
            (f"{c}_min", f"{c}_max")
            if kind is not None
            else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
        )
        entries.append(f"'{c}', {c}_nn, {c}_nd, {mn}, {mx}")
    unpivot = (
        f"stack({len(PROFILE_COLS)}, {', '.join(entries)}) "
        "AS (col_name, n_nonnull, n_distinct, min_value, max_value)"
    )
    return (
        ev.agg(*aggs)
        .select("_n", F.expr(unpivot))
        .select(
            "col_name",
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col("n_nonnull")).alias("n_nulls"),
            "n_distinct",
            "min_value",
            "max_value",
        )
        .orderBy("col_name")
    )


def _profile_oracle_sql() -> str:
    rows = []
    for c, kind in PROFILE_COLS:
        src = f"epoch_us({c})" if kind == "epoch_us" else c
        mn, mx = (
            (f"CAST(min({src}) AS DOUBLE)", f"CAST(max({src}) AS DOUBLE)")
            if kind is not None
            else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
        )
        rows.append(
            f"SELECT '{c}' AS col_name, count(*) AS n_rows,\n"
            f"       count(*) - count({src}) AS n_nulls,\n"
            f"       count(DISTINCT {src}) AS n_distinct,\n"
            f"       {mn} AS min_value, {mx} AS max_value\n"
            "FROM events"
        )
    return "\nUNION ALL\n".join(rows) + "\nORDER BY col_name"


PROFILE_SQL = _profile_oracle_sql()


# --------------------------------------------------------------------------
# Declarative expectations: every rule is (name, violation-predicate SQL
# text valid in BOTH dialects) -- evaluated in ONE conditional-sum scan,
# the generalization of the reference's three hand-written DQ checks
# (dags/compute-daily-metrics.py:49-61; jobs.py run_dq_checks is the
# scheduled twin). Adding a rule is adding a tuple.
DQ_EVENT_TYPES = "'click', 'error', 'purchase', 'signup', 'view'"
DQ_RULES: tuple[tuple[str, str], ...] = (
    ("event_id_not_null", "event_id IS NULL"),
    ("user_id_not_null", "user_id IS NULL"),
    ("value_non_negative", "value < 0"),
    ("event_type_in_enum", f"event_type NOT IN ({DQ_EVENT_TYPES})"),
    (
        "ts_in_sane_range",
        "ts < TIMESTAMP '2020-01-01 00:00:00'"
        " OR ts >= TIMESTAMP '2030-01-01 00:00:00'",
    ),
)


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations report over the events stream's landing table: one
    row per declared rule plus the uniqueness check, with exact
    violation counts and integer-ppm rates. The uniqueness rule cannot
    be a row predicate; it is count(*) - count(DISTINCT event_id) in
    the same aggregate. The JSON rule uses the engine's JSON extractor
    (props rows whose $.k is missing/unparseable).

    Scale: one conditional-sum scan (all row rules collapse map-side)
    + the exact-NDV for uniqueness -- the only shuffle, same cost class
    as predictions_profile's NDV column. Output is O(rules)."""
    ev = _events(spark, sf_dir)
    aggs = [
        F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END")).alias(name)
        for name, pred in DQ_RULES
    ]
    aggs.append(
        F.sum(
            F.expr(
                "CASE WHEN get_json_object(props, '$.k') IS NULL"
                " THEN 1 ELSE 0 END"
            )
        ).alias("props_has_k")
    )
    # uniqueness is judged over NON-NULL ids (count(col) skips NULLs in
    # both engines); null-ness is its own rule above
    aggs.append(
        (F.count("event_id") - F.countDistinct("event_id")).alias(
            "event_id_unique"
        )
    )
    aggs.append(F.count("*").alias("_n"))
    wide = ev.agg(*aggs)
    names = [name for name, _ in DQ_RULES] + ["props_has_k", "event_id_unique"]
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return (
        wide.selectExpr(
            f"stack({len(names)}, {stack}) AS (rule, n_violations)", "_n"
        )
        .selectExpr(
            "rule",
            "n_violations",
            "_n AS n_checked",
            "CAST((n_violations * 1000000L) DIV _n AS BIGINT)"
            " AS violation_ppm",
        )
        .orderBy("rule")
    )


def _dq_oracle_sql() -> str:
    rows = [
        f"SELECT '{name}' AS rule,\n"
        f"       CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_violations,\n"
        "       CAST(count(*) AS BIGINT) AS n_checked\nFROM events"
        for name, pred in DQ_RULES
    ]
    # guard json_extract behind json_valid: DuckDB RAISES on malformed
    # JSON where Spark's get_json_object returns NULL -- the CASE makes
    # both engines count NULL/malformed/keyless identically
    rows.append(
        "SELECT 'props_has_k' AS rule,\n"
        "       CAST(sum(CASE WHEN props IS NULL THEN 1\n"
        "                     WHEN NOT json_valid(props) THEN 1\n"
        "                     WHEN json_extract(props, '$.k') IS NULL"
        " THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,\n"
        "       CAST(count(*) AS BIGINT) AS n_checked\nFROM events"
    )
    rows.append(
        "SELECT 'event_id_unique' AS rule,\n"
        "       CAST(count(event_id) - count(DISTINCT event_id) AS BIGINT)"
        " AS n_violations,\n"
        "       CAST(count(*) AS BIGINT) AS n_checked\nFROM events"
    )
    body = "\nUNION ALL\n".join(rows)
    return f"""
SELECT rule, n_violations, n_checked,
       CAST((n_violations * 1000000) // n_checked AS BIGINT)
         AS violation_ppm
FROM ({body})
ORDER BY rule
"""


DQ_EXPECTATIONS_SQL = _dq_oracle_sql()


# --------------------------------------------------------------------------
# Referential integrity: the schema's foreign-key relations as data.
# dq_expectations audits one table's ROW rules; this audits the rules
# BETWEEN tables -- the orphan check every warehouse load runs before
# trusting a join (the reference's flat schema has no FKs to audit;
# services/db/init.sql:1-31).
FK_RELATIONS: tuple[tuple[str, str, str, str, str], ...] = (
    # (relation name, child table, child key, parent table, parent key)
    ("lineitem_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer_nationkey", "customer", "c_nationkey", "nation",
     "n_nationkey"),
    ("supplier_nationkey", "supplier", "s_nationkey", "nation",
     "n_nationkey"),
    ("nation_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
    # the multimodal alignment rule: every embedding row must reference
    # a document (vec_id IS the doc_id in the 1:1 alignment
    # dedup_signal_crosstab and the SemDeDup stage depend on) -- an
    # orphan vector means the doc store and the vector store diverged
    ("embeddings_vec_doc", "embeddings", "vec_id", "documents", "doc_id"),
)


def fk_integrity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit: one row per declared relation with the
    child row count, orphan count (child keys with no parent; NULL
    child keys counted separately, SQL-FK style), and integer-ppm
    orphan rate. Adding a relation is adding a tuple.

    Scale shape: per relation, the child side collapses to DISTINCT
    keys + counts FIRST (one keyed aggregate, output bounded by key
    cardinality), then LEFT-joins the parent's distinct keys and folds
    row count, null count and orphan count into ONE aggregate over the
    joined frame -- so the join moves distinct keys, never child rows,
    and the child subtree is evaluated once. The previous
    stats-crossJoin-anti-join form referenced the child aggregate from
    TWO branches, and Catalyst evaluated the whole child scan+groupBy
    per branch (plan-verified: lineitem scanned 6x across its 3
    relations; guide 2.4 on removing duplicate subtrees). The parent
    side is deduplicated explicitly so the left join stays
    set-semantic like the anti-join it replaces, whatever the parent's
    key multiplicity. Dimension-sized parents broadcast under AQE.
    Output is O(relations). Measured at the 100x replica, best-of-2:
    28.4 s -> 13.1 s."""
    parts = []
    for name, child, ckey, parent, pkey in FK_RELATIONS:
        c = load_table(spark, sf_dir, child)
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pkey).alias("k"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        keyed = (
            c.select(F.col(ckey).alias("k"))
            .groupBy("k")
            .agg(F.count("*").alias("n"))
        )
        leg = keyed.join(p, "k", "left").agg(
            F.sum("n").alias("n_child_rows"),
            F.sum(F.expr("CASE WHEN k IS NULL THEN n ELSE 0 END")).alias(
                "n_null_keys"
            ),
            # coalesce mirrors the old anti-join leg: an EMPTY child
            # table must still report 0 orphans, not NULL
            F.coalesce(
                F.sum(
                    F.expr(
                        "CASE WHEN k IS NOT NULL AND _hit IS NULL"
                        " THEN n ELSE 0 END"
                    )
                ),
                F.lit(0),
            ).alias("n_orphans"),
        )
        parts.append(
            leg.selectExpr(
                f"'{name}' AS relation",
                "n_child_rows",
                "n_null_keys",
                "n_orphans",
                # zero-guard: an empty child table must report 0, not
                # NULL (Spark) vs a division-by-zero error (DuckDB)
                "CAST(CASE WHEN n_child_rows = 0 THEN 0"
                " ELSE n_orphans * 1000000L DIV n_child_rows END"
                " AS BIGINT) AS orphan_ppm",
            )
        )
    out = parts[0]
    for frag in parts[1:]:
        out = out.unionByName(frag)
    return out.orderBy("relation")


def _fk_oracle_sql() -> str:
    rows = [
        f"""SELECT '{name}' AS relation,
       CAST(count(*) AS BIGINT) AS n_child_rows,
       CAST(sum(CASE WHEN {ckey} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_keys,
       CAST(sum(CASE WHEN {ckey} IS NOT NULL AND {ckey} NOT IN
                (SELECT {pkey} FROM {parent}) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans
FROM {child}"""
        for name, child, ckey, parent, pkey in FK_RELATIONS
    ]
    body = "\nUNION ALL\n".join(rows)
    return f"""
SELECT relation, n_child_rows, n_null_keys, n_orphans,
       CAST(CASE WHEN n_child_rows = 0 THEN 0
            ELSE n_orphans * 1000000 // n_child_rows END AS BIGINT)
         AS orphan_ppm
FROM ({body})
ORDER BY relation
"""


FK_INTEGRITY_SQL = _fk_oracle_sql()


QUERIES = {
    "dq_expectations": dq_expectations,
    "fk_integrity_check": fk_integrity_check,
    "props_json_stats": props_json_stats,
    "daily_metrics": daily_metrics,
    "freshness_check": freshness_check,
    "null_id_check": null_id_check,
    "windowed_rates": windowed_rates,
    "hourly_timeseries": hourly_timeseries,
    "tumbling_15min": tumbling_15min,
    "recent_topk": recent_topk,
    "heuristic_score": heuristic_score,
    "feature_extract": feature_extract,
    "predictions_profile": predictions_profile,
}

ORACLE = {
    "dq_expectations": DQ_EXPECTATIONS_SQL,
    "fk_integrity_check": FK_INTEGRITY_SQL,
    "props_json_stats": PROPS_JSON_SQL,
    "daily_metrics": DAILY_METRICS_SQL,
    "freshness_check": FRESHNESS_SQL,
    "null_id_check": NULL_ID_SQL,
    "windowed_rates": WINDOWED_RATES_SQL,
    "hourly_timeseries": HOURLY_TIMESERIES_SQL,
    "tumbling_15min": TUMBLING_15MIN_SQL,
    "recent_topk": RECENT_TOPK_SQL,
    "heuristic_score": HEURISTIC_SCORE_SQL,
    "feature_extract": FEATURE_EXTRACT_SQL,
    "predictions_profile": PROFILE_SQL,
}
