"""Temporal operators Spark lacks as built-ins, re-expressed Spark-first:
as-of join, interval (range) join, and HLL approx-distinct with a
bounded-error oracle.

These are the stream-correlation primitives a predictions store needs
(the reference correlates events only implicitly, via Grafana time-range
panels -- grafana/dashboards/predictions.json:35,49); here they are
first-class, scale-safe operators:

  * asof_click_before_purchase -- classic AS-OF: each purchase picks the
    user's most recent prior click. Spark has no ASOF JOIN; the naive
    inequality join is O(n*m) per user. Implementation: tag + union both
    sides, ONE shuffle (partitionBy user, orderBy ts), and a running
    ``last(ignorenulls)`` carries the latest click forward. Linear,
    no join at all, survives arbitrary skew in either side.
  * clicks_before_errors -- interval join (right rows within a bounded
    time range of left rows). Naive SQL is again a per-user cross
    product. Implementation: time-bucket both sides at the window width,
    duplicate each right row into (bucket, bucket+1), and equi-join on
    (user, bucket) -- candidates are exact supersets of the true matches,
    a final predicate trims them. Shuffle is keyed by (user, bucket):
    high cardinality, no skew pile-up, each task sees only a 2-window
    slice.
  * approx_distinct_users -- approx_count_distinct (HLL++) next to the
    exact count; the emitted column is the bounded-relative-error
    VERDICT, not the sketch estimate, so engines with different HLL
    implementations agree on the output.

DuckDB oracles use the built-in ASOF JOIN / inequality joins -- different
physical strategy, identical semantics, which is exactly what the
correctness gate should pin down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.money import cents_sql, exact_sum

BUCKET_S = 300  # interval-join window width: 5 minutes
APPROX_RSD = 0.05
APPROX_TOL = 0.10


# --------------------------------------------------------------------------
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase event, the same user's most recent click at or
    before the purchase timestamp (inner as-of semantics: purchases with
    no prior click are dropped).

    Right side is first deduplicated to one row per (user, ts) keeping
    the max event_id, so tie-breaking is deterministic in both engines."""
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("click_id"),
            F.expr("max_by(value, event_id)").alias("click_value"),
        )
        .select(
            "user_id",
            F.col("ts").alias("ev_ts"),
            F.lit(0).alias("tag"),
            "click_id",
            "click_value",
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("ev_ts"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("double").alias("click_value"),
        F.col("event_id").alias("purchase_id"),
    )
    # tag orders clicks before purchases at equal ts => inclusive (<=) as-of
    w = (
        Window.partitionBy("user_id")
        .orderBy("ev_ts", "tag", "click_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).select(
        "*",
        F.last("click_id", ignorenulls=True).over(w).alias("asof_click_id"),
        F.last(
            F.when(F.col("tag") == 0, F.col("ev_ts")), ignorenulls=True
        )
        .over(w)
        .alias("asof_click_ts"),
        F.last("click_value", ignorenulls=True).over(w).alias("asof_value"),
    )
    return (
        merged.filter((F.col("tag") == 1) & F.col("asof_click_id").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.col("ev_ts").alias("purchase_ts"),
            F.col("asof_click_id").alias("click_id"),
            F.col("asof_click_ts").alias("click_ts"),
            F.round("asof_value", 2).alias("click_value"),
        )
        .orderBy("purchase_id")
    )


ASOF_SQL = """
WITH clicks AS (
  SELECT user_id, ts,
         max(event_id) AS click_id,
         arg_max(value, event_id) AS click_value
  FROM events WHERE event_type = 'click'
  GROUP BY 1, 2
),
purch AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
       c.click_id, c.ts AS click_ts, round(c.click_value, 2) AS click_value
FROM purch p
ASOF JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
ORDER BY purchase_id
"""


# --------------------------------------------------------------------------
def clicks_before_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: per error event, count + value-sum of the same
    user's clicks in the strict 5-minute window before the error
    (click_ts in [error_ts - 5 min, error_ts)). Errors with no clicks
    are kept with zero counts."""
    ev = load_table(spark, sf_dir, "events")
    bucket = lambda c: F.floor(F.unix_micros(c) / (BUCKET_S * 1_000_000))  # noqa: E731
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts").alias("err_ts"),
        bucket(F.col("ts")).alias("bucket"),
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
            F.explode(
                F.array(bucket(F.col("ts")), bucket(F.col("ts")) + 1)
            ).alias("bucket"),
        )
    )
    in_window = (
        (F.col("click_ts") >= F.col("err_ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("click_ts") < F.col("err_ts"))
    )
    joined = errors.join(
        clicks, ["user_id", "bucket"], "left"
    ).withColumn("matched", F.when(in_window, F.col("click_value")))
    return (
        joined.groupBy("err_id", "user_id", "err_ts")
        .agg(
            F.count("matched").alias("n_clicks"),
            F.round(F.coalesce(F.sum("matched"), F.lit(0.0)), 2).alias(
                "click_value_sum"
            ),
        )
        .orderBy("err_id")
    )


INTERVAL_JOIN_SQL = """
SELECT e.event_id AS err_id, e.user_id, e.ts AS err_ts,
       count(c.ts) AS n_clicks,
       round(coalesce(sum(c.value), 0), 2) AS click_value_sum
FROM events e
LEFT JOIN events c
  ON c.event_type = 'click' AND c.user_id = e.user_id
 AND c.ts >= e.ts - INTERVAL 5 MINUTE AND c.ts < e.ts
WHERE e.event_type = 'error'
GROUP BY 1, 2, 3
ORDER BY err_id
"""


# --------------------------------------------------------------------------
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type: exact count plus an HLL++
    approx_count_distinct sanity verdict (within 10% relative error).
    Only the verdict is emitted -- sketch estimates are engine-specific,
    the error bound is not."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.approx_count_distinct("user_id", APPROX_RSD).alias("_ap"),
        )
        .select(
            "event_type",
            "n_users",
            (
                (F.abs(F.col("_ap") - F.col("n_users")) / F.col("n_users"))
                <= APPROX_TOL
            )
            .cast("int")
            .alias("approx_ok"),
        )
        .orderBy("event_type")
    )


APPROX_DISTINCT_SQL = f"""
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       CAST(abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
            / count(DISTINCT user_id) <= {APPROX_TOL} AS INT) AS approx_ok
FROM events
GROUP BY 1
ORDER BY event_type
"""


# --------------------------------------------------------------------------
def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles per event type next to the exact ones,
    emitting bounded-relative-error verdicts -- the approx_distinct
    pattern applied to percentile_approx (Greenwald-Khanna in Spark,
    t-digest in DuckDB: different sketches, same error contract)."""
    ev = load_table(spark, sf_dir, "events")
    qs = [0.5, 0.9, 0.99]
    exact = [
        F.expr(f"percentile(value, {q})").alias(f"p{int(q * 100)}")
        for q in qs
    ]
    approx = [
        F.expr(f"percentile_approx(value, {q}, 1000)").alias(
            f"ap{int(q * 100)}"
        )
        for q in qs
    ]
    out = ev.groupBy("event_type").agg(*exact, *approx)
    cols = [
        (
            (
                F.abs(F.col(f"ap{p}") - F.col(f"p{p}"))
                / F.greatest(F.abs(F.col(f"p{p}")), F.lit(1e-9))
            )
            <= APPROX_TOL
        )
        .cast("int")
        .alias(f"p{p}_ok")
        for p in (50, 90, 99)
    ]
    return (
        out.select(
            "event_type",
            F.round("p50", 4).alias("p50"),
            F.round("p90", 4).alias("p90"),
            F.round("p99", 4).alias("p99"),
            *cols,
        )
        .orderBy("event_type")
    )


APPROX_QUANTILES_SQL = f"""
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99,
       CAST(abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
            / greatest(abs(quantile_cont(value, 0.5)), 1e-9)
            <= {APPROX_TOL} AS INT) AS p50_ok,
       CAST(abs(approx_quantile(value, 0.9) - quantile_cont(value, 0.9))
            / greatest(abs(quantile_cont(value, 0.9)), 1e-9)
            <= {APPROX_TOL} AS INT) AS p90_ok,
       CAST(abs(approx_quantile(value, 0.99) - quantile_cont(value, 0.99))
            / greatest(abs(quantile_cont(value, 0.99)), 1e-9)
            <= {APPROX_TOL} AS INT) AS p99_ok
FROM events
GROUP BY 1
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Inter-arrival gap histogram. Thresholds in integer MICROSECONDS so both
# engines bucket on exact int64 arithmetic -- no float boundary drift.
GAP_EDGES_US = [
    (60_000_000, "a_lt_1m"),
    (300_000_000, "b_1m_5m"),
    (3_600_000_000, "c_5m_1h"),
]
GAP_LAST = "d_ge_1h"


def event_gap_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-user inter-event gaps, attributed to the LATER
    event's type: for each user's event stream ordered by (ts, event_id),
    the gap to the previous event (any type) is bucketed into
    <1m / 1-5m / 5m-1h / >=1h.

    This is the arrival-process profile behind every streaming knob the
    pipeline exposes (watermark delay, session gap, trigger interval --
    the reference hard-codes 15 min / 1 h windows, Data_quality_checks.py
    :24,37, with no way to know whether those fit the stream).

    Scale: ONE shuffle (partitionBy user_id) shared by the lag window --
    the same key the sessionizer shuffles on; the final groupBy is on
    ~4x|event_type| rows of partial counts. Gap arithmetic stays in int64
    microseconds end-to-end: bucket edges compare exactly in both engines,
    min/max per bucket divide down to whole seconds with integer DIV."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    bucket = F.when(F.col("gap_us") < GAP_EDGES_US[0][0], GAP_EDGES_US[0][1])
    for edge, label in GAP_EDGES_US[1:]:
        bucket = bucket.when(F.col("gap_us") < edge, label)
    bucket = bucket.otherwise(GAP_LAST)
    return (
        ev.select("event_type", gap.alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
        .groupBy("event_type", bucket.alias("gap_bucket"))
        .agg(
            F.count("*").alias("n_gaps"),
            F.expr("min(gap_us) DIV 1000000").alias("min_gap_s"),
            F.expr("max(gap_us) DIV 1000000").alias("max_gap_s"),
        )
        .orderBy("event_type", "gap_bucket")
    )


GAP_BUCKETS_SQL = f"""
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type,
       CASE WHEN gap_us < {GAP_EDGES_US[0][0]} THEN '{GAP_EDGES_US[0][1]}'
            WHEN gap_us < {GAP_EDGES_US[1][0]} THEN '{GAP_EDGES_US[1][1]}'
            WHEN gap_us < {GAP_EDGES_US[2][0]} THEN '{GAP_EDGES_US[2][1]}'
            ELSE '{GAP_LAST}' END AS gap_bucket,
       count(*) AS n_gaps,
       min(gap_us) // 1000000 AS min_gap_s,
       max(gap_us) // 1000000 AS max_gap_s
FROM gaps
WHERE gap_us IS NOT NULL
GROUP BY 1, 2
ORDER BY event_type, gap_bucket
"""


# --------------------------------------------------------------------------
# Recency-decayed value: the fraud-feature form of "how active is this
# account lately". Decay is DAY-GRANULAR with a power-of-two half-life:
# weight = 2^-floor(age_days / HALFLIFE_DAYS). Designed for exactness,
# not approximation convenience: integer age buckets + power-of-two
# weights mean both engines compute bit-identical weights (pow(2, -k)
# is exact in IEEE for integer k; exp()-based decay differs in the
# last ulp across libm implementations), and each weighted term is
# fixed-pointed BEFORE the sum, so the aggregate is order-independent
# (functions/money.py rationale).
DECAY_HALFLIFE_DAYS = 7


def decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user recency-weighted value: sum(value * 2^-(age_days div
    halflife)) with age measured back from max(ts) (the deterministic
    'now' anchor), plus the undecayed total for contrast. One scan, one
    broadcast scalar anchor, one groupBy(user_id) -- scale shape
    identical to any keyed rollup."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("now_ts"))
    weighted = (
        "CAST(round(value * pow(2, -CAST(datediff(now_ts, ts) AS INT)"
        f" DIV {DECAY_HALFLIFE_DAYS}) * 10000, 0) AS BIGINT)"
    )
    return (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                f"CAST(sum({weighted}) AS DOUBLE) / 10000"
            ).alias("decayed_value"),
            F.expr(
                "CAST(sum(CAST(round(value * 10000, 0) AS BIGINT))"
                " AS DOUBLE) / 10000"
            ).alias("total_value"),
        )
        .orderBy("user_id")
    )


DECAYED_VALUE_SQL = f"""
WITH anchored AS (
  SELECT user_id, value,
         datediff('day', CAST(ts AS DATE),
                  CAST((SELECT max(ts) FROM events) AS DATE)) AS age_days
  FROM events
)
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * pow(2, -(age_days // {DECAY_HALFLIFE_DAYS}))
                           * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000
         AS decayed_value,
       CAST(sum(CAST(round(value * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000
         AS total_value
FROM anchored
GROUP BY user_id
ORDER BY user_id
"""



# --------------------------------------------------------------------------
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The product-analytics staple: per activity day, DAU, trailing-
    7-day WAU, and stickiness = DAU/WAU in integer ppm. Exact distinct
    users (no sketches), computed the scalable way: one (user, day)
    distinct, then each active (user, day) PROJECTS ITSELF FORWARD
    into the <= 7 window-end days it contributes to (a bounded 7x
    explode -- the classic trick that turns a sliding distinct-count
    window into two plain distinct aggregations), restricted to days
    that actually have activity so the output is the DAU table's own
    day set."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    contrib = ud.selectExpr(
        "user_id", "explode(sequence(0, 6)) AS k", "day"
    ).select("user_id", F.expr("date_add(day, k)").alias("wday"))
    wau = (
        contrib.distinct()
        .groupBy(F.col("wday").alias("day"))
        .agg(F.count("*").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .selectExpr(
            "day",
            "dau",
            "wau",
            "CAST(round(dau * 1000000.0 / wau, 0) AS BIGINT)"
            " AS stickiness_ppm",
        )
        .orderBy("day")
    )


DAU_WAU_STICKINESS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
contrib AS (
  SELECT DISTINCT user_id, day + CAST(k AS INTEGER) AS wday
  FROM ud CROSS JOIN UNNEST(range(0, 7)) AS t(k)
),
wau AS (SELECT wday AS day, count(*) AS wau FROM contrib GROUP BY 1)
SELECT d.day,
       CAST(d.dau AS BIGINT) AS dau,
       CAST(w.wau AS BIGINT) AS wau,
       CAST(round(d.dau * 1000000.0 / w.wau, 0) AS BIGINT)
         AS stickiness_ppm
FROM dau d JOIN wau w USING (day)
ORDER BY day
"""


# --------------------------------------------------------------------------
def event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity over behavior: baskets are a user's
    DISTINCT event types per day; emit every type pair with its
    support count (baskets containing both), each type's solo basket
    count, and integer-ppm confidence in both directions
    (P(b|a), P(a|b)) -- the frequent-pattern mining pass behind
    "users who do X also do Y" product analytics. All counts are exact
    integers; confidences are round-to-integer ppm (boundary-safe).

    Scale shape: one distinct over (user, day, type) -- the basket
    projection, shuffle keyed by the composite -- then a within-basket
    self-join whose fanout is bounded by (distinct event types)^2 per
    basket (single digits here; capped by the type vocabulary, NOT by
    data volume), and a tiny pair-keyed rollup. The same
    basket-bounded-fanout argument that makes A-Priori's pair pass
    linear over transactions."""
    ev = load_table(spark, sf_dir, "events")
    # cache() the basket projection: it feeds FOUR consumers (both
    # sides of the within-basket self-join and solo's two broadcast
    # legs), and uncached each re-ran the events scan + composite-key
    # distinct -- four full corpus passes for one O(user-days) frame
    # (round-13 optimization, guide §2.4; same precedent as the cached
    # fingerprint frame in dedup_simhash).
    baskets = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("day"),
            "event_type",
        )
        .distinct()
        .cache()
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    solo = baskets.groupBy("event_type").agg(F.count("*").alias("n"))
    sa = solo.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = solo.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .selectExpr(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            "CAST(round(n_both * 1000000.0 / n_a, 0) AS BIGINT)"
            " AS conf_a_to_b_ppm",
            "CAST(round(n_both * 1000000.0 / n_b, 0) AS BIGINT)"
            " AS conf_b_to_a_ppm",
        )
        .orderBy("type_a", "type_b")
    )


EVENT_TYPE_AFFINITY_SQL = """
WITH baskets AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
  FROM events
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_both
  FROM baskets a
  JOIN baskets b
    ON a.user_id = b.user_id AND a.day = b.day
   AND a.event_type < b.event_type
  GROUP BY 1, 2
),
solo AS (
  SELECT event_type, count(*) AS n FROM baskets GROUP BY 1
)
SELECT p.type_a, p.type_b,
       CAST(p.n_both AS BIGINT) AS n_both,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       CAST(round(p.n_both * 1000000.0 / sa.n, 0) AS BIGINT)
         AS conf_a_to_b_ppm,
       CAST(round(p.n_both * 1000000.0 / sb.n, 0) AS BIGINT)
         AS conf_b_to_a_ppm
FROM pairs p
JOIN solo sa ON sa.event_type = p.type_a
JOIN solo sb ON sb.event_type = p.type_b
ORDER BY type_a, type_b
"""


# --------------------------------------------------------------------------
# RFM segmentation thresholds: FIXED absolute boundaries (not data
# quantiles) so the segment definition is deterministic, identical
# across engines, and stable as the corpus grows -- a quantile-based
# cut would re-label every user whenever new data arrives.
RFM_R_HOURS = (6, 24, 72)  # recency: <=6h -> 4, <=24h -> 3, <=72h -> 2
RFM_F_EVENTS = (72, 66, 61)  # frequency: >=72 -> 4, >=66 -> 3, >=61 -> 2
RFM_M_CENTS = (370_000, 330_000, 295_000)  # monetary (exact cents)


def _rfm_score(col: str, cuts, descending: bool) -> str:
    a, b, c = cuts
    op = ">=" if descending else "<="
    return (
        f"CASE WHEN {col} {op} {a} THEN 4 WHEN {col} {op} {b} THEN 3"
        f" WHEN {col} {op} {c} THEN 2 ELSE 1 END"
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/Frequency/Monetary segmentation census: users scored 1-4
    on each axis against fixed boundaries, rolled up per (r, f, m)
    cell. Recency is hours back from max(ts) (the deterministic 'now'
    anchor -- the decayed_user_value pattern); monetary accumulates
    exact integer cents so the per-user totals, and hence the scores,
    are order-independent and engine-exact.

    Scale: one scan, one groupBy(user_id), a broadcast scalar anchor,
    and an O(64-cell) final rollup -- the same shape as any keyed
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("now_ts"))
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST((unix_micros(max(now_ts)) - unix_micros(max(ts)))"
                " DIV 3600000000 AS BIGINT)"
            ).alias("recency_h"),
            F.count("*").alias("n_events"),
            F.expr(
                "sum(CAST(round(value * 100, 0) AS BIGINT))"
            ).alias("cents"),
        )
    )
    scored = per_user.selectExpr(
        f"{_rfm_score('recency_h', RFM_R_HOURS, False)} AS r_score",
        f"{_rfm_score('n_events', RFM_F_EVENTS, True)} AS f_score",
        f"{_rfm_score('cents', RFM_M_CENTS, True)} AS m_score",
        "cents",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("cents").alias("total_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


RFM_SEGMENTS_SQL = f"""
WITH anchor AS (SELECT max(ts) AS now_ts FROM events),
per_user AS (
  SELECT user_id,
         CAST((epoch_us(max(a.now_ts)) - epoch_us(max(ts)))
              // 3600000000 AS BIGINT) AS recency_h,
         count(*) AS n_events,
         sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
  FROM events, anchor a
  GROUP BY user_id
),
scored AS (
  SELECT {_rfm_score('recency_h', RFM_R_HOURS, False)} AS r_score,
         {_rfm_score('n_events', RFM_F_EVENTS, True)} AS f_score,
         {_rfm_score('cents', RFM_M_CENTS, True)} AS m_score,
         cents
  FROM per_user
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Gap-filled time series (TimescaleDB time_bucket_gapfill / locf /
# interpolate semantics, re-expressed Spark-first).


def gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-event-type gauge series with GAPS MATERIALIZED and two
    standard fills: LOCF (last observation carried forward) and linear
    interpolation between the surrounding observed buckets.

    The reference's dashboard charts (grafana/dashboards/
    predictions.json:18) silently connect points across empty hours --
    a thin hour and a missing hour look identical. A gapfilled series
    makes the difference explicit (n_events = 0, fills non-NULL), which
    is what time-series engines ship as a first-class operator
    (TimescaleDB ``time_bucket_gapfill`` + ``locf`` + ``interpolate``);
    Spark has no built-in, so this composes one:

      1. ONE scan aggregates events to (event_type, epoch-hour) --
         everything after operates on the bucket grid, whose size is
         O(hours x types) regardless of input rows (720 x 5 here; a
         YEAR of 100 TB telemetry is still only 8,760 x types rows).
      2. The dense grid is sequence()-exploded from the global hour
         bounds and cross-joined with the distinct types -- both sides
         are tiny, the join is broadcast by AQE.
      3. Fills run in a window partitioned by event_type over the GRID
         (never the raw events): LOCF is last(ignorenulls) backward;
         interpolation carries (prev, next) observed values/hours and
         evaluates in INTEGER cents -- ``(prev*(nh-h) + next*(h-ph))
         DIV (nh-ph)`` -- every term non-negative, so floor == trunc
         and the result is bit-identical across engines and run orders.

    Leading gaps have no LOCF/interp (NULL); trailing gaps LOCF but do
    not interpolate. Gauge = floor mean of value in cents."""
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.selectExpr(
            "event_type",
            "unix_timestamp(ts) DIV 3600 AS h",
            f"{_CENTS} AS cents",
        )
        .groupBy("event_type", "h")
        .agg(
            F.count("*").alias("n_events"),
            F.expr("sum(cents) DIV count(*)").alias("avg_cents"),
        )
    )
    agg = agg.cache()
    grid = (
        agg.groupBy()
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .selectExpr("explode(sequence(mn, mx)) AS h")
        .crossJoin(F.broadcast(agg.select("event_type").distinct()))
    )
    j = grid.join(agg, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "avg_cents",
    )
    back = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("avg_cents").isNotNull(), F.col("h"))
    w = j.select(
        "event_type",
        "h",
        "n_events",
        "avg_cents",
        F.last("avg_cents", ignorenulls=True).over(back).alias("locf_cents"),
        F.last(obs_h, ignorenulls=True).over(back).alias("ph"),
        F.first("avg_cents", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(fwd).alias("nh"),
    )
    return (
        w.selectExpr(
            "event_type",
            "date_format(timestamp_seconds(h * 3600),"
            " 'yyyy-MM-dd HH:mm:ss') AS bucket_hour",
            "n_events",
            "avg_cents",
            "locf_cents",
            "CASE WHEN avg_cents IS NOT NULL THEN avg_cents"
            "     WHEN ph IS NOT NULL AND nh IS NOT NULL THEN"
            "       (locf_cents * (nh - h) + nv * (h - ph)) DIV (nh - ph)"
            " END AS interp_cents",
        )
        .orderBy("event_type", "bucket_hour")
    )


_CENTS = cents_sql("value", 100)

GAPFILL_HOURLY_SQL = f"""
WITH agg AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
         count(*) AS n_events,
         sum({_CENTS}) // count(*) AS avg_cents
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(h) AS mn, max(h) AS mx FROM agg),
grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM agg) t,
       (SELECT unnest(range((SELECT mn FROM bounds),
                            (SELECT mx FROM bounds) + 1)) AS h) g
),
j AS (
  SELECT g.event_type, g.h,
         coalesce(a.n_events, 0) AS n_events, a.avg_cents
  FROM grid g LEFT JOIN agg a USING (event_type, h)
),
w AS (
  SELECT event_type, h, n_events, avg_cents,
    last_value(avg_cents IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_cents,
    last_value(CASE WHEN avg_cents IS NOT NULL THEN h END IGNORE NULLS)
      OVER (PARTITION BY event_type ORDER BY h
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
    first_value(avg_cents IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY h
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN avg_cents IS NOT NULL THEN h END IGNORE NULLS)
      OVER (PARTITION BY event_type ORDER BY h
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM j
)
SELECT event_type,
       strftime(make_timestamp(h * 3600 * 1000000),
                '%Y-%m-%d %H:%M:%S') AS bucket_hour,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(avg_cents AS BIGINT) AS avg_cents,
       CAST(locf_cents AS BIGINT) AS locf_cents,
       CAST(CASE WHEN avg_cents IS NOT NULL THEN avg_cents
                 WHEN ph IS NOT NULL AND nh IS NOT NULL THEN
                   (locf_cents * (nh - h) + nv * (h - ph)) // (nh - ph)
            END AS BIGINT) AS interp_cents
FROM w
ORDER BY event_type, bucket_hour
"""


# --------------------------------------------------------------------------
# Trailing-window velocity features, profiled as a bounded histogram.
_H1_US = 3_600_000_000 - 1  # trailing (t-1h, t] in microseconds
_D1_US = 86_400_000_000 - 1  # trailing (t-24h, t]


def velocity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window velocity features -- per event, the user's event
    count over the trailing hour and spend over the trailing 24h --
    profiled as an order-of-magnitude histogram per event type. These
    are THE classic card-fraud features ('5th transaction this hour')
    that the reference's stateless per-message scorer
    (services/fraud_service/app/main.py:100-104) cannot compute; here
    they are two RANGE-frame window aggregates sharing one user-keyed
    sort, all JVM-side.

    Exactness: frames are value-based on integer microseconds --
    peer-inclusive RANGE semantics are identical in both engines and
    independent of tie order; spend sums exact cents (BIGINT); buckets
    are decimal digit counts of BIGINTs. Scale: ONE shuffle
    (partitionBy user), both frames computed in the same window pass;
    the histogram rollup collapses map-side to <= |types| x 7 x 12
    rows. Per-user data is bounded by a user's own activity, so the
    keyed sort survives arbitrary corpus growth; a single pathological
    user degrades to one sorted partition of its own events."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.selectExpr(
        "user_id",
        "event_type",
        "unix_micros(ts) AS us",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents",
    )
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_H1_US, 0)
    )
    w24 = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_D1_US, 0)
    )
    feat = base.select(
        "event_type",
        F.count(F.lit(1)).over(w1).alias("v1h"),
        F.sum("cents").over(w24).alias("c24h"),
    )
    return (
        feat.groupBy(
            "event_type",
            F.expr("length(CAST(v1h AS STRING))").alias("v1h_digits"),
            F.expr("length(CAST(c24h AS STRING))").alias("c24h_digits"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.max("v1h").alias("max_v1h"),
            F.max("c24h").alias("max_c24h"),
        )
        .orderBy("event_type", "v1h_digits", "c24h_digits")
    )


VELOCITY_PROFILE_SQL = f"""
WITH feat AS (
  SELECT event_type,
         CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN {_H1_US} PRECEDING AND CURRENT ROW)
              AS BIGINT) AS v1h,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN {_D1_US} PRECEDING AND CURRENT ROW)
              AS BIGINT) AS c24h
  FROM events
)
SELECT event_type,
       CAST(length(CAST(v1h AS VARCHAR)) AS INT) AS v1h_digits,
       CAST(length(CAST(c24h AS VARCHAR)) AS INT) AS c24h_digits,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(v1h) AS BIGINT) AS max_v1h,
       CAST(max(c24h) AS BIGINT) AS max_c24h
FROM feat GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# SCD2 dimension history + point-in-time enrichment: the TEMPORAL
# CORRECTNESS surface of storage.py's merge_dimension_scd2 /
# point_in_time_join, expressed as oracle-checkable registry queries.
# The reference stores only current-state rows (Postgres upserts,
# services/fraud_service/app/main.py:150-170); a training-data pipeline
# needs the feature value AS-OF the event, which requires the history
# these two queries pin down.


def _scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative SCD2 history of each customer's order PRIORITY
    attribute: per (customer, day) the attribute is the priority of
    that day's highest orderkey; consecutive equal values collapse
    (SCD2 records CHANGES, not updates); each change row carries
    [valid_from, valid_to) with NULL = current.

    Scale shape: ONE shuffle keyed by customer and ONE sort serve all
    three window passes -- the day's winning update is the FIRST row
    per (customer, day) under the (date ASC, orderkey DESC) sort (a
    lag(date) boundary test, equivalent to the row_number()=1 pick but
    without its own (custkey, date) exchange), and the change-collapse
    and validity-chain windows require only the (custkey, date-prefix)
    ordering that sort already provides, so Catalyst plans no further
    exchange or sort (plan-asserted in tests/test_plans.py). No join,
    no collect. tests/test_storage.py asserts this declarative history
    is row-identical to applying storage.merge_dimension_scd2
    incrementally over the same update stream, which is what gives the
    disk-merge operator driver-verdict coverage."""
    orders = load_table(spark, sf_dir, "orders")
    w_seq = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").desc()
    )
    daily = (
        orders.withColumn("_prev_eff", F.lag("o_orderdate").over(w_seq))
        .filter(
            F.col("_prev_eff").isNull()
            | (F.col("_prev_eff") != F.col("o_orderdate"))
        )
        .select(
            "o_custkey",
            F.col("o_orderdate").alias("eff"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    w_cust = Window.partitionBy("o_custkey").orderBy("eff")
    changes = (
        daily.withColumn("_prev", F.lag("priority").over(w_cust))
        .filter(
            F.col("_prev").isNull() | (F.col("_prev") != F.col("priority"))
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            "priority",
            F.col("eff").alias("valid_from"),
        )
    )
    w_hist = Window.partitionBy("custkey").orderBy("valid_from")
    return changes.withColumn(
        "valid_to", F.lead("valid_from").over(w_hist)
    )


def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD2 dimension itself: every (customer, priority) validity
    window, full history."""
    return _scd2_history(spark, sf_dir).select(
        "custkey", "priority", "valid_from", "valid_to"
    )


def pit_event_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment through storage.point_in_time_join:
    events (mapped onto the customer key space, shifted 28 years back
    so they land MID-history -- both the bounded-window and the
    no-valid-version branches get rows) pick up the customer's
    priority AS-OF the event timestamp, never the current row (using
    the current row would leak the future into training features).
    Output: event count + value mass per as-of priority; the NULL
    group is the before-first-window/unknown-key mass.

    Scale shape: the SCD2 dimension is the small side of the star, so
    point_in_time_join broadcasts it and the range predicate evaluates
    map-side -- the event stream never shuffles. Past the broadcast
    threshold (a dimension with hundreds of millions of history rows)
    the same equality key lets Spark degrade to a shuffled hash/SMJ
    with the range as a residual filter -- never a cartesian, because
    the key equality always anchors the join."""
    from ..storage import point_in_time_join

    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    maxc = orders.agg(F.max("o_custkey").alias("_maxc"))
    facts = ev.crossJoin(F.broadcast(maxc)).select(
        (F.col("user_id") % F.col("_maxc") + F.lit(1)).alias("custkey"),
        (F.col("ts") - F.expr("INTERVAL 28 YEARS")).alias("ts"),
        "value",
    )
    dim = _scd2_history(spark, sf_dir)
    joined = point_in_time_join(facts, dim, "custkey", "ts")
    return joined.groupBy(
        F.col("priority").alias("priority_asof")
    ).agg(
        F.count("*").alias("n_events"),
        # Fixed-point sum: double summation order differs between
        # Spark's partial aggregation and DuckDB's single-node sum,
        # and round(double, 4) breaks ties differently per engine --
        # the exact cross-engine mismatch class sessionize's
        # session_summary documents. Integer ten-thousandths are
        # order-independent and identical by construction.
        F.expr(exact_sum("value", 4)).alias("sum_value"),
    )


_SCD2_HIST_CTE = """
ranked AS (
  SELECT o_custkey, o_orderdate AS eff, o_orderpriority AS priority,
         row_number() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
), daily AS (SELECT o_custkey, eff, priority FROM ranked WHERE rn = 1),
chg AS (
  SELECT o_custkey, priority, eff AS valid_from,
         lag(priority) OVER (PARTITION BY o_custkey ORDER BY eff) AS prev
  FROM daily
), hist AS (
  SELECT o_custkey AS custkey, priority, valid_from,
         lead(valid_from) OVER (PARTITION BY o_custkey
                                ORDER BY valid_from) AS valid_to
  FROM chg WHERE prev IS NULL OR prev <> priority
)"""

SCD2_PRIORITY_HISTORY_SQL = f"""
WITH {_SCD2_HIST_CTE}
SELECT custkey, priority, valid_from, valid_to FROM hist
"""

PIT_EVENT_ENRICHMENT_SQL = f"""
WITH {_SCD2_HIST_CTE},
maxc AS (SELECT max(o_custkey) AS m FROM orders),
facts AS (SELECT (user_id % (SELECT m FROM maxc)) + 1 AS custkey,
                 ts - INTERVAL 28 YEAR AS ts, value FROM events)
SELECT h.priority AS priority_asof,
       count(*) AS n_events,
       {exact_sum("f.value", 4)} AS sum_value
FROM facts f LEFT JOIN hist h
  ON f.custkey = h.custkey AND f.ts >= h.valid_from
     AND (h.valid_to IS NULL OR f.ts < h.valid_to)
GROUP BY h.priority
"""


QUERIES = {
    "scd2_priority_history": scd2_priority_history,
    "pit_event_enrichment": pit_event_enrichment,
    "gapfill_hourly": gapfill_hourly,
    "rfm_segments": rfm_segments,
    "event_type_affinity": event_type_affinity,
    "dau_wau_stickiness": dau_wau_stickiness,
    "asof_click_before_purchase": asof_click_before_purchase,
    "clicks_before_errors": clicks_before_errors,
    "approx_distinct_users": approx_distinct_users,
    "approx_value_quantiles": approx_value_quantiles,
    "event_gap_buckets": event_gap_buckets,
    "decayed_user_value": decayed_user_value,
    "velocity_profile": velocity_profile,
}

ORACLE = {
    "scd2_priority_history": SCD2_PRIORITY_HISTORY_SQL,
    "pit_event_enrichment": PIT_EVENT_ENRICHMENT_SQL,
    "gapfill_hourly": GAPFILL_HOURLY_SQL,
    "rfm_segments": RFM_SEGMENTS_SQL,
    "event_type_affinity": EVENT_TYPE_AFFINITY_SQL,
    "dau_wau_stickiness": DAU_WAU_STICKINESS_SQL,
    "asof_click_before_purchase": ASOF_SQL,
    "clicks_before_errors": INTERVAL_JOIN_SQL,
    "approx_distinct_users": APPROX_DISTINCT_SQL,
    "approx_value_quantiles": APPROX_QUANTILES_SQL,
    "event_gap_buckets": GAP_BUCKETS_SQL,
    "decayed_user_value": DECAYED_VALUE_SQL,
    "velocity_profile": VELOCITY_PROFILE_SQL,
}
