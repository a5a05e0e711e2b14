"""Oracle-checked ML-surface queries: the reference's synthetic training
frame and its fixed-coefficient logistic scorer as pure Catalyst
expressions.

The reference's training generator (services/training/app/training.py:14-40)
uses numpy RNG -- unreproducible across engines. This module re-derives it
as a DETERMINISTIC counter-based generator (Philox-style idea: value =
f(key)) so Spark and DuckDB compute bit-identical frames:

  * uniforms: md5(id || ':gJ') sliced into 8-hex windows / 2^32 -- one
    digest yields 4 uniforms, 7 digests cover the 27 draws a row needs;
  * normals: Irwin-Hall 12-sum of uniforms minus 6 (classic N(0,1)
    approximation, exact same floating-point summation order in both
    dialects);
  * fields per training.py:17-29: amount = exp(3 + z) rounded 2dp,
    num_items = max(1, round(2 + z')), merchant_risk ~ U(0,1),
    hour = floor(24u), label ~ Bernoulli(sigmoid(0.002*amount +
    1.5*merchant_risk + 0.05*night - 2.5)) with night = hour in
    {0,1,2,3,23} (training.py:23-29).

``logit_score`` then applies the generating coefficients as a fixed
logistic model -- the engine's scoring path (SURVEY.md P3/P6/P8: ordered
feature projection, sigmoid, 0.5 threshold, main.py:99-121,178) with zero
Python in the loop: everything is whole-stage-codegen'd JVM expressions,
which is the point -- per-event model apply at 100 TB must not leave the
JVM. (The trained-MLlib-model path lives in ml/: training.py, scoring.py;
its fit is covered by tests, not an oracle, since no two engines fit
identical coefficients.)

Row keys come from orders.o_orderkey so the frame scales with sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table, spread

N_DIGESTS = 7  # 4 uniforms each


def _frame_sql(dialect: str, id_source: str) -> str:
    """Full generator as one nested-SELECT SQL string (same text modulo
    dialect casts, so floating-point evaluation order is identical).

    Staged: digests d0..d6 are named once in an inner SELECT, the 28
    uniforms slice them in the next stage -- without the staging the
    md5s appear 4x each in the expression tree and codegen compiles a
    28-way-duplicated plan (measured ~3.5 s of compile at sf0.1).

    No final ORDER BY: a generated frame is semantically a SET of rows
    (training consumers shuffle anyway) and the driver's comparison is
    order-insensitive; a global sort of the full frame is pure cost at
    scale. Applies to both dialects -- this builder emits the Spark
    query and the DuckDB oracle."""
    if dialect == "spark":
        cast_id = "CAST(id AS STRING)"
        hex2num = lambda h: f"CAST(conv({h}, 16, 10) AS DOUBLE)"  # noqa: E731
    else:
        cast_id = "CAST(id AS VARCHAR)"
        hex2num = lambda h: f"CAST(CAST('0x' || {h} AS BIGINT) AS DOUBLE)"  # noqa: E731
    digests = ", ".join(
        f"md5(concat({cast_id}, ':g{j}')) AS d{j}" for j in range(N_DIGESTS)
    )
    u = [
        f"({hex2num(f'substr(d{n // 4}, {1 + 8 * (n % 4)}, 8)')} / 4294967296.0)"
        for n in range(N_DIGESTS * 4)
    ]
    z1 = "(" + " + ".join(u[0:12]) + " - 6.0)"
    z2 = "(" + " + ".join(u[12:24]) + " - 6.0)"
    int_t = "INT"
    return f"""
SELECT id, amount, num_items, merchant_risk, hour, label
FROM (
  SELECT id, amount, num_items, merchant_risk, hour,
         CAST(u_label < 1.0 / (1.0 + exp(-(0.002 * amount
              + 1.5 * merchant_risk
              + 0.05 * (CASE WHEN hour IN (0.0, 1.0, 2.0, 3.0, 23.0)
                             THEN 1.0 ELSE 0.0 END)
              - 2.5))) AS {int_t}) AS label
  FROM (
    SELECT id,
           round(exp(3.0 + {z1}), 2) AS amount,
           greatest(1, CAST(round(2.0 + {z2}, 0) AS {int_t})) AS num_items,
           {u[24]} AS merchant_risk,
           CAST(floor({u[25]} * 24.0) AS DOUBLE) AS hour,
           {u[26]} AS u_label
    FROM (SELECT id, {digests} FROM ({id_source}))
  )
)
"""


def _register_ids(spark: SparkSession, sf_dir: str) -> None:
    """Register the id source spread across cores: a single parquet file
    is one input split, and without the repartition the whole md5-heavy
    generator projection runs on one task (the sort exchange comes too
    late to help)."""
    spread(
        load_table(spark, sf_dir, "orders").select("o_orderkey")
    ).createOrReplaceTempView("_ml_orders")


def training_frame_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic twin of the reference training generator (M1)."""
    _register_ids(spark, sf_dir)
    return spark.sql(
        _frame_sql("spark", "SELECT o_orderkey AS id FROM _ml_orders")
    )


TRAINING_FRAME_SQL = _frame_sql(
    "duck", "SELECT o_orderkey AS id FROM orders"
)


def _score_sql(dialect: str, id_source: str) -> str:
    # No final ORDER BY: per-event scoring is semantically unordered
    # (the reference appends rows as they arrive) and the driver's
    # comparison is order-insensitive -- a global sort of the full
    # scored frame was the single biggest cost of this query at the
    # 100x scale test, bought nothing, and is dropped in BOTH dialects
    # (this builder emits the Spark query and the DuckDB oracle).
    frame = _frame_sql(dialect, id_source)
    return f"""
SELECT id, amount,
       round(1.0 / (1.0 + exp(-(0.002 * amount + 1.5 * merchant_risk
             + 0.05 * (CASE WHEN hour IN (0.0, 1.0, 2.0, 3.0, 23.0)
                            THEN 1.0 ELSE 0.0 END) - 2.5))), 6) AS proba,
       CAST(1.0 / (1.0 + exp(-(0.002 * amount + 1.5 * merchant_risk
             + 0.05 * (CASE WHEN hour IN (0.0, 1.0, 2.0, 3.0, 23.0)
                            THEN 1.0 ELSE 0.0 END) - 2.5))) >= 0.5
            AS INT) AS prediction,
       'logit-fixed-v1' AS model_version
FROM ({frame})
"""


def logit_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-coefficient logistic scoring of the deterministic frame:
    proba + 0.5-threshold prediction + model_version, the full per-event
    scoring row shape of the reference hot path (main.py:173-180)."""
    _register_ids(spark, sf_dir)
    return spark.sql(
        _score_sql("spark", "SELECT o_orderkey AS id FROM _ml_orders")
    )


LOGIT_SCORE_SQL = _score_sql("duck", "SELECT o_orderkey AS id FROM orders")


def _calibration_sql(dialect: str, id_source: str) -> str:
    """Reliability report over the deterministic frame: decile bins of
    the scored probability vs the ACTUAL label rate per bin -- the
    standard check that a scorer's probabilities mean what they say
    (a fraud model claiming 0.7 should be right ~70% of the time in
    that bin), run before anyone thresholds on them. All emitted
    values are integer or integer-ppm (per-row probas enter the
    per-bin mean as fixed-point ints, so the sum is order-independent
    and the final round-to-integer is half-boundary-safe)."""
    frame = _frame_sql(dialect, id_source)
    proba = (
        "round(1.0 / (1.0 + exp(-(0.002 * amount + 1.5 * merchant_risk"
        " + 0.05 * (CASE WHEN hour IN (0.0, 1.0, 2.0, 3.0, 23.0)"
        " THEN 1.0 ELSE 0.0 END) - 2.5))), 6)"
    )
    return f"""
SELECT bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(label) AS BIGINT) AS n_pos,
       CAST(round(sum(proba_ppm) * 1.0 / count(*), 0) AS BIGINT)
         AS avg_proba_ppm,
       CAST(round(sum(label) * 1000000.0 / count(*), 0) AS BIGINT)
         AS pos_rate_ppm
FROM (
  SELECT least(9, CAST(floor({proba} * 10) AS INT)) AS bin,
         label,
         CAST(round({proba} * 1000000, 0) AS BIGINT) AS proba_ppm
  FROM ({frame})
)
GROUP BY bin
ORDER BY bin
"""


def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile calibration of the fixed logistic scorer vs the frame's
    own labels (see _calibration_sql). Shape at scale: the generator
    projection is map-only, the rollup is one 10-key aggregate --
    map-side partials collapse to 10 rows per task."""
    _register_ids(spark, sf_dir)
    return spark.sql(
        _calibration_sql("spark", "SELECT o_orderkey AS id FROM _ml_orders")
    )


CALIBRATION_BINS_SQL = _calibration_sql(
    "duck", "SELECT o_orderkey AS id FROM orders"
)


SWEEP_THRESHOLDS_PPM = tuple(range(100_000, 1_000_000, 100_000))  # 0.1..0.9


def _threshold_sweep_sql(dialect: str, id_source: str) -> str:
    """Precision/recall across candidate decision thresholds -- the
    table a deployment reads to PICK the threshold the reference
    hard-codes at 0.5 (main.py:178). One corpus scan builds a
    1000-bucket (floor(proba*1000), label) histogram; each threshold's
    confusion entries are integer sums over buckets (thresholds sit
    exactly on bucket edges, so floor-bucketing partitions rows
    EXACTLY as proba >= t would), and precision/recall emit as
    round-to-integer ppm."""
    frame = _frame_sql(dialect, id_source)
    proba = (
        "round(1.0 / (1.0 + exp(-(0.002 * amount + 1.5 * merchant_risk"
        " + 0.05 * (CASE WHEN hour IN (0.0, 1.0, 2.0, 3.0, 23.0)"
        " THEN 1.0 ELSE 0.0 END) - 2.5))), 6)"
    )
    thr_rows = ", ".join(f"({t})" for t in SWEEP_THRESHOLDS_PPM)
    return f"""
WITH hist AS (
  SELECT CAST(floor({proba} * 1000) AS INT) AS bucket,
         label, count(*) AS n
  FROM ({frame})
  GROUP BY 1, 2
),
thr (thr_ppm) AS (VALUES {thr_rows})
SELECT t.thr_ppm,
       CAST(coalesce(sum(CASE WHEN h.bucket * 1000 >= t.thr_ppm
                               AND h.label = 1 THEN h.n END), 0)
            AS BIGINT) AS tp,
       CAST(coalesce(sum(CASE WHEN h.bucket * 1000 >= t.thr_ppm
                               AND h.label = 0 THEN h.n END), 0)
            AS BIGINT) AS fp,
       CAST(coalesce(sum(CASE WHEN h.bucket * 1000 < t.thr_ppm
                               AND h.label = 1 THEN h.n END), 0)
            AS BIGINT) AS fn,
       CAST(coalesce(sum(CASE WHEN h.bucket * 1000 < t.thr_ppm
                               AND h.label = 0 THEN h.n END), 0)
            AS BIGINT) AS tn
FROM thr t CROSS JOIN hist h
GROUP BY t.thr_ppm
ORDER BY t.thr_ppm
"""


def threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion table per candidate threshold (see
    _threshold_sweep_sql); precision/recall derive trivially from the
    exact integer counts, so the query emits the counts themselves --
    the engine-portable ground truth."""
    _register_ids(spark, sf_dir)
    return spark.sql(
        _threshold_sweep_sql(
            "spark", "SELECT o_orderkey AS id FROM _ml_orders"
        )
    )


THRESHOLD_SWEEP_SQL = _threshold_sweep_sql(
    "duck", "SELECT o_orderkey AS id FROM orders"
)


# --------------------------------------------------------------------------
# Deterministic train/val split (M2 at scale): membership is a pure
# function of the row key (md5 window < threshold), so the split is
# reproducible across engines, re-runs, retries, and cluster sizes --
# the property randomSplit()/sampleBy() lack (their sampling is
# partition-order-dependent). 90/10 by the first 8 hex digits.
SPLIT_TRAIN_PCT = 90


def _split_sql(dialect: str) -> str:
    if dialect == "spark":
        h = "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS DOUBLE)"
    else:
        h = "CAST(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE)"
    frac = f"({h} / 4294967296.0)"
    return f"""
SELECT CASE WHEN {frac} < {SPLIT_TRAIN_PCT / 100.0} THEN 'train'
            ELSE 'val' END AS split,
       count(*) AS n_rows,
       round(avg(value), 6) AS avg_value,
       round(avg(CASE WHEN event_type = 'error' THEN CAST(1 AS DOUBLE)
                      ELSE CAST(0 AS DOUBLE) END), 6) AS error_rate
FROM events
GROUP BY 1
ORDER BY split
"""


def deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split summary: row counts and label-ish rates per split --
    balanced rates across splits are the sanity check a training
    pipeline runs after splitting."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_split_sql("spark"))


DETERMINISTIC_SPLIT_SQL = _split_sql("duck")


# Per-class sampling rates: keep every rare/high-value class, thin the
# bulk ones -- the standard class-rebalancing pass before training.
STRATA_RATES = {"purchase": 1.0, "error": 1.0, "click": 0.1, "view": 0.25}
STRATA_DEFAULT_RATE = 0.5


def _stratified_sql(dialect: str) -> str:
    """Deterministic stratified sampling summary, one scan: membership
    is md5(event_id) mapped to [0,1) (engine/retry/partitioning
    invariant -- the same idiom as deterministic_split, so re-runs and
    cluster resizes keep the identical sample), compared to a per-class
    rate. Emits per-class totals, kept counts, the realized rate vs the
    target, and the kept rows' average value. At 100 TB this is a
    map-side projection + one small keyed agg; no sampled rows are ever
    materialized to the driver."""
    if dialect == "spark":
        h = (
            "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 8), 16, 10)"
            " AS DOUBLE)"
        )
    else:
        h = (
            "CAST(CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)"
            " AS BIGINT) AS DOUBLE)"
        )
    frac = f"({h} / 4294967296.0)"
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(STRATA_RATES.items())
    )
    # CAST: a bare Spark decimal literal list would widen to
    # DECIMAL(3,2) and render '0.10' vs DuckDB's '0.1'
    rate = (
        f"CAST(CASE event_type {whens} ELSE {STRATA_DEFAULT_RATE} END"
        " AS DOUBLE)"
    )
    kept = f"CASE WHEN {frac} < {rate} THEN 1 ELSE 0 END"
    return f"""
SELECT event_type,
       {rate} AS target_rate,
       count(*) AS n_total,
       CAST(sum({kept}) AS BIGINT) AS n_kept,
       round(CAST(sum({kept}) AS BIGINT) / count(*), 6) AS realized_rate,
       round(avg(CASE WHEN {kept} = 1 THEN value END), 6) AS kept_avg_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class deterministic downsampling summary (see
    _stratified_sql)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_stratified_sql("spark"))


STRATIFIED_SAMPLE_SQL = _stratified_sql("duck")


# --------------------------------------------------------------------------
WSAMPLE_K = 5  # sampled docs per source


def _wsample_sql(dialect: str) -> str:
    """Efraimidis-Spirakis weighted sampling WITHOUT replacement
    (A-Res), deterministic: each doc draws the md5-uniform u and takes
    key u^(1/w) with w = n_chars; the top-{WSAMPLE_K} keys per source
    ARE a without-replacement sample with inclusion probability
    proportional to weight. Ordering by ln(u)/w is monotone-equivalent
    to u^(1/w) (both strictly increasing transforms for u in (0,1),
    w > 0) and numerically safer; the key is emitted in 1e-9 fixed
    point (the dsir/bigram integer-log convention) so ranking compares
    identical integers on both engines, doc_id breaking the only
    possible ties (identical u AND w). This is the
    mixture-materialization primitive when big documents should be
    favored: mixture_apply_sample keeps a deterministic FRACTION,
    this picks a deterministic weighted TOP-K.

    Scale shape: one scan, one per-source top-k window (keyed
    exchange on source; a source with extreme cardinality takes the
    part_rankings two-phase partial-top-k variant)."""
    if dialect == "spark":
        u = ("CAST(conv(substr(md5(concat('wsample:',"
             " CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)")
    else:
        u = ("CAST('0x' || substr(md5('wsample:'"
             " || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)")
    return f"""
WITH keyed AS (
  SELECT source, doc_id, n_chars,
         CAST(round(ln(({u} + 1) / 4294967297.0) / n_chars
                    * 1000000000, 0) AS BIGINT) AS key_fp
  FROM documents
),
ranked AS (
  SELECT source, doc_id, n_chars, key_fp,
         row_number() OVER (PARTITION BY source
                            ORDER BY key_fp DESC, doc_id ASC) AS rank
  FROM keyed
)
SELECT source, CAST(rank AS INT) AS rank, doc_id,
       CAST(n_chars AS BIGINT) AS n_chars, key_fp
FROM ranked WHERE rank <= {WSAMPLE_K}
ORDER BY source, rank
"""


def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted without-replacement sample (see
    _wsample_sql)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_wsample_sql("spark"))


WEIGHTED_SAMPLE_SQL = _wsample_sql("duck")


QUERIES = {
    "training_frame_det": training_frame_det,
    "logit_score": logit_score,
    "calibration_bins": calibration_bins,
    "threshold_sweep": threshold_sweep,
    "deterministic_split": deterministic_split,
    "stratified_sample": stratified_sample,
    "weighted_sample_topk": weighted_sample_topk,
}

ORACLE = {
    "training_frame_det": TRAINING_FRAME_SQL,
    "logit_score": LOGIT_SCORE_SQL,
    "calibration_bins": CALIBRATION_BINS_SQL,
    "threshold_sweep": THRESHOLD_SWEEP_SQL,
    "deterministic_split": DETERMINISTIC_SPLIT_SQL,
    "stratified_sample": STRATIFIED_SAMPLE_SQL,
    "weighted_sample_topk": WEIGHTED_SAMPLE_SQL,
}
