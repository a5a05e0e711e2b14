"""Grouped-map pandas operator: per-user robust anomaly scores.

The batch ``applyInPandas`` shape (one Arrow frame per group in, one
frame out) -- the API for per-entity model-ish logic that built-in
aggregates can't express but that must still scale: groups are
distributed by the groupBy shuffle, each executor sees whole groups,
nothing touches the driver. Here the kernel is numpy median/MAD
(robust z-score; |z| > 3 flags an outlier) -- the classic fraud-ish
per-account baseline the reference's per-event threshold (main.py:178)
cannot provide.

Oracle: identical math in DuckDB SQL (median/MAD via quantile_cont,
one self-join). Both engines interpolate medians the same way
(numpy.median == quantile_cont 0.5 linear interpolation), and the final
score is rounded before the threshold compare, so flags agree exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table

MAD_K = 1.4826  # normal-consistency constant
Z_FLAG = 3.0
EPS = 1e-9

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("robust_z", T.DoubleType()),
        T.StructField("is_outlier", T.IntegerType()),
    ]
)


def _score_group(pdf: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    med = float(np.median(pdf["value"]))
    mad = float(np.median(np.abs(pdf["value"] - med)))
    z = (pdf["value"] - med) / (MAD_K * mad + EPS)
    z = z.round(4)
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "value": pdf["value"],
            "robust_z": z,
            "is_outlier": (z.abs() > Z_FLAG).astype("int32"),
        }
    )


def _score_partition(batches):
    """Partition-wise twin of ``_score_group``: one pandas groupby
    over ALL of a hash-partitioned partition's rows. Arrow hands a
    partition over as multiple record batches that can SPLIT a user,
    so the batches concatenate first -- the partition (not the group)
    is the memory unit, exactly like the grouped-map form."""
    import numpy as np  # noqa: F401  (parity with _score_group's env)

    pdfs = [p for p in batches if not p.empty]
    if not pdfs:
        return
    pdf = pd.concat(pdfs, ignore_index=True)
    med = pdf.groupby("user_id")["value"].transform("median")
    mad = (
        (pdf["value"] - med).abs().groupby(pdf["user_id"]).transform("median")
    )
    z = ((pdf["value"] - med) / (MAD_K * mad + EPS)).round(4)
    yield pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "value": pdf["value"],
            "robust_z": z,
            "is_outlier": (z.abs() > Z_FLAG).astype("int32"),
        }
    )


def user_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event robust z vs the user's own value distribution.

    Runs as repartition(user_id) + mapInPandas with a vectorized
    pandas groupby rather than groupBy().applyInPandas(_score_group):
    both shuffle the events once by user, but the grouped-map form
    pays a Python call + frame construction PER GROUP (~15k groups =
    49 s per 100x run) while the partition-wise kernel pays one call
    per partition with C-speed grouped medians (identical
    interpolation, identical rounding) -- the standard scale shape for
    small-group grouped-map work. ``_score_group`` stays as the
    reference per-group form; tests assert the two agree row-for-row.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    return (
        ev.repartition("user_id")
        .mapInPandas(_score_partition, ANOMALY_SCHEMA)
        .orderBy("event_id")
    )


USER_ANOMALIES_SQL = f"""
WITH med AS (
  SELECT user_id, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
),
mad AS (
  SELECT e.user_id, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (user_id)
  GROUP BY 1
)
SELECT e.user_id, e.event_id, e.value,
       round((e.value - m.med) / ({MAD_K} * d.mad + {EPS}), 4) AS robust_z,
       CAST(abs(round((e.value - m.med) / ({MAD_K} * d.mad + {EPS}), 4))
            > {Z_FLAG} AS INT) AS is_outlier
FROM events e
JOIN med m USING (user_id)
JOIN mad d USING (user_id)
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# Population-stability drift check: PSI of the value distribution
# between the first and second half of the time range, per event_type.
PSI_BUCKET_WIDTH = 5.0
PSI_MAX_BUCKET = 9
PSI_ALERT = 0.2  # the conventional "significant shift" threshold


def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift detection: Population Stability Index of ``value`` between
    the first and second half of the event-time range, per event_type
    -- the monitoring pass a scoring pipeline runs to decide whether
    the feature distribution its model was trained on still holds.

    Buckets are FIXED-WIDTH (floor(value/width), clamped to 0..9), not
    quantiles: quantile edges are engine-interpolation-specific and
    data-order-sensitive, fixed edges are reproducible everywhere.
    Counts are add-0.5 smoothed over the per-type observed bucket set,
    so empty-vs-tiny buckets cannot blow up the log. The time midpoint
    is integer epoch-microsecond arithmetic (bit-identical across
    engines); it comes from one bounded min/max aggregate (answered by
    parquet stats, a 1-row driver scalar, not a data collect).

    Shape at scale: one scan -> (event_type, bucket) count agg (one
    shuffle on a tiny composite key), then window+sum arithmetic over
    an O(types x buckets) frame."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("m0"),
        F.max(F.unix_micros("ts")).alias("m1"),
    ).first()
    thr = b["m0"] + (b["m1"] - b["m0"]) // 2
    bucket = F.least(
        F.lit(PSI_MAX_BUCKET),
        F.greatest(
            F.lit(0), F.floor(F.col("value") / PSI_BUCKET_WIDTH).cast("int")
        ),
    )
    counts = (
        ev.select(
            "event_type",
            bucket.alias("bucket"),
            (F.unix_micros("ts") < F.lit(thr)).cast("int").alias("h1"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum("h1").alias("n1"),
            F.sum(F.lit(1) - F.col("h1")).alias("n2"),
        )
    )
    w = Window.partitionBy("event_type")
    p = (F.col("n1") + 0.5) / (F.sum("n1").over(w) + 0.5 * F.count("*").over(w))
    q = (F.col("n2") + 0.5) / (F.sum("n2").over(w) + 0.5 * F.count("*").over(w))
    stats = counts.select(
        "event_type",
        F.sum("n1").over(w).alias("n_first"),
        F.sum("n2").over(w).alias("n_second"),
        F.count("*").over(w).alias("n_buckets"),
        ((p - q) * F.log(p / q)).alias("term"),
    )
    return (
        stats.groupBy("event_type", "n_first", "n_second", "n_buckets")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
        .withColumn(
            "drifted", (F.col("psi") > PSI_ALERT).cast("int")
        )
        .orderBy("event_type")
    )


VALUE_DRIFT_PSI_SQL = f"""
WITH params AS (
  SELECT min(epoch_us(ts)) AS m0, max(epoch_us(ts)) AS m1 FROM events
),
base AS (
  SELECT event_type,
         least({PSI_MAX_BUCKET},
               greatest(0, CAST(floor(value / {PSI_BUCKET_WIDTH}) AS INT)))
           AS bucket,
         CASE WHEN epoch_us(ts) < p.m0 + (p.m1 - p.m0) // 2
              THEN 1 ELSE 0 END AS h1
  FROM events, params p
),
counts AS (
  SELECT event_type, bucket, sum(h1) AS n1, sum(1 - h1) AS n2
  FROM base GROUP BY 1, 2
),
stats AS (
  SELECT event_type, n1, n2,
         sum(n1) OVER (PARTITION BY event_type) AS t1,
         sum(n2) OVER (PARTITION BY event_type) AS t2,
         count(*) OVER (PARTITION BY event_type) AS nb
  FROM counts
)
SELECT event_type,
       CAST(max(t1) AS BIGINT) AS n_first,
       CAST(max(t2) AS BIGINT) AS n_second,
       CAST(max(nb) AS BIGINT) AS n_buckets,
       round(sum(((n1 + 0.5) / (t1 + 0.5 * nb) - (n2 + 0.5) / (t2 + 0.5 * nb))
                 * ln(((n1 + 0.5) / (t1 + 0.5 * nb))
                      / ((n2 + 0.5) / (t2 + 0.5 * nb)))), 6) AS psi,
       CAST(round(sum(((n1 + 0.5) / (t1 + 0.5 * nb)
                       - (n2 + 0.5) / (t2 + 0.5 * nb))
                 * ln(((n1 + 0.5) / (t1 + 0.5 * nb))
                      / ((n2 + 0.5) / (t2 + 0.5 * nb)))), 6) > {PSI_ALERT}
            AS INT) AS drifted
FROM stats
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Deterministic Poisson(1) bootstrap for metric confidence intervals.
BOOT_R = 16  # replicas; CI = 2nd / 15th order statistic (~87.5% band)
FRAUD_CUT = 200  # flag threshold for THIS report (see docstring)
# Poisson(1) inverse-CDF ladder: cumulative P(X <= k) for k = 0..6,
# written as decimal literals both engines parse to identical doubles.
_POIS_CDF = (
    "0.36787944117144233",  # k=0
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.9999167588507119",
)


def _pois_ladder(u: str) -> str:
    """CASE ladder mapping a uniform in [0,1) to a Poisson(1) draw
    (identical SQL text in both dialects)."""
    cases = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"(CASE {cases} ELSE 7 END)"


_BOOT_SENTINEL_DAY = -(2**31)  # stands in for a NULL day inside numpy


def _boot_partial_batches(batches):
    """Per-batch, per-day exact int64 partial sums for the bootstrap
    replicas (round-14 optimization, guide §4.2 -- the repetition_stats
    precedent): each event's 64-byte digest blob (4 x unhex(md5),
    concatenated JVM-side) parses into 16 big-endian uint32s; u =
    uint32 / 2^32 is the EXACT double the JVM's
    CAST(conv(substr(hex, ..), 16, 10) AS DOUBLE) / 4294967296.0
    produced (uint32 -> float64 is exact, the divisor is a power of
    two), and the Poisson ladder is searchsorted(cdf, u, 'right') --
    #{c <= u} is precisely the CASE WHEN u < c_k ladder's index, with
    the same decimal literals parsed to the same IEEE doubles by both
    runtimes. A NULL blob (NULL event_id) takes the ladder's ELSE arm
    (7) exactly as SQL's null-comparison fallthrough did; a NULL day
    groups under the sentinel and is restored to NULL on output. All
    emitted sums are exact int64 (weights <= 7, batch sums < 2^53, so
    the float64 bincount accumulators are integer-exact); the final
    per-day aggregation of the partials stays JVM-side, and integer
    sums are order-independent -- not one output bit moves (pinned by
    tests/test_operators.py::
    test_bootstrap_kernel_matches_jvm_expression_form)."""
    import numpy as np

    cdf = np.array([float(c) for c in _POIS_CDF], dtype=np.float64)
    zero = b"\x00" * (16 * BOOT_R // 4)
    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        dd = pdf["dd"].tolist()
        null_d = np.array([v is None for v in dd], dtype=bool)
        buf = b"".join(v if v is not None else zero for v in dd)
        u32 = np.frombuffer(buf, dtype=">u4").reshape(n, BOOT_R)
        u = u32.astype(np.float64) / 4294967296.0
        w = np.searchsorted(cdf, u.ravel(), side="right").reshape(
            n, BOOT_R
        ).astype(np.int64)
        w[null_d] = 7
        isf = pdf["is_fraud"].to_numpy(np.int64)
        di = pdf["day_i"]
        day = di.fillna(_BOOT_SENTINEL_DAY).to_numpy(np.int64)
        uniq, inv = np.unique(day, return_inverse=True)
        inv = inv.ravel()  # numpy 2.x shape quirk under return_inverse
        m = len(uniq)
        wf = w * isf[:, None]
        out = {"day_i": pd.array(
            [None if d == _BOOT_SENTINEL_DAY else int(d) for d in uniq],
            dtype="Int64",
        )}
        for r in range(BOOT_R):
            out[f"num{r}"] = np.bincount(
                inv, weights=wf[:, r], minlength=m
            ).astype(np.int64)
        for r in range(BOOT_R):
            out[f"den{r}"] = np.bincount(
                inv, weights=w[:, r], minlength=m
            ).astype(np.int64)
        out["n_events"] = np.bincount(inv, minlength=m).astype(np.int64)
        out["n_fraud"] = np.bincount(
            inv, weights=isf, minlength=m
        ).astype(np.int64)
        yield pd.DataFrame(out)


_BOOT_PARTIALS_SCHEMA = ", ".join(
    ["day_i long"]
    + [f"num{r} long" for r in range(BOOT_R)]
    + [f"den{r} long" for r in range(BOOT_R)]
    + ["n_events long", "n_fraud long"]
)


def bootstrap_fraud_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day heuristic fraud rate with a bootstrap confidence band:
    every event carries {BOOT_R} deterministic Poisson(1) resampling
    weights (the standard online/streaming bootstrap -- Poisson counts
    approximate multinomial resampling without materializing resamples),
    each replica's weighted rate is an EXACT integer ppm, and the band
    is the 2nd/{BOOT_R}-1th order statistic of the replica rates. Point
    estimates without uncertainty are how fraud-rate dashboards
    (dags/compute-daily-metrics.py:19-37 feeds one) mislead on thin
    days; the reference has no uncertainty surface at all.

    Determinism: weights are md5-keyed by (event_id, replica) -- pure
    functions of the row, identical across engines, retries, and
    partitionings; rates are integer arithmetic end to end, so the
    order statistics cannot be perturbed by float summation order.

    Scale: ONE scan, ZERO explode -- each replica's weighted
    numerator/denominator is its own map-side-combinable aggregate
    expression (2 x {BOOT_R} sums over the day groups), so the
    per-event x{BOOT_R} row fanout the explode form materialized
    (300M rows at the 100x scale test, the sweep's standing worst at
    34.1 s) never exists; the days x {BOOT_R} replica frame is
    unstacked AFTER aggregation from O(days) rows. The md5 draws are
    byte-identical to the explode form (one digest = four uniforms,
    staged so codegen hashes once) and integer sums are
    order-independent, so not a single output bit moves -- the
    round-11 verdict's grouped-replay reshape. The flag predicate is
    the P7 fallback scorer's SHAPE (main.py:100-104: a fixed amount
    threshold) at this dataset's own cut -- value > {FRAUD_CUT} flags
    ~1.75% of events, where the reference's literal 1000 never fires
    on the events table (max value ~560) and would report a
    degenerate all-zero band."""
    ev = load_table(spark, sf_dir, "events")
    # The point estimate's n_events / n_fraud ride the SAME aggregate
    # (round-13 optimization, guide §2.3 "aggregate before you
    # shuffle" / §1.2 "don't compute things twice"): the second full
    # events scan the old `point` branch paid -- md5-free but still a
    # corpus pass -- collapses into two extra map-side sums here, and
    # the point-vs-band join disappears (30.4 -> 19.2 s best-of-2 at
    # the 100x scale test; output byte-identical, the ppm quotient is
    # computed from the same integers).
    #
    # Round-14 (guide §4.2, the repetition_stats precedent): the
    # 16-way conv + CASE-ladder + 34-expression hash aggregate moved
    # into ONE map-only Arrow kernel emitting per-(batch, day) exact
    # int64 partial sums; the JVM keeps the md5 draws (codegen hashes
    # beat hashlib loops), ships ONE 64-byte binary blob per event,
    # and final-sums the partials per day. Bit-identical by the
    # uint32/2^32 and searchsorted identities in the kernel docstring
    # (parity-pinned in tests); 14.2 -> 3.4 s (4.2x) same-session
    # both-orders best-of-2 at the 100x replica.
    blob = "concat(" + ", ".join(
        f"unhex(md5(concat('boot:', CAST(event_id AS STRING), ':g{j}')))"
        for j in range(BOOT_R // 4)
    ) + ") AS dd"
    per_event = ev.selectExpr(
        "datediff(CAST(ts AS DATE), DATE '1970-01-01') AS day_i",
        f"CASE WHEN value > {FRAUD_CUT} THEN 1 ELSE 0 END AS is_fraud",
        blob,
    )
    partials = per_event.mapInPandas(
        _boot_partial_batches, _BOOT_PARTIALS_SCHEMA
    )
    sums = (
        partials.groupBy("day_i")
        .agg(
            *[F.sum(f"num{r}").alias(f"num{r}") for r in range(BOOT_R)],
            *[F.sum(f"den{r}").alias(f"den{r}") for r in range(BOOT_R)],
            F.sum("n_events").alias("n_events"),
            F.sum("n_fraud").alias("n_fraud"),
        )
        .withColumn(
            "day", F.expr("date_add(DATE '1970-01-01', CAST(day_i AS INT))")
        )
        .drop("day_i")
    )
    stack_args = ", ".join(
        f"{r}, num{r}, den{r}" for r in range(BOOT_R)
    )
    from pyspark.sql.window import Window

    per_rep = (
        sums.selectExpr(
            "day",
            "n_events",
            "n_fraud",
            f"stack({BOOT_R}, {stack_args}) AS (r, num, den)",
        )
        .selectExpr(
            "day", "n_events", "n_fraud", "r",
            "CASE WHEN den = 0 THEN 0"
            " ELSE CAST((num * 1000000L) DIV den AS BIGINT) END AS rate_ppm",
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("day").orderBy("rate_ppm", "r")
            ),
        )
    )
    # the point estimate reuses n_events / n_fraud carried through the
    # stack: same integers the dropped second scan aggregated, same
    # floor-ppm quotient
    band = (
        per_rep.groupBy("day")
        .agg(
            F.first("n_events").alias("n_events"),
            F.first("n_fraud").alias("n_fraud"),
            F.max(F.when(F.col("rk") == 2, F.col("rate_ppm"))).alias(
                "ci_lo_ppm"
            ),
            F.max(
                F.when(F.col("rk") == BOOT_R - 1, F.col("rate_ppm"))
            ).alias("ci_hi_ppm"),
        )
    )
    return (
        band.selectExpr(
            "day",
            "n_events",
            "CAST((n_fraud * 1000000L) DIV n_events AS BIGINT)"
            " AS rate_ppm",
            "ci_lo_ppm",
            "ci_hi_ppm",
        )
        .orderBy("day")
    )


_DUCK_DIGESTS = ", ".join(
    f"md5('boot:' || CAST(event_id AS VARCHAR) || ':g{j}') AS d{j}"
    for j in range(BOOT_R // 4)
)
_DUCK_WS = ", ".join(
    _pois_ladder(
        f"(CAST(CAST('0x' || substr(d{r // 4}, {1 + 8 * (r % 4)}, 8)"
        " AS BIGINT) AS DOUBLE) / 4294967296.0)"
    )
    for r in range(BOOT_R)
)

BOOTSTRAP_FRAUD_CI_SQL = f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN value > {FRAUD_CUT} THEN 1 ELSE 0 END AS is_fraud,
         {_DUCK_DIGESTS}
  FROM events
),
d2 AS (
  SELECT day, is_fraud, [{_DUCK_WS}] AS ws FROM d
),
rep AS (
  SELECT day, reps.r, is_fraud, ws[reps.r + 1] AS w
  FROM d2, (SELECT unnest(range({BOOT_R})) AS r) reps
),
per_rep AS (
  SELECT day, r,
         CASE WHEN sum(w) = 0 THEN 0
              ELSE CAST((sum(w * is_fraud) * 1000000) // sum(w) AS BIGINT)
         END AS rate_ppm
  FROM rep GROUP BY 1, 2
),
ranked AS (
  SELECT day, rate_ppm,
         row_number() OVER (PARTITION BY day ORDER BY rate_ppm, r) AS rk
  FROM per_rep
),
band AS (
  SELECT day,
         max(CASE WHEN rk = 2 THEN rate_ppm END) AS ci_lo_ppm,
         max(CASE WHEN rk = {BOOT_R - 1} THEN rate_ppm END) AS ci_hi_ppm
  FROM ranked GROUP BY 1
),
point AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST((sum(CASE WHEN value > {FRAUD_CUT} THEN 1 ELSE 0 END) * 1000000)
              // count(*) AS BIGINT) AS rate_ppm
  FROM events GROUP BY 1
)
SELECT p.day, p.n_events, p.rate_ppm, b.ci_lo_ppm, b.ci_hi_ppm
FROM point p JOIN band b USING (day)
ORDER BY p.day
"""


# --------------------------------------------------------------------------
# Benford first-digit conformance -- the classic fabricated-amounts
# screen. P(first digit = d) = log10(1 + 1/d), here as exact ppm
# integer constants (they sum to exactly 1,000,000) so neither engine
# evaluates a log at query time.
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
BENFORD_TOL_PPM = 20_000  # |excess| > 2pp flags the digit cell


def _benford_case(col: str) -> str:
    cases = " ".join(
        f"WHEN {col} = {d} THEN {p}" for d, p in BENFORD_PPM.items()
    )
    return f"CASE {cases} END"


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit census of transaction amounts per event
    type vs the Benford expectation -- the fraud-analytics screen the
    reference's fixed per-event threshold (services/fraud_service/app/
    main.py:100-104) has no analog for: fabricated or clipped amount
    populations show up as digit cells far off log10(1 + 1/d) even when
    every individual amount looks plausible.

    Exactness: amounts are exact cents (verified <= 4e-12 from the
    integer grid), so ``round(value*100)`` never lands on a .5 boundary;
    the first digit comes from the BIGINT's decimal image, identical in
    both engines. Shares are floor-ppm integers and the Benford
    expectation is an integer constant table, so every output column is
    engine-exact. Scale: one scan into a (type, digit) <= 9x|types|
    aggregate with map-side partials; the dense digit grid and the
    per-type totals join are O(types) broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    digits = (
        ev.selectExpr(
            "event_type",
            "CAST(substring(CAST(CAST(round(value * 100, 0) AS BIGINT)"
            " AS STRING), 1, 1) AS INT) AS digit",
        )
        .groupBy("event_type", "digit")
        .agg(F.count("*").alias("n_obs"))
    )
    # Three consumers (type list, totals, the left join) re-derive the
    # census otherwise -- cache the <= 9 x |types|-row aggregate so the
    # corpus scan runs once.
    digits = digits.cache()
    grid = (
        digits.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
            )
        )
    )
    totals = digits.groupBy("event_type").agg(
        F.sum("n_obs").alias("n_total")
    )
    return (
        grid.join(digits, ["event_type", "digit"], "left")
        .join(F.broadcast(totals), "event_type")
        .selectExpr(
            "event_type",
            "digit",
            "coalesce(n_obs, 0L) AS n_obs",
            "n_total",
            "coalesce(n_obs, 0L) * 1000000 DIV n_total AS obs_ppm",
            f"{_benford_case('digit')} AS benford_ppm",
        )
        .selectExpr(
            "*",
            "obs_ppm - benford_ppm AS excess_ppm",
            f"CAST(abs(obs_ppm - benford_ppm) > {BENFORD_TOL_PPM} AS INT)"
            " AS flagged",
        )
        .orderBy("event_type", "digit")
    )


BENFORD_SQL = f"""
WITH digits AS (
  SELECT event_type,
         CAST(substring(CAST(CAST(round(value * 100, 0) AS BIGINT)
              AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT t.event_type, d.digit
  FROM (SELECT DISTINCT event_type FROM digits) t,
       (SELECT CAST(range AS INT) AS digit FROM range(1, 10)) d
), totals AS (
  SELECT event_type, CAST(sum(n_obs) AS BIGINT) AS n_total
  FROM digits GROUP BY 1
)
SELECT g.event_type, g.digit,
       coalesce(n.n_obs, 0) AS n_obs,
       t.n_total,
       CAST(coalesce(n.n_obs, 0) * 1000000 // t.n_total AS BIGINT)
         AS obs_ppm,
       {_benford_case('g.digit')} AS benford_ppm,
       CAST(coalesce(n.n_obs, 0) * 1000000 // t.n_total
         - {_benford_case('g.digit')} AS BIGINT) AS excess_ppm,
       CAST(abs(coalesce(n.n_obs, 0) * 1000000 // t.n_total
            - {_benford_case('g.digit')}) > {BENFORD_TOL_PPM} AS INT)
         AS flagged
FROM grid g
LEFT JOIN digits n USING (event_type, digit)
JOIN totals t ON t.event_type = g.event_type
ORDER BY g.event_type, g.digit
"""


# --------------------------------------------------------------------------
# Hour-of-week seasonal baseline and the slots that deviate most.
SEASONAL_TOP = 20


def seasonal_hour_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-|SEASONAL_TOP| calendar hours whose event volume deviates
    most from their hour-of-week seasonal baseline -- the ops question
    behind the reference's raw hourly chart (grafana/dashboards/
    predictions.json:18): 'is this Tuesday 14:00 unusually busy FOR a
    Tuesday 14:00?'. A raw z-score against the global hourly mean
    flags every rush hour; the seasonal baseline only flags departures
    from the weekly rhythm.

    Shape: ONE scan aggregates events to epoch-hour counts; the dense
    hour grid (sequence-exploded from the global bounds, zero-filled
    left join) is O(calendar), and the (dow, hour-of-day) baseline is
    a 168-row broadcast joined back to the grid. Exactness: dow comes
    from epoch-day arithmetic ((days + 4) % 7, Sunday = 0) -- never the
    engines' divergent dayofweek() -- and both deviation_ppm and
    baseline_ppm use floor(int/int) where the quotient's denominator is
    the tiny occurrence count, exact in double well past 2^50. Ordering
    ties break on (day, hour)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.selectExpr("unix_timestamp(ts) DIV 3600 AS h")
        .groupBy("h")
        .agg(F.count("*").alias("n_events"))
    )
    hourly = hourly.cache()
    grid = (
        hourly.groupBy()
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .selectExpr("explode(sequence(mn, mx)) AS h")
        .join(hourly, "h", "left")
        .selectExpr(
            "h",
            "date_add(DATE '1970-01-01', CAST(h DIV 24 AS INT)) AS day",
            "CAST(h % 24 AS INT) AS hour",
            "CAST((h DIV 24 + 4) % 7 AS INT) AS dow",
            "coalesce(n_events, 0L) AS n_events",
        )
    )
    base = grid.groupBy("dow", "hour").agg(
        F.count("*").alias("n_occ"), F.sum("n_events").alias("sum_c")
    )
    return (
        grid.join(F.broadcast(base), ["dow", "hour"])
        .selectExpr(
            "day",
            "hour",
            "dow",
            "n_events",
            "CAST(floor(sum_c * 1000000 / n_occ) AS BIGINT)"
            " AS baseline_ppm",
            "CAST(floor((n_events * n_occ - sum_c) * 1000000 / n_occ)"
            " AS BIGINT) AS deviation_ppm",
        )
        .orderBy(
            F.abs(F.col("deviation_ppm")).desc(), "day", "hour"
        )
        .limit(SEASONAL_TOP)
    )


SEASONAL_SQL = f"""
WITH hourly AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
), bounds AS (
  SELECT min(h) AS mn, max(h) AS mx FROM hourly
), grid AS (
  SELECT g.h,
         DATE '1970-01-01' + CAST(g.h // 24 AS INT) AS day,
         CAST(g.h % 24 AS INT) AS hour,
         CAST((g.h // 24 + 4) % 7 AS INT) AS dow,
         coalesce(n.n_events, 0) AS n_events
  FROM (SELECT unnest(range(mn, mx + 1)) AS h FROM bounds) g
  LEFT JOIN hourly n USING (h)
), base AS (
  SELECT dow, hour, CAST(count(*) AS BIGINT) AS n_occ,
         sum(n_events) AS sum_c
  FROM grid GROUP BY 1, 2
)
SELECT g.day, g.hour, g.dow, g.n_events,
       CAST(floor(sum_c * 1000000 / n_occ) AS BIGINT) AS baseline_ppm,
       CAST(floor((g.n_events * n_occ - sum_c) * 1000000 / n_occ)
            AS BIGINT) AS deviation_ppm
FROM grid g JOIN base USING (dow, hour)
ORDER BY abs(CAST(floor((g.n_events * n_occ - sum_c) * 1000000 / n_occ)
             AS BIGINT)) DESC, g.day, g.hour
LIMIT {SEASONAL_TOP}
"""


# --------------------------------------------------------------------------
# CUSUM changepoint detection over the daily flagged rate.
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-sum changepoint statistic over the daily heuristic
    flagged rate -- the standard answer to 'WHEN did the fraud mix
    shift?', which neither a per-day chart (dags/
    compute-daily-metrics.py:19-37) nor value_drift_psi's two-window
    compare localizes: the day with the extreme |CUSUM| is the
    maximum-likelihood single changepoint of a mean shift.

    Exactness: rates are floor-ppm integers; the deviation is kept in
    the integer scale ``rate_ppm * n_days - sum_ppm`` (deviation from
    the mean multiplied through by n_days, so no division ever
    happens), and the running sum is integer -- identical in both
    engines at any day count. Scale: one scan collapses to O(days)
    rows map-side; the unpartitioned running-sum window and the 1-row
    scalar anchors after it touch only that calendar-bounded frame --
    the moving_avg_revenue day-grain pattern."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.selectExpr(
            "CAST(ts AS DATE) AS day",
            f"CASE WHEN value > {FRAUD_CUT} THEN 1L ELSE 0L END AS f",
        )
        .groupBy("day")
        .agg(F.count("*").alias("n_events"), F.sum("f").alias("n_flagged"))
        .selectExpr(
            "day",
            "n_events",
            "n_flagged",
            "n_flagged * 1000000 DIV n_events AS rate_ppm",
        )
        # cache() both O(days) frames (calendar-bounded whatever the
        # corpus size): daily fed tot + cur and cur fed peak + the
        # final projection, so the full events scan + day aggregate
        # re-ran FOUR times uncached (round-13 optimization, guide
        # §2.4/§5 bounded-cache pattern)
        .cache()
    )
    tot = daily.agg(
        F.count("*").alias("n_days"), F.sum("rate_ppm").alias("sum_ppm")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cur = daily.crossJoin(F.broadcast(tot)).withColumn(
        "cusum_scaled",
        F.sum(F.expr("rate_ppm * n_days - sum_ppm")).over(w),
    ).cache()
    peak = cur.agg(F.max(F.abs(F.col("cusum_scaled"))).alias("peak"))
    return (
        cur.crossJoin(F.broadcast(peak))
        .selectExpr(
            "day",
            "n_events",
            "n_flagged",
            "rate_ppm",
            "cusum_scaled",
            "CAST(abs(cusum_scaled) = peak AS INT) AS is_changepoint",
        )
        .orderBy("day")
    )


CUSUM_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN value > {FRAUD_CUT} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_flagged
  FROM events GROUP BY 1
), d2 AS (
  SELECT *, CAST(n_flagged * 1000000 // n_events AS BIGINT) AS rate_ppm
  FROM daily
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(rate_ppm) AS BIGINT) AS sum_ppm
  FROM d2
), cur AS (
  SELECT d.*,
         CAST(sum(rate_ppm * n_days - sum_ppm)
              OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cusum_scaled
  FROM d2 d, tot
)
SELECT day, n_events, n_flagged, rate_ppm, cusum_scaled,
       CAST(abs(cusum_scaled) = (SELECT max(abs(cusum_scaled)) FROM cur)
            AS INT) AS is_changepoint
FROM cur ORDER BY day
"""


# --------------------------------------------------------------------------
# (event type x hour-of-day) flagged-rate lift matrix.
def risk_lift_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagged-rate lift per (event type, UTC hour-of-day) cell vs the
    global rate -- the risk-segmentation table a rules team reads
    before touching a threshold: lift 2,000,000 ppm means that cell
    flags at twice the global rate. The reference applies ONE global
    threshold to every message (main.py:100-104); this shows exactly
    where that miscalibrates.

    Exactness: both the cell rate and the lift are floor-ppm integers
    (the lift divides the two already-floored ppm rates -- documented
    floor-of-floor, replayed identically by the oracle). Scale: one
    scan into a <= |types| x 24 keyed aggregate with map-side partials;
    the global totals are a 1-row broadcast -- the freshness_check
    scalar-anchor pattern."""
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.selectExpr(
            "event_type",
            "CAST(hour(ts) AS INT) AS hour",
            f"CASE WHEN value > {FRAUD_CUT} THEN 1L ELSE 0L END AS f",
        )
        .groupBy("event_type", "hour")
        .agg(F.count("*").alias("n_events"), F.sum("f").alias("n_flagged"))
    )
    tot = cells.agg(
        F.sum("n_events").alias("t_n"), F.sum("n_flagged").alias("t_f")
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .selectExpr(
            "event_type",
            "hour",
            "n_events",
            "n_flagged",
            "n_flagged * 1000000 DIV n_events AS flagged_ppm",
            "(n_flagged * 1000000 DIV n_events) * 1000000"
            " DIV (t_f * 1000000 DIV t_n) AS lift_ppm",
        )
        .orderBy("event_type", "hour")
    )


RISK_LIFT_SQL = f"""
WITH cells AS (
  SELECT event_type,
         CAST(hour(ts) AS INT) AS hour,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN value > {FRAUD_CUT} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_flagged
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT CAST(sum(n_events) AS BIGINT) AS t_n,
         CAST(sum(n_flagged) AS BIGINT) AS t_f
  FROM cells
)
SELECT event_type, hour, n_events, n_flagged,
       CAST(n_flagged * 1000000 // n_events AS BIGINT) AS flagged_ppm,
       CAST((n_flagged * 1000000 // n_events) * 1000000
            // (t_f * 1000000 // t_n) AS BIGINT) AS lift_ppm
FROM cells, tot ORDER BY event_type, hour
"""


QUERIES = {
    "user_value_anomalies": user_value_anomalies,
    "value_drift_psi": value_drift_psi,
    "bootstrap_fraud_ci": bootstrap_fraud_ci,
    "benford_first_digit": benford_first_digit,
    "seasonal_hour_baseline": seasonal_hour_baseline,
    "cusum_changepoints": cusum_changepoints,
    "risk_lift_matrix": risk_lift_matrix,
}
ORACLE = {
    "user_value_anomalies": USER_ANOMALIES_SQL,
    "value_drift_psi": VALUE_DRIFT_PSI_SQL,
    "bootstrap_fraud_ci": BOOTSTRAP_FRAUD_CI_SQL,
    "benford_first_digit": BENFORD_SQL,
    "seasonal_hour_baseline": SEASONAL_SQL,
    "cusum_changepoints": CUSUM_SQL,
    "risk_lift_matrix": RISK_LIFT_SQL,
}
