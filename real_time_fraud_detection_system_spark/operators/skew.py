"""Skew-resilient aggregation: salted two-phase groupBy.

At 100 TB a groupBy on a low-cardinality or hot-keyed column (event_type
here: 5 values over billions of rows) funnels each key through ONE
reducer -- AQE's skew handling splits join partitions but does not split
a single aggregation key. The standard fix is salting: phase 1 groups by
(key, salt) so each hot key spreads over n_salts reducers and the
map-side partial aggregation stays effective; phase 2 merges the n_salts
partials per key. Algebraic aggregates (count/sum -> avg) re-compose
exactly, so the result is bit-identical to the naive plan -- which is
exactly what the DuckDB oracle (a plain GROUP BY) checks.

The salt must be deterministic per row (NOT rand(): a retried task would
re-salt rows differently and double-count under speculative execution) --
here pmod(xxhash64(event_id), n_salts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

N_SALTS = 16


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_col: Column,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Two-phase salted aggregation producing n_rows, sum, avg per key.
    Phase 1 shuffles on (key, salt) -- hot keys spread across n_salts
    reducers; phase 2 shuffles the tiny per-salt partials on the key."""
    phase1 = (
        df.withColumn("_salt", F.pmod(salt_col, F.lit(n_salts)))
        .groupBy(*key_cols, "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum(value_col).alias("_sum"),
        )
    )
    return phase1.groupBy(*key_cols).agg(
        F.sum("_n").alias("n_rows"),
        F.sum("_sum").alias("value_sum"),
        (F.sum("_sum") / F.sum("_n")).alias("value_avg"),
    )


def salted_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type totals via the salted plan; values identical to a
    plain GROUP BY (the oracle runs the naive form)."""
    ev = load_table(spark, sf_dir, "events")
    out = salted_sum_count(
        ev, ["event_type"], "value", F.xxhash64("event_id")
    )
    return out.select(
        "event_type",
        "n_rows",
        F.round("value_sum", 2).alias("value_sum"),
        F.round("value_avg", 6).alias("value_avg"),
    ).orderBy("event_type")


SALTED_SQL = """
SELECT event_type,
       count(*) AS n_rows,
       round(sum(value), 2) AS value_sum,
       round(sum(value) / count(*), 6) AS value_avg
FROM events
GROUP BY 1
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Shuffle-balance profiler: the diagnostic that DECIDES whether a key
# needs the salting above. Buckets are derived from md5 (not xxhash64)
# solely so the DuckDB oracle can reproduce them bit-for-bit; a real
# deployment would profile with the engine's own partitioner hash --
# the imbalance statistics are hash-agnostic for any well-mixed hash.
N_PROFILE_BUCKETS = 32


def shuffle_balance_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulate the reducer-side row distribution of a shuffle keyed on
    events.user_id at N_PROFILE_BUCKETS partitions: rows and distinct
    keys per bucket. A skewed key surfaces here as one bucket holding a
    disproportionate n_rows share BEFORE you pay for the real shuffle --
    the input to choosing n_salts / AQE skew thresholds.

    Scale: cost is one aggregation keyed (bucket, user_id) -- exactly the
    cardinality of the shuffle being modeled -- then a trivial rollup to
    N_PROFILE_BUCKETS rows. Output size is constant in the data size."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.expr(
        "pmod(CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 4), 16, 10)"
        f" AS INT), {N_PROFILE_BUCKETS})"
    )
    return (
        ev.groupBy(bucket.alias("bucket_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("user_id").alias("n_keys"),
        )
        .orderBy("bucket_id")
    )


BALANCE_SQL = f"""
SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT)
           % {N_PROFILE_BUCKETS} AS bucket_id,
       count(*) AS n_rows,
       count(DISTINCT user_id) AS n_keys
FROM events
GROUP BY 1
ORDER BY bucket_id
"""


# --------------------------------------------------------------------------
BLOWUP_TOPK = 10


def join_blowup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-cardinality probe: the EXACT output size a
    user_id self-join of events would produce (sum over keys of n^2),
    per key, for the {BLOWUP_TOPK} keys contributing the most pairs.
    The interval join / sessionization / pair-mining family all start
    from this shape, and at 100 TB one hot key can turn a linear join
    into an output explosion -- this probe costs ONE keyed count
    aggregate (map-side partials), not the join, and names the keys to
    salt or cap first.

    Exact integers end to end: pairs = n*n, shares in ppm by integer
    floor division against the 1-row total broadcast (the scalar-anchor
    pattern). The reference has no join surface at all (SURVEY.md
    par. 2.4); this guards the engine's own extensions."""
    ev = load_table(spark, sf_dir, "events")
    per_key = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").alias("n_rows"))
        .withColumn("pairs", F.expr("n_rows * n_rows"))
    )
    total = per_key.agg(
        F.sum("pairs").alias("total_pairs"),
        F.sum("n_rows").alias("total_rows"),
    )
    return (
        per_key.crossJoin(F.broadcast(total))
        .selectExpr(
            "user_id",
            "n_rows",
            "pairs",
            "total_rows",
            "total_pairs",
            "CAST((pairs * 1000000L) DIV total_pairs AS BIGINT)"
            " AS pair_share_ppm",
        )
        .orderBy(F.desc("pairs"), F.asc("user_id"))
        .limit(BLOWUP_TOPK)
    )


JOIN_BLOWUP_SQL = f"""
WITH per_key AS (
  SELECT user_id, count(*) AS n_rows, count(*) * count(*) AS pairs
  FROM events
  WHERE user_id IS NOT NULL
  GROUP BY user_id
),
tot AS (
  SELECT CAST(sum(pairs) AS BIGINT) AS total_pairs,
         CAST(sum(n_rows) AS BIGINT) AS total_rows
  FROM per_key
)
SELECT user_id,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(pairs AS BIGINT) AS pairs,
       total_rows, total_pairs,
       CAST((pairs * 1000000) // total_pairs AS BIGINT) AS pair_share_ppm
FROM per_key, tot
ORDER BY pairs DESC, user_id
LIMIT {BLOWUP_TOPK}
"""


QUERIES = {
    "salted_value_by_type": salted_value_by_type,
    "shuffle_balance_profile": shuffle_balance_profile,
    "join_blowup_probe": join_blowup_probe,
}
ORACLE = {
    "salted_value_by_type": SALTED_SQL,
    "shuffle_balance_profile": BALANCE_SQL,
    "join_blowup_probe": JOIN_BLOWUP_SQL,
}
