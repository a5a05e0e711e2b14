"""Probabilistic-filter sketches with exact cross-engine replay: a
Bloom-filter join prefilter audit and a Count-Min heavy-hitter sketch.

Both sketches are built from md5-derived hash positions (the repo-wide
cross-engine hash convention, operators/skew.py), so DuckDB reproduces
every bit decision and the oracle compares EXACT values -- unlike the
engine-native sketches in temporal.py (HLL / GK quantiles) which need
bounded-relative-error verdicts.

Why these belong in a 100 TB engine:

* ``bloom_prefilter_stats`` is the runtime-filter / semi-join-reduction
  pattern: before shuffling the 100 TB fact side of a selective join,
  build a Bloom filter over the (small) filtered build side's keys,
  broadcast the bit set, and drop fact rows that cannot match. Spark's
  own runtime filters (spark.sql.optimizer.runtime.bloomFilter.enabled)
  do exactly this inside the engine; this operator AUDITS the trade --
  measured false-positive rate and bit-load for a concrete (bits,
  hashes) choice -- which is the table you read before sizing
  ``...bloomFilter.expectedNumItems`` / ``numBits``. The reference has
  no join surface at all (SURVEY.md par. 2.4); this guards the
  engine's own join extensions.

* ``countmin_heavy_hitters`` is the mergeable frequency sketch: cell
  counts are plain sums, so partial aggregation, shuffle order, retry
  and cluster size cannot change a single cell -- the map-side-combine
  friendly shape. The report compares the CMS estimate against the
  exact count for the true top keys; the overestimate column is the
  documented one-sided CMS error (never negative).

Scale shape: both sketches cost ONE scan + one small keyed aggregate
(cells / bit positions bounded by the sketch size, not the data), and
the probe side joins against a broadcastable constant-size table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

# --------------------------------------------------------------------------
# Bloom prefilter: BITS addressable bits, K independent md5-derived
# hash functions. 2^16 bits / 3 hashes over the ~SF*1500 urgent-order
# build keys gives a visibly loaded filter at sf0.1 (the interesting
# regime for an FPR audit) while staying broadcast-sized at any SF.
BLOOM_BITS = 1 << 16
BLOOM_K = 3


def _pos(key_col: str, salt: int, modulus: int) -> str:
    """SQL for hash position #salt of a BIGINT key: first 8 md5 hex
    chars (32 bits -- exact in BIGINT) of 'key:salt', mod `modulus`.
    Identical text contract as the DuckDB oracle's _duck_pos."""
    return (
        "CAST(conv(substr(md5(concat(CAST("
        f"{key_col} AS STRING), ':', '{salt}')), 1, 8), 16, 10) AS BIGINT)"
        f" % {modulus}"
    )


def _duck_pos(key_col: str, salt: int, modulus: int) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR) || ':' ||"
        f" '{salt}'), 1, 8) AS BIGINT) % {modulus}"
    )


def bloom_prefilter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit a Bloom prefilter for the selective join
    ``lineitem JOIN orders WHERE o_orderpriority = '1-URGENT'``:
    build the filter from urgent order keys, probe every distinct
    lineitem order key, and report load factor, pass rate and the
    measured false-positive rate (all exact integer ppm).

    Plan shape: the bit set is a DISTINCT over build_keys x K rows
    (<= BLOOM_BITS rows by construction), broadcast ONCE and probed by
    K map-side broadcast-hash left joins that MARK each position hit
    (a probe key passes iff all K marks land); one more keyed join
    marks true membership, and every counter folds in a SINGLE scalar
    aggregate over that one marked pass -- the probe side (the 100 TB
    side in the real pattern) is scanned once and shuffled only for
    its own distinct + the membership join. Two measured traps from
    earlier drafts, both at the 100x scale test: computing each
    counter as its own aggregate re-derived the probe pipeline six
    times (43-183 s), and broadcast-hinting the counters row ran the
    whole pass inside a broadcast exchange, outside AQE (127 s) -- the
    corpus-sized aggregate must be the STREAMED side of the summary
    crossJoin (45 s, ~all of it the honest distinct + K md5 +
    membership-join cost)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    build = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("k")
    )
    probe = lineitem.select(F.col("l_orderkey").alias("k")).distinct()

    pos_arr = F.array(
        *[F.expr(_pos("k", i, BLOOM_BITS)) for i in range(BLOOM_K)]
    )
    # localCheckpoint (not cache): materializes eagerly and frees with
    # the frame instead of pinning executor storage across the sweep
    # (the supplier_bfs_hops convention)
    bits = (
        build.select(F.explode(pos_arr).alias("pos"))
        .distinct()
        .localCheckpoint()
    )

    marked = probe
    for i in range(BLOOM_K):
        marked = (
            marked.withColumn("pos", F.expr(_pos("k", i, BLOOM_BITS)))
            .join(
                F.broadcast(bits.select("pos", F.lit(1).alias(f"h{i}"))),
                "pos",
                "left",
            )
            .drop("pos")
        )
    hit_all = " AND ".join(
        f"coalesce(h{i}, 0) = 1" for i in range(BLOOM_K)
    )
    marked = marked.join(
        build.groupBy("k").agg(F.lit(1).alias("is_m")), "k", "left"
    ).selectExpr(
        "k",
        f"CAST(({hit_all}) AS INT) AS is_pass",
        "CAST(is_m IS NOT NULL AS INT) AS is_member",
    )
    counters = marked.agg(
        F.count("*").alias("n_probe_keys"),
        F.sum("is_pass").alias("n_pass_keys"),
        F.sum("is_member").alias("n_true_keys"),
        F.sum(F.expr("is_pass * (1 - is_member)")).alias("n_false_pos"),
    )

    n_build = build.agg(F.count("*").alias("n_build_keys"))
    n_bits = bits.agg(F.count("*").alias("n_bits_set"))

    # counters (the corpus-sized pass) stays the STREAMED side: a
    # broadcast hint on it would run the whole pass inside a broadcast
    # exchange, outside AQE
    row = counters.crossJoin(F.broadcast(n_build)).crossJoin(
        F.broadcast(n_bits)
    )
    return row.selectExpr(
        "n_build_keys",
        "n_bits_set",
        f"CAST(n_bits_set * 1000000L DIV {BLOOM_BITS} AS BIGINT)"
        " AS load_ppm",
        "n_probe_keys",
        "n_pass_keys",
        "n_true_keys",
        "n_false_pos",
        # FPR over the keys that COULD false-positive (non-members)
        "CAST(CASE WHEN n_probe_keys = n_true_keys THEN 0"
        "      ELSE n_false_pos * 1000000L DIV (n_probe_keys - n_true_keys)"
        " END AS BIGINT) AS fpr_ppm",
    )


def _bloom_sql() -> str:
    pos_union = "\n    UNION ALL\n    ".join(
        f"SELECT {_duck_pos('k', i, BLOOM_BITS)} AS pos FROM build"
        for i in range(BLOOM_K)
    )
    probe_pos = "\n    UNION ALL\n    ".join(
        f"SELECT k, {_duck_pos('k', i, BLOOM_BITS)} AS pos FROM probe"
        for i in range(BLOOM_K)
    )
    return f"""
WITH build AS (
  SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
),
probe AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
bits AS (SELECT DISTINCT pos FROM (
    {pos_union}
)),
probe_pos AS (
    {probe_pos}
),
passed AS (
  SELECT k FROM probe_pos JOIN bits USING (pos)
  GROUP BY k HAVING count(*) = {BLOOM_K}
),
stats AS (
  SELECT
    (SELECT count(*) FROM build) AS n_build_keys,
    (SELECT count(*) FROM bits) AS n_bits_set,
    (SELECT count(*) FROM probe) AS n_probe_keys,
    (SELECT count(*) FROM passed) AS n_pass_keys,
    (SELECT count(*) FROM probe WHERE k IN (SELECT k FROM build))
        AS n_true_keys,
    (SELECT count(*) FROM passed WHERE k NOT IN (SELECT k FROM build))
        AS n_false_pos
)
SELECT n_build_keys, n_bits_set,
       CAST(n_bits_set * 1000000 // {BLOOM_BITS} AS BIGINT) AS load_ppm,
       n_probe_keys, n_pass_keys, n_true_keys, n_false_pos,
       CAST(CASE WHEN n_probe_keys = n_true_keys THEN 0
            ELSE n_false_pos * 1000000 // (n_probe_keys - n_true_keys)
       END AS BIGINT) AS fpr_ppm
FROM stats
"""


# --------------------------------------------------------------------------
# Count-Min sketch: CMS_D independent rows of CMS_W counters. 4 x 512
# cells hold ~1000 distinct users with visible (but bounded) collision
# noise -- the regime where the overestimate column means something.
CMS_D = 4
CMS_W = 512
CMS_TOPK = 20


def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates vs exact counts for the
    {CMS_TOPK} most active users of the events table.

    The sketch: every event increments cell (d, md5_d(user) % W) for
    d in 0..{CMS_D}-1; the estimate for a key is min over d of its
    cell. Cells are plain sums -- mergeable partials, so the sketch is
    identical at any partitioning (asserted by the invariance gate).
    `overestimate = est - exact` is the one-sided CMS error; the
    oracle replays the identical cells, so values match exactly."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    pos_structs = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.expr(_pos("user_id", d, CMS_W)).alias("pos"),
            )
            for d in range(CMS_D)
        ]
    )
    cells = (
        ev.select(F.explode(pos_structs).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.pos").alias("pos"))
        .agg(F.count("*").alias("cell_n"))
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(CMS_TOPK)
    )
    est = (
        top.select("user_id", "exact_n", F.explode(pos_structs).alias("c"))
        .select("user_id", "exact_n", "c.d", "c.pos")
        .join(F.broadcast(cells), ["d", "pos"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cell_n").alias("cms_est"))
    )
    return est.selectExpr(
        "user_id",
        "exact_n",
        "cms_est",
        "cms_est - exact_n AS overestimate",
        "CAST((cms_est - exact_n) * 1000000L DIV exact_n AS BIGINT)"
        " AS err_ppm",
    ).orderBy(F.desc("exact_n"), F.asc("user_id"))


def _cms_sql() -> str:
    cell_union = "\n    UNION ALL\n    ".join(
        f"SELECT {d} AS d, {_duck_pos('user_id', d, CMS_W)} AS pos"
        " FROM ev"
        for d in range(CMS_D)
    )
    top_pos = "\n    UNION ALL\n    ".join(
        f"SELECT user_id, exact_n, {d} AS d,"
        f" {_duck_pos('user_id', d, CMS_W)} AS pos FROM top"
        for d in range(CMS_D)
    )
    return f"""
WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
cells AS (
  SELECT d, pos, count(*) AS cell_n FROM (
    {cell_union}
  ) GROUP BY d, pos
),
top AS (
  SELECT user_id, count(*) AS exact_n FROM ev
  GROUP BY user_id ORDER BY exact_n DESC, user_id LIMIT {CMS_TOPK}
),
est AS (
  SELECT t.user_id, t.exact_n, min(c.cell_n) AS cms_est
  FROM ({top_pos}) t JOIN cells c USING (d, pos)
  GROUP BY t.user_id, t.exact_n
)
SELECT user_id, exact_n, cms_est,
       cms_est - exact_n AS overestimate,
       CAST((cms_est - exact_n) * 1000000 // exact_n AS BIGINT) AS err_ppm
FROM est
ORDER BY exact_n DESC, user_id
"""


# --------------------------------------------------------------------------
# KMV (bottom-k) distinct sketch with SET ALGEBRA: the scale path for
# cross-dump overlap. The K smallest 60-bit shingle hashes per source
# form a uniform sample of that source's distinct shingle set; the
# bottom-K of a PAIR's union is a uniform sample of the union, and the
# fraction of it present in both sources estimates the same Jaccard
# shard_overlap computes EXACTLY -- without ever joining two 100 TB
# dumps' full shingle sets. Exact-replay: every hash is the repo-wide
# md5/60-bit construction, so DuckDB computes the identical sketch;
# the exact Jaccard rides along as the honest baseline (the
# ann_recall_eval estimator-vs-exact pattern) with the signed error.
KMV_K = 256


def _kmv_sketch_fresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, h): the bottom-KMV_K distinct shingle hashes per
    source -- the K-row sketch a dump SHIPS at 100 TB. One map-side
    explode of the memoized census + one per-source sort (row_number
    window); output is K * |sources| rows, constant in the data."""
    from pyspark.sql.window import Window

    from .dedup import _source_shingle_table

    dist = _source_shingle_table(spark, sf_dir).select(
        F.explode("ss").alias("source"), "h"
    )
    w = Window.partitionBy("source").orderBy("h")
    return (
        dist.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= KMV_K)
        .select("source", "h")
    )


def _kmv_sketch_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bottom-K sketch, memoized like the census it reduces:
    this IS the cross-dump artifact (K rows per source, shipped instead
    of the dump), so build-once/probe-many is the production shape, and
    the estimator's plan references it four times."""
    from .dedup import (
        _source_shingle_census_fresh,
        signature_index,
    )
    from ._memo import code_token, memo_parquet, table_fingerprint

    from .dedup import MINHASH_K, SHINGLE_N

    fp = table_fingerprint(
        sf_dir, "documents", MINHASH_K, SHINGLE_N, KMV_K, "kmvsketch",
        code_token(
            signature_index, _source_shingle_census_fresh, _kmv_sketch_fresh
        ),
    )
    return memo_parquet(
        spark, fp, "kmvsketch",
        lambda: _kmv_sketch_fresh(spark, sf_dir),
    )


def kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap ESTIMATES from bottom-K shingle
    sketches next to the exact Jaccard, both in integer ppm, plus the
    signed estimator error.

    Scale shape: the corpus-sized work is the memoized per-shingle
    source census (dedup._source_shingle_table -- ONE h-keyed
    aggregate of the signature index, shared with
    corpusops.shard_overlap so the stage is paid once per corpus
    snapshot, not once per query); the (source, h) distinct is a
    map-side explode of it and the exact baseline reduces over the
    census rows directly. The sketches are K rows per source,
    CONSTANT at any data size, so the estimator stage touches
    O(sources^2 * K) rows. At 100 TB you ship only the K-row sketches
    between dumps and skip the exact side entirely."""
    from pyspark.sql.window import Window

    # the estimator consumes the PERSISTED sketch: the plan references
    # it four times (source list + both pair sides), and an unmemoized
    # sketch subtree re-ran the census scan + per-source sort for each
    # reference (~11 s warm at the 100x scale test vs ~2 s reading the
    # K-rows-per-source parquet)
    sketch = _kmv_sketch_table(spark, sf_dir)
    srcs = sketch.select("source").distinct()
    pair_names = srcs.selectExpr("source AS src_a").join(
        F.broadcast(srcs.selectExpr("source AS src_b")),
        F.col("src_a") < F.col("src_b"),
    )
    side_a = pair_names.join(
        F.broadcast(sketch.selectExpr("source AS src_a", "h")), "src_a"
    ).select(
        "src_a", "src_b", "h",
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    side_b = pair_names.join(
        F.broadcast(sketch.selectExpr("source AS src_b", "h")), "src_b"
    ).select(
        "src_a", "src_b", "h",
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    merged = (
        side_a.unionByName(side_b)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("src_a", "src_b").orderBy("h")
    est = (
        merged.withColumn("_r", F.row_number().over(wp))
        .filter(F.col("_r") <= KMV_K)
        .groupBy("src_a", "src_b")
        .agg(
            F.count("*").alias("k_used"),
            F.sum(
                (F.col("in_a") * F.col("in_b")).cast("bigint")
            ).alias("n_both"),
        )
        .selectExpr(
            "src_a", "src_b", "k_used",
            "CAST(n_both * 1000000 DIV k_used AS BIGINT)"
            " AS est_jaccard_ppm",
        )
    )
    # ---- exact baseline: the memoized O(sources^2) pairwise overlap
    # aggregate (dedup._source_pair_overlap, shared with shard_overlap)
    from .dedup import _source_pair_overlap

    exact = _source_pair_overlap(spark, sf_dir).selectExpr(
        "src_a", "src_b",
        "CAST(n_shared * 1000000 DIV (n_a + n_b - n_shared) AS BIGINT)"
        " AS exact_jaccard_ppm",
    )
    return (
        est.join(exact, ["src_a", "src_b"], "left")
        .selectExpr(
            "src_a", "src_b", "k_used", "est_jaccard_ppm",
            "COALESCE(exact_jaccard_ppm, 0) AS exact_jaccard_ppm",
            "est_jaccard_ppm - COALESCE(exact_jaccard_ppm, 0) AS err_ppm",
        )
        .orderBy("src_a", "src_b")
    )


def _kmv_sql() -> str:
    from .corpusops import _DUCK_SH

    return f"""
WITH dist AS (
  SELECT DISTINCT source,
         unnest(list_distinct(list_transform({_DUCK_SH},
           x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)))) AS h
  FROM documents
),
sketch AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS r
    FROM dist
  ) WHERE r <= {KMV_K}
),
srcs AS (SELECT DISTINCT source FROM sketch),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b
  FROM srcs a JOIN srcs b ON a.source < b.source
),
sides AS (
  SELECT p.src_a, p.src_b, s.h, 1 AS in_a, 0 AS in_b
  FROM pairs p JOIN sketch s ON s.source = p.src_a
  UNION ALL
  SELECT p.src_a, p.src_b, s.h, 0 AS in_a, 1 AS in_b
  FROM pairs p JOIN sketch s ON s.source = p.src_b
),
merged AS (
  SELECT src_a, src_b, h, max(in_a) AS in_a, max(in_b) AS in_b
  FROM sides GROUP BY 1, 2, 3
),
bottomk AS (
  SELECT * FROM (
    SELECT src_a, src_b, in_a, in_b,
           row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS r
    FROM merged
  ) WHERE r <= {KMV_K}
),
est AS (
  SELECT src_a, src_b,
         CAST(count(*) AS BIGINT) AS k_used,
         CAST(sum(in_a * in_b) AS BIGINT) AS n_both
  FROM bottomk GROUP BY 1, 2
),
sizes AS (SELECT source, count(*) AS n_sh FROM dist GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
  FROM dist a JOIN dist b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT e.src_a, e.src_b, e.k_used,
       CAST(e.n_both * 1000000 // e.k_used AS BIGINT) AS est_jaccard_ppm,
       COALESCE(CAST(i.n_inter * 1000000
                     // (sa.n_sh + sb.n_sh - i.n_inter) AS BIGINT), 0)
         AS exact_jaccard_ppm,
       CAST(e.n_both * 1000000 // e.k_used AS BIGINT)
         - COALESCE(CAST(i.n_inter * 1000000
                         // (sa.n_sh + sb.n_sh - i.n_inter) AS BIGINT), 0)
         AS err_ppm
FROM est e
LEFT JOIN inter i ON i.src_a = e.src_a AND i.src_b = e.src_b
JOIN sizes sa ON sa.source = e.src_a
JOIN sizes sb ON sb.source = e.src_b
ORDER BY e.src_a, e.src_b
"""


# --------------------------------------------------------------------------
HLL_P = 8  # 2^8 = 256 registers; standard error 1.04/sqrt(m) ~ 6.5%
_HLL_M = 1 << HLL_P


def _rho_ladder(w_sql: str) -> str:
    """Leading-zero rank of the 52-bit post-bucket hash remainder as a
    pure integer CASE ladder -- bit-exact in both engines, no float
    log2 whose rounding could flip at exact powers of two."""
    branches = " ".join(
        f"WHEN {w_sql} >= {1 << (52 - r)} THEN {r}" for r in range(1, 53)
    )
    return f"CASE {branches} ELSE 53 END"


def hll_registers(dist: DataFrame) -> DataFrame:
    """(source, bucket, reg): HLL registers over a (source, h) frame of
    distinct 60-bit hashes -- the K-bytes-per-source artifact a dump
    SHIPS. Registers from independent shards MERGE BY MAX (proved in
    tests against the union build), so per-dump sketches combine
    without touching the data again."""
    return (
        dist.selectExpr(
            "source",
            f"h % {_HLL_M} AS bucket",
            f"{_rho_ladder(f'(h DIV {_HLL_M})')} AS rho",
        )
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_shingle_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-shingle cardinality per source, EXACTLY
    replayed: registers come from the same md5-derived 60-bit shingle
    hashes both engines already share (bucket = h mod {_HLL_M}, rho =
    leading-zero rank of the remaining 52 bits via an integer CASE
    ladder), the register fold is the INTEGER sum S2 = sum over
    buckets of 2^(53 - reg) (empty registers contribute 2^53; max
    total 2^61, comfortably BIGINT), and the single double step
    est = alpha * m^2 * 2^53 / S2 -- with the standard linear-counting
    fallback below 2.5m -- starts from identical integers everywhere.
    Next to ``kmv_source_overlap`` this completes the sketch pair a
    dump SHIPS instead of its data: KMV answers overlap BETWEEN dumps,
    HLL answers size WITHIN one, both mergeable (HLL registers merge
    by max) and both audited here against the exact count with a
    signed integer-ppm error.

    Scale shape: rides the memoized per-shingle source census (one
    map-side explode), a (source, bucket) keyed max -- output bounded
    at sources x {_HLL_M} rows -- and an O(sources) fold. The exact
    baseline is the same census's per-source count."""
    from .dedup import _source_shingle_table

    dist = _source_shingle_table(spark, sf_dir).select(
        F.explode("ss").alias("source"), "h"
    )
    regs = hll_registers(dist)
    folded = regs.groupBy("source").agg(
        F.count("*").alias("occupied"),
        F.expr("sum(CAST(pow(2, 53 - reg) AS BIGINT))").alias("s_occ"),
    )
    exact = dist.groupBy("source").agg(F.count("*").alias("n_exact"))
    alpha = f"(0.7213 / (1 + 1.079 / {_HLL_M}))"
    est_raw = (
        f"{alpha} * {_HLL_M} * {_HLL_M} * 9007199254740992.0"
        f" / (s_occ + ({_HLL_M} - occupied) * 9007199254740992)"
    )
    return (
        folded.join(exact, "source")
        .selectExpr(
            "source",
            "n_exact",
            f"""CAST(round(CASE
                 WHEN {est_raw} <= 2.5 * {_HLL_M}
                      AND occupied < {_HLL_M}
                 THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                                    / ({_HLL_M} - occupied))
                 ELSE {est_raw} END, 0) AS BIGINT) AS hll_est""",
        )
        .selectExpr(
            "source",
            "CAST(n_exact AS BIGINT) AS n_exact",
            "hll_est",
            "CAST((hll_est - n_exact) * 1000000 DIV n_exact AS BIGINT)"
            " AS err_ppm",
        )
        .orderBy("source")
    )


def _hll_sql() -> str:
    from .corpusops import _DUCK_SH

    rho = _rho_ladder(f"(h // {_HLL_M})")
    alpha = f"(0.7213 / (1 + 1.079 / {_HLL_M}))"
    est_raw = (
        f"{alpha} * {_HLL_M} * {_HLL_M} * 9007199254740992.0"
        f" / (s_occ + ({_HLL_M} - occupied) * 9007199254740992)"
    )
    return f"""
WITH dist AS (
  SELECT DISTINCT source,
         unnest(list_distinct(list_transform({_DUCK_SH},
           x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)))) AS h
  FROM documents
),
regs AS (
  SELECT source, h % {_HLL_M} AS bucket, max({rho}) AS reg
  FROM dist GROUP BY source, bucket
),
folded AS (
  SELECT source, count(*) AS occupied,
         CAST(sum(CAST(pow(2, 53 - reg) AS BIGINT)) AS BIGINT) AS s_occ
  FROM regs GROUP BY source
),
exact AS (SELECT source, count(*) AS n_exact FROM dist GROUP BY source),
est AS (
  SELECT f.source, e.n_exact,
         CAST(round(CASE
           WHEN {est_raw} <= 2.5 * {_HLL_M} AND occupied < {_HLL_M}
           THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                              / ({_HLL_M} - occupied))
           ELSE {est_raw} END, 0) AS BIGINT) AS hll_est
  FROM folded f JOIN exact e USING (source)
)
SELECT source,
       CAST(n_exact AS BIGINT) AS n_exact,
       hll_est,
       CAST((hll_est - n_exact) * 1000000 // n_exact AS BIGINT) AS err_ppm
FROM est
ORDER BY source
"""


QUERIES = {
    "bloom_prefilter_stats": bloom_prefilter_stats,
    "kmv_source_overlap": kmv_source_overlap,
    "countmin_heavy_hitters": countmin_heavy_hitters,
    "hll_shingle_cardinality": hll_shingle_cardinality,
}
ORACLE = {
    "bloom_prefilter_stats": _bloom_sql(),
    "kmv_source_overlap": _kmv_sql(),
    "countmin_heavy_hitters": _cms_sql(),
    "hll_shingle_cardinality": _hll_sql(),
}
