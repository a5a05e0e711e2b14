"""Data-layout analytics: what min/max file pruning is worth under a
Z-order layout vs the default time-ordered ingest layout.

The reference appends rows to Postgres in arrival order
(services/fraud_service/app/main.py:137-156) -- at 100 TB the analogous
parquet lake's dominant cost lever is which FILES a query can skip from
footer statistics alone. ``layout_pruning_stats`` simulates both
layouts from the same scan and reports, for a fixed 2-D predicate box
(a user band x a time band), how many files each layout scans and how
many rows those files drag in. ``write_zordered`` applies the real
thing to a DataFrame on disk.

Simulation, not measurement: a file is the set of rows sharing a file
id (equal-width time buckets for the ingest layout; equal-width Morton
key ranges for the Z-order layout), and a file is "scanned" iff its
[min, max] box on the two dimensions intersects the predicate box --
exactly the footer-pruning rule. Everything is integer arithmetic
(``functions/zorder.py``), so the DuckDB oracle reproduces the file
assignment bit-for-bit.

Scale posture: one scan of a 4-int projection of events, doubled by the
two-layout explode, into ONE keyed aggregation of (layout, file_id)
cardinality 2 x N_FILES; the final per-layout rollup is over 128 rows
(the near-scalar pattern). The min/max bounds are a 1-row broadcast
(the freshness_check scalar-anchor pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.zorder import morton2_expr, norm16_expr

N_FILES = 64
# predicate box on the 16-bit normalized grid: users 45-55%, time 40-60%
U_LO, U_HI = 29491, 36044
T_LO, T_HI = 26214, 39321


def _tagged_exprs(dialect: str) -> tuple[str, str]:
    """(zfile, tfile) expressions over normalized columns u_n / t_n."""
    div = "DIV" if dialect == "spark" else "//"
    zkey = morton2_expr("u_n", "t_n", dialect)
    # 32-bit morton key -> N_FILES equal-width key ranges (>> 26)
    zfile = f"CAST({zkey} {div} {2**32 // N_FILES} AS BIGINT)"
    tfile = f"CAST((t_n * {N_FILES}) {div} 65536 AS BIGINT)"
    return zfile, tfile


def layout_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per layout: simulated file count, files a footer-pruning reader
    must scan for the fixed predicate box, rows inside those scanned
    files (the I/O actually paid), and rows truly matching (identical
    for both layouts -- the built-in sanity row)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.expr("unix_micros(ts)")).alias("t_min"),
        F.max(F.expr("unix_micros(ts)")).alias("t_max"),
        F.min("user_id").alias("u_min"),
        F.max("user_id").alias("u_max"),
    )
    norm = ev.crossJoin(F.broadcast(bounds)).selectExpr(
        f"{norm16_expr('user_id', 'u_min', 'u_max', 'spark')} AS u_n",
        f"{norm16_expr('unix_micros(ts)', 't_min', 't_max', 'spark')} AS t_n",
    )
    zfile, tfile = _tagged_exprs("spark")
    both = norm.selectExpr(
        "u_n",
        "t_n",
        f"explode(array(named_struct('layout', 'zorder', 'file_id', {zfile}),"
        f" named_struct('layout', 'time', 'file_id', {tfile}))) AS lf",
    ).select("u_n", "t_n", F.col("lf.layout").alias("layout"), F.col("lf.file_id").alias("file_id"))
    in_box = (
        F.col("u_n").between(U_LO, U_HI) & F.col("t_n").between(T_LO, T_HI)
    ).cast("long")
    per_file = both.groupBy("layout", "file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("u_n").alias("u_lo"),
        F.max("u_n").alias("u_hi"),
        F.min("t_n").alias("t_lo"),
        F.max("t_n").alias("t_hi"),
        F.sum(in_box).alias("n_match"),
    )
    scanned = (
        (F.col("u_lo") <= U_HI)
        & (F.col("u_hi") >= U_LO)
        & (F.col("t_lo") <= T_HI)
        & (F.col("t_hi") >= T_LO)
    ).cast("long")
    return (
        per_file.groupBy("layout")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(scanned).alias("files_scanned"),
            F.sum(F.col("n_rows") * scanned).alias("rows_scanned"),
            F.sum("n_match").alias("rows_matching"),
        )
        .orderBy("layout")
    )


def _duck_sql() -> str:
    zfile, tfile = _tagged_exprs("duck")
    u_n = norm16_expr("user_id", "u_min", "u_max", "duck")
    t_n = norm16_expr("epoch_us(ts)", "t_min", "t_max", "duck")
    return f"""
WITH bounds AS (
  SELECT min(epoch_us(ts)) AS t_min, max(epoch_us(ts)) AS t_max,
         min(user_id) AS u_min, max(user_id) AS u_max
  FROM events
),
norm AS (
  SELECT {u_n} AS u_n, {t_n} AS t_n
  FROM events, bounds
),
tagged AS (
  SELECT u_n, t_n, 'zorder' AS layout, {zfile} AS file_id FROM norm
  UNION ALL
  SELECT u_n, t_n, 'time' AS layout, {tfile} AS file_id FROM norm
),
per_file AS (
  SELECT layout, file_id,
         count(*) AS n_rows,
         min(u_n) AS u_lo, max(u_n) AS u_hi,
         min(t_n) AS t_lo, max(t_n) AS t_hi,
         sum(CASE WHEN u_n BETWEEN {U_LO} AND {U_HI}
                   AND t_n BETWEEN {T_LO} AND {T_HI}
             THEN 1 ELSE 0 END) AS n_match
  FROM tagged
  GROUP BY 1, 2
)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN u_lo <= {U_HI} AND u_hi >= {U_LO}
                      AND t_lo <= {T_HI} AND t_hi >= {T_LO}
                THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(sum(CASE WHEN u_lo <= {U_HI} AND u_hi >= {U_LO}
                      AND t_lo <= {T_HI} AND t_hi >= {T_LO}
                THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(sum(n_match) AS BIGINT) AS rows_matching
FROM per_file
GROUP BY layout
ORDER BY layout
"""


LAYOUT_PRUNING_SQL = _duck_sql()


def write_zordered(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    n_files: int = N_FILES,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of two
    16-bit-normalized dimensions: repartitionByRange on the key gives
    each output file a contiguous zkey range, i.e. a 2-D tile with
    tight footer min/max on BOTH columns. The normalization bounds come
    from one aggregate over the input (a write-time cost, not a read
    cost)."""
    bounds = df.agg(
        F.min(xcol).alias("x_min"),
        F.max(xcol).alias("x_max"),
        F.min(ycol).alias("y_min"),
        F.max(ycol).alias("y_max"),
    )
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_zkey",
        F.expr(
            morton2_expr(
                norm16_expr(xcol, "x_min", "x_max", "spark"),
                norm16_expr(ycol, "y_min", "y_max", "spark"),
                "spark",
            )
        ),
    )
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", "x_min", "x_max", "y_min", "y_max")
        .write.mode("overwrite")
        .parquet(path)
    )


QUERIES = {
    "layout_pruning_stats": layout_pruning_stats,
}

ORACLE = {
    "layout_pruning_stats": LAYOUT_PRUNING_SQL,
}
