"""Testdata catalog: load the driver's parquet tables and register views.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings, one parquet file per table under an sf dir.

Scale note: reads are plain ``spark.read.parquet`` so Catalyst gets full
predicate pushdown / column pruning / partition pruning on the scan. At
100 TB the same call points at a partitioned directory tree; nothing here
assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region=5,
# nation=25 rows by construction -- TPC-H invariant). Customer/supplier/part
# grow with SF, so they are NOT on this list; AQE decides for them.
ALWAYS_BROADCAST = ("region", "nation")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which Spark's reader
        # rejects; read as raw nanos and truncate to microseconds with
        # integer division (ts div 1000 -- double division would lose
        # precision at 1e18 ns magnitudes). Matches DuckDB's ns->us
        # truncation, so oracle comparisons agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F

        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def spread(df: DataFrame, key: str | None = None, parts: int | None = None) -> DataFrame:
    """Repartition before CPU-heavy per-row work (hashing, shingling,
    vector math, pandas UDFs).

    A small parquet file arrives as ONE input split, so expression-heavy
    operators would otherwise run on a single core; at 100 TB the same
    call is how skewed/coarse inputs get spread across executors. Keyed
    when a downstream groupBy/join reuses the partitioning, round-robin
    otherwise.
    """
    n = parts or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, key) if key else df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` works directly."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
