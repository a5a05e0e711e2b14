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
        # events.parquet has shipped with two physical types for ``ts``:
        # TIMESTAMP(NANOS) (which Spark's reader rejects unless read as raw
        # long nanos) and plain TIMESTAMP(MICROS). Handle both: when the
        # column arrives as a long it is epoch nanos -- truncate to micros
        # with integer division (double division would lose precision at
        # 1e18 ns magnitudes, and DuckDB also truncates ns->us, so oracle
        # comparisons agree). When it arrives as TIMESTAMP_NTZ, cast to
        # TIMESTAMP: the session runs in UTC so the instant is unchanged,
        # and downstream operators (unix_micros, window, date_trunc) expect
        # the LTZ type this loader has always produced. The nanosAsLong
        # conf is baked into get_spark sessions; ensure_runtime_conf
        # covers externally-built ones (idempotent, no-op once set).
        from .session import ensure_runtime_conf

        ensure_runtime_conf(spark)
        raw = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F
        from pyspark.sql.types import IntegerType, LongType, TimestampNTZType

        dt = raw.schema["ts"].dataType
        if isinstance(dt, (LongType, IntegerType)):
            raw = raw.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif isinstance(dt, TimestampNTZType):
            raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
        return raw
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


# --------------------------------------------------------------------------
# Interchange formats: parquet is the native store, but a pipeline's
# edges speak whatever the upstream/downstream system emits. One pair
# of helpers with per-format options chosen so EVERY table round-trips
# value-identically (tests/test_storage.py drives all formats over the
# hardest columns: free text with delimiters/quotes, timestamps,
# doubles, arrays where the format supports them).
INTERCHANGE_FORMATS = ("parquet", "orc", "json", "csv")

_WRITE_OPTIONS: dict[str, dict[str, str]] = {
    # csv: header for self-description; explicit quote/escape so free
    # text containing commas, quotes, and newlines survives; ISO
    # timestamps so the read side parses without a locale guess
    "csv": {
        "header": "true",
        "escape": '"',
        "multiLine": "true",
        "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    },
    "json": {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
}


def write_table_as(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Persist ``df`` in an interchange format. CSV/JSON cannot carry
    array columns (embeddings) -- callers serialize those themselves
    or use parquet/orc; the writer fails fast on them rather than
    silently stringifying."""
    if fmt not in INTERCHANGE_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    if fmt in ("csv",):
        bad = [f.name for f in df.schema.fields
               if f.dataType.typeName() in ("array", "map", "struct")]
        if bad:
            raise ValueError(
                f"csv cannot carry nested columns {bad}; use parquet/orc"
            )
    w = df.write.mode("overwrite").format(fmt)
    for k, v in _WRITE_OPTIONS.get(fmt, {}).items():
        w = w.option(k, v)
    w.save(path)


def read_table_as(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None
) -> DataFrame:
    """Read an interchange file back. CSV and JSON are schema-on-read
    text formats: pass the writer's schema (or any explicit one) so
    types -- timestamps especially -- reproduce exactly instead of
    being re-inferred per file."""
    if fmt not in INTERCHANGE_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}")
    r = spark.read.format(fmt)
    for k, v in _WRITE_OPTIONS.get(fmt, {}).items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)
