"""Physical-layout levers for the 100 TB posture: bucketed tables.

A repeated big-big equi-join (orders x lineitem on orderkey here; at
100 TB, predictions x any event-keyed table) pays a full shuffle of both
sides every query. Bucketing pre-shuffles ONCE at write time: both
tables hash-clustered into the same number of buckets on the join key
make the join a zero-exchange sort-merge (each task reads matching
bucket files from both sides). The plan test asserts the join runs with
no Exchange on either side -- the property that survives any scale-up.

Date-partitioned + bucketed is the canonical prediction-store layout:
partition pruning serves the time filters (SURVEY.md P12/P13), buckets
serve the key joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> DataFrame:
    """Persist df hash-clustered (and optionally sorted) by keys into
    n_buckets bucket files; returns the catalog-backed table. Joins and
    aggregations keyed on `keys` against tables bucketed with the SAME
    bucket count skip their shuffle (and sort, if sorted)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the in-memory catalog forgets tables across sessions but their
    # warehouse directories survive -- clear any orphaned location
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)

    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *keys
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)
    return spark.table(table)


class CompactionError(RuntimeError):
    """Base for compaction concurrency failures."""


class CompactionInProgress(CompactionError):
    """Another compaction holds the store's lock file."""


class ConcurrentAppend(CompactionError):
    """Files appeared in the store between the compaction read and its
    rewrite -- aborting instead of silently dropping those rows."""


COMPACTION_LOCK = "_COMPACTION_LOCK"


def compaction_locked(store_dir: str) -> bool:
    """True while a compaction rewrite holds the store. Cooperative
    writers (prediction_sink_writer) check this and fail loudly rather
    than appending rows the in-flight rewrite would silently drop."""
    import os

    return os.path.exists(os.path.join(store_dir, COMPACTION_LOCK))


def compact_partitions(
    spark: SparkSession,
    store_dir: str,
    partition_col: str = "event_date",
    target_rows_per_file: int = 1_000_000,
    _pre_write_hook=None,
) -> dict:
    """Small-files compaction for a partitioned store.

    Streaming appends write one file per (micro-batch, partition) --
    after a day at a 30 s trigger that is ~2,880 files per partition,
    and at 100 TB the NameNode/listing and open-per-file costs dominate
    scans long before the bytes do. Compaction rewrites each partition
    to ~ceil(partition_rows / target_rows_per_file) files: per-partition
    row counts (one cheap agg) size a salt column, and the shuffle keys
    on (partition, salt) so large partitions split across that many
    tasks/files instead of collapsing into one giant file per partition
    value. Dynamic partition overwrite replaces ONLY rewritten
    partitions, so concurrent appends to OTHER partitions survive.

    Concurrency protocol (plain parquet has no transaction log, so this
    is guard + detect, not a transaction):

      * a ``_COMPACTION_LOCK`` sentinel is held for the duration; a
        second compaction raises CompactionInProgress, and cooperative
        writers (``compaction_locked``) refuse to append while it is up;
      * the file listing captured at read time is re-audited immediately
        before the rewrite is issued -- any file that appeared since
        (a non-cooperative concurrent append) raises ConcurrentAppend
        and the store is left untouched;
      * the unguardable remainder is the rewrite itself: rows appended
        by a non-cooperative writer DURING the overwrite commit are lost
        with their partition's rewrite. Run compaction on partitions the
        stream has moved past (e.g. yesterday and older), never on the
        hot partition.

    ``_pre_write_hook`` is a test seam invoked between the audit
    snapshot and the audit check. Idempotent; returns before/after file
    counts.
    """
    import glob
    import os

    from pyspark.sql import functions as F

    def n_files() -> int:
        return len(
            glob.glob(f"{store_dir}/{partition_col}=*/*.parquet")
        )

    def listing() -> set[str]:
        return set(glob.glob(f"{store_dir}/{partition_col}=*/*.parquet"))

    lock_path = os.path.join(store_dir, COMPACTION_LOCK)
    try:
        lock_fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise CompactionInProgress(
            f"{lock_path} exists -- another compaction is rewriting this "
            "store (remove the file only if that process is dead)"
        )
    os.close(lock_fd)
    try:
        return _compact_locked(
            spark, store_dir, partition_col, target_rows_per_file,
            n_files, listing, F, _pre_write_hook,
        )
    finally:
        os.remove(lock_path)


def _compact_locked(
    spark, store_dir, partition_col, target_rows_per_file,
    n_files, listing, F, _pre_write_hook,
):
    before = n_files()
    snapshot = listing()
    df = spark.read.parquet(store_dir)
    # ONE counting scan: per-partition rows -> total, per-partition file
    # targets, and the overall shuffle width all derive from it in Python
    counted = df.groupBy(partition_col).agg(F.count("*").alias("_prows")).collect()
    n_rows = sum(r["_prows"] for r in counted)
    nf = {
        r[partition_col]: max(1, -(-r["_prows"] // target_rows_per_file))
        for r in counted
    }
    n_out = max(1, sum(nf.values()))
    from pyspark.sql.types import IntegerType

    per_part = spark.createDataFrame(
        [(k, v) for k, v in nf.items() if k is not None],
        df.select(partition_col).schema.add("_nf", IntegerType()),
    )
    salted = (
        # LEFT join + coalesce: rows with a NULL partition value (e.g.
        # malformed events with no date) never equi-join -- they still
        # must be rewritten, into the default partition, not dropped
        df.join(F.broadcast(per_part), partition_col, "left")
        # row-unique id mod _nf spreads each store partition round-robin
        # across its _nf salt values regardless of how the scan packed
        # the small input files into splits
        .withColumn(
            "_salt",
            F.pmod(
                F.monotonically_increasing_id(),
                F.coalesce(F.col("_nf"), F.lit(1)),
            ),
        )
    )
    if _pre_write_hook is not None:
        _pre_write_hook()
    # write-audit: catch non-cooperative appends that landed between the
    # counting read and this point; the remaining race is the write
    # duration itself (see docstring)
    appeared = listing() - snapshot
    if appeared:
        raise ConcurrentAppend(
            f"{len(appeared)} file(s) appended during compaction, e.g. "
            f"{sorted(appeared)[0]!r}; aborting before any rewrite"
        )
    (
        salted.repartition(int(n_out), partition_col, "_salt")
        .drop("_nf", "_salt")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        # hard cap: even when salt buckets hash-collide into one task,
        # the writer splits its output at the row target
        .option("maxRecordsPerFile", target_rows_per_file)
        .partitionBy(partition_col)
        .parquet(store_dir)
    )
    return {"files_before": before, "files_after": n_files(), "rows": n_rows}


def bucketed_orders_lineitem(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[DataFrame, DataFrame]:
    """Bucketed copies of orders and lineitem clustered on the join key."""
    from .catalog import load_table

    orders = write_bucketed(
        load_table(spark, sf_dir, "orders"), "orders_b", ["o_orderkey"],
        n_buckets,
    )
    lineitem = write_bucketed(
        load_table(spark, sf_dir, "lineitem"), "lineitem_b", ["l_orderkey"],
        n_buckets,
    )
    return orders, lineitem


# --------------------------------------------------------------------------
def merge_dimension(
    spark: SparkSession, dim_dir: str, updates: DataFrame, key: str
) -> int:
    """SCD-type-1 upsert for an unpartitioned parquet dimension: rows
    in ``updates`` replace same-key rows, new keys append, everything
    else survives untouched -- MERGE INTO semantics on a format with
    no row-level operations, realized the parquet-native way: rewrite
    into a staging directory, then swap directories. The swap is the
    commit point; a crash before it leaves the old dimension intact
    and a re-run is idempotent (updates win by key, applying them
    twice is a no-op).

    Scale shape: one full-outer-free pass -- existing rows anti-join
    the update keys (updates are small by the SCD contract, so the
    anti-join broadcasts), then a unionByName. Dimensions are the
    SMALL tables of a star schema; a keyed fact store uses
    daily_metrics_upsert's dynamic-partition overwrite instead.

    Returns the merged row count."""
    import os
    import shutil

    from pyspark.sql import functions as F

    if os.path.isdir(dim_dir):
        existing = spark.read.parquet(dim_dir)
        merged = existing.join(
            F.broadcast(updates.select(key)), key, "left_anti"
        ).unionByName(updates)
    else:
        merged = updates
    staging = dim_dir.rstrip("/") + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    merged.write.mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count()
    old = dim_dir.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(dim_dir):
        os.rename(dim_dir, old)
    os.rename(staging, dim_dir)
    shutil.rmtree(old, ignore_errors=True)
    return n


def merge_dimension_scd2(
    spark: SparkSession,
    dim_dir: str,
    updates: DataFrame,
    key: str,
    effective_col: str = "effective_ts",
) -> int:
    """SCD-type-2 merge: history-keeping upsert. Dimension rows carry
    ``valid_from`` / ``valid_to`` (NULL = current). A batch may carry
    a WHOLE SEQUENCE of updates per key (a daily ingest batch
    legitimately contains several changes for one key): per key the
    updates are ordered by the effective timestamp, consecutive equal
    attributes collapse (SCD2 records changes, not updates), the
    key's current row closes at the first surviving change, and the
    intra-batch changes chain their own validity windows, the last
    one staying open. Updates not NEWER than the key's current
    ``valid_from`` are dropped as already-applied -- which is what
    makes re-applying the same batch a no-op -- and a batch's first
    change equal to the current attributes is likewise ignored. New
    keys open at their first change. Same staging-rewrite +
    directory-swap commit as merge_dimension.

    Assumes (key, effective_ts) is unique within a batch and batches
    arrive in non-decreasing time order (the checkpointed-ingest
    shape). Attribute equality uses a null-safe struct compare over
    every column except the key and the effective timestamp. Returns
    the merged row count (history rows included)."""
    import os
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    attr_cols = [
        c for c in updates.columns if c not in (key, effective_col)
    ]
    w_seq = Window.partitionBy(key).orderBy("_eff")
    incoming = updates.select(
        key,
        F.col(effective_col).alias("_eff"),
        F.struct(*attr_cols).alias("_attrs"),
    )
    if os.path.isdir(dim_dir):
        existing = spark.read.parquet(dim_dir)
        cur = existing.filter(F.col("valid_to").isNull()).select(
            key,
            F.struct(*attr_cols).alias("_cur_attrs"),
            F.col("valid_from").alias("_cur_from"),
        )
        # stale-drop (replay idempotence), then collapse the intra-batch
        # sequence to changes, then drop a first change equal to the
        # stored current attributes -- in that order: each step's output
        # is what the next one's semantics are defined over
        fresh = (
            incoming.join(F.broadcast(cur), key, "left")
            .filter(
                F.col("_cur_from").isNull()
                | (F.col("_eff") > F.col("_cur_from"))
            )
        )
        changes = (
            fresh.withColumn("_prev", F.lag("_attrs").over(w_seq))
            .filter(
                F.col("_prev").isNull()
                | ~F.col("_attrs").eqNullSafe(F.col("_prev"))
            )
            .withColumn("_rn", F.row_number().over(w_seq))
            .filter(
                ~(
                    (F.col("_rn") == 1)
                    & F.col("_attrs").eqNullSafe(F.col("_cur_attrs"))
                )
            )
            .select(key, "_eff", "_attrs")
        )
        closing = F.broadcast(
            changes.groupBy(key).agg(F.min("_eff").alias("_close_ts"))
        )
        kept = (
            existing.join(closing, key, "left")
            .withColumn(
                "valid_to",
                F.when(
                    F.col("valid_to").isNull()
                    & F.col("_close_ts").isNotNull(),
                    F.col("_close_ts"),
                ).otherwise(F.col("valid_to")),
            )
            .drop("_close_ts")
        )
    else:
        kept = None
        changes = (
            incoming.withColumn("_prev", F.lag("_attrs").over(w_seq))
            .filter(
                F.col("_prev").isNull()
                | ~F.col("_attrs").eqNullSafe(F.col("_prev"))
            )
            .select(key, "_eff", "_attrs")
        )
    opened = changes.select(
        key,
        *[F.col("_attrs")[c].alias(c) for c in attr_cols],
        F.col("_eff").alias("valid_from"),
        # intra-batch chains close at the NEXT change; the last stays
        # open (NULL) as the key's new current row
        F.lead("_eff").over(
            Window.partitionBy(key).orderBy("_eff")
        ).cast("timestamp").alias("valid_to"),
    )
    merged = opened if kept is None else kept.unionByName(opened)
    staging = dim_dir.rstrip("/") + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    merged.write.mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count()
    old = dim_dir.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(dim_dir):
        os.rename(dim_dir, old)
    os.rename(staging, dim_dir)
    shutil.rmtree(old, ignore_errors=True)
    return n


def point_in_time_join(
    facts: DataFrame, dim: DataFrame, key: str, ts_col: str
) -> DataFrame:
    """Point-in-time enrichment against an SCD2 dimension: each fact
    row joins the dimension version whose validity window
    [valid_from, valid_to) contains the fact's timestamp -- the lookup
    that makes history-keeping dimensions USABLE (training-data
    pipelines need the feature value as-of the event, not as-of
    today; joining the current row silently leaks the future).

    Scale shape: dimensions are the small side of a star schema, so
    the version table broadcasts and the range predicate evaluates
    map-side -- no shuffle of the fact stream, the same posture as
    the other dimension enrichments. Facts with no valid version
    (before the key's first window, or unknown key) keep NULL
    attributes via the left join."""
    from pyspark.sql import functions as F

    d = dim.alias("_dim")
    f = facts.alias("_f")
    cond = (
        (F.col(f"_f.{key}") == F.col(f"_dim.{key}"))
        & (F.col(f"_f.{ts_col}") >= F.col("_dim.valid_from"))
        & (
            F.col("_dim.valid_to").isNull()
            | (F.col(f"_f.{ts_col}") < F.col("_dim.valid_to"))
        )
    )
    return f.join(F.broadcast(d), cond, "left").select(
        "_f.*",
        *[
            F.col(f"_dim.{c}")
            for c in dim.columns
            if c not in (key, "valid_from", "valid_to")
        ],
    )
