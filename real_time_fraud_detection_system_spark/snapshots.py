"""Manifest-based snapshot store: atomic versioned writes + time travel
over plain parquet -- the minimal slice of a lakehouse table format
(Delta/Iceberg's core idea) in ~100 lines, for the stores this engine
appends to continuously.

Why the reference needs it (and lacks it): the Postgres predictions
table gives its dashboards a consistent view for free; a parquet lake
does NOT -- a reader listing a directory mid-rewrite sees half a table.
The fix is indirection: data files are immutable and WRITE-ONCE under
``data/``, each version is a manifest JSON listing exactly its files,
and ``_latest`` is a tiny pointer file whose single atomic rename
(os.replace) is the commit. Readers resolve the pointer (or any pinned
version) and read only the listed files -- never the directory -- so a
concurrent commit can't tear a read, and old versions stay readable
until explicitly expired (time travel for debugging / reproducing a
training run).

Scale posture: the manifest lists file paths, so commit cost is
O(files-in-version), independent of rows; reads prune to the listed
files exactly like any static parquet read (pushdown and pruning
unaffected). Expiry unlinks data files no surviving manifest
references."""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _norm(table_dir: str) -> str:
    """All file paths recorded in manifests, and all comparisons
    against them, go through one absolute-path normalization --
    expire_versions decides liveness by string membership, so a
    relative-vs-absolute (or dot-prefixed) spelling difference between
    the write and the expiry would otherwise unlink LIVE data files."""
    return os.path.abspath(table_dir)


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"manifest-{version:08d}.json")


def latest_version(table_dir: str) -> int | None:
    table_dir = _norm(table_dir)
    ptr = os.path.join(table_dir, "_latest")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return int(fh.read().strip())


def write_version(df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as the next version. Data lands under a fresh
    uuid subdirectory of data/ (immutable, never listed by readers),
    then the manifest write + pointer rename publish it atomically.

    Single-writer contract: the atomic rename protects READERS from
    torn views; two concurrent WRITERS would race the version number
    (last rename wins, the loser's manifest is overwritten). Serialize
    writers externally -- the same contract as the directory-swap
    dimension merge (storage.merge_dimension)."""
    table_dir = _norm(table_dir)
    os.makedirs(os.path.join(table_dir, "data"), exist_ok=True)
    prev = latest_version(table_dir)
    version = 0 if prev is None else prev + 1
    stamp = uuid.uuid4().hex
    data_dir = os.path.join(table_dir, "data", stamp)
    df.write.mode("error").parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    manifest = {"version": version, "files": files}
    mpath = _manifest_path(table_dir, version)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, mpath)
    ptr_tmp = os.path.join(table_dir, "_latest.tmp")
    with open(ptr_tmp, "w") as fh:
        fh.write(str(version))
    os.replace(ptr_tmp, os.path.join(table_dir, "_latest"))  # THE commit
    return version


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the pinned version (default: latest). Reads ONLY the
    manifest's files -- concurrent commits never tear the result."""
    table_dir = _norm(table_dir)
    if version is None:
        version = latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no committed version in {table_dir}")
    with open(_manifest_path(table_dir, version)) as fh:
        manifest = json.load(fh)
    return spark.read.parquet(*manifest["files"])


def expire_versions(table_dir: str, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` manifests and unlink data
    files no surviving manifest references. Returns counts."""
    table_dir = _norm(table_dir)
    latest = latest_version(table_dir)
    if latest is None:
        return {"dropped_manifests": 0, "dropped_files": 0}
    cutoff = latest - keep_last + 1
    keep_files: set[str] = set()
    dropped_manifests = 0
    for v in range(latest + 1):
        mpath = _manifest_path(table_dir, v)
        if not os.path.exists(mpath):
            continue
        with open(mpath) as fh:
            files = json.load(fh)["files"]
        if v >= cutoff:
            keep_files.update(files)
        else:
            os.unlink(mpath)
            dropped_manifests += 1
    dropped_files = 0
    data_root = os.path.join(table_dir, "data")
    for sub in os.listdir(data_root):
        subdir = os.path.join(data_root, sub)
        for f in os.listdir(subdir):
            path = os.path.join(subdir, f)
            if f.endswith(".parquet") and path not in keep_files:
                os.unlink(path)
                dropped_files += 1
        if not any(f.endswith(".parquet") for f in os.listdir(subdir)):
            for leftover in os.listdir(subdir):
                os.unlink(os.path.join(subdir, leftover))
            os.rmdir(subdir)
    return {
        "dropped_manifests": dropped_manifests,
        "dropped_files": dropped_files,
    }
