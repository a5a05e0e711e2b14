"""Manifest snapshot store: atomic versioned commits, time travel, and
reader isolation from concurrent commits."""

import pytest

from real_time_fraud_detection_system_spark.snapshots import (
    expire_versions,
    latest_version,
    read_version,
    write_version,
)


def test_versions_commit_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = write_version(spark.range(0, 10), t)
    v1 = write_version(spark.range(0, 25), t)
    assert (v0, v1) == (0, 1)
    assert latest_version(t) == 1
    assert read_version(spark, t).count() == 25  # latest
    assert read_version(spark, t, 0).count() == 10  # time travel
    assert read_version(spark, t, 1).count() == 25


def test_reader_pinned_before_commit_is_untorn(spark, tmp_path):
    """A frame resolved against version 0 must keep returning version
    0's rows even after a later commit (the manifest lists files, the
    reader never lists the directory)."""
    t = str(tmp_path / "tbl")
    write_version(spark.range(0, 7), t)
    pinned = read_version(spark, t, 0)
    write_version(spark.range(0, 1000), t)
    assert pinned.count() == 7
    assert read_version(spark, t).count() == 1000


def test_expire_keeps_latest_and_unlinks_orphans(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for n in (5, 6, 7):
        write_version(spark.range(0, n), t)
    info = expire_versions(t, keep_last=1)
    assert info["dropped_manifests"] == 2
    assert info["dropped_files"] > 0
    assert read_version(spark, t).count() == 7
    with pytest.raises(FileNotFoundError):
        read_version(spark, t, 0)


def test_empty_table_dir_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_version(spark, str(tmp_path / "nope"))
