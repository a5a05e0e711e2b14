"""operators/_memo.py: fingerprint sensitivity, build-once semantics,
value identity through the roundtrip, and eviction bounds."""

import os
import time

from real_time_fraud_detection_system_spark.operators import _memo


def test_fingerprint_tracks_data_and_constants(tmp_path, spark):
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.range(5).write.parquet(str(sf / "documents.parquet"))
    fp1 = _memo.table_fingerprint(str(sf), "documents", 8, 5)
    assert fp1 == _memo.table_fingerprint(str(sf), "documents", 8, 5)
    # constants change the key
    assert fp1 != _memo.table_fingerprint(str(sf), "documents", 8, 7)
    # data change (any part file's mtime) changes the key
    part = next(
        p for p in (sf / "documents.parquet").iterdir()
        if p.name.endswith(".parquet")
    )
    os.utime(part, (time.time() + 10, time.time() + 10))
    assert fp1 != _memo.table_fingerprint(str(sf), "documents", 8, 5)
    # missing table -> None -> memo_parquet falls through to build
    assert _memo.table_fingerprint(str(sf), "nope") is None


def test_memo_builds_once_and_roundtrips_values(
    tmp_path, spark, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_SIGCACHE", str(tmp_path / "cache"))
    sf = tmp_path / "sf"
    sf.mkdir()
    spark.range(10).selectExpr("id AS doc_id", "id * 2 AS v").write.parquet(
        str(sf / "documents.parquet")
    )
    fp = _memo.table_fingerprint(str(sf), "documents", "t")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.read.parquet(str(sf / "documents.parquet"))

    a = _memo.memo_parquet(spark, fp, "x", build)
    b = _memo.memo_parquet(spark, fp, "x", build)
    assert calls["n"] == 1  # second call read the memo
    rows = sorted(map(tuple, a.collect()))
    assert rows == sorted(map(tuple, b.collect()))
    assert rows == [(i, 2 * i) for i in range(10)]
    # None fingerprint -> always builds, never writes
    _memo.memo_parquet(spark, None, "x", build)
    assert calls["n"] == 2


def test_memo_eviction_keeps_newest(tmp_path, spark, monkeypatch):
    cache = tmp_path / "cache"
    monkeypatch.setenv("SPARK_GRAFT_SIGCACHE", str(cache))
    monkeypatch.setattr(_memo, "MEMO_KEEP", 3)
    df = spark.range(1)
    base = time.time() - 100
    for i in range(5):
        _memo.memo_parquet(spark, f"fp{i}", "t", lambda: df)
        # distinct PAST mtimes so eviction order is well-defined and a
        # later write's own eviction pass never outranks a newer entry
        if (cache / f"fp{i}-t").exists():
            os.utime(cache / f"fp{i}-t", (base + i, base + i))
    left = sorted(d for d in os.listdir(cache) if not d.endswith(".tmp"))
    assert len(left) == 3
    assert "fp4-t" in left  # newest survives
