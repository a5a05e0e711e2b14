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


def test_nonstattable_path_warns_once_and_disables_memo(tmp_path):
    """Non-local/unstattable input (the 100 TB shared-storage case):
    fingerprint is None (memo off, consumers rebuild) and a ONE-TIME
    warning names the persisted-index production path."""
    import warnings

    _memo._warned_unstattable.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert _memo.table_fingerprint("s3a://bucket/corpus", "documents") is None
        assert _memo.table_fingerprint("s3a://bucket/corpus", "documents") is None
    warned = [x for x in w if "persist_dedup_index" in str(x.message)]
    assert len(warned) == 1, "expected exactly one warning per path"


def test_code_token_tracks_source_changes():
    """Editing a build-pipeline function changes its code token (memo
    keys folding it in auto-invalidate -- the 'sigv2' near-miss class
    is closed by construction)."""
    ns1, ns2 = {}, {}
    exec("def f(x):\n    return x + 1\n", ns1)
    exec("def f(x):\n    return x + 2\n", ns2)
    # exec'd functions have no retrievable source -> fall back to name
    # (stable, but equal); REAL module functions differ by source:
    t_sig = _memo.code_token(_memo.table_fingerprint)
    t_evict = _memo.code_token(_memo._evict)
    assert t_sig != t_evict
    assert t_sig == _memo.code_token(_memo.table_fingerprint)
    # multi-function token differs from each single one
    assert _memo.code_token(
        _memo.table_fingerprint, _memo._evict
    ) not in (t_sig, t_evict)


def test_evict_sweeps_orphaned_tmp_and_survives_races(
    tmp_path, spark, monkeypatch
):
    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setattr(_memo, "MEMO_KEEP", 2)
    # an orphaned crashed-build staging dir, older than the sweep age
    old_tmp = cache / "deadbeef-t.12345.tmp"
    old_tmp.mkdir()
    past = time.time() - _memo.TMP_SWEEP_SECONDS - 60
    os.utime(old_tmp, (past, past))
    # a FRESH tmp dir (live writer): must survive
    live_tmp = cache / "cafe-t.999.tmp"
    live_tmp.mkdir()
    for i in range(4):
        d = cache / f"fp{i}-t"
        d.mkdir()
        os.utime(d, (past + i, past + i))
    _memo._evict(str(cache))
    left = set(os.listdir(cache))
    assert "deadbeef-t.12345.tmp" not in left, "orphan tmp not swept"
    assert "cafe-t.999.tmp" in left, "live tmp wrongly swept"
    assert {"fp2-t", "fp3-t"} <= left and "fp0-t" not in left
