"""jsonlsink (Python DataSource writer): staged-commit JSONL directory
sink -- batch write, streaming exactly-once across a checkpoint
restart, and abort/staging hygiene."""

import glob
import json
import os


def _register(spark):
    from real_time_fraud_detection_system_spark.sources.jsonl_sink import (
        register,
    )

    register(spark)


def _read_rows(path, pattern):
    rows = []
    for f in glob.glob(os.path.join(path, pattern)):
        with open(f) as fh:
            rows += [json.loads(ln) for ln in fh if ln.strip()]
    return rows


def test_jsonlsink_batch_write_roundtrip(spark, tmp_path):
    _register(spark)
    out = str(tmp_path / "out")
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    df.write.format("jsonlsink").option("path", out).mode("append").save()
    rows = _read_rows(out, "data/*.jsonl")
    assert sorted((r["id"], r["v"]) for r in rows) == [
        (i, 2 * i) for i in range(100)
    ]
    assert os.path.exists(os.path.join(out, "data", "_SUCCESS"))
    assert not os.listdir(os.path.join(out, ".staging"))  # all moved


def test_jsonlsink_stream_exactly_once_across_restart(spark, tmp_path):
    """fraudgen stream -> jsonlsink with a checkpoint, stopped and
    resumed: every id lands in a _SUCCESS-stamped batch dir exactly
    once."""
    from real_time_fraud_detection_system_spark.sources.datasource import (
        register as register_gen,
    )

    _register(spark)
    register_gen(spark)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run(max_rows):
        q = (
            spark.readStream.format("fraudgen")
            .option("rowsPerBatch", "30")
            .option("maxRows", str(max_rows))
            .load()
            .writeStream.format("jsonlsink")
            .option("path", out)
            .option("checkpointLocation", ck)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run(70)
    run(130)
    batch_dirs = glob.glob(os.path.join(out, "batch=*"))
    assert batch_dirs, "no committed batches"
    for d in batch_dirs:
        assert os.path.exists(os.path.join(d, "_SUCCESS")), d
    rows = _read_rows(out, "batch=*/*.jsonl")
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids)), "duplicate rows across restart"
    assert sorted(ids) == list(range(130))
    assert not os.listdir(os.path.join(out, ".staging"))


# --------------------------------------------------------------------------
# Round-8 ADVICE fixes: unit-level tests against the writer classes
# directly (no streaming query needed -- commit semantics are pure
# filesystem protocol).

class _FakeRow:
    def __init__(self, **kw):
        self._d = kw

    def asDict(self, recursive=True):
        return dict(self._d)


def _mk_stream_writer(path):
    from real_time_fraud_detection_system_spark.sources.jsonl_sink import (
        _JsonlStreamWriter,
    )

    return _JsonlStreamWriter({"path": str(path)})


def test_replay_of_fully_committed_batch_discards_duplicates(tmp_path):
    """The exactly-once crash window: attempt 1 fully committed
    (files moved, _SUCCESS written) but Spark died before its own
    checkpoint commit log -- the replayed attempt must NOT append its
    rows alongside the old ones."""
    out = tmp_path / "out"
    out.mkdir()
    w1 = _mk_stream_writer(out)
    m1 = w1.write(iter([_FakeRow(id=1), _FakeRow(id=2)]))
    w1.commit([m1], batchId=0)
    rows1 = _read_rows(str(out), "batch=0/*.jsonl")
    assert sorted(r["id"] for r in rows1) == [1, 2]

    # replayed attempt (fresh writer, as after restart) stages the same
    # logical rows again, then finds the marker
    w2 = _mk_stream_writer(out)
    m2 = w2.write(iter([_FakeRow(id=1), _FakeRow(id=2)]))
    w2.commit([m2], batchId=0)

    rows2 = _read_rows(str(out), "batch=0/*.jsonl")
    assert sorted(r["id"] for r in rows2) == [1, 2], "rows duplicated"
    with open(out / "batch=0" / "_SUCCESS") as fh:
        assert int(fh.read()) == 2
    # the duplicate attempt's staged files were discarded
    staging = out / ".staging"
    assert not any(staging.rglob("*.jsonl"))


def test_half_committed_batch_is_cleared_and_redone(tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    # half-committed: dir with an orphan file, NO marker
    (out / "batch=0").mkdir()
    (out / "batch=0" / "orphan.jsonl").write_text('{"id": 99}\n')
    w = _mk_stream_writer(out)
    m = w.write(iter([_FakeRow(id=1)]))
    w.commit([m], batchId=0)
    rows = _read_rows(str(out), "batch=0/*.jsonl")
    assert sorted(r["id"] for r in rows) == [1], "orphan survived replay"


def test_batch_append_marker_accumulates_and_retry_is_idempotent(tmp_path):
    from real_time_fraud_detection_system_spark.sources.jsonl_sink import (
        _JsonlBatchWriter,
    )

    out = tmp_path / "out"
    out.mkdir()
    w1 = _JsonlBatchWriter({"path": str(out)}, overwrite=False)
    m = w1.write(iter([_FakeRow(id=1), _FakeRow(id=2)]))
    w1.commit([m])
    w2 = _JsonlBatchWriter({"path": str(out)}, overwrite=False)
    m2 = w2.write(iter([_FakeRow(id=3)]))
    w2.commit([m2])
    # marker describes the DIRECTORY (3 rows), not the newest write (1)
    with open(out / "data" / "_SUCCESS") as fh:
        assert int(fh.read()) == 3
    # driver-side commit retry with the same messages: no re-count, no
    # crash on the already-moved staged source
    w2.commit([m2])
    with open(out / "data" / "_SUCCESS") as fh:
        assert int(fh.read()) == 3
    rows = _read_rows(str(out), "data/*.jsonl")
    assert sorted(r["id"] for r in rows) == [1, 2, 3]


def test_concurrent_writer_staging_not_swept(tmp_path):
    """A second live run's staged file must survive the first run's
    commit sweep (staging is namespaced + age-gated)."""
    out = tmp_path / "out"
    out.mkdir()
    w_a = _mk_stream_writer(out)
    w_b = _mk_stream_writer(out)
    m_b = w_b.write(iter([_FakeRow(id=7)]))  # staged, not yet committed
    m_a = w_a.write(iter([_FakeRow(id=1)]))
    w_a.commit([m_a], batchId=0)
    # b's staged file is untouched and its own commit still succeeds
    w_b.commit([m_b], batchId=1)
    rows = _read_rows(str(out), "batch=*/*.jsonl")
    assert sorted(r["id"] for r in rows) == [1, 7]


def test_batch_overwrite_commit_retry_keeps_winners(tmp_path):
    """Driver-side commit retry in OVERWRITE mode: the naive path
    rmtrees dest (deleting the winners attempt 1 already moved there),
    then crashes renaming the vanished staged sources -- the batch's
    rows would be permanently lost. The retry must instead recognize
    the completed move and keep the winners."""
    from real_time_fraud_detection_system_spark.sources.jsonl_sink import (
        _JsonlBatchWriter,
    )

    out = tmp_path / "out"
    out.mkdir()
    # pre-existing data a FRESH overwrite must still clear
    (out / "data").mkdir()
    (out / "data" / "old.jsonl").write_text('{"id": 99}\n')
    w = _JsonlBatchWriter({"path": str(out)}, overwrite=True)
    m = w.write(iter([_FakeRow(id=1), _FakeRow(id=2)]))
    w.commit([m])
    rows = _read_rows(str(out), "data/*.jsonl")
    assert sorted(r["id"] for r in rows) == [1, 2], "overwrite kept old"

    # driver retries the SAME commit: must not lose the batch
    w.commit([m])
    rows = _read_rows(str(out), "data/*.jsonl")
    assert sorted(r["id"] for r in rows) == [1, 2], "retry lost the batch"
    with open(out / "data" / "_SUCCESS") as fh:
        assert int(fh.read()) == 2
