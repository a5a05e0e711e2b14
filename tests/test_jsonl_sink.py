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
