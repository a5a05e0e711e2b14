"""Broker-replay harness: recorded Kafka-wire segments through the
kafka_source parse path, exercising the offset/checkpoint semantics no
live broker exists to test here (VERDICT r2 gap #1).

The harness writes parquet "segments" whose schema is exactly what
``spark.readStream.format('kafka')`` emits (key/value binary + topic/
partition/offset/timestamp metadata); a file stream over them feeds
``parse_transactions`` -- the same code the Kafka source feeds -- and
``run_pipeline``'s checkpoint provides the resume contract:

  * restart picks up AFTER the last committed segment (no reprocessing,
    proven via recentProgress input counts);
  * duplicate transaction_ids arriving after a restart are still
    dropped (dedup state survives in the checkpoint);
  * a crash AFTER the sink append but BEFORE the epoch commit replays
    the SAME epoch on restart, and the sink's batchId marker makes the
    replay a no-op -- zero duplicate predictions (exactly-once).
"""

import datetime

import pytest

from pyspark.sql import functions as F

from real_time_fraud_detection_system_spark.streaming.pipeline import (
    kafka_sink_options,
    parse_transactions,
    prediction_sink_writer,
    run_pipeline,
)

KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)

TXN_SCHEMA = (
    "transaction_id string, amount double, "
    "features struct<num_items:int,merchant_risk:double,hour:double>, "
    "event_time timestamp"
)

TS = datetime.datetime(2025, 1, 1, 12, 0, 0)


def _write_segment(spark, seg_dir: str, ids: range) -> None:
    """One recorded 'topic segment': rows serialized with the engine's
    own Kafka producer serializer (kafka_sink_options), plus the
    consumer-side metadata columns a real broker read would carry."""
    rows = [
        (f"T{i:04d}", 10.0 + i, (1 + i % 5, 0.25, 12.0), TS) for i in ids
    ]
    txns = spark.createDataFrame(rows, TXN_SCHEMA)
    wire = kafka_sink_options(txns, "replay:9092", "transactions").select(
        F.lit(None).cast("binary").alias("key"),
        F.encode("value", "UTF-8").alias("value"),
        F.lit("transactions").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.lit(TS).alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    wire.coalesce(1).write.mode("append").parquet(seg_dir)


def _replayed_transactions(spark, seg_dir: str):
    raw = (
        spark.readStream.schema(KAFKA_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(seg_dir)
    )
    parsed = parse_transactions(raw)
    return parsed.filter(~F.col("_corrupt")).select(
        "transaction_id", "amount", "features", "event_time"
    )


def _drain(q) -> int:
    """Run an availableNow query to termination; return rows ingested."""
    q.awaitTermination(180)
    return sum(p["numInputRows"] for p in q.recentProgress)


def test_restart_resumes_after_committed_offsets(spark, tmp_path):
    seg, out, ckpt = (
        str(tmp_path / "segments"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    _write_segment(spark, seg, range(0, 30))
    n_in = _drain(run_pipeline(_replayed_transactions(spark, seg), out, ckpt))
    assert n_in == 30
    assert spark.read.parquet(out).count() == 30

    # second incarnation: 20 new ids + 10 replayed duplicates
    _write_segment(spark, seg, range(20, 50))
    n_in = _drain(run_pipeline(_replayed_transactions(spark, seg), out, ckpt))
    # resume read ONLY the new segment (30 rows), not the committed one
    assert n_in == 30
    store = spark.read.parquet(out)
    # the 10 overlapping ids were dropped by checkpointed dedup state
    assert store.count() == 50
    assert store.select("transaction_id").distinct().count() == 50


def test_crash_after_append_replays_exactly_once(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    seg, out, ckpt = (
        str(tmp_path / "segments"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    _write_segment(spark, seg, range(0, 10))
    _drain(run_pipeline(_replayed_transactions(spark, seg), out, ckpt))
    assert spark.read.parquet(out).count() == 10

    # crash AFTER the sink append, BEFORE Spark commits the epoch: the
    # worst-case window for duplicate predictions
    _write_segment(spark, seg, range(10, 20))
    real_sink = prediction_sink_writer(out)
    crashed = {"done": False}

    def crashing_sink(batch_df, epoch_id):
        real_sink(batch_df, epoch_id)
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash between append and commit")

    q = run_pipeline(
        _replayed_transactions(spark, seg), out, ckpt, sink=crashing_sink
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(180)
    assert crashed["done"]

    # restart: Spark replays the uncommitted epoch under the SAME id;
    # the sink's batchId marker turns the replay into a no-op
    _drain(run_pipeline(_replayed_transactions(spark, seg), out, ckpt))
    store = spark.read.parquet(out)
    assert store.count() == 20  # no duplicate appends from the replay
    assert store.select("transaction_id").distinct().count() == 20


def test_kafka_peek_newest_first_over_recorded_segment(spark, tmp_path):
    """S4 (kafka_peek) semantics without a broker: a batch read of a
    recorded wire segment through ``peek_newest`` returns the n NEWEST
    messages by broker timestamp, parsed, with corrupt payloads
    surfaced (not filtered) -- the diagnostic contract of the
    reference's GET /peek."""
    from real_time_fraud_detection_system_spark.streaming.pipeline import (
        peek_newest,
    )

    seg = str(tmp_path / "peek_seg")
    rows = [
        (f"P{i:02d}", 5.0 + i, (1, 0.5, 9.0), TS + datetime.timedelta(minutes=i))
        for i in range(8)
    ]
    txns = spark.createDataFrame(rows, TXN_SCHEMA)
    # broker timestamp tracks the event minute so newest-first is
    # observable; one garbage record lands SECOND-newest
    wire = kafka_sink_options(txns, "replay:9092", "transactions").select(
        F.encode("value", "UTF-8").alias("value"),
        F.get_json_object(F.col("value"), "$.event_time").alias("_et"),
    ).select(
        F.lit(None).cast("binary").alias("key"),
        "value",
        F.lit("transactions").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.to_timestamp("_et").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    corrupt = spark.createDataFrame(
        [(None, bytearray(b"{not json!"), "transactions", 0, 99)],
        "key binary, value binary, topic string, partition int, offset long",
    ).select(
        "key", "value", "topic", "partition", "offset",
        F.lit(TS + datetime.timedelta(minutes=6, seconds=30)).alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    wire.unionByName(corrupt).coalesce(1).write.parquet(seg)

    raw = spark.read.schema(KAFKA_WIRE_SCHEMA).parquet(seg)
    got = peek_newest(raw, 3).collect()
    assert len(got) == 3
    # newest first: P07 (minute 7), then the corrupt record (6:30),
    # then P06 (minute 6)
    assert got[0]["transaction_id"] == "P07" and not got[0]["_corrupt"]
    assert got[1]["_corrupt"] and got[1]["raw_payload"] == "{not json!"
    assert got[2]["transaction_id"] == "P06" and not got[2]["_corrupt"]
    # parse parity with the hot path: amount/event_time round-trip
    assert abs(got[0]["amount"] - 12.0) < 1e-9
    assert got[0]["event_time"] == TS + datetime.timedelta(minutes=7)
