"""LIVE-broker Kafka integration tests.

Skipped unless ``SPARK_GRAFT_KAFKA_BOOTSTRAP`` points at a reachable
broker (host:port) and the spark-sql-kafka package is on the classpath
(``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark ver>``).
This container ships neither, so in the sandbox every test here reports
the skip reason below; the broker-LESS floor for the same semantics --
wire-format parse, dead-letter routing, checkpoint resume, no-dup
delivery, newest-first peek -- is tests/test_replay_resume.py over
recorded wire segments. README section "Kafka semantics: proven vs
asserted" states exactly which behaviors each side covers.
"""

import json
import os
import time
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

live = pytest.mark.skipif(
    not BOOTSTRAP,
    reason=(
        "no live broker: set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port (and "
        "add spark-sql-kafka to the classpath) to run; broker-less floor "
        "= tests/test_replay_resume.py (README: 'Kafka semantics')"
    ),
)


def _produce(spark, topic, payloads):
    df = spark.createDataFrame([(p,) for p in payloads], "value string")
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )


@live
def test_subscribe_roundtrip_parses_and_dead_letters(spark, tmp_path):
    """Produce valid + corrupt payloads, subscribe from earliest with
    availableNow, and assert the parse/dead-letter split a real broker
    read produces matches the recorded-segment harness's."""
    from real_time_fraud_detection_system_spark.streaming.pipeline import (
        kafka_source,
        parse_transactions,
    )

    topic = f"t_{uuid.uuid4().hex[:12]}"
    good = [
        json.dumps(
            {
                "transaction_id": f"T{i}",
                "event_time": "2024-01-01T00:00:00Z",
                "amount": 10.0 + i,
                "features": {"num_items": 1, "merchant_risk": 0.2,
                             "hour": 12.0},
            }
        )
        for i in range(5)
    ]
    _produce(spark, topic, good + ["{not json", '{"no_id": true}'])

    parsed = parse_transactions(
        kafka_source(spark, BOOTSTRAP, topic=topic)
    )
    out = tmp_path / "rows"
    q = (
        parsed.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(str(out)).collect()
    ok = [r for r in rows if not r["_corrupt"]]
    bad = [r for r in rows if r["_corrupt"]]
    assert {r["transaction_id"] for r in ok} == {f"T{i}" for i in range(5)}
    assert len(bad) == 2  # corrupt payloads routed, not dropped


@live
def test_checkpoint_resume_no_duplicates(spark, tmp_path):
    """Two availableNow runs over one checkpoint: messages produced
    between the runs arrive exactly once, already-read offsets never
    re-emit -- the live form of test_replay_resume's resume test."""
    from real_time_fraud_detection_system_spark.streaming.pipeline import (
        kafka_source,
        parse_transactions,
    )

    topic = f"t_{uuid.uuid4().hex[:12]}"
    out, ckpt = tmp_path / "rows", tmp_path / "ckpt"

    def run_once():
        q = (
            parse_transactions(kafka_source(spark, BOOTSTRAP, topic=topic))
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def payload(i):
        return json.dumps(
            {
                "transaction_id": f"T{i}",
                "event_time": "2024-01-01T00:00:00Z",
                "amount": float(i),
                "features": {"num_items": 1, "merchant_risk": 0.1,
                             "hour": 1.0},
            }
        )

    _produce(spark, topic, [payload(i) for i in range(3)])
    run_once()
    _produce(spark, topic, [payload(i) for i in range(3, 5)])
    run_once()
    ids = [
        r["transaction_id"]
        for r in spark.read.parquet(str(out)).collect()
    ]
    assert sorted(ids) == [f"T{i}" for i in range(5)]  # once each


@live
def test_kafka_peek_returns_newest(spark):
    """kafka_peek against the broker: newest-by-broker-timestamp row
    comes back parsed (the live form of test_replay_resume's
    peek_newest test)."""
    from real_time_fraud_detection_system_spark.streaming.pipeline import (
        kafka_peek,
    )

    topic = f"t_{uuid.uuid4().hex[:12]}"
    for i in range(3):
        _produce(
            spark,
            topic,
            [json.dumps(
                {
                    "transaction_id": f"T{i}",
                    "event_time": "2024-01-01T00:00:00Z",
                    "amount": float(i),
                    "features": {"num_items": 1, "merchant_risk": 0.1,
                                 "hour": 1.0},
                }
            )],
        )
        time.sleep(0.05)  # distinct broker timestamps
    rows = kafka_peek(spark, BOOTSTRAP, topic=topic, n=1).collect()
    assert len(rows) == 1 and rows[0]["transaction_id"] == "T2"
