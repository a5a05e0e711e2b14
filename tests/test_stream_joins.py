"""Stream-stream join and native session_window streaming tests."""

import datetime as dt

from real_time_fraud_detection_system_spark.streaming.pipeline import (
    session_window_counts,
    stream_stream_click_purchase_join,
)


def _t(minute):
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def test_stream_stream_join_matches_window(spark, tmp_path):
    csrc, psrc = tmp_path / "clicks", tmp_path / "purch"
    spark.createDataFrame(
        [(_t(0), 1), (_t(4), 1), (_t(20), 1), (_t(3), 2)],
        "click_ts timestamp, c_user_id long",
    ).coalesce(1).write.parquet(str(csrc / "b1"))
    spark.createDataFrame(
        [(_t(5), 1, 10.0), (_t(30), 2, 5.0)],
        "purchase_ts timestamp, p_user_id long, amount double",
    ).coalesce(1).write.parquet(str(psrc / "b1"))

    clicks = spark.readStream.schema(
        "click_ts timestamp, c_user_id long"
    ).parquet(str(csrc / "*"))
    purchases = spark.readStream.schema(
        "purchase_ts timestamp, p_user_id long, amount double"
    ).parquet(str(psrc / "*"))

    rows = []
    q = (
        stream_stream_click_purchase_join(clicks, purchases)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda df, eid: rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {(r["p_user_id"], r["purchase_ts"], r["click_ts"]) for r in rows}
    # user 1 purchase at minute 5 matches clicks at 0 and 4 (window
    # [0, 5)); the minute-20 click is after, user 2's click at minute 3
    # is 27 min before the minute-30 purchase -- outside the horizon
    assert got == {(1, _t(5), _t(0)), (1, _t(5), _t(4))}


def test_native_session_window_closes_sessions(spark, tmp_path):
    src = tmp_path / "src"
    spark.createDataFrame(
        [(_t(0), 1, 1.0), (_t(10), 1, 2.0), (_t(100), 1, 4.0),
         (_t(500), 9, 0.1)],
        "ts timestamp, user_id long, value double",
    ).coalesce(1).write.parquet(str(src / "b1"))

    stream = spark.readStream.schema(
        "ts timestamp, user_id long, value double"
    ).parquet(str(src / "*"))
    rows = []
    q = (
        session_window_counts(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda df, eid: rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    u1 = sorted(
        [r for r in rows if r["user_id"] == 1],
        key=lambda r: r["session_start"],
    )
    # watermark driven by minute-500 event closes both user-1 sessions:
    # [0,10] (2 events) and [100] (1 event)
    assert [r["n_events"] for r in u1] == [2, 1]
    assert u1[0]["session_start"] == _t(0)
    assert abs(u1[0]["total_value"] - 3.0) < 1e-9


def test_stream_stream_join_accepts_unprefixed_user_id(spark, tmp_path):
    """Docstring contract: plain user_id inputs are renamed internally."""
    csrc, psrc = tmp_path / "clicks", tmp_path / "purch"
    spark.createDataFrame(
        [(_t(0), 1), (_t(4), 1)],
        "click_ts timestamp, user_id long",
    ).coalesce(1).write.parquet(str(csrc / "b1"))
    spark.createDataFrame(
        [(_t(5), 1, 10.0)],
        "purchase_ts timestamp, user_id long, amount double",
    ).coalesce(1).write.parquet(str(psrc / "b1"))

    clicks = spark.readStream.schema(
        "click_ts timestamp, user_id long"
    ).parquet(str(csrc / "*"))
    purchases = spark.readStream.schema(
        "purchase_ts timestamp, user_id long, amount double"
    ).parquet(str(psrc / "*"))

    rows = []
    q = (
        stream_stream_click_purchase_join(clicks, purchases)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda df, eid: rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["p_user_id"], r["purchase_ts"], r["click_ts"]) for r in rows}
    assert got == {(1, _t(5), _t(0)), (1, _t(5), _t(4))}
