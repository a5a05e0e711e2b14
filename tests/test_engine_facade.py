"""Engine facade: one object covering the reference's whole surface."""

from real_time_fraud_detection_system_spark.engine import Engine


def test_engine_sql_and_query(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    assert eng.sql("SELECT count(*) AS n FROM orders").first()["n"] > 0
    assert "revenue" in eng.query("q6_revenue_change").columns
    assert "dedup_exact" in eng.queries()


def test_engine_score_one_heuristic(spark, sf_dir):
    eng = Engine(spark, sf_dir)  # no registry -> heuristic fallback
    out = eng.score_one(
        {"transaction_id": "t1", "amount": 2000.0, "features": {}}
    )
    assert out["prediction"] == 1 and out["proba"] == 1.0
    out = eng.score_one(
        {"transaction_id": "t2", "amount": 3.0, "features": {}}
    )
    assert out["prediction"] == 0 and out["proba"] == 0.05


def test_engine_dq_and_metrics(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    eng = Engine(spark, sf_dir)
    ev = eng.table("events")
    preds = ev.select(
        F.col("ts").alias("event_time"),
        F.col("event_id").cast("string").alias("transaction_id"),
        F.col("value").alias("amount"),
        (F.col("value") > 100).cast("int").alias("prediction"),
        F.lit(0.5).alias("proba"),
    )
    eng.daily_metrics_upsert(preds, str(tmp_path / "metrics"))
    metrics = spark.read.parquet(str(tmp_path / "metrics"))
    assert metrics.count() > 0
