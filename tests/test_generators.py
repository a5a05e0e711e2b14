"""S1/M1 generator distribution tests (SURVEY.md section 5.3)."""

import math

from pyspark.sql import functions as F

from real_time_fraud_detection_system_spark.sources.generators import (
    training_frame,
    transactions_batch,
)


def test_transactions_schema_and_ranges(spark):
    df = transactions_batch(spark, 2000, seed=7)
    row = df.agg(
        F.count("*").alias("n"),
        F.countDistinct("transaction_id").alias("ids"),
        F.min("features.num_items").alias("min_items"),
        F.min("features.merchant_risk").alias("min_risk"),
        F.max("features.merchant_risk").alias("max_risk"),
        F.min("amount").alias("min_amount"),
    ).first()
    assert row["n"] == 2000
    assert row["ids"] == 2000  # uuid4 unique
    assert row["min_items"] >= 1  # int(max(1, N(2,1)))
    assert 0.0 <= row["min_risk"] and row["max_risk"] <= 1.0
    assert row["min_amount"] > 0.0  # lognormal support


def test_transactions_lognormal_body(spark):
    # median of lognormal(3, 1) is e^3 ~ 20.1; spikes shift the mean but
    # barely move the median. Allow a generous band.
    df = transactions_batch(spark, 20000, seed=11)
    med = df.approxQuantile("amount", [0.5], 0.01)[0]
    assert math.exp(3) * 0.8 < med < math.exp(3) * 1.25


def test_transactions_spike_rate(spark):
    # ~5% of amounts are multiplied by U(5, 20); detect via the heavy tail
    df = transactions_batch(spark, 20000, seed=13)
    q95 = df.approxQuantile("amount", [0.95], 0.005)[0]
    q99 = df.approxQuantile("amount", [0.99], 0.005)[0]
    assert q99 > q95 * 2  # spike tail well beyond the lognormal body


def test_training_frame_label_recipe(spark):
    df = training_frame(spark, 20000, seed=42).cache()
    rate = df.agg(F.avg("label")).first()[0]
    # sigmoid(0.002*E[amount] + 1.5*E[risk] - 2.5) ~ sigmoid(-1.7) ~ 0.15;
    # heavy amount tail pushes it up. Reference observes ~0.2 +- a lot.
    assert 0.08 < rate < 0.40
    # risk monotonicity: high merchant_risk must raise the fraud rate
    hi = df.filter("merchant_risk > 0.8").agg(F.avg("label")).first()[0]
    lo = df.filter("merchant_risk < 0.2").agg(F.avg("label")).first()[0]
    assert hi > lo
    df.unpersist()


def test_training_frame_deterministic(spark):
    a = training_frame(spark, 500, seed=42).agg(F.sum("amount")).first()[0]
    b = training_frame(spark, 500, seed=42).agg(F.sum("amount")).first()[0]
    assert a == b
