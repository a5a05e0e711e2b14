"""Scheduled batch jobs over the prediction store (EP3 + T9/T10).

daily_metrics_upsert -- A7: the reference's hourly
  INSERT ... ON CONFLICT (day) DO UPDATE (compute-daily-metrics.py:19-37)
  has no parquet equivalent, so the engine uses dynamic partition
  overwrite keyed by day: recompute affected days, overwrite exactly
  those partitions. Idempotent (run twice -> identical rows) and safe
  under late data (re-running refreshes any day, not just today --
  strictly better than the reference's drop-after-midnight behavior,
  SURVEY.md T3).

dq_checks -- T10: the three assertions from Data_quality_checks.py:18-40
  (freshness >= 1 row / 15 min; zero null ids; fraud rate in [0,1]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def daily_metrics_frame(predictions: DataFrame, days_filter=None) -> DataFrame:
    """A4: the grouped aggregation (COUNT + AVG x3 by day)."""
    df = predictions.withColumn("day", F.to_date("event_time"))
    if days_filter is not None:
        df = df.filter(F.col("day").isin(days_filter))
    return df.groupBy("day").agg(
        F.count("*").alias("num_predictions"),
        F.avg(F.col("prediction").cast("double")).alias("fraud_rate"),
        F.avg("amount").alias("avg_amount"),
        F.avg("proba").alias("avg_proba"),
    )


def daily_metrics_upsert(
    spark: SparkSession, predictions: DataFrame, metrics_dir: str,
    days_filter=None,
) -> None:
    """A7: keyed overwrite of the day partitions. With
    partitionOverwriteMode=dynamic only partitions present in the new
    frame are replaced -- the parquet-native ON CONFLICT (day) DO UPDATE."""
    from ..session import conf_override

    with conf_override(
        spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"
    ):
        (
            daily_metrics_frame(predictions, days_filter)
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(metrics_dir)
        )


class DataQualityError(AssertionError):
    pass


def dq_checks(predictions: DataFrame, now_col=None) -> dict:
    """T10: run the three reference checks, raise DataQualityError on the
    first violation, return the measured values. One aggregation pass --
    the reference runs three separate queries; at scale one scan wins."""
    if now_col is not None:
        anchored = predictions.withColumn("_now", now_col)
    else:
        # deterministic anchor: max event_time, broadcast as a 1-row dim
        # (answered by parquet max stats, not a full scan)
        anchor = predictions.agg(F.max("event_time").alias("_now"))
        anchored = predictions.crossJoin(F.broadcast(anchor))
    row = anchored.agg(
        F.sum(
            (
                F.col("event_time") > F.col("_now") - F.expr("INTERVAL 15 MINUTES")
            ).cast("long")
        ).alias("recent"),
        F.sum(F.col("transaction_id").isNull().cast("long")).alias("null_ids"),
        F.avg(
            F.when(
                F.col("event_time") > F.col("_now") - F.expr("INTERVAL 1 HOUR"),
                F.col("prediction").cast("double"),
            )
        ).alias("fraud_rate_1h"),
    ).first()
    result = {
        "recent_rows": row["recent"] or 0,
        "null_ids": row["null_ids"] or 0,
        "fraud_rate_1h": row["fraud_rate_1h"],
    }
    if result["recent_rows"] < 1:
        raise DataQualityError(f"freshness violated: {result}")
    if result["null_ids"] > 0:
        raise DataQualityError(f"null transaction_ids: {result}")
    fr = result["fraud_rate_1h"]
    if fr is not None and not (0.0 <= fr <= 1.0):
        raise DataQualityError(f"fraud rate out of bounds: {result}")
    return result
