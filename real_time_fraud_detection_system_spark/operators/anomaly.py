"""Grouped-map pandas operator: per-user robust anomaly scores.

The batch ``applyInPandas`` shape (one Arrow frame per group in, one
frame out) -- the API for per-entity model-ish logic that built-in
aggregates can't express but that must still scale: groups are
distributed by the groupBy shuffle, each executor sees whole groups,
nothing touches the driver. Here the kernel is numpy median/MAD
(robust z-score; |z| > 3 flags an outlier) -- the classic fraud-ish
per-account baseline the reference's per-event threshold (main.py:178)
cannot provide.

Oracle: identical math in DuckDB SQL (median/MAD via quantile_cont,
one self-join). Both engines interpolate medians the same way
(numpy.median == quantile_cont 0.5 linear interpolation), and the final
score is rounded before the threshold compare, so flags agree exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..catalog import load_table

MAD_K = 1.4826  # normal-consistency constant
Z_FLAG = 3.0
EPS = 1e-9

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("robust_z", T.DoubleType()),
        T.StructField("is_outlier", T.IntegerType()),
    ]
)


def _score_group(pdf: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    med = float(np.median(pdf["value"]))
    mad = float(np.median(np.abs(pdf["value"] - med)))
    z = (pdf["value"] - med) / (MAD_K * mad + EPS)
    z = z.round(4)
    return pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "event_id": pdf["event_id"],
            "value": pdf["value"],
            "robust_z": z,
            "is_outlier": (z.abs() > Z_FLAG).astype("int32"),
        }
    )


def user_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event robust z vs the user's own value distribution."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    return (
        ev.groupBy("user_id")
        .applyInPandas(_score_group, ANOMALY_SCHEMA)
        .orderBy("event_id")
    )


USER_ANOMALIES_SQL = f"""
WITH med AS (
  SELECT user_id, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
),
mad AS (
  SELECT e.user_id, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (user_id)
  GROUP BY 1
)
SELECT e.user_id, e.event_id, e.value,
       round((e.value - m.med) / ({MAD_K} * d.mad + {EPS}), 4) AS robust_z,
       CAST(abs(round((e.value - m.med) / ({MAD_K} * d.mad + {EPS}), 4))
            > {Z_FLAG} AS INT) AS is_outlier
FROM events e
JOIN med m USING (user_id)
JOIN mad d USING (user_id)
ORDER BY event_id
"""


QUERIES = {"user_value_anomalies": user_value_anomalies}
ORACLE = {"user_value_anomalies": USER_ANOMALIES_SQL}
