"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` -- flagship query smoke check at sf0.001.
``queries()``    -- every implemented operator from SURVEY.md section 2,
                    (spark, sf_dir) -> DataFrame.
``oracle_sql()`` -- matching DuckDB SQL per query (omitted only for
                    genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_fraud_detection_system_spark.operators import (  # noqa: E402
    all_oracles,
    all_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing summary
    (scan -> pushed filter -> hash agg -> sort), the same shape as the
    reference's daily-metrics job (compute-daily-metrics.py:19-37)."""
    from real_time_fraud_detection_system_spark.operators.relational import (
        q1_pricing_summary,
    )

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
