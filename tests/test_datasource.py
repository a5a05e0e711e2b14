"""Custom Python DataSource: the fraudgen source must agree BIT-FOR-BIT
with the Catalyst SQL twin (mlqueries._frame_sql), which the DuckDB
oracle already value-gates -- three engines, one frame."""

from real_time_fraud_detection_system_spark.operators.mlqueries import (
    _frame_sql,
)
from real_time_fraud_detection_system_spark.sources.datasource import (
    register,
)

N = 500


def test_fraudgen_matches_sql_twin(spark):
    register(spark)
    ds = (
        spark.read.format("fraudgen")
        .option("n", str(N))
        .option("partitions", "4")
        .load()
    )
    sql_twin = spark.sql(
        _frame_sql("spark", f"SELECT id FROM range({N})")
    )
    got = sorted(tuple(r) for r in ds.collect())
    want = sorted(tuple(r) for r in sql_twin.collect())
    assert len(got) == N
    assert got == want  # every float, every label, bit-identical


def test_fraudgen_partitions_cover_range_exactly(spark):
    register(spark)
    ds = (
        spark.read.format("fraudgen")
        .option("n", "101")
        .option("partitions", "7")
        .load()
    )
    ids = sorted(r["id"] for r in ds.collect())
    assert ids == list(range(101))
    assert ds.rdd.getNumPartitions() == 7
