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


def test_token_counts_udtf_matches_codegen_path(spark):
    """The UDTF escape hatch must agree exactly with the codegen'd
    explode+groupBy it would replace, via a SQL lateral join."""
    from real_time_fraud_detection_system_spark.functions.udtfs import (
        register as register_udtf,
    )

    register_udtf(spark)
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "x x x"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("_udtf_docs")
    got = spark.sql(
        "SELECT d.doc_id, t.token, t.n FROM _udtf_docs d,"
        " LATERAL token_counts(d.text) t"
    ).collect()
    want = (
        docs.selectExpr("doc_id", "explode(split(text, ' ')) AS token")
        .filter("token != ''")
        .groupBy("doc_id", "token")
        .count()
        .collect()
    )
    assert sorted((r["doc_id"], r["token"], r["n"]) for r in got) == sorted(
        (r["doc_id"], r["token"], r["count"]) for r in want
    )
    assert {r["doc_id"] for r in got} == {1, 2}  # null/empty yield nothing


def test_fraudgen_stream_matches_batch_source(spark, tmp_path):
    """The streaming form must deliver exactly the batch source's rows
    (bit-identical -- both are pure functions of id), micro-batched by
    rowsPerBatch and stopping at maxRows."""
    from real_time_fraud_detection_system_spark.sources.datasource import (
        register,
    )

    register(spark)
    got = []
    q = (
        spark.readStream.format("fraudgen")
        .option("rowsPerBatch", "40")
        .option("maxRows", "100")
        .option("partitions", "4")
        .load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(lambda b, _: got.extend(b.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    want = (
        spark.read.format("fraudgen")
        .option("n", "100")
        .option("partitions", "4")
        .load()
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_fraudgen_stream_checkpoint_resume_no_duplicates(spark, tmp_path):
    """Stop mid-stream, restart from the checkpoint with a higher
    maxRows: the union must be every id exactly once (offset-ranged
    replay, the Kafka-like contract)."""
    from real_time_fraud_detection_system_spark.sources.datasource import (
        register,
    )

    register(spark)
    ck = str(tmp_path / "ck")
    got = []

    def run(max_rows):
        q = (
            spark.readStream.format("fraudgen")
            .option("rowsPerBatch", "25")
            .option("maxRows", str(max_rows))
            .load()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ck)
            .foreachBatch(lambda b, _: got.extend(b.collect()))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run(60)
    n_first = len(got)
    assert 0 < n_first <= 60
    run(110)
    ids = [r["id"] for r in got]
    assert len(ids) == len(set(ids)), "duplicate ids across restart"
    assert sorted(ids) == list(range(110))
