"""End-to-end corpus preparation: the composed pipeline must preserve
every invariant its oracle-checked stages individually guarantee."""

from pyspark.sql import functions as F

from real_time_fraud_detection_system_spark.corpus_pipeline import prepare_corpus
from real_time_fraud_detection_system_spark.operators.dedup import (
    dedup_minhash_clusters,
    dedup_minhash_lsh,
)

SF = "/root/testdata/sf0.001"


def test_prepare_corpus_funnel_and_hygiene(spark, tmp_path):
    out = str(tmp_path / "corpus")
    funnel = prepare_corpus(spark, SF, out)

    # monotone funnel, splits reconcile
    assert (
        funnel["raw_docs"]
        >= funnel["after_quality"]
        >= funnel["after_exact_dedup"]
        >= funnel["after_neardup_dedup"]
        > 0
    )
    assert sum(funnel["splits"].values()) == funnel["after_neardup_dedup"]

    got = spark.read.parquet(out)
    assert got.count() == funnel["after_neardup_dedup"]
    assert set(funnel["splits"]) <= {"train", "val", "test"}

    # exact-dedup invariant: no two output docs share a text
    assert (
        got.groupBy(F.md5("text")).count().filter("count > 1").count() == 0
    )
    # near-dup invariant: output contains at most one doc per cluster,
    # so NO verified near-dup pair survives into the corpus at all
    labels = dedup_minhash_clusters(spark, SF)
    assert (
        got.join(labels, "doc_id")
        .groupBy("cluster_id")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )
    kept = {r["doc_id"] for r in got.select("doc_id").collect()}
    pairs = dedup_minhash_lsh(spark, SF).collect()
    assert not any(p["a_id"] in kept and p["b_id"] in kept for p in pairs)

    # deterministic: a re-run reproduces the identical funnel
    again = prepare_corpus(spark, SF, str(tmp_path / "corpus2"))
    again["out_dir"] = funnel["out_dir"]
    assert again == funnel


def test_prepare_corpus_semantic_stage(spark, tmp_path):
    """semantic=True appends the SemDeDup keep-one pass: the funnel
    records it, the splits reconcile against the FINAL count, and no
    two output docs share a semantic (embedding-direction) cluster --
    on top of the lexical invariants the default pipeline guarantees."""
    from real_time_fraud_detection_system_spark.operators.similarity import (
        semantic_dedup_clusters,
    )

    out = str(tmp_path / "sem_corpus")
    funnel = prepare_corpus(spark, SF, out, semantic=True)

    assert (
        funnel["after_neardup_dedup"]
        >= funnel["after_semantic_dedup"]
        > 0
    )
    assert sum(funnel["splits"].values()) == funnel["after_semantic_dedup"]
    got = spark.read.parquet(out)
    assert got.count() == funnel["after_semantic_dedup"]

    # semantic invariant: at most one survivor per embedding cluster
    sem = semantic_dedup_clusters(spark, SF).select(
        F.col("vec_id").alias("doc_id"), "cluster_id"
    )
    assert (
        got.join(sem, "doc_id")
        .groupBy("cluster_id")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )
    # lexical invariants are untouched by the extra pass
    assert (
        got.groupBy(F.md5("text")).count().filter("count > 1").count() == 0
    )
    labels = dedup_minhash_clusters(spark, SF)
    assert (
        got.join(labels, "doc_id")
        .groupBy("cluster_id")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )
    # deterministic re-run
    again = prepare_corpus(spark, SF, str(tmp_path / "sem2"), semantic=True)
    again["out_dir"] = funnel["out_dir"]
    assert again == funnel
