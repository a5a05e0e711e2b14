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


def _write_base_snapshot(spark, tmp_path, docs):
    base_dir = tmp_path / "base_snap"
    base_dir.mkdir()
    docs.write.parquet(str(base_dir / "documents.parquet"))
    return str(base_dir)


def test_prepare_corpus_incremental_equals_full_rerun(spark, tmp_path):
    """The round-9 verdict's incremental entry point: with a base
    snapshot that is a strict subset of the new dump (add-only), the
    base_snapshot mode must (a) run the census first and record it,
    (b) funnel the ADDED docs' own stage counts, and (c) produce
    byte-identical survivors to a full re-run over the union -- the
    incremental label construction (memoized base pairs + shard probe)
    must be exactly dedup_minhash_clusters over the union."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = docs.filter("CAST(conv(substr(md5(concat('inc:', "
                       "CAST(doc_id AS STRING))), 1, 6), 16, 10) "
                       "AS BIGINT) % 5 > 0")  # ~80% of the dump
    base_dir = _write_base_snapshot(spark, tmp_path, base)

    full = prepare_corpus(spark, SF, str(tmp_path / "full"))
    inc = prepare_corpus(
        spark, SF, str(tmp_path / "inc"), base_snapshot=base_dir
    )

    assert inc["mode"] == "incremental"
    n_added = docs.count() - base.count()
    assert n_added > 0
    assert inc["census"]["added"]["n_docs"] == n_added
    assert inc["census"]["unchanged"]["n_docs"] == base.count()
    assert "removed" not in inc["census"]
    assert inc["added"]["raw"] == n_added
    assert (
        inc["added"]["raw"]
        >= inc["added"]["after_quality"]
        >= inc["added"]["after_exact_dedup"]
        >= inc["added"]["after_neardup_dedup"]
    )

    # the union funnel and the survivors themselves are identical
    for k in ("raw_docs", "after_quality", "after_exact_dedup",
              "after_neardup_dedup", "splits"):
        assert inc[k] == full[k], k
    rows_full = sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "full")).collect()
    )
    rows_inc = sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "inc")).collect()
    )
    assert rows_inc == rows_full


def test_prepare_corpus_incremental_on_changed(spark, tmp_path):
    """A dump with 'changed' mass (re-crawled text) no longer falls
    back (round-10 verdict Next #4): the changed docs' OLD versions
    are tombstoned out of the reused base signature/pair artifacts,
    their NEW versions re-probe like added docs, and the output is
    byte-identical to the full rebuild."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    perturbed = docs.withColumn(
        "text",
        F.expr("CASE WHEN doc_id % 97 = 0 THEN concat(text, ' r10') "
               "ELSE text END"),
    )
    base_dir = _write_base_snapshot(spark, tmp_path, perturbed)

    inc = prepare_corpus(
        spark, SF, str(tmp_path / "fb"), base_snapshot=base_dir
    )
    assert inc["mode"] == "incremental_removals"
    assert inc["census"]["changed"]["n_docs"] == docs.filter(
        "doc_id % 97 = 0"
    ).count()
    full = prepare_corpus(spark, SF, str(tmp_path / "fb_full"))
    for k in ("raw_docs", "after_quality", "after_exact_dedup",
              "after_neardup_dedup", "splits"):
        assert inc[k] == full[k], k
    rows_full = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "fb_full")).collect()
    )
    rows_inc = sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "fb")).collect()
    )
    assert rows_inc == rows_full


def test_prepare_corpus_incremental_removed_changed_added(spark, tmp_path):
    """The general day-2 shape: the base snapshot has docs the new
    dump REMOVED (tombstoned), docs it CHANGED (old version
    tombstoned, new version re-probed), and is missing docs the dump
    ADDED -- all three at once must still price incrementally and
    reproduce the full rebuild byte-for-byte."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # base: 80% of the dump (the rest become 'added'), some texts
    # perturbed (those become 'changed'), plus synthetic docs absent
    # from the dump (those become 'removed')
    kept = docs.filter("doc_id % 5 > 0")
    perturbed = kept.withColumn(
        "text",
        F.expr("CASE WHEN doc_id % 97 = 0 THEN concat(text, ' old') "
               "ELSE text END"),
    )
    ghosts = docs.filter("doc_id % 31 = 0").withColumn(
        "doc_id", F.expr("doc_id + 10000000")
    )
    base = perturbed.unionByName(ghosts)
    base_dir = _write_base_snapshot(spark, tmp_path, base)

    inc = prepare_corpus(
        spark, SF, str(tmp_path / "rca"), base_snapshot=base_dir
    )
    assert inc["mode"] == "incremental_removals"
    assert inc["census"]["removed"]["n_docs"] == ghosts.count()
    assert inc["census"]["changed"]["n_docs"] == kept.filter(
        "doc_id % 97 = 0"
    ).count()
    assert inc["census"]["added"]["n_docs"] == docs.count() - kept.count()

    full = prepare_corpus(spark, SF, str(tmp_path / "rca_full"))
    for k in ("raw_docs", "after_quality", "after_exact_dedup",
              "after_neardup_dedup", "splits"):
        assert inc[k] == full[k], k
    rows_full = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "rca_full")).collect()
    )
    rows_inc = sorted(
        tuple(r) for r in spark.read.parquet(str(tmp_path / "rca")).collect()
    )
    assert rows_inc == rows_full


def test_prepare_corpus_incremental_null_text_counts_as_changed(
    spark, tmp_path
):
    """ADVICE r11: changed-doc detection must be NULL-safe. A base
    snapshot holding NULL text for a doc whose re-crawl has real text
    (or vice versa) must tombstone + re-probe that doc, not silently
    reuse its stale base signature -- `h_new <> h_old` yields NULL
    when either md5 is NULL and drops exactly these rows. Engineered
    so the bug is VISIBLE: the nulled docs are both endpoints of a
    known near-dup pair, so skipping their re-probe loses the pair
    and the funnel diverges from the full rebuild."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pair = dedup_minhash_lsh(spark, SF).limit(1).collect()[0]
    hit_ids = (int(pair["a_id"]), int(pair["b_id"]))
    base = docs.withColumn(
        "text",
        F.expr(f"CASE WHEN doc_id IN {hit_ids} THEN NULL "
               "ELSE text END"),
    )
    base_dir = _write_base_snapshot(spark, tmp_path, base)

    inc = prepare_corpus(
        spark, SF, str(tmp_path / "nullch"), base_snapshot=base_dir
    )
    assert inc["mode"] == "incremental_removals"
    full = prepare_corpus(spark, SF, str(tmp_path / "nullch_full"))
    for k in ("raw_docs", "after_quality", "after_exact_dedup",
              "after_neardup_dedup", "splits"):
        assert inc[k] == full[k], k
    rows_full = sorted(
        tuple(r)
        for r in spark.read.parquet(
            str(tmp_path / "nullch_full")
        ).collect()
    )
    rows_inc = sorted(
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "nullch")).collect()
    )
    assert rows_inc == rows_full
