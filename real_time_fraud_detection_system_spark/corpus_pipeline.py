"""End-to-end training-corpus preparation: the composition a user
actually runs over a raw document dump, built ENTIRELY from the
oracle-checked operator stages (each stage's semantics is individually
value-matched against DuckDB by the registry queries named below).

    raw documents
      -> quality gate        (textops.corpus_quality_gate's predicate)
      -> exact dedup         (dedup.dedup_exact's md5 keep-min-id rule)
      -> near-dup keep-one   (dedup.dedup_minhash_clusters labels)
      -> cluster-safe split  (dedup.cluster_safe_split's assignment)
      -> split-partitioned parquet

The reference has no corpus surface at all; this is the capstone of the
brief's LLM-pipeline mandate -- SURVEY.md par. 2.9's dedup/split rows
composed into one artifact.

Design decisions that matter at 100 TB:
  * near-dup CLUSTER LABELS are computed over the FULL corpus (before
    the quality/exact filters), so the keep-one representative is the
    min-id KEPT member of each cluster -- filtering first would split
    clusters across filter boundaries and resurrect duplicates.
  * the split key is the cluster id, so no near-dup pair straddles
    train/val/test in the output BY CONSTRUCTION (the
    split_leakage_check -> cluster_safe_split story).
  * one write, partitioned by split: downstream readers prune to their
    split from directory structure alone.
  * the returned funnel (exact counts per stage) is the run's audit
    record; write it next to the data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators.dedup import _doc_split_spark, dedup_minhash_clusters
from .operators.textops import QUALITY_KEEP, _quality_expr


def prepare_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    quality_keep: float = QUALITY_KEEP,
) -> dict:
    """Run the full prep over ``sf_dir``'s documents table, write the
    surviving docs (with their split label) to ``out_dir`` partitioned
    by split, and return the exact stage funnel."""
    docs = load_table(spark, sf_dir, "documents")
    labels = dedup_minhash_clusters(spark, sf_dir)  # doc_id, cluster_id

    # round(quality, 6) BEFORE the comparison: the oracle-checked
    # corpus_quality_gate counts kept docs on the 6-dp-rounded score,
    # so a raw-score comparison would diverge from the stage's own
    # semantics on boundary docs (raw 0.49999995 rounds to kept)
    staged = (
        docs.join(labels, "doc_id")
        .withColumn(
            "quality_ok",
            F.expr(f"round({_quality_expr('spark')}, 6) >= {quality_keep}"),
        )
        .withColumn("text_md5", F.md5("text"))
        .cache()  # shared by the filter chain AND the funnel counts;
        # unpersisted after the funnel is materialized below
    )
    # exact dedup: keep the min doc_id per identical text, but only
    # among quality survivors (dropped docs must not claim the slot)
    kept_q = staged.filter("quality_ok")
    exact_rep = kept_q.groupBy("text_md5").agg(
        F.min("doc_id").alias("exact_keep_id")
    )
    after_exact = kept_q.join(
        exact_rep,
        (kept_q["text_md5"] == exact_rep["text_md5"])
        & (kept_q["doc_id"] == exact_rep["exact_keep_id"]),
    ).select(kept_q["*"])
    # near-dup keep-one: the surviving min doc_id per cluster
    cluster_rep = after_exact.groupBy("cluster_id").agg(
        F.min("doc_id").alias("cluster_keep_id")
    )
    survivors = (
        after_exact.join(
            cluster_rep,
            (after_exact["cluster_id"] == cluster_rep["cluster_id"])
            & (after_exact["doc_id"] == cluster_rep["cluster_keep_id"]),
        )
        .select(after_exact["*"])
        .withColumn("split", F.expr(_doc_split_spark("cluster_id")))
        .select("doc_id", "text", "lang", "source", "n_chars", "split")
        .cache()
    )
    (
        survivors.write.mode("overwrite")
        .partitionBy("split")
        .parquet(out_dir)
    )
    funnel = {
        "raw_docs": docs.count(),
        "after_quality": kept_q.count(),
        "after_exact_dedup": after_exact.count(),
        "after_neardup_dedup": survivors.count(),
        "splits": {
            r["split"]: r["n"]
            for r in survivors.groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        },
        "out_dir": out_dir,
    }
    survivors.unpersist()
    staged.unpersist()
    with open(os.path.join(out_dir, "_funnel.json"), "w") as fh:
        json.dump(funnel, fh, indent=2, sort_keys=True)
    return funnel
