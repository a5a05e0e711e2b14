"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query seconds.

Execution is forced with the noop sink (full plan runs, nothing
collected to the driver, no output I/O in the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_fraud_detection_system_spark.operators import all_queries
from real_time_fraud_detection_system_spark.session import (
    cpu_count,
    default_sf_dir,
    get_spark,
)

# Headline set: relational core + every LLM-pipeline operator family
# (dedup, similarity, text, multimodal) + reference analytics. The
# quadratic verification primitives (pairwise ngram/simhash) are not
# headline -- their scale paths (minhash_lsh, lsh_bucketed) are.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_change",
    "q10_returned_items",
    "q7_volume_shipping",
    "q18_large_volume_customers",
    "top_orders_per_customer",
    "daily_metrics",
    "hourly_timeseries",
    "recent_topk",
    "heuristic_score",
    "logit_score",
    "user_sessions",
    "asof_click_before_purchase",
    "clicks_before_errors",
    "dedup_exact",
    "salted_value_by_type",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_clusters_wide",
    "text_stats",
    "corpus_token_stats",
    "repetition_stats",
    "sequence_packing",
    "contamination_check",
    "q21_sole_late_supplier",
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "multimodal_features",
    "multimodal_frames",
    # round-5 additions
    "tfidf_top_terms",
    "semantic_dedup_clusters",
    "dedup_minhash_clusters",
    "weekly_retention_cohorts",
    "source_mixture_plan",
    "value_drift_psi",
    "lang_mismatch_rate",
    "predictions_profile",
    "event_gap_buckets",
    "shuffle_balance_profile",
    # round-6 additions (q20 joined after its semi-join pushdown fix
    # so the plan change stays measured round-over-round)
    "dedup_incremental",
    "split_leakage_check",
    "pii_scrub_stats",
    "embedding_outliers",
    "bigram_lm_score",
    "q20_excess_stock_suppliers",
    # round-6 late additions: ann_ivf_topk enters the headline with its
    # kernelized assignment (its pre-kernel 100x cost -- 521 s -- went
    # unmeasured precisely because it sat outside this list; anything
    # rewritten for scale belongs HERE so regressions stay visible)
    "ann_ivf_topk",
    "ann_recall_eval",
    "crossdoc_ngram_share",
    "supplier_pagerank",
    "dedup_containment",
    # round-6 continuation additions
    "token_concentration_bins",
    "cluster_safe_split",
    "minhash_lsh_recall",
    "layout_pruning_stats",
    "kmeans_fixedpoint",
    "rfm_segments",
    "dq_expectations",
    "join_blowup_probe",
    "source_token_entropy",
    "bloom_prefilter_stats",
    "countmin_heavy_hitters",
    "skyline_parts",
    "supplier_bfs_hops",
    "exact_median_by_type",
    "event_comovement_corr",
    "activity_islands",
    "last_touch_attribution",
    "daily_value_percentiles",
    "ann_knn_join",
    "daily_trend_slopes",
    "part_cooccurrence_topk",
    "time_weighted_value",
    "fk_integrity_check",
    # round-7 additions: the two new corpus operators, plus
    # dedup_signal_crosstab (now riding the sig/pairs/semlabels memos
    # -- rewritten-for-scale queries belong here so regressions show)
    "exact_substring_spans",
    "dsir_importance_bins",
    "dedup_signal_crosstab",
    "token_fertility",
    "shingle_df_curve",
    "dedup_keep_best",
    "packing_budget_sweep",
    "minhash_est_vs_exact",
]


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_streaming_ingest(spark, seconds: int = 20) -> float:
    """Sustained scored-events throughput (BASELINE target >= 2000 ev/s):
    rate source -> dedup -> heuristic score -> counted foreachBatch sink.
    eps is measured from stream start to the LAST COMMITTED batch, so a
    trailing in-flight batch cut off by stop() doesn't zero the number
    (micro-batches run seconds at this rate on a loaded machine)."""
    import tempfile

    from real_time_fraud_detection_system_spark.sources.generators import (
        transactions_stream,
    )
    from real_time_fraud_detection_system_spark.streaming.pipeline import (
        scored_stream,
    )

    counts = {"n": 0, "t_last": None}

    def count_batch(batch_df, epoch_id):
        counts["n"] += batch_df.count()
        counts["t_last"] = time.time()

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            scored_stream(transactions_stream(spark, rows_per_second=1000000))
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(count_batch)
            .trigger(processingTime="1 seconds")
            .start()
        )
        t0 = time.time()
        time.sleep(seconds)
        # under heavy host contention the first micro-batch can outlive
        # the whole window (observed: eps recorded 0.0); extend rather
        # than record a number that says "broken" when it means "busy"
        extra = 0
        while counts["n"] == 0 and extra < 40:
            time.sleep(10)
            extra += 10
        q.stop()
    if not counts["n"] or counts["t_last"] is None:
        return 0.0
    return counts["n"] / (counts["t_last"] - t0)


def main() -> None:
    t_start = time.time()
    sf_dir = default_sf_dir()
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # local-bench scan parallelism: the sf0.1 tables are single ~1-10 MB
    # parquet files, which at the cluster-sane 128 MB default arrive as
    # ONE input split each and serialize every scan onto one core. 1 MB
    # splits spread them; a real cluster keeps the default (its files
    # are file-per-partition and 128 MB-sized to begin with).
    spark = get_spark(
        "bench",
        cpus=cpu_count(),
        extra_conf={"spark.sql.files.maxPartitionBytes": str(1024 * 1024)},
    )
    queries = all_queries()

    # JVM/codegen warmup outside the measurement, plus a trivial
    # mapInPandas pass so Python-worker spawn (32 procs) is not billed
    # to the first pandas-stage query
    run_query(queries["q6_revenue_change"](spark, sf_dir))
    import pandas as _pd  # noqa: F401

    spark.range(64, numPartitions=cpu_count()).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # best-of-2 per query: the first run pays codegen/JIT compile and is
    # exposed to machine noise; the min is the reproducible number. One
    # protocol for every measured suite -- sf0.1 and sf1 numbers must
    # stay comparable.
    def run_suite(dir_: str, deadline: float | None = None,
                  runs: int = 2) -> dict[str, float]:
        """deadline (abs epoch seconds): between queries, if the clock
        has passed it, remaining queries record -1 ("not run") instead
        of blocking the harness window -- a partial suite with an
        explicit marker beats a bench line that never prints."""
        out: dict[str, float] = {}
        for name in HEADLINE:
            if deadline is not None and time.time() > deadline:
                out[name] = -1.0
                continue
            best = float("inf")
            for _ in range(runs):
                t0 = time.time()
                run_query(queries[name](spark, dir_))
                best = min(best, time.time() - t0)
            out[name] = round(best, 3)
            # operators that cache intermediates (dedup, contamination)
            # must not leave them pinned: accumulated caches shift later
            # queries' GC behavior and make run N depend on runs 1..N-1
            spark.catalog.clearCache()
        return out

    timings = run_suite(sf_dir)
    # full-precision per-query detail for the gate scale goes out on its
    # own line, same shape as the scale sections below
    print(json.dumps({
        "scale_section": f"sf{sf}",
        "queries": timings,
        "sf": float(sf),
    }), flush=True)

    ingest_eps = bench_streaming_ingest(spark)

    result = {
        "metric": "headline_suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        # 2 decimals: the contract line has a hard size budget (below)
        # and 10 ms resolution is noise at these runtimes anyway
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": float(sf),
        "streaming_ingest_eps": round(ingest_eps, 1),
    }

    # Scale validation: run the suite over whichever replica datasets
    # exist (built with tools/make_scale_data.py): sf1 = 10x sf0.1,
    # sf10 = 100x. Best-of-2 like the main suite (the shared host's
    # wall-clock noise swamps single passes); split sizes grow with the
    # data -- the 1 MB local knob would shred the larger files into
    # thousands of scheduling-dominated tasks.
    repo = os.path.dirname(os.path.abspath(__file__))
    scale_sections = [
        # (label, dir, sf, split bytes, elapsed budget s, runs/query).
        # The 100x section runs each query ONCE: at 74 headline queries
        # best-of-2 blew past the old 900 s budget on a slow-host day
        # and 22 queries recorded -1; isolated best-of-2 at 100x lives
        # in tools/scale_sweep.py where a kill cannot truncate the
        # contract line.
        ("sf1", os.environ.get("SPARK_GRAFT_SF1_DIR",
                               os.path.join(repo, ".scale/sf1")),
         1.0, 16 * 1024 * 1024, 900, 2),
        ("sf10", os.environ.get("SPARK_GRAFT_SF10_DIR",
                                os.path.join(repo, ".scale/sf10")),
         10.0, 64 * 1024 * 1024, 1800, 1),
    ]
    for label, dir_, sf_val, split, budget_s, runs in scale_sections:
        if not os.path.isdir(dir_):
            continue
        # skip gracefully when earlier sections already burned the wall
        # clock (host-noise storm): a truncated-by-timeout bench line
        # is worse than a bench line that says the scale section was
        # skipped and why
        if time.time() - t_start > budget_s:
            result[f"{label}_skipped"] = (
                f"suite at {round(time.time() - t_start)}s elapsed "
                "(host contention); scale section skipped to stay "
                "inside the harness window"
            )
            continue
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
        # hard mid-suite stop: a single pathological query at 100x data
        # must not eat the whole harness window (-1 marks "not run")
        timings_s = run_suite(dir_, deadline=t_start + budget_s + 600,
                              runs=runs)
        ran = {k: v for k, v in timings_s.items() if v >= 0}
        # per-query scale detail goes out IMMEDIATELY as its own JSON
        # line (live progress + the full-precision evidence record).
        # The FINAL contract line stays COMPACT: stuffing all per-query
        # dicts of every scale into it grew it past ~8 KB in rounds 4
        # and 6 and the harness recorded parsed=null both times, while
        # round 5's ~4 KB line parsed -- so per scale only totals,
        # n_skipped, and the worst-5 ride the contract line, and a hard
        # size budget below enforces it.
        print(json.dumps({
            "scale_section": label,
            "queries": timings_s,
            "sf": sf_val,
        }), flush=True)
        worst5 = dict(sorted(ran.items(), key=lambda kv: -kv[1])[:5])
        result[label] = {
            "value": round(sum(ran.values()), 3),
            "n_queries": len(timings_s),
            "n_skipped": len(timings_s) - len(ran),
            "sf": sf_val,
            "worst5": {k: round(v, 2) for k, v in worst5.items()},
        }

    # hard budget on the contract line: stay well under the ~8 KB size
    # that failed to parse, with margin for future suite growth. If the
    # sf0.1 queries dict ever pushes past it, shed the fastest entries
    # (full detail already went out on the sf0.1 scale_section line)
    # and say how many were shed.
    line = json.dumps(result)
    if len(line) > 4000:
        by_cost = sorted(result["queries"].items(), key=lambda kv: -kv[1])
        n_total = len(by_cost)
        while len(line) > 4000 and len(by_cost) > 5:
            by_cost = by_cost[:-5]
            result["queries"] = dict(by_cost)
            result["queries_shed"] = n_total - len(by_cost)
            line = json.dumps(result)
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
