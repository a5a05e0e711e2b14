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
    # (a) NEW IN ROUND 8 -- no driver verdict exists: the SCD2
    #     dimension-history twin and the point-in-time enrichment that
    #     drives storage.point_in_time_join (the round-7 verdict's
    #     item 7: the temporal-correctness surface of the storage layer
    #     finally under the oracle); plus the Zipf-exponent source
    #     screen and the Chao1 dedup-at-scale estimator (late round-8
    #     registrations);
    "scd2_priority_history", "pit_event_enrichment",
    "zipf_alpha_by_source", "dup_chao1_estimate",
    #     and the SAX-style activity-shape similarity buckets (the
    #     time-series twin of MinHash banding) and the KMV bottom-k
    #     overlap estimator (sketch set-algebra for cross-dump triage);
    "activity_shape_buckets", "activity_shape_matches",
    "shape_match_recall", "kmv_source_overlap",
    # (b) the 29 queries NO driver window has ever checked (round-7
    #     verdict item 2 -- my independent 168/168 sf0.01 run covers
    #     them, but a driver verdict is the contract). shingle_df_curve
    #     and minhash_est_vs_exact double as changed-code coverage for
    #     this round's memo-key refactor (code_token folded into every
    #     memoized build): both route through the signature memo.
    "minhash_est_vs_exact", "shingle_df_curve", "dedup_keep_best",
    "dq_expectations", "emb_quantize_int8", "kmeans_fixedpoint",
    "ivf_probe_sweep", "token_fertility", "token_concentration_bins",
    "packing_budget_sweep", "peak_concurrency",
    "event_transition_matrix", "conversion_latency_buckets",
    "gapfill_hourly", "rfm_segments", "velocity_profile",
    "calibration_bins", "skyline_parts", "supplier_bfs_hops",
    "bootstrap_fraud_ci", "benford_first_digit",
    "seasonal_hour_baseline", "cusum_changepoints", "risk_lift_matrix",
    "time_weighted_value", "last_touch_attribution",
    "daily_value_percentiles", "daily_trend_slopes",
    "event_comovement_corr",
    # (c) family representatives for the six families (b) leaves
    #     uncovered (tests/test_registry.py gate), preferring the
    #     OLDEST standing verdicts: relational (r4), multimodal (r5),
    #     windows (r5), skew (r5), sketches (r6), layout (r7 -- its
    #     only member);
    "q4_order_priority_exists", "multimodal_frames",
    "orders_pivot_status", "shuffle_balance_profile",
    "countmin_heavy_hitters", "layout_pruning_stats",
    # (d) oldest-verdict backfill: the round-4-verdict remainder
    #     (ann_lsh_bucketed is ALSO the bench session-aging exhibit --
    #     a fresh driver verdict on it this round pins that its values
    #     never moved while its in-session timing did), then the
    #     round-5-verdict cohort in registry order.
    "recent_topk", "ann_lsh_bucketed", "q18_large_volume_customers",
    "q5_local_supplier_volume", "q6_revenue_change",
    "q10_returned_items", "top_orders_per_customer",
    # ROUND-9 QUEUE (in priority order): customer_rollup,
    # order_priority_count, customers_without_orders,
    # nations_with_both,
    # segment_distinct_nations and part_price_buckets (round-5
    # verdicts, displaced by the three late round-8 registrations
    # above), then the rest of the
    # round-5-verdict cohort -- predictions_profile, dedup_exact,
    # dedup_ngram_jaccard, simhash_fingerprints, dedup_simhash,
    # dedup_simhash16, dedup_clusters, dedup_clusters_wide,
    # dup_rate_by_source, ann_cosine_topk, embedding_near_dup,
    # text_stats, lang_id_heuristic, doc_fingerprint,
    # corpus_token_stats, bpe_token_stats, tfidf_top_terms,
    # lang_mismatch_rate, contamination_check, source_mixture_plan,
    # session_summary, weekly_retention_cohorts, part_rankings,
    # value_percentiles, wire_format_roundtrip, event_gap_buckets,
    # training_frame_det, logit_score, q21_sole_late_supplier,
    # value_drift_psi -- then the round-6 cohort.
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
