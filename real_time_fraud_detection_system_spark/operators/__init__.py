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

# Queries whose CODE changed this round (new registrations or rewritten
# internals). The current round's list is the head of PRIORITY (the
# driver re-verifies changed code first) AND a bench-headline
# obligation: tests/test_bench_headline.py asserts every member is in
# bench.py HEADLINE, so anything rewritten for scale gets measured the
# same round it changes (the round-6 lesson: ann_ivf_topk's 521 s
# pre-kernel cost went unmeasured precisely because it sat outside the
# headline). The dict is keyed by ROUND so a forgotten reset is
# DETECTABLE, not silent (ADVICE r9): tests/test_registry.py asserts
# ROUND == 1 + the newest CORRECTNESS_r*.json on disk, so a stale
# round number fails the suite at round start.
ROUND = 11
_ROUND_CHANGED_BY_ROUND: dict[int, list[str]] = {
    # round 10: the five queries freed of the forced corpus-sized
    # doc-map broadcast (round-9 verdict What's wrong #1), plus the
    # ten new round-10 registrations (pricing triad completion, TwoNN,
    # epoch plan, quality drift PSI, label separation, A-Res sampling,
    # the exact PPJoin, BM25, position attribution, session paths,
    # replayed HLL). Kept for the staleness audit trail.
    10: [
        "shard_overlap", "kmv_source_overlap", "contamination_check",
        "crossdoc_ngram_share", "snapshot_novelty",
        "containment_recall",
        "added_dup_against_base", "intrinsic_dim_twonn",
        "source_epoch_plan",
        "snapshot_quality_drift", "fk_integrity_check",
        "label_centroid_separation",
        "weighted_sample_topk",
        "dedup_prefix_filter",
        "bm25_topk",
        "position_attribution",
        "top_session_paths",
        "hll_shingle_cardinality",
    ],
    11: [
        # snapshot_quality_drift: per-bucket PSI terms now quantized
        # to 1e-9 fixed-point BIGINT before the per-source sum
        # (ADVICE r10 -- the repo's integer-before-sum convention);
        # source_epoch_plan: dead Window binding deleted (plan
        # unchanged; re-attested out of caution).
        "snapshot_quality_drift", "source_epoch_plan",
        # NEW round-11 registration: the tombstone/compaction
        # accounting of the persisted dedup index (the registry form
        # of tombstone_dedup_index / live_dedup_index /
        # compact_dedup_index -- the removals leg the incremental
        # ingest story was missing; round-10 verdict Next #4).
        "index_tombstone_stats",
        # NEW round-11 registration: reciprocal-rank fusion of the
        # BM25 lexical ranking and the IVF semantic ranking
        # (integer-exact RRF -- the canonical hybrid-search primitive;
        # round-10 verdict Next #5).
        "hybrid_topk",
        # REWRITTEN for scale: the exact set-similarity join gained
        # PPJoin's positional filter (overlap bound from matching
        # prefix positions) -- 7.8M -> 2.49M verified candidates,
        # 21.9 -> 18.6 s at 100x, recall still 1.0 (purely
        # conservative pruning; brute-force equality re-tested).
        "dedup_prefix_filter",
    ],
}
ROUND_CHANGED = _ROUND_CHANGED_BY_ROUND[ROUND]

PRIORITY = [
    # (a) CHANGED IN ROUND 11 (see _ROUND_CHANGED_BY_ROUND[11]).
    *ROUND_CHANGED,
    # (b) the round-6-verdict cohort -- the 9 oldest standing driver
    #     verdicts (verdict-union histogram after round 10 reads
    #     r6=9, r7=42, r8=47, r9=44, r10=50) -- exactly the ROUND-11
    #     QUEUE promised last round;
    "approx_distinct_users", "approx_value_quantiles",
    "decayed_user_value", "deterministic_split", "stratified_sample",
    "q2_min_cost_supplier", "q11_important_stock",
    "q16_parts_supplier_counts", "q20_excess_stock_suppliers",
    #     then the round-7 cohort in name order as far as the window
    #     reaches (32 of 42; survival_weekly rides slot (c) as the
    #     sessionize rep, and source_token_entropy jumps the name
    #     order as the only round-7 textops query -- the family gate);
    "ann_ivf_topk", "ann_recall_eval", "bigram_lm_score",
    "bloom_prefilter_stats", "chunk_dup_rate", "cluster_safe_split",
    "dau_wau_stickiness", "dedup_apply_stats", "dedup_cluster_density",
    "dedup_containment", "dedup_incremental", "dedup_minhash_clusters",
    "dedup_minhash_lsh", "dedup_signal_crosstab", "doc_chunks",
    "dsir_importance_bins", "embedding_outliers", "event_type_affinity",
    "exact_substring_spans", "ivf_cell_stats", "minhash_lsh_recall",
    "minhash_signatures", "mixture_apply_sample", "moving_avg_revenue",
    "multimodal_meta", "part_cooccurrence_topk", "part_triangles",
    "q12_shipping_delay_classes",
    "source_token_entropy",
    # (c) family representatives for the seven families (a)+(b) leave
    #     uncovered (tests/test_registry.py gate), preferring the
    #     OLDEST standing verdicts: sessionize (r7), anomaly (r8),
    #     metrics (r8), relational (r8), skew (r8), stats (r8),
    #     layout (r10 -- its only member).
    "survival_weekly", "benford_first_digit", "dq_expectations",
    "q10_returned_items", "shuffle_balance_profile",
    "daily_trend_slopes", "layout_pruning_stats",
    # ROUND-12 QUEUE (in priority order): round-12 changed code first,
    # then the round-7 remainder in name order --
    # q13_customer_distribution, q14_promo_revenue, q15_top_supplier,
    # q17_small_qty_revenue,
    # q19_disjunctive_revenue,
    # q22_dormant_high_balance, q8_market_share, q9_profit_by_nation,
    # source_semantic_similarity,
    # split_leakage_check, supplier_pagerank, threshold_sweep --
    # then the round-8 cohort in name order (compute the exact
    # staleness order from the CORRECTNESS_r*.json union at round
    # start).
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
