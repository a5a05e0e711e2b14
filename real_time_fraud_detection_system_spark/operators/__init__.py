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
# internals). This list is the head of PRIORITY (the driver re-verifies
# changed code first) AND a bench-headline obligation: tests/
# test_bench_headline.py asserts every member is in bench.py HEADLINE,
# so anything rewritten for scale gets measured the same round it
# changes (the round-6 lesson: ann_ivf_topk's 521 s pre-kernel cost
# went unmeasured precisely because it sat outside the headline).
# RESET this list at the START of each round (members keep their
# HEADLINE seats -- rule 3 -- but only current-round changes belong
# here), then refill it as code changes land.
ROUND_CHANGED = [
    "containment_recall", "pit_event_enrichment",
    "kmv_source_overlap", "shard_overlap",
    # new round-9 registrations: the banding-parameter pricing table,
    # the int8-retrieval recall gate, and the dump-over-dump diff
    # census + its shingle-level novelty companion
    "lsh_band_sweep", "ann_int8_recall", "corpus_snapshot_diff",
    "snapshot_novelty",
]

PRIORITY = [
    # (a) CHANGED IN ROUND 9 -- code touched since the round-8 window,
    #     so their standing verdicts describe superseded code:
    #     containment_recall is NEW (the measured-recall twin for the
    #     df-capped containment candidacy -- round-8 verdict missing
    #     item 3); pit_event_enrichment was rewritten to the repo's
    #     fixed-point cross-engine sum convention (ADVICE r8 medium);
    #     shard_overlap and kmv_source_overlap now share the memoized
    #     source-shingle census + pairwise-overlap artifacts (round-8
    #     verdict item 2); lsh_band_sweep (the table that PICKS the
    #     banding -- recall + verify-cost per (bands, rows) config) and
    #     ann_int8_recall (retrieval recall@k of int8-quantized
    #     vectors, the retrieval side of emb_quantize_int8's
    #     compression audit) are NEW this round.
    *ROUND_CHANGED,
    # (b) the round-5-verdict cohort, stale per round-8 verdict item 1:
    #     every one has a green verdict ever, but the dedup/textops/
    #     similarity modules were rewritten since round 5 (signature
    #     memoization, SimHash refactor, Arrow kernels) -- their latest
    #     driver verdicts predate the code they now run. Exactly the
    #     ROUND-9 QUEUE order promised last round.
    "customer_rollup", "order_priority_count",
    "customers_without_orders", "nations_with_both",
    "segment_distinct_nations", "part_price_buckets",
    "predictions_profile", "dedup_exact", "dedup_ngram_jaccard",
    "simhash_fingerprints", "dedup_simhash", "dedup_simhash16",
    "dedup_clusters", "dedup_clusters_wide", "dup_rate_by_source",
    "ann_cosine_topk", "embedding_near_dup", "text_stats",
    "lang_id_heuristic", "doc_fingerprint", "corpus_token_stats",
    "bpe_token_stats", "tfidf_top_terms", "lang_mismatch_rate",
    "contamination_check", "source_mixture_plan", "session_summary",
    "weekly_retention_cohorts", "part_rankings", "value_percentiles",
    "wire_format_roundtrip", "event_gap_buckets", "training_frame_det",
    "logit_score", "q21_sole_late_supplier", "value_drift_psi",
    # (c) family representatives for the four families (a)+(b) leave
    #     uncovered (tests/test_registry.py gate), preferring the
    #     OLDEST standing verdicts: multimodal (r6), skew (r6),
    #     stats (r6), layout (r8 -- its only member);
    "multimodal_features", "salted_value_by_type", "activity_islands",
    "layout_pruning_stats",
    # (d) oldest-verdict filler: the round-6-verdict cohort in registry
    #     order (null_id_check and windowed_rates were displaced by the
    #     two late round-9 registrations above -- they head the queue).
    "q3_shipping_priority", "props_json_stats",
    # ROUND-10 QUEUE (in priority order): round-10 changed code first,
    # then daily_metrics, freshness_check, null_id_check and
    # windowed_rates (displaced round-6 verdicts), then the rest of
    # the round-6-verdict cohort -- hourly_timeseries,
    # tumbling_15min, heuristic_score, feature_extract,
    # customer_blocking_er, ann_knn_join, semantic_dedup_clusters,
    # pii_scrub_stats, corpus_quality_gate, repetition_stats,
    # sequence_packing, vocab_coverage, user_sessions,
    # conversion_funnel, multimodal_resize, unpivot_daily_metrics,
    # cube_region_segment, lapsed_customers_except,
    # parts_above_brand_avg, grouping_sets_summary,
    # asof_click_before_purchase, clicks_before_errors,
    # approx_distinct_users, approx_value_quantiles,
    # decayed_user_value, deterministic_split, stratified_sample,
    # q7_volume_shipping, q2_min_cost_supplier, q11_important_stock,
    # q16_parts_supplier_counts, q20_excess_stock_suppliers --
    # then the round-7 cohort.
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
