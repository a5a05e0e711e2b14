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
    for name in ("metrics", "dedup", "similarity", "textops", "corpusops", "sessionize", "multimodal", "windows", "temporal", "mlqueries", "tpch_extra", "skew", "anomaly"):
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
    # (a) changed in round 5 (no verdict on the new code): ann_ivf_topk
    #     (sqrt(n)-rate centroid sample, oracle changed with it),
    #     dedup_clusters_wide (hybrid connected-components dispatch; its
    #     rollup dup_rate_by_source rides the same path), and
    #     multimodal_features (packaged P6 decoder now runs a real
    #     decode; oracle changed with it). New in round 5 (no verdict
    #     yet): per-doc tf-idf keywords, SemDeDup-style embedding
    #     clusters, the MinHash-path cluster stage, cohort retention,
    #     the domain-mixture sampling planner, and PSI value-drift.
    "tfidf_top_terms", "semantic_dedup_clusters", "dedup_minhash_clusters",
    "weekly_retention_cohorts", "source_mixture_plan", "value_drift_psi",
    "lang_mismatch_rate",
    "predictions_profile", "event_gap_buckets", "shuffle_balance_profile",
    "ann_ivf_topk", "dedup_clusters_wide", "dup_rate_by_source",
    "multimodal_features",
    # (b) the 36 queries whose latest driver verdict predates round 4
    #     (33 round-3 greens + session_summary / value_percentiles /
    #     wire_format_roundtrip / training_frame_det, displaced last
    #     round on round-2 verdicts). All fit, so after this round no
    #     registered query's verdict is older than one round.
    "q1_pricing_summary", "q5_local_supplier_volume", "q6_revenue_change",
    "q10_returned_items", "q21_sole_late_supplier",
    "top_orders_per_customer", "customer_rollup", "order_priority_count",
    "customers_without_orders", "nations_with_both",
    "segment_distinct_nations", "part_price_buckets",
    "moving_avg_revenue", "part_rankings", "orders_pivot_status",
    "value_percentiles", "session_summary", "wire_format_roundtrip",
    "training_frame_det", "logit_score",
    "dedup_exact", "dedup_ngram_jaccard", "simhash_fingerprints",
    "dedup_simhash", "dedup_simhash16", "dedup_clusters",
    "ann_cosine_topk", "embedding_near_dup",
    "text_stats", "lang_id_heuristic", "doc_fingerprint",
    "corpus_token_stats", "bpe_token_stats", "contamination_check",
    "multimodal_meta", "multimodal_frames",
    # (c) the former metrics/temporal/skew fillers (heuristic_score,
    #     asof_click_before_purchase, salted_value_by_type -- all
    #     round-4 green) rotated out for the three NEW queries in those
    #     same modules (predictions_profile / event_gap_buckets /
    #     shuffle_balance_profile, section (a)), which keep every
    #     family represented (test_registry.py gate) while spending the
    #     window on code with no verdict yet.
    #
    # ROUND-6 WINDOW HEAD (registered past position 50 this round; the
    # window was already full with the 36 stale-verdict queries):
    # q2_min_cost_supplier / q11_important_stock /
    # q16_parts_supplier_counts / q20_excess_stock_suppliers -- the
    # derived-partsupp queries completing the 22-query TPC-H surface --
    # and customer_blocking_er (record linkage: blocking + in-block
    # Levenshtein verify). All local-checker green at sf0.01; they take
    # section-(a) slots in the round-6 rotation, displacing
    # round-5-verified filler. ALSO round-6 (a): hourly_timeseries,
    # tumbling_15min, user_sessions -- changed late in round 5 (their
    # double-rounding aggregates moved to exact fixed-point after the
    # sf0.1 parity sweep caught the round-boundary class; verdicts on
    # the old code are round 4) and decayed_user_value (NEW:
    # recency-decayed per-user value, power-of-two day-bucketed decay
    # for bit-exact cross-engine weights).
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
