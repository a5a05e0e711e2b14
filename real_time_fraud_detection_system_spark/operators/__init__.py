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
    # (a) round-3 additions / changed implementations:
    #     dedup_simhash is now the 60-bit wide path (headline swap),
    #     dedup_simhash16 is the demoted 16-bit teaching variant,
    #     dedup_clusters_wide is the new distributed clustering stage.
    "dedup_simhash", "dedup_simhash16", "dedup_clusters_wide",
    # (b) oldest driver verdict (round-1 only; all still green locally)
    "q5_local_supplier_volume", "q6_revenue_change", "q10_returned_items",
    "top_orders_per_customer", "customer_rollup", "order_priority_count",
    "customers_without_orders", "nations_with_both",
    "segment_distinct_nations", "part_price_buckets",
    "props_json_stats", "freshness_check", "windowed_rates",
    "hourly_timeseries", "tumbling_15min", "recent_topk",
    "heuristic_score", "feature_extract",
    "minhash_signatures", "dedup_ngram_jaccard", "simhash_fingerprints",
    "ann_cosine_topk",
    "lang_id_heuristic", "doc_fingerprint", "corpus_token_stats",
    "bpe_token_stats",
    "multimodal_meta", "multimodal_frames",
    "moving_avg_revenue", "part_rankings", "orders_pivot_status",
    "unpivot_daily_metrics",
    # (c) family representatives for modules with no entry above
    "contamination_check", "user_sessions", "asof_click_before_purchase",
    "logit_score", "q21_sole_late_supplier", "salted_value_by_type",
    "user_value_anomalies",
    # (d) filler from the round-2-green set (first to rotate out when
    #     new round-3 queries land)
    "dedup_exact", "dedup_minhash_lsh", "dedup_clusters",
    "q1_pricing_summary", "daily_metrics", "text_stats",
    "multimodal_features", "embedding_near_dup",
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
