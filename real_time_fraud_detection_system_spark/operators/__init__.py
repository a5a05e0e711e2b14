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
    # (a) no VALID driver verdict on the round-4 testdata: these 14
    #     errored in round 3 (events.ts arrived as TIMESTAMP_NTZ and
    #     the old loader raised; fixed in catalog.load_table) -- their
    #     last green verdicts predate both the fix and the regenerated
    #     parquet, so they verify first.
    "daily_metrics", "props_json_stats", "freshness_check",
    "windowed_rates", "hourly_timeseries", "tumbling_15min",
    "recent_topk", "heuristic_score", "feature_extract",
    "unpivot_daily_metrics", "user_sessions",
    "asof_click_before_purchase", "salted_value_by_type",
    "user_value_anomalies",
    # (a') new this round (no verdict yet): tokenizer-vocab coverage,
    #      cross-shard shingle overlap, stratified sampling, per-source
    #      duplication rollup.
    "vocab_coverage", "shard_overlap", "stratified_sample",
    "dup_rate_by_source",
    # (a'') implementations changed this round: shared-md5 signature
    #      restructure (minhash family) and the label_propagation
    #      iteration rework (clusters_wide).
    "minhash_signatures", "dedup_minhash_lsh", "dedup_clusters_wide",
    # (b) oldest remaining verdict (round 2) -- all 33 of them fit, so
    #     after this round every query's verdict is at most one round
    #     old: the 33 round-3-green queries outside this window are the
    #     only ones not re-checked, and they rotate in next round.
    "q3_shipping_priority", "q7_volume_shipping", "q8_market_share",
    "q9_profit_by_nation", "q12_shipping_delay_classes",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q17_small_qty_revenue", "q18_large_volume_customers",
    "q19_disjunctive_revenue", "q4_order_priority_exists",
    "q22_dormant_high_balance",
    "ann_ivf_topk", "ann_lsh_bucketed",
    "approx_distinct_users", "approx_value_quantiles",
    "clicks_before_errors", "conversion_funnel", "corpus_quality_gate",
    "cube_region_segment", "deterministic_split",
    "grouping_sets_summary", "lapsed_customers_except",
    "multimodal_resize", "null_id_check", "parts_above_brand_avg",
    "repetition_stats", "sequence_packing",
    # (session_summary, value_percentiles, wire_format_roundtrip,
    # training_frame_det displaced to keep the window at 50; they carry
    # round-2 verdicts and rotate back in next round)
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
