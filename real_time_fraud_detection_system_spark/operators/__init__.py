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
ROUND = 10
_ROUND_CHANGED_BY_ROUND: dict[int, list[str]] = {
    9: [
        "containment_recall", "pit_event_enrichment",
        "kmv_source_overlap", "shard_overlap",
        "lsh_band_sweep", "ann_int8_recall", "corpus_snapshot_diff",
        "snapshot_novelty",
    ],
    # round 10: the five queries freed of the forced corpus-sized
    # doc-map broadcast (source now rides the signature memo;
    # round-9 verdict What's wrong #1) plus containment_recall,
    # whose sample-linear size/id hints were dropped for AQE's
    # size-adaptive join choice.
    10: [
        "shard_overlap", "kmv_source_overlap", "contamination_check",
        "crossdoc_ngram_share", "snapshot_novelty",
        "containment_recall",
        # NEW round-10 registrations: duplication provenance of a new
        # dump's added docs (recycled-from-base / within-dump / novel
        # -- the third leg of the incremental-ingest pricing triad
        # with corpus_snapshot_diff and snapshot_novelty); the TwoNN
        # intrinsic-dimension estimate of the embedding manifold; and
        # the max-epoch-capped token allocation plan (the repeat
        # dimension source_mixture_plan defers).
        "added_dup_against_base", "intrinsic_dim_twonn",
        "source_epoch_plan",
        # snapshot_quality_drift: the QUALITY leg of the census family
        # (per-source PSI of the quality score between snapshots);
        # fk_integrity_check gained the embeddings->documents
        # multimodal alignment relation.
        "snapshot_quality_drift", "fk_integrity_check",
        # label_centroid_separation: embedding-space class
        # separability (inter-centroid cosine vs intra cohesion, all
        # integer accumulations) -- the label-column trust gate.
        "label_centroid_separation",
        # weighted_sample_topk: Efraimidis-Spirakis A-Res weighted
        # without-replacement sampling, md5-deterministic.
        "weighted_sample_topk",
        # dedup_prefix_filter: PPJoin-style EXACT set-similarity join
        # (prefix + length filters, recall 1.0) -- the provably-
        # complete complement to the LSH path.
        "dedup_prefix_filter",
        # bm25_topk: Okapi BM25 lexical retrieval, fixed-point scored
        # -- the lexical side of hybrid search next to the ANN family.
        "bm25_topk",
        # position_attribution: U-shaped multi-touch revenue credit
        # (40/20/40 in exact ppm, deterministic remainder rule) --
        # the multi-touch generalization of last_touch_attribution.
        "position_attribution",
        # top_session_paths: path analysis over whole sessions
        # (opening-path census) -- the journey view next to
        # event_transition_matrix's one-hop view.
        "top_session_paths",
        # hll_shingle_cardinality: exactly-replayed HyperLogLog
        # (integer register fold, linear-counting fallback) -- KMV's
        # cardinality companion in the shippable-sketch pair.
        "hll_shingle_cardinality",
    ],
}
ROUND_CHANGED = _ROUND_CHANGED_BY_ROUND[ROUND]

PRIORITY = [
    # (a) CHANGED IN ROUND 10 (see _ROUND_CHANGED_BY_ROUND[10]): six
    #     queries whose plans the forced-doc-map-broadcast fix touched
    #     (their round-9 verdicts describe superseded code) plus the
    #     ten new round-10 registrations.
    *ROUND_CHANGED,
    # (b) the round-6-verdict cohort -- the oldest standing driver
    #     verdicts in the registry (36 queries; the verdict-union
    #     histogram after round 9 reads r6=36, r7=48, r8=47, r9=50).
    #     Exactly the ROUND-10 QUEUE order promised last round:
    #     daily_metrics/freshness_check/null_id_check/windowed_rates
    #     first (displaced from the round-9 window by late round-9
    #     registrations), then the rest in registry order.
    "daily_metrics", "freshness_check", "null_id_check",
    "windowed_rates", "hourly_timeseries", "tumbling_15min",
    "heuristic_score", "feature_extract", "customer_blocking_er",
    "ann_knn_join", "semantic_dedup_clusters", "pii_scrub_stats",
    "corpus_quality_gate", "repetition_stats", "sequence_packing",
    "vocab_coverage", "user_sessions", "conversion_funnel",
    "multimodal_resize", "unpivot_daily_metrics", "cube_region_segment",
    "lapsed_customers_except", "parts_above_brand_avg",
    "grouping_sets_summary", "asof_click_before_purchase",
    "clicks_before_errors",

    "q7_volume_shipping",
    # (deterministic_split and stratified_sample -- their mlqueries
    #  family is covered by weighted_sample_topk in the head -- plus
    #  q2_min_cost_supplier,
    #  q11_important_stock, q16_parts_supplier_counts and
    #  q20_excess_stock_suppliers were displaced by the round-10 head
    #  growth; they lead the round-6 remainder in the ROUND-11 QUEUE)
    # (c) family representatives for the five families (a)+(b) leave
    #     uncovered (tests/test_registry.py gate), preferring the
    #     OLDEST standing verdicts: relational (r7), skew (r7),
    #     anomaly (r7), stats (r7), layout (r9 -- its only member);
    "q1_pricing_summary", "join_blowup_probe", "user_value_anomalies",
    "exact_median_by_type", "layout_pruning_stats",
    # (d) no filler this round: the three round-10 registrations
    #     displaced ann_ivf_topk, ann_recall_eval and bigram_lm_score
    #     (they head the ROUND-11 QUEUE below).
    # ROUND-11 QUEUE (in priority order): round-11 changed code first,
    # then approx_distinct_users, approx_value_quantiles,
    # decayed_user_value,
    # deterministic_split, stratified_sample,
    # q2_min_cost_supplier,
    # q11_important_stock, q16_parts_supplier_counts and
    # q20_excess_stock_suppliers
    # (round-6 verdicts displaced by this round's head growth), then
    # the round-7-verdict cohort in name order --
    # ann_ivf_topk, ann_recall_eval, bigram_lm_score (displaced from
    # this round's filler slots by the new registrations),
    # bloom_prefilter_stats, chunk_dup_rate, cluster_safe_split,
    # dau_wau_stickiness, dedup_apply_stats, dedup_cluster_density,
    # dedup_containment, dedup_incremental, dedup_minhash_clusters,
    # dedup_minhash_lsh, dedup_signal_crosstab, doc_chunks,
    # dsir_importance_bins, and onward (compute the exact staleness
    # order from the CORRECTNESS_r*.json union at round start) --
    # then the round-8 cohort.
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
