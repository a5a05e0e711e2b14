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
ROUND = 12
_ROUND_CHANGED_BY_ROUND: dict[int, list[str]] = {
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
    # Round 12 (grows as operators land -- round-11 verdict Next
    # #3/#4):
    12: [
        # NEW: bm25_topk answered from the memoized postings index --
        # the registry face of the persisted lexical index family
        # (persist_text_index / bm25_search / text_index_sink_writer
        # / tombstone+compact legs, all library+test).
        "bm25_indexed_topk",
        # REFACTORED: bm25_topk's scoring core factored into
        # _bm25_rank (shared with the indexed probe) -- values
        # unchanged (equality pinned in tests/test_text_index.py);
        # re-attested per the rewritten-internals rule.
        "bm25_topk",
        # NEW: perceptual-hash image dedup -- real P6 decode ->
        # 60-cell integer aHash -> the dedup_simhash 3-of-6-block
        # candidacy; every image's brightness-shifted re-encode twin
        # caught at Hamming 0 (the invariance is exact in BIGINT
        # arithmetic on both engines).
        "dedup_phash",
        # REWRITTEN for scale: the explode-free grouped bootstrap --
        # each replica's weighted num/den is its own map-side
        # aggregate expression, so the 300M-row x16 fanout (the
        # sweep's standing worst, 34.1 s) never materializes; md5
        # draws and integer sums byte-identical, output unchanged
        # (round-11 verdict What's wrong #3).
        "bootstrap_fraud_ci",
        # NEW: batch lexical retrieval -- Q fixed term queries
        # answered from ONE shared postings slice (per-term tf/df
        # computed once for the term union, per-query integer scoring
        # from a broadcast (q_id, t) map) -- the 'audit many topics'
        # amortization the persisted index exists for.
        "bm25_batch_topk",
        # NEW: the lexical member of the uniform index-lifecycle
        # accounting (the dedup index has index_tombstone_stats; all
        # three persisted indexes now share a registry-checked
        # removal story): exact BIGINT posting/token/vocabulary cost
        # of tombstoning one dump's removals.
        "text_index_stats",
        # NEW: the perceptual family's AUDIO member -- real RIFF/WAV
        # chunk-walk decode (payloads wrapped JVM-side into true 8-bit
        # PCM containers) -> 61-window energy-envelope dHash (delta
        # bits, DC-offset-invariant by exact BIGINT cancellation) ->
        # the same 3-of-6-block candidacy.
        "dedup_audio_fp",
        # NEW: the perceptual family's VIDEO member, completing the
        # modality triple -- frame-sampled clip dedup (stub frame
        # extraction per the multimodal contract, real plumbing):
        # per-frame 24-bit brightness-invariant aHash, clips joined
        # on exact (frame_position, frame_hash), pairs at >= 6/8
        # matching positions; flat (hash-0) frames excluded from the
        # join on both engines (the quadratic guard for near-empty
        # clip slices -- output-neutral on the fixtures).
        "dedup_video_fp",
        # REFACTORED: the exactly-once fingerprint pair join-back
        # (candidacy on distinct fingerprints + the self-pair filter)
        # factored into dedup.wide_pair_join / _duck_wide_pair_select,
        # now shared verbatim by dedup_simhash / dedup_phash /
        # dedup_audio_fp on both engines -- values unchanged;
        # re-attested per the rewritten-internals rule.
        "dedup_simhash",
    ],
}
ROUND_CHANGED = _ROUND_CHANGED_BY_ROUND[ROUND]

PRIORITY = [
    # (a) CHANGED IN ROUND 12 (see _ROUND_CHANGED_BY_ROUND[12]) --
    #     grows as round-12 operators land; filler drops from the
    #     tail of (d) to keep the window at exactly 50.
    *ROUND_CHANGED,
    # (b) the round-7-verdict cohort -- the 12 oldest standing driver
    #     verdicts (verdict-union histogram after round 11 reads
    #     r7=12, r8=42, r9=44, r10=46, r11=50) -- exactly the
    #     ROUND-12 QUEUE promised last round;
    "q13_customer_distribution", "q14_promo_revenue",
    "q15_top_supplier", "q17_small_qty_revenue",
    "q19_disjunctive_revenue", "q22_dormant_high_balance",
    "q8_market_share", "q9_profit_by_nation",
    "source_semantic_similarity", "split_leakage_check",
    "supplier_pagerank", "threshold_sweep",
    # (c) family representatives for the two families (a)+(b)+(d)
    #     leave uncovered (tests/test_registry.py gate): skew and
    #     layout (layout's only member).
    "shuffle_balance_profile", "layout_pruning_stats",
    # (d) the round-8 cohort in name order as far as the window
    #     reaches (34 of 42; the name-order stragglers queue first
    #     for round 13 -- see the ROUND-13 QUEUE below).
    "activity_shape_buckets", "activity_shape_matches",
    "ann_lsh_bucketed", "calibration_bins",
    "conversion_latency_buckets", "countmin_heavy_hitters",
    "cusum_changepoints", "daily_value_percentiles", "dedup_keep_best",
    "dup_chao1_estimate", "emb_quantize_int8", "event_comovement_corr",
    "event_transition_matrix", "gapfill_hourly", "ivf_probe_sweep",
    "kmeans_fixedpoint", "last_touch_attribution",
    "minhash_est_vs_exact", "multimodal_frames", "orders_pivot_status",
    "packing_budget_sweep", "peak_concurrency",
    "q18_large_volume_customers", "q4_order_priority_exists",
    "q5_local_supplier_volume", "q6_revenue_change", "recent_topk",
    # ROUND-13 QUEUE (in priority order): round-13 changed code first,
    # then the round-8 remainder in name order --
    # rfm_segments (displaced when dedup_simhash re-joined the head),
    # risk_lift_matrix, scd2_priority_history, seasonal_hour_baseline,
    # shape_match_recall, shingle_df_curve,
    # skyline_parts, supplier_bfs_hops, time_weighted_value,
    # token_concentration_bins, token_fertility,
    # top_orders_per_customer, velocity_profile, zipf_alpha_by_source
    # -- then the round-9 cohort in name order (recompute the exact
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
