"""Physical-plan regression tests: pushdown, pruning, broadcast, shuffle
budget. These are the scale guarantees -- a green suite means the plans
are the ones we'd want on a 1000-executor cluster, not just ones that
happen to pass on 60k rows."""

from pyspark.sql import functions as F

from real_time_fraud_detection_system_spark.catalog import load_table
from real_time_fraud_detection_system_spark.operators.metrics import (
    recent_topk,
)
from real_time_fraud_detection_system_spark.operators.relational import (
    q1_pricing_summary,
    q5_local_supplier_volume,
    q6_revenue_change,
    top_orders_per_customer,
)
from real_time_fraud_detection_system_spark.plans.explain_checks import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pruned_schema,
    assert_pushed_filters,
    count_exchanges,
    simple_plan,
)


def test_q6_filters_push_to_scan(spark, sf_dir):
    df = q6_revenue_change(spark, sf_dir)
    # every predicate is on a scan column -> must reach PushedFilters
    assert_pushed_filters(df, "l_shipdate", "l_discount", "l_quantity")


def test_q6_column_pruning(spark, sf_dir):
    df = q6_revenue_change(spark, sf_dir)
    # needs only shipdate, discount, quantity, extendedprice of 11 cols
    assert_pruned_schema(df, "lineitem", max_cols=4)


def test_q1_single_shuffle(spark, sf_dir):
    df = q1_pricing_summary(spark, sf_dir)
    # partial agg map-side + one exchange on the group key + sort for
    # the orderBy; anything beyond 2 exchanges is a regression.
    # (codegen spans only materialize in the AQE final plan, so they are
    # not asserted here)
    assert count_exchanges(df) <= 2


def test_q5_broadcasts_constant_dims(spark, sf_dir):
    df = q5_local_supplier_volume(spark, sf_dir)
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_topk_uses_take_ordered(spark, sf_dir):
    df = recent_topk(spark, sf_dir)
    # ORDER BY ... LIMIT k must plan TakeOrderedAndProject, never a
    # global sort of the whole table
    assert "TakeOrderedAndProject" in simple_plan(df)


def test_window_topk_single_shuffle(spark, sf_dir):
    df = top_orders_per_customer(spark, sf_dir)
    # one hash-partition exchange for the window; final orderBy adds a
    # range exchange. More means the window partitioning was not reused.
    assert count_exchanges(df) <= 2


def test_scan_pushdown_timestamp_range(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    ).select("l_orderkey")
    assert_pushed_filters(df, "l_shipdate")
    assert_pruned_schema(df, "lineitem", max_cols=2)

def test_tpch_extra_no_cartesian_and_broadcasts(spark, sf_dir):
    from real_time_fraud_detection_system_spark.operators.tpch_extra import (
        q7_volume_shipping,
        q8_market_share,
        q14_promo_revenue,
        q18_large_volume_customers,
    )

    for q in (q7_volume_shipping, q8_market_share, q14_promo_revenue):
        df = q(spark, sf_dir)
        assert_no_cartesian(df)
        assert_broadcast_join(df)
    assert_no_cartesian(q18_large_volume_customers(spark, sf_dir))


def test_q14_pushes_shipdate_range(spark, sf_dir):
    from real_time_fraud_detection_system_spark.operators.tpch_extra import (
        q14_promo_revenue,
    )

    assert_pushed_filters(q14_promo_revenue(spark, sf_dir), "l_shipdate")


def test_asof_join_is_single_shuffle_no_join(spark, sf_dir):
    from real_time_fraud_detection_system_spark.operators.temporal import (
        asof_click_before_purchase,
    )

    df = asof_click_before_purchase(spark, sf_dir)
    plan = simple_plan(df)
    # the as-of is a union + window pass: no join operator at all
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
    # one hash exchange for (user) window, one range for the final sort,
    # plus the pre-dedup agg exchange
    assert count_exchanges(df) <= 3


def test_interval_join_is_equi_join(spark, sf_dir):
    from real_time_fraud_detection_system_spark.operators.temporal import (
        clicks_before_errors,
    )

    df = clicks_before_errors(spark, sf_dir)
    assert_no_cartesian(df)
    plan = simple_plan(df)
    # bucketing turns the range predicate into an equi-join; a
    # BroadcastNestedLoopJoin here would mean the rewrite regressed
    assert "NestedLoop" not in plan


def _no_induced_hash_shuffle(df):
    """Every hash exchange must be an explicit spread() repartition
    (REPARTITION_BY_NUM); an ENSURE_REQUIREMENTS hash exchange means an
    aggregation or join stopped riding the doc_id partitioning and the
    planner had to insert its own shuffle -- the regression these
    operators' explode + codegen-agg rewrite specifically avoids.
    (Range exchanges for orderBy and broadcast exchanges are fine.)"""
    plan = simple_plan(df)
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "ENSURE_REQUIREMENTS" not in line, plan


def test_wide_fingerprints_vote_agg_is_shuffle_free(spark, sf_dir):
    from real_time_fraud_detection_system_spark.operators.dedup import (
        wide_fingerprints,
    )

    _no_induced_hash_shuffle(wide_fingerprints(spark, sf_dir))


def test_repetition_stats_aggs_are_shuffle_free(spark, sf_dir):
    from real_time_fraud_detection_system_spark.operators.corpusops import (
        repetition_stats,
    )

    _no_induced_hash_shuffle(repetition_stats(spark, sf_dir))


def test_tfidf_scan_prunes_to_two_columns(spark, sf_dir):
    """tfidf reads only (doc_id, text) from the documents scan; a scan
    carrying lang/source/n_chars for a 2-column projection would read
    extra corpus bytes at every scale."""
    from real_time_fraud_detection_system_spark.operators.textops import (
        tfidf_top_terms,
    )
    from real_time_fraud_detection_system_spark.plans.explain_checks import (
        assert_no_cartesian,
        assert_pruned_schema,
    )

    df = tfidf_top_terms(spark, sf_dir)
    assert_pruned_schema(df, "documents", 2)
    assert_no_cartesian(df)


def test_derived_partsupp_is_map_side(spark, sf_dir):
    from real_time_fraud_detection_system_spark.operators.tpch_extra import (
        derived_partsupp,
    )

    df = derived_partsupp(spark, sf_dir)
    # part scan -> project -> explode -> project: generation must not
    # shuffle (the queries that consume it pay for their own joins)
    assert count_exchanges(df) == 0
    assert_pruned_schema(df, "part", max_cols=1)


def test_partsupp_queries_broadcast_dims(spark, sf_dir):
    from real_time_fraud_detection_system_spark.operators.tpch_extra import (
        q2_min_cost_supplier,
        q16_parts_supplier_counts,
        q20_excess_stock_suppliers,
    )

    for fn in (q2_min_cost_supplier, q16_parts_supplier_counts,
               q20_excess_stock_suppliers):
        df = fn(spark, sf_dir)
        assert_broadcast_join(df)
        assert_no_cartesian(df)


def test_q20_semi_join_below_lineitem_aggregate(spark, sf_dir):
    from real_time_fraud_detection_system_spark.operators.tpch_extra import (
        q20_excess_stock_suppliers,
    )

    df = q20_excess_stock_suppliers(spark, sf_dir)
    lines = simple_plan(df).splitlines()
    # the selective part filter must reach lineitem BEFORE the
    # (l_partkey, l_suppkey) aggregate: in the printed tree, the partial
    # HashAggregate's subtree must contain a LeftSemi broadcast join
    # above the lineitem scan (else the agg runs over 25x the rows)
    idx = next(
        i
        for i, ln in enumerate(lines)
        if "HashAggregate" in ln
        and "l_partkey" in ln
        and "l_suppkey" in ln
        and "partial_sum" in ln
    )
    semi = next(
        (
            i
            for i, ln in enumerate(lines[idx:], idx)
            if "BroadcastHashJoin" in ln and "LeftSemi" in ln
        ),
        None,
    )
    scan = next(
        i for i, ln in enumerate(lines[idx:], idx) if "lineitem" in ln
    )
    assert semi is not None and semi < scan, "\n".join(lines)


def test_layout_pruning_scan_prunes_to_two_columns(spark, sf_dir):
    """The pruning simulation needs only (user_id, ts) from events; a
    scan dragging event_type/value/props would read most of the table's
    bytes for a 2-column computation."""
    from real_time_fraud_detection_system_spark.operators.layout import (
        layout_pruning_stats,
    )
    from real_time_fraud_detection_system_spark.plans.explain_checks import (
        assert_no_cartesian,
        assert_pruned_schema,
    )

    df = layout_pruning_stats(spark, sf_dir)
    assert_pruned_schema(df, "events", 2)
    assert_no_cartesian(df)


def test_rfm_scan_prunes_to_three_columns(spark, sf_dir):
    """RFM needs only (user_id, ts, value) from the events scan."""
    from real_time_fraud_detection_system_spark.operators.temporal import (
        rfm_segments,
    )
    from real_time_fraud_detection_system_spark.plans.explain_checks import (
        assert_no_cartesian,
        assert_pruned_schema,
    )

    df = rfm_segments(spark, sf_dir)
    assert_pruned_schema(df, "events", 3)
    assert_no_cartesian(df)


def test_token_concentration_scan_prunes_to_one_column(spark, sf_dir):
    """The Lorenz bins need only n_chars -- the text column (the bulk of
    every document byte) must never reach the scan output."""
    from real_time_fraud_detection_system_spark.operators.corpusops import (
        token_concentration_bins,
    )
    from real_time_fraud_detection_system_spark.plans.explain_checks import (
        assert_pruned_schema,
    )

    df = token_concentration_bins(spark, sf_dir)
    assert_pruned_schema(df, "documents", 1)


def test_part_cooccurrence_pair_expansion_is_broadcast(spark, sf_dir):
    """The focus-items side must broadcast into the cached items frame
    (map-side pair expansion); the lineitem scan must prune to the two
    key columns; no cartesian anywhere."""
    from real_time_fraud_detection_system_spark.operators.tpch_extra import (
        part_cooccurrence_topk,
    )
    from real_time_fraud_detection_system_spark.plans.explain_checks import (
        assert_broadcast_join,
        assert_no_cartesian,
        assert_pruned_schema,
    )

    df = part_cooccurrence_topk(spark, sf_dir)
    assert_broadcast_join(df)
    assert_no_cartesian(df)
    # the items frame localCheckpoints inside the operator (storage-leak
    # fix), which truncates the returned plan's lineage above the scan;
    # assert the 2-column pruning on the same pre-checkpoint shape the
    # operator builds
    from real_time_fraud_detection_system_spark.catalog import load_table

    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    assert_pruned_schema(items, "lineitem", 2)


def test_bloom_probe_side_has_no_explode(spark, sf_dir):
    """The probe pipeline marks positions via K broadcast-hash joins --
    the probe side must never explode (K x |probe| row blowup) and the
    lineitem scan must prune to the single key column."""
    from real_time_fraud_detection_system_spark.operators.sketches import (
        bloom_prefilter_stats,
    )
    from real_time_fraud_detection_system_spark.plans.explain_checks import (
        assert_pruned_schema,
        simple_plan,
    )

    from real_time_fraud_detection_system_spark.operators.sketches import (
        BLOOM_K,
    )

    df = bloom_prefilter_stats(spark, sf_dir)
    plan = simple_plan(df)
    # every explode is the build side's bit-position expansion (its
    # subtree prints once per broadcast reuse); the probe side reaches
    # the hit-mark joins as plain Projects
    assert plan.count("Generate explode") <= BLOOM_K + 1, plan
    assert plan.count("BroadcastHashJoin") >= BLOOM_K, plan  # hit-marks
    assert_pruned_schema(df, "lineitem", 1)


def test_skyline_scan_prunes_to_three_columns(spark, sf_dir):
    """The skyline needs (size, price, partkey); the frontier joins
    back as a broadcast."""
    from real_time_fraud_detection_system_spark.operators.tpch_extra import (
        skyline_parts,
    )
    from real_time_fraud_detection_system_spark.plans.explain_checks import (
        assert_broadcast_join,
        assert_pruned_schema,
    )

    df = skyline_parts(spark, sf_dir)
    assert_pruned_schema(df, "part", 3)
    assert_broadcast_join(df)


def test_scd2_history_one_exchange_one_sort(spark, sf_dir):
    """The SCD2 history's three window passes (day-winner pick, change
    collapse, validity chain) must share ONE customer-keyed exchange
    and ONE sort -- the (date ASC, orderkey DESC) sort is a prefix
    superset of every later window's required ordering."""
    from real_time_fraud_detection_system_spark.operators.temporal import (
        _scd2_history,
    )

    df = _scd2_history(spark, sf_dir)
    assert count_exchanges(df) == 1
    plan = simple_plan(df)
    assert plan.count("+- Sort") == 1, plan
