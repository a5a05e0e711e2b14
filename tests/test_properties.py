"""Property-based tests (hypothesis): engine operators vs pure-Python
references on randomized small inputs. Few examples, deterministic
seeds -- each example costs Spark jobs."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

PROP = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

EPOCH = dt.datetime(2024, 1, 1)


# --------------------------------------------------------------------------
@PROP
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-1000, max_value=1000),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_salted_agg_equals_plain_groupby(spark, rows):
    from real_time_fraud_detection_system_spark.operators.skew import (
        salted_sum_count,
    )

    df = spark.createDataFrame(
        [(i, k, float(v)) for i, (k, v) in enumerate(rows)],
        "event_id long, k string, value double",
    )
    got = {
        r["k"]: (r["n_rows"], r["value_sum"])
        for r in salted_sum_count(
            df, ["k"], "value", F.xxhash64("event_id"), n_salts=4
        ).collect()
    }
    want = {}
    for k, v in rows:
        n, s = want.get(k, (0, 0.0))
        want[k] = (n + 1, s + v)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6


# --------------------------------------------------------------------------
def _ref_sessions(offsets_by_user, gap_min):
    """Python reference: per user, count gap-rule sessions and events."""
    out = {}
    for uid, offsets in offsets_by_user.items():
        if not offsets:
            continue
        ordered = sorted(offsets)
        n_sessions = 1
        for prev, cur in zip(ordered, ordered[1:]):
            if (cur - prev) > gap_min:
                n_sessions += 1
        out[uid] = (n_sessions, len(ordered))
    return out


@PROP
@given(
    data=st.dictionaries(
        keys=st.integers(min_value=1, max_value=4),
        values=st.lists(
            st.integers(min_value=0, max_value=600), min_size=1, max_size=15
        ),
        min_size=1,
        max_size=4,
    )
)
def test_sessionize_matches_python_reference(spark, data):
    from real_time_fraud_detection_system_spark.operators.sessionize import (
        assign_sessions,
    )

    gap_min = 30
    rows, eid = [], 0
    for uid, offsets in data.items():
        for m in offsets:
            rows.append((eid, uid, EPOCH + dt.timedelta(minutes=m)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got_rows = assign_sessions(df, gap_minutes=gap_min).collect()
    got = {}
    for r in got_rows:
        ns, ne = got.get(r["user_id"], (0, 0))
        got[r["user_id"]] = (max(ns, r["session_seq"]), ne + 1)
    # duplicate timestamps collapse in the reference's set-free model --
    # keep duplicates, reference handles them as gap 0 (same session)
    want = _ref_sessions(
        {uid: offs for uid, offs in data.items()}, gap_min
    )
    assert got == want


@PROP
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=0,
        max_size=15,
    )
)
def test_label_propagation_matches_union_find(spark, edges):
    from real_time_fraud_detection_system_spark.operators.graph import (
        label_propagation,
    )

    n_nodes = 13
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "node long")
    e = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "src long, dst long"
    )
    got = {
        r["node"]: r["label"] for r in label_propagation(nodes, e).collect()
    }

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: min(j for j in range(n_nodes) if find(j) == find(i))
            for i in range(n_nodes)}
    assert got == want


def test_connected_components_dispatch_paths_agree(spark):
    """The hybrid dispatcher's two paths (driver union-find under the
    edge threshold, label propagation above) must reach the identical
    fixpoint; threshold=0 forces the distributed path on the same
    graph."""
    from real_time_fraud_detection_system_spark.operators.graph import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(12)], "node long")
    # a 4-chain, a triangle, a 2-cycle duplicate edge, and singletons
    edge_rows = [(0, 1), (1, 2), (2, 3), (5, 6), (6, 7), (7, 5), (9, 10), (10, 9)]
    edges = spark.createDataFrame(edge_rows, "src long, dst long")
    driver = {
        r["node"]: r["label"]
        for r in connected_components(nodes, edges).collect()
    }
    distributed = {
        r["node"]: r["label"]
        for r in connected_components(
            nodes, edges, driver_edge_threshold=0
        ).collect()
    }
    want = {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 5,
            8: 8, 9: 9, 10: 9, 11: 11}
    assert driver == want
    assert distributed == want


@PROP
@given(
    vals=st.lists(
        st.integers(min_value=-10**7, max_value=10**7).map(lambda c: c / 100),
        min_size=1,
        max_size=60,
    )
)
def test_exact_sum_matches_decimal_reference(spark, vals):
    from decimal import ROUND_HALF_UP, Decimal

    from real_time_fraud_detection_system_spark.functions.money import (
        exact_sum,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(F.expr(exact_sum("v")).alias("s")).first()["s"]
    want = float(
        sum(Decimal(str(v)) for v in vals).quantize(
            Decimal("0.01"), rounding=ROUND_HALF_UP
        )
    )
    assert abs(got - want) < 1e-9


def test_partitioning_invariance_of_deterministic_ops(spark, sf_dir, monkeypatch):
    """deterministic_split / stratified_sample / minhash_signatures
    claim engine/retry/cluster-size invariance: per-row membership and
    signatures derive from md5 of stable keys, never from rand(),
    monotonically_increasing_id, or partition ids. Regression-gate the
    claim by running each under a 1-partition and a 64-partition input
    layout and demanding identical output (exact for ints/strings,
    1e-9 for the rounded double aggregates, whose summation order is
    the only thing partitioning may legally change)."""
    import real_time_fraud_detection_system_spark.operators.dedup as dd
    import real_time_fraud_detection_system_spark.operators.mlqueries as mlq
    import real_time_fraud_detection_system_spark.operators.textops as tx

    def rows_equal(a, b):
        assert len(a) == len(b)
        for ra, rb in zip(a, b):
            for va, vb in zip(ra, rb):
                if isinstance(va, float):
                    assert abs(va - vb) < 1e-9
                else:
                    assert va == vb

    real_load = mlq.load_table

    def run_all(parts):
        monkeypatch.setattr(
            mlq, "load_table",
            lambda s, d, n: real_load(s, d, n).repartition(parts),
        )
        for mod in (dd, tx):
            monkeypatch.setattr(
                mod, "spread",
                lambda df, key=None, p=None: (
                    df.repartition(parts, key) if key else df.repartition(parts)
                ),
            )
        # collect order is not part of the contract -- values are
        return (
            sorted(mlq.deterministic_split(spark, sf_dir).collect()),
            sorted(mlq.stratified_sample(spark, sf_dir).collect()),
            sorted(
                dd.minhash_signatures(spark, sf_dir).collect(),
                key=lambda r: r["doc_id"],
            ),
            sorted(
                tx.tfidf_top_terms(spark, sf_dir).collect(),
                key=lambda r: (r["doc_id"], r["rank"]),
            ),
        )

    one = run_all(1)
    many = run_all(64)
    for a, b in zip(one, many):
        rows_equal(a, b)


def test_connected_components_empty_edges(spark):
    """Zero edges: every node is its own component on both dispatch
    arms (the driver arm must survive an empty collect/createDataFrame)."""
    from real_time_fraud_detection_system_spark.operators.graph import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    edges = spark.createDataFrame([], "src long, dst long")
    for thr in (10, 0):
        got = {
            r["node"]: r["label"]
            for r in connected_components(
                nodes, edges, driver_edge_threshold=thr
            ).collect()
        }
        assert got == {i: i for i in range(5)}


def test_partitioning_invariance_of_new_diagnostics(spark, sf_dir, monkeypatch):
    """predictions_profile / event_gap_buckets / shuffle_balance_profile
    are exact (selection aggregates, int64 gap arithmetic, md5 buckets):
    output must be bit-identical under a 1-partition vs 64-partition
    input layout -- no rand(), no partition-id dependence, no float
    accumulation order to hide behind."""
    import real_time_fraud_detection_system_spark.operators.metrics as mx
    import real_time_fraud_detection_system_spark.operators.skew as sk
    import real_time_fraud_detection_system_spark.operators.temporal as tp

    reals = {mod: mod.load_table for mod in (mx, sk, tp)}

    def run_all(parts):
        for mod, real in reals.items():
            monkeypatch.setattr(
                mod, "load_table",
                lambda s, d, n, _r=real: _r(s, d, n).repartition(parts),
            )
        return (
            sorted(map(tuple, mx.predictions_profile(spark, sf_dir).collect())),
            sorted(map(tuple, tp.event_gap_buckets(spark, sf_dir).collect())),
            sorted(map(tuple, sk.shuffle_balance_profile(spark, sf_dir).collect())),
        )

    assert run_all(1) == run_all(64)


# --------------------------------------------------------------------------
def _lev(a: str, b: str) -> int:
    """Classic Levenshtein DP, the textbook reference."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            ))
        prev = cur
    return prev[-1]


@PROP
@given(
    recs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),      # nationkey (block)
            st.text(alphabet="ab", min_size=1, max_size=3),  # name suffix
        ),
        min_size=2,
        max_size=12,
    )
)
def test_customer_blocking_er_matches_reference(spark, recs):
    """The ER verifier is not decorative: against a pure-Python
    two-stage reference (exact collapse -> stem block -> Levenshtein
    gate), exactly the qualifying identity pairs survive -- in-block
    pairs beyond ER_MAX_DIST are rejected, cross-block near-names are
    never paired, and the collapse counts ride through."""
    import real_time_fraud_detection_system_spark.operators.dedup as dd

    STEM = "Customer#x"
    rows = [
        (i + 1, STEM + suf, nk, "SEG") for i, (nk, suf) in enumerate(recs)
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long, c_mktsegment string",
    )
    real = dd.load_table
    dd.load_table = (
        lambda s, d, n: df if n == "customer" else real(s, d, n)
    )
    try:
        got = {
            (r["custkey_a"], r["custkey_b"], r["name_dist"],
             r["n_records_a"], r["n_records_b"])
            for r in dd.customer_blocking_er(spark, "unused").collect()
        }
    finally:
        dd.load_table = real

    idents: dict = {}
    for ck, name, nk, seg in rows:
        keep, n = idents.get((nk, seg, name), (ck, 0))
        idents[(nk, seg, name)] = (min(keep, ck), n + 1)
    want = set()
    items = sorted(idents.items())
    for x in range(len(items)):
        for y in range(x + 1, len(items)):
            (nk1, seg1, n1), (k1, c1) = items[x]
            (nk2, seg2, n2), (k2, c2) = items[y]
            if (nk1, seg1) != (nk2, seg2) or n1 == n2:
                continue
            if n1[: len(n1) - dd.ER_STEM_DROP] != n2[: len(n2) - dd.ER_STEM_DROP]:
                continue  # different stems: blocked apart
            d = _lev(n1, n2)
            if d > dd.ER_MAX_DIST:
                continue
            if n1 < n2:
                want.add((k1, k2, d, c1, c2))
            else:
                want.add((k2, k1, d, c2, c1))
    assert got == want


def test_nearest_cells_kernel_ties_break_by_centroid_id(spark):
    """Bit-equal cosines (scalar multiples of one direction) must
    assign to the SMALLEST centroid id, and rank order must be exact
    cosine order otherwise -- the contract the DuckDB oracle's
    (cosine DESC, c_id ASC) ranking assumes of the Arrow kernel."""
    from pyspark.sql import functions as F

    from real_time_fraud_detection_system_spark.operators.similarity import (
        _nearest_cells_udf,
    )

    # centroids 10 and 20 share a direction (scalar multiple): cosine
    # against ANY vector is bit-identical, so 10 must always win.
    cent_ids = [10, 20, 30]
    cent_embs = [[1.0, 0.0], [2.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame(
        [(1, [5.0, 0.0]), (2, [0.0, 3.0]), (3, [1.0, 1.0])],
        "vec_id long, emb array<double>",
    )
    top2 = _nearest_cells_udf(cent_ids, cent_embs, 2)
    rows = {
        r["vec_id"]: r["cells"]
        for r in df.select(
            "vec_id", top2(F.col("emb")).alias("cells")
        ).collect()
    }
    assert rows[1] == [10, 20]  # tie on cos=1.0 -> ascending c_id
    assert rows[2][0] == 30  # exact match beats the tied pair
    assert rows[2][1] == 10  # then the tie again, smallest id first
    assert rows[3][:1] in ([10], [30]) and set(rows[3]) <= {10, 20, 30}


def test_partitioning_invariance_of_round6_ops(spark, sf_dir, monkeypatch):
    """The round-6 deterministic operators must produce identical
    values under a 1-partition and a 64-partition input layout:
    integer-ppm outputs and fixed-point scores leave NO legal room for
    summation-order drift, so equality is exact."""
    import real_time_fraud_detection_system_spark.operators.corpusops as co
    import real_time_fraud_detection_system_spark.operators.temporal as tp
    import real_time_fraud_detection_system_spark.operators.tpch_extra as tx

    real_co, real_tp, real_tx = co.load_table, tp.load_table, tx.load_table

    def run_all(parts):
        monkeypatch.setattr(
            co, "load_table",
            lambda s, d, n: real_co(s, d, n).repartition(parts),
        )
        monkeypatch.setattr(
            co, "spread",
            lambda df, key=None, p=None: (
                df.repartition(parts, key) if key else df.repartition(parts)
            ),
        )
        monkeypatch.setattr(
            tp, "load_table",
            lambda s, d, n: real_tp(s, d, n).repartition(parts),
        )
        monkeypatch.setattr(
            tx, "load_table",
            lambda s, d, n: real_tx(s, d, n).repartition(parts),
        )
        return (
            sorted(map(tuple, co.crossdoc_ngram_share(spark, sf_dir).collect())),
            sorted(map(tuple, co.chunk_dup_rate(spark, sf_dir).collect())),
            sorted(map(tuple, co.mixture_apply_sample(spark, sf_dir).collect())),
            sorted(map(tuple, co.doc_chunks(spark, sf_dir).collect())),
            sorted(map(tuple, tp.event_type_affinity(spark, sf_dir).collect())),
            sorted(map(tuple, tx.supplier_pagerank(spark, sf_dir).collect())),
            sorted(map(tuple, tx.skyline_parts(spark, sf_dir).collect())),
            sorted(map(tuple, tx.supplier_bfs_hops(spark, sf_dir).collect())),
        )

    one = run_all(1)
    many = run_all(64)
    assert one == many


def test_partitioning_invariance_of_stats(spark, sf_dir, monkeypatch):
    """Median picks ranks in integer cents, correlation folds exact
    integer moments, islands count distinct integer days -- all three
    stats operators must be bit-identical at 1 vs 64 partitions."""
    import real_time_fraud_detection_system_spark.operators.stats as st

    real = st.load_table

    def run_all(parts):
        monkeypatch.setattr(
            st, "load_table",
            lambda s, d, n: real(s, d, n).repartition(parts),
        )
        return (
            sorted(map(tuple, st.exact_median_by_type(spark, sf_dir).collect())),
            sorted(map(tuple, st.event_comovement_corr(spark, sf_dir).collect())),
            sorted(map(tuple, st.activity_islands(spark, sf_dir).collect())),
            sorted(map(tuple, st.last_touch_attribution(spark, sf_dir).collect())),
            sorted(map(tuple, st.daily_value_percentiles(spark, sf_dir).collect())),
            sorted(map(tuple, st.daily_trend_slopes(spark, sf_dir).collect())),
            sorted(map(tuple, st.time_weighted_value(spark, sf_dir).collect())),
        )

    assert run_all(1) == run_all(64)


def test_partitioning_invariance_of_ann_knn_join(spark, sf_dir, monkeypatch):
    """The kNN join's kernel folds are per-row (cell assignment) and
    per-cell (pair cosines); centroid sampling is an md5 rule over the
    index side -- nothing depends on layout, so 1 vs 64 partitions
    must match exactly."""
    import real_time_fraud_detection_system_spark.operators.similarity as sim

    real = sim.load_table

    def run(parts):
        monkeypatch.setattr(
            sim, "load_table",
            lambda s, d, n: real(s, d, n).repartition(parts),
        )
        return sorted(
            map(tuple, sim.ann_knn_join(spark, sf_dir).collect())
        )

    assert run(1) == run(64)


def test_partitioning_invariance_of_sketches(spark, sf_dir, monkeypatch):
    """Bloom bit positions are per-key md5 decisions and Count-Min
    cells are plain sums, so both sketch reports must be bit-identical
    under a 1-partition and a 64-partition input layout (the mergeable-
    partials claim in sketches.py's module docstring)."""
    import real_time_fraud_detection_system_spark.operators.sketches as sk

    real = sk.load_table

    def run_all(parts):
        monkeypatch.setattr(
            sk, "load_table",
            lambda s, d, n: real(s, d, n).repartition(parts),
        )
        return (
            sorted(map(tuple, sk.bloom_prefilter_stats(spark, sf_dir).collect())),
            sorted(map(tuple, sk.countmin_heavy_hitters(spark, sf_dir).collect())),
        )

    assert run_all(1) == run_all(64)


# --------------------------------------------------------------------------
@PROP
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=2000),  # cents
        ),
        min_size=1,
        max_size=30,
    )
)
def test_exact_median_matches_statistics_median(spark, monkeypatch, rows):
    """The histogram-rank median equals statistics.median of the cent
    values for every group, on arbitrary multisets (ties included)."""
    import statistics

    import real_time_fraud_detection_system_spark.operators.stats as sto

    df = spark.createDataFrame(
        [
            (i, EPOCH, 1, typ, cents / 100.0, None)
            for i, (typ, cents) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(sto, "load_table", lambda s, d, n: df)
    got = {
        r["event_type"]: (r["n_events"], r["median_value"])
        for r in sto.exact_median_by_type(spark, "x").collect()
    }
    want = {}
    for typ in {t for t, _ in rows}:
        cents = sorted(c for t, c in rows if t == typ)
        want[typ] = (len(cents), float(statistics.median(cents)) / 100.0)
    assert set(got) == set(want)
    for typ in want:
        assert got[typ][0] == want[typ][0]
        assert abs(got[typ][1] - want[typ][1]) < 1e-9


# --------------------------------------------------------------------------
@PROP
@given(
    days_by_user=st.dictionaries(
        st.integers(min_value=1, max_value=4),
        st.sets(st.integers(min_value=1, max_value=20), min_size=1,
                max_size=12),
        min_size=1,
        max_size=4,
    )
)
def test_activity_islands_matches_bruteforce(spark, monkeypatch, days_by_user):
    """The rank-difference streak census equals a pure-Python scan of
    each user's sorted active-day set."""
    import real_time_fraud_detection_system_spark.operators.stats as sto

    rows, eid = [], 0
    for user, days in days_by_user.items():
        for d in days:
            eid += 1
            rows.append(
                (eid, EPOCH + dt.timedelta(days=d - 1, hours=eid % 7),
                 user, "view", 1.0, None)
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(sto, "load_table", lambda s, d, n: df)
    got = {
        r["streak_days"]: (r["n_streaks"], r["n_users"])
        for r in sto.activity_islands(spark, "x").collect()
    }
    streaks = {}  # length -> [user, ...]
    for user, days in days_by_user.items():
        run = 1
        sd = sorted(days)
        for prev, cur in zip(sd, sd[1:]):
            if cur == prev + 1:
                run += 1
            else:
                streaks.setdefault(run, []).append(user)
                run = 1
        streaks.setdefault(run, []).append(user)
    want = {
        ln: (len(users), len(set(users))) for ln, users in streaks.items()
    }
    assert got == want


# --------------------------------------------------------------------------
@PROP
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),      # user
            st.integers(min_value=0, max_value=30),     # minute
            st.sampled_from(["click", "view", "purchase"]),
            st.integers(min_value=0, max_value=5000),   # cents
        ),
        min_size=1,
        max_size=25,
    )
)
def test_last_touch_attribution_matches_bruteforce(spark, monkeypatch, events):
    """Credit assignment equals a per-user sequential scan ordered by
    (ts, non-purchase-first, event_id) -- including same-instant
    touches and 'direct' purchases."""
    import real_time_fraud_detection_system_spark.operators.stats as sto

    rows = [
        (i, EPOCH + dt.timedelta(minutes=m), u, typ, c / 100.0, None)
        for i, (u, m, typ, c) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(sto, "load_table", lambda s, d, n: df)
    got = {
        r["touch_type"]: (r["n_purchases"], round(r["revenue"] * 100))
        for r in sto.last_touch_attribution(spark, "x").collect()
    }
    want = {}
    by_user = {}
    for i, (u, m, typ, c) in enumerate(events):
        by_user.setdefault(u, []).append((m, typ == "purchase", i, typ, c))
    for u, evs in by_user.items():
        last_touch = None
        for m, is_p, i, typ, c in sorted(evs):
            if is_p:
                key = last_touch or "direct"
                n, s = want.get(key, (0, 0))
                want[key] = (n + 1, s + c)
            else:
                last_touch = typ
    assert got == want


@PROP
@given(
    # per key: a sequence of attribute values drawn from a tiny alphabet
    # (maximizing no-op and A->B->A patterns), one update per day
    seqs=st.dictionaries(
        st.integers(min_value=1, max_value=4),
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=8),
        min_size=1,
        max_size=4,
    ),
    n_batches=st.integers(min_value=1, max_value=4),
)
def test_scd2_merge_batching_invariance(spark, tmp_path_factory, seqs,
                                        n_batches):
    """PROPERTY: applying an update stream through merge_dimension_scd2
    in ANY number of time-ordered batches yields the same history as
    one batch of everything -- the invariance the streaming sink's
    exactly-once story rests on."""
    from pyspark.sql import Row

    from real_time_fraud_detection_system_spark.storage import (
        merge_dimension_scd2,
    )

    updates = [
        Row(k=k, v=v, effective_ts=EPOCH + dt.timedelta(days=i))
        for k, vs in seqs.items()
        for i, v in enumerate(vs)
    ]
    updates.sort(key=lambda r: r.effective_ts)
    schema = "k long, v string, effective_ts timestamp"
    base = tmp_path_factory.mktemp("scd2prop")

    ref_dir = str(base / "ref")
    merge_dimension_scd2(
        spark, ref_dir, spark.createDataFrame(updates, schema), "k"
    )

    inc_dir = str(base / "inc")
    # split on DAY boundaries (time-ordered batches, the operator's
    # contract; a key may still carry several changes per batch)
    days = sorted({r.effective_ts for r in updates})
    cuts = [days[(len(days) * i) // n_batches] for i in range(1, n_batches)]
    lo = None
    for hi in cuts + [None]:
        batch = [
            r for r in updates
            if (lo is None or r.effective_ts > lo)
            and (hi is None or r.effective_ts <= hi)
        ]
        if batch:
            merge_dimension_scd2(
                spark, inc_dir, spark.createDataFrame(batch, schema), "k"
            )
        lo = hi

    cols = ("k", "v", "valid_from", "valid_to")
    ref = sorted(map(tuple, spark.read.parquet(ref_dir).select(*cols).collect()))
    inc = sorted(map(tuple, spark.read.parquet(inc_dir).select(*cols).collect()))
    assert ref == inc


def test_bounded_hamming_labels_match_reference_union_find():
    """dedup_clusters' driver-side numpy clustering must produce the
    exact connected-component labels of the DECLARED 16-bit edge
    relation (some 8-bit block equal AND Hamming 1..3) -- brute-force
    union-find over all pairs is the reference. Deterministic md5-seeded
    fingerprint set, saturated enough to form multi-node components."""
    import hashlib

    from real_time_fraud_detection_system_spark.operators.dedup import (
        SIMHASH_BITS,
        SIMHASH_MAX_HAMMING,
        SIMHASH_N_BLOCKS,
        _bounded_hamming_labels,
    )

    nodes = sorted(
        {
            int.from_bytes(
                hashlib.md5(f"fp:{i}".encode()).digest()[:2], "big"
            )
            for i in range(400)
        }
    )
    width = SIMHASH_BITS // SIMHASH_N_BLOCKS
    mask_lo = (1 << width) - 1

    def is_edge(a: int, b: int) -> bool:
        x = a ^ b
        block_shared = (x & mask_lo) == 0 or (x >> width) == 0
        return a != b and block_shared and bin(x).count("1") <= SIMHASH_MAX_HAMMING

    idx = {v: i for i, v in enumerate(nodes)}
    parent = list(range(len(nodes)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_edges = 0
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if is_edge(a, b):
                n_edges += 1
                ra, rb = find(idx[a]), find(idx[b])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    assert n_edges > 50  # the fixture must actually exercise merging
    want = {v: nodes[find(idx[v])] for v in nodes}

    got = dict(
        _bounded_hamming_labels(nodes, SIMHASH_BITS, SIMHASH_MAX_HAMMING)
    )
    assert got == want
