"""Distributed graph primitives: connected components.

``connected_components`` is the entry point: it sizes the edge set and
dispatches between two algorithms with the same fixpoint --

  * min-label propagation (``label_propagation``): for graphs whose
    NODE SET GROWS WITH THE DATA (document-level dedup graphs,
    user-interaction graphs) driver-side union-find stops fitting, so
    labels converge in-cluster: each iteration is one shuffle (edge
    join + min per node), labels are monotonically non-increasing so
    convergence is guaranteed within the graph diameter,
    ``localCheckpoint()`` truncates the growing lineage each round (the
    thing that kills naive iterative DataFrame code), and the loop
    exits early at the fixpoint.

  * driver union-find (``_driver_union_find``): when the edge count is
    under a BOUNDED threshold, one collect + union-find beats
    diameter-many Spark jobs -- the per-iteration scheduling constant
    of the propagation loop dominates on small graphs (it was ~8.7 s of
    fixed cost at sf0.1 where the whole edge set is 14k rows).

At 100 TB the edge count of a realistic near-dup graph is far past the
threshold and every run takes the distributed path; the hybrid only
removes the small-graph constant, not the scale story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Max edges the driver path may collect: 1M edges is ~32 MB of longs on
# the driver (bounded, independent of corpus size -- the same class of
# bounded collect as the <= 2^16-node union-find in dedup_clusters).
DRIVER_EDGE_THRESHOLD = 1_000_000


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    driver_edge_threshold: int = DRIVER_EDGE_THRESHOLD,
) -> DataFrame:
    """nodes(node: long), edges(src: long, dst: long) undirected input
    (each edge once). Returns (node, label), label = min node id of the
    component. Dispatches on the edge count: small graphs run one
    driver union-find job, large graphs run distributed label
    propagation -- identical fixpoint either way (tests assert it)."""
    edges = edges.cache()
    n_edges = edges.count()
    if n_edges <= driver_edge_threshold:
        out = _driver_union_find(nodes, edges)
    else:
        out = label_propagation(nodes, edges)
    # Both paths materialize their result before returning (collect /
    # final localCheckpoint), so the edge cache is no longer referenced.
    edges.unpersist()
    return out


def _driver_union_find(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Collect the (bounded) edge list and union-find on the driver.
    Only edge-touched nodes enter the map; untouched nodes are their
    own component and rejoin via the left join below."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for row in edges.collect():
        ra, rb = find(row["src"]), find(row["dst"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    spark = edges.sparkSession
    labels = spark.createDataFrame(
        [(n, find(n)) for n in parent] or [],
        "node long, label long",
    )
    out = nodes.join(F.broadcast(labels), "node", "left").select(
        "node", F.coalesce("label", "node").alias("label")
    )
    # Materialize so the caller holds data, not a plan over the
    # temporary labels frame (parity with label_propagation's contract).
    return out.localCheckpoint()


def label_propagation(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 30
) -> DataFrame:
    """nodes(node: long), edges(src: long, dst: long) undirected input
    (pass each edge once; both directions are derived). Returns
    (node, label) with label = min node id of the component."""
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # Repartition ONCE on the join key: the union would otherwise carry
    # 2x the input partition count into every iteration's join (each a
    # fixed per-task scheduling cost that dwarfs the work on sparse
    # graphs), and hash-partitioning by src lets each iteration's join
    # reuse the layout.
    sym = (
        edges.selectExpr("src", "dst")
        .union(edges.selectExpr("dst AS src", "src AS dst"))
        .repartition(n_parts, "src")
        .cache()
    )
    # Iterate ONLY over edge-touched nodes: a node with no incident
    # edge is its own component and its label can never change, so
    # keeping singletons out of the loop makes every iteration's
    # shuffle proportional to the edge-endpoint count, not the node
    # count. On sparse dedup graphs (the common case: most documents
    # are unique) that is orders of magnitude smaller; singletons
    # rejoin with label = node at the end.
    touched = sym.select("src").distinct().selectExpr("src AS node")
    labels = touched.selectExpr("node", "node AS label").localCheckpoint()
    for _ in range(max_iter):
        prop = (
            sym.join(labels, F.col("src") == F.col("node"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(prop, "node", "left").select(
            "node",
            F.col("label").alias("old_label"),
            F.least(
                F.col("label"), F.coalesce("nbr_label", "label")
            ).alias("label"),
        )
        # Pointer doubling: label <- label(label). A label is always
        # itself a node id in the iterated set, so composing the
        # mapping with itself halves every label chain -- convergence
        # drops from O(diameter) iterations to O(log diameter)
        # (measured: 11 rounds -> 5 on the sf0.1 near-dup graph;
        # composing twice per round was tried and LOST -- the extra
        # small shuffle per round cost more than the rounds it saved).
        ll = stepped.selectExpr("node AS label", "label AS label2")
        checkpointed = (
            stepped.join(ll, "label", "left")
            .select(
                "node",
                F.coalesce("label2", "label").alias("label"),
                "old_label",
            )
            .localCheckpoint()
        )
        # Convergence check is a scan of the just-materialized blocks
        # (old_label rides along through the iteration), NOT a join of
        # two label tables -- on sparse graphs the per-iteration fixed
        # cost of that extra shuffle job exceeded the propagation work
        # itself.
        changed = checkpointed.filter(
            F.col("label") != F.col("old_label")
        ).count()
        # The superseded iteration's localCheckpoint blocks are RDD
        # storage, not SQL-cache entries, so DataFrame.unpersist cannot
        # free them; rebinding `labels` drops the last reference and
        # ContextCleaner reclaims the blocks via GC. Rounds are
        # O(log diameter), so at most that many label tables coexist
        # briefly between GC cycles.
        labels = checkpointed.select("node", "label")
        if changed == 0:
            break
    out = nodes.join(labels, "node", "left").select(
        "node", F.coalesce("label", "node").alias("label")
    )
    # The caller consumes a plain DataFrame; materialize the final
    # labels into it, then release the symmetric-edge SQL cache (the
    # loop-internal checkpoint blocks are reclaimed by ContextCleaner
    # once `labels` goes out of scope -- see the note in the loop).
    out = out.localCheckpoint()
    sym.unpersist()
    return out
