"""Distributed iterative graph primitive: min-label propagation.

Connected components for graphs whose NODE SET GROWS WITH THE DATA
(document-level dedup graphs, user-interaction graphs) -- driver-side
union-find stops fitting, so labels converge in-cluster: each iteration
is one shuffle (edge join + min per node), labels are monotonically
non-increasing so convergence is guaranteed within the graph diameter,
``localCheckpoint()`` truncates the growing lineage each round (the
thing that kills naive iterative DataFrame code), and the loop exits
early at the fixpoint.

For BOUNDED node sets (e.g. the 2^16 SimHash fingerprint graph in
dedup.dedup_clusters) collect + union-find on the driver instead -- one
job beats diameter-many.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
        # Free the superseded iteration's checkpoint blocks: without
        # this every round leaks its predecessor's storage, and a long
        # benchmark session (or a many-component corpus) accumulates
        # diameter-many copies of the label table in executor memory.
        labels.unpersist()
        labels = checkpointed.select("node", "label")
        if changed == 0:
            break
    out = nodes.join(labels, "node", "left").select(
        "node", F.coalesce("label", "node").alias("label")
    )
    # The caller consumes a plain DataFrame; materialize the final
    # labels into it before dropping the loop-internal caches.
    out = out.localCheckpoint()
    labels.unpersist()
    sym.unpersist()
    return out
