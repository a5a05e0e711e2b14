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
    sym = (
        edges.selectExpr("src", "dst")
        .union(edges.selectExpr("dst AS src", "src AS dst"))
        .cache()
    )
    labels = nodes.selectExpr("node", "node AS label").localCheckpoint()
    for _ in range(max_iter):
        prop = (
            sym.join(labels, F.col("src") == F.col("node"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(prop, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
