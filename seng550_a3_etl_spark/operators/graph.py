"""Connected components over a pair/edge list — the clustering step that
turns near-dup *pairs* (operators/text_dedup.py, operators/similarity.py)
into dedup *groups* with one canonical survivor per group.

Iterative min-label propagation (the large-scale classic, cf. GraphX /
Hash-to-Min): every node starts labeled with itself; each round a node
takes the minimum label among itself and its neighbors; at fixpoint each
node's label is the minimum node id of its component. Rounds needed =
graph diameter — for dedup clusters (near-cliques around a duplicated
document) that is 2-3, so the loop is short and each round is one
shuffle join + one aggregate. ``localCheckpoint`` truncates the lineage
every round so the plan does not grow with iterations (the standard
Spark iterative-algorithm pattern).

Not SQL-expressible in one query on the Spark side (requires a driver
loop), but a DuckDB ``WITH RECURSIVE`` reachability closure computes the
same fixpoint — the suite's ``dup_clusters`` oracle does exactly that,
so even this iterative operator is fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(node, label) for every node in ``edges``; label = min node id in
    the node's component. Edges are treated as undirected; iteration
    stops at fixpoint (or ``max_iter`` as a runaway bound)."""
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("t")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["t"] == labels["node"])
            .groupBy("s")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["s"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
