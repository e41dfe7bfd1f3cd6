"""Connected components over an edge list — the clustering step that
turns verified near-dup *pairs* into dedup *groups* (keep one doc per
component), the canonical final stage of a large-scale dedup pipeline.

Algorithm: iterative min-label propagation.  Every node starts
labelled with its own id; each round, a node's label becomes the min
of its own and its neighbors' labels; stop at fixpoint.  Rounds
needed = the component diameter — near-dup components are short
chains, so convergence is fast; for adversarial long-chain graphs the
alternating large-star/small-star variant (same join shape) converges
in O(log n) rounds and is the drop-in upgrade.

Scale shape per round: one equi-join (edges ⋈ labels on the node id)
+ one grouped min — both hash-shuffle on node id, so successive
rounds reuse the same partitioning.  Each round's result is eagerly
materialized (localCheckpoint) to truncate the growing lineage, which
is mandatory for iterative DataFrame algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import materialize


def connected_components(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 50
) -> DataFrame:
    """(id, cluster_id) for every node in ``edges``; ``cluster_id`` is
    the minimum node id reachable in the component.

    Raises ``RuntimeError`` if labels have not reached a fixpoint
    within ``max_iter`` rounds — returning unconverged labels would
    silently split one true component into several (and downstream
    dedup would keep duplicates it was built to remove)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = materialize(e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))))
    labels = materialize(
        sym.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    )
    converged = False
    for _ in range(max_iter):
        nmin = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = materialize(
            labels.join(nmin, labels["id"] == nmin["src"], "left").select(
                labels["id"],
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds the iteration budget; raise max_iter "
            "or switch to the large-star/small-star variant)"
        )
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))
