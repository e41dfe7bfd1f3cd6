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
            "or switch to connected_components_star)"
        )
    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round: every node u links its strictly-larger
    neighbors to min(N(u) ∪ {u}).  Input/output: symmetric edge list
    (u, v) — output is deduped and NOT symmetric."""
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient each edge high→low, then every
    node links its smaller-or-equal neighbors (and itself) to the
    minimum of that in-neighborhood."""
    directed = edges.select(
        F.greatest(F.col("u"), F.col("v")).alias("u"),
        F.least(F.col("u"), F.col("v")).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        directed.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_link = mins.select(F.col("u"), F.col("m").alias("v"))
    return relink.union(self_link).filter(F.col("u") != F.col("v")).distinct()


def connected_components_star(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iter: int = 25
) -> DataFrame:
    """Alternating large-star/small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    same contract as :func:`connected_components` ((id, cluster_id),
    cluster_id = component minimum) but converging in O(log n) rounds
    on ANY graph, including adversarial long chains where min-label
    propagation needs diameter rounds.

    Per round: two grouped mins + two equi-joins on node id — the same
    shuffle shape as one min-label round, so the 100 TB posture is
    identical, just with exponentially fewer rounds.  Fixpoint = the
    directed edge set is unchanged (exact set comparison, no hashing).
    """
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # Node universe comes from the RAW edge list: a node whose only
    # edge is a self-loop is still a (singleton) component, and the
    # min-label variant labels it — dropping it here would make the
    # two variants disagree on the same input.
    all_nodes = materialize(
        raw.select(F.col("u").alias("id"))
        .union(raw.select(F.col("v").alias("id")))
        .distinct()
    )
    e = raw.filter(F.col("u") != F.col("v")).distinct()
    # _small_star orients every edge high→low itself, so seeding with
    # the raw (deduped) edge list is equivalent to the symmetric form.
    cur = materialize(_small_star(e))
    n_cur = cur.count()
    converged = False
    for _ in range(max_iter):
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        nxt = materialize(_small_star(_large_star(sym)))
        n_nxt = nxt.count()
        # Exact set equality, count-gated: the subtract (a distinct
        # shuffle of both sides) only runs in rounds where the counts
        # already agree — i.e. at most the final rounds.
        if n_nxt == n_cur and nxt.subtract(cur).isEmpty():
            converged = True
            cur = nxt
            break
        cur, n_cur = nxt, n_nxt
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # At fixpoint every edge is (node, component_min); minima and
    # isolated-in-output nodes label themselves.
    labels = cur.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    self_labeled = all_nodes.join(labels, "id", "left_anti").select(
        F.col("id"), F.col("id").alias("cluster_id")
    )
    return labels.union(self_labeled)
