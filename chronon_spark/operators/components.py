"""Connected components over candidate-pair graphs — near-dup clustering.

MinHash/SimHash/embedding dedup emit PAIRS; dropping duplicates needs
the transitive closure (a~b, b~c ⇒ one keeper for {a,b,c}). This
computes, for every node, the minimum node id reachable from it — the
canonical component label — so ``keep = (node == component)`` picks one
deterministic representative per duplicate cluster. The reference
engine has no graph operator — beyond-reference training-data surface.

100 TB shape: iterative min-label propagation with PATH HALVING. Each
round is two narrow shuffles over (node, label) pairs: (1) pull the min
label across edges, (2) jump to the label's own label (pointer
doubling), which collapses chains in O(log diameter) rounds instead of
O(diameter) — a pathological 1M-link chain converges in ~20 rounds,
not 1M. Rounds persist their label frame and unpersist the previous
one, so lineage stays bounded (no recursive plan blowup); convergence
is an exact changed-count == 0 check, not a fixed iteration guess.
Labels are (long, long) rows — document payloads never enter the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Returns (node, component) for every node appearing in ``edges``,
    where component is the minimum node id in its connected component.

    Raises if ``max_iter`` rounds don't converge (with path halving that
    needs a component diameter over ~2^max_iter — input is broken).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter("a != b")
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # localCheckpoint (not persist): iterative joins grow the logical plan
    # superlinearly per round — checkpointing truncates lineage so round
    # N's plan is O(1), not O(N)
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # (1) neighbor-min pull: label[u] <- min(label[u], min label of N(u))
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("a", "node")
        )
        pulled = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
            )
        )
        # (2) path halving: label[u] <- label[label[u]] (pointer jump)
        jump = pulled.select(F.col("node").alias("label"), F.col("label").alias("jlabel"))
        halved = (
            pulled.join(jump, "label", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("jlabel", F.col("label"))).alias("label"),
            )
        )
        new_labels = halved.localCheckpoint(eager=True)
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "node")
            .filter("label != old")
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def drop_near_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep one representative (the min id) per duplicate cluster plus
    every doc that appears in no pair; adds ``dup_cluster`` (the
    component id, null for singletons) and ``cluster_size`` on kept
    representatives so removal stays auditable."""
    comp = connected_components(pairs, src, dst)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    labeled = docs.join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    )
    return (
        labeled.filter(F.col("component").isNull() | (F.col(id_col) == F.col("component")))
        .join(sizes, "component", "left")
        .withColumnRenamed("component", "dup_cluster")
    )
