"""Connected components — collapsing near-dup PAIRS into CLUSTERS.

A dedup pipeline does not stop at candidate pairs: to keep one
canonical document per duplicate group it needs the transitive
closure of the pair relation (A~B, B~C => {A,B,C} is one group even
when A and C never collide directly). The reference's dedup is
exact-hash only (dags/orbit_daily_update_dag.py:188-200), where
groups fall out of a single GROUP BY; the near-dup operators this
engine adds (MinHash-LSH, SimHash) emit *edges*, so cluster collapse
is a graph-connectivity step.

Spark-first shape: iterative min-label propagation over a
hash-partitioned symmetric edge list. Each round is one shuffle
(join edges with current labels on dst, min-aggregate per src);
rounds needed = graph diameter, and duplicate clusters are
near-cliques, so 2-4 rounds in practice. ``localCheckpoint``
truncates lineage every round — without it the plan doubles per
iteration and the job dies on plan size long before data size.

At 100 TB: the same loop holds (state per round = one (node,label)
table, shuffled on node). If components with large diameter are
possible, switch the update rule to large-star/small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) which converges in O(log n) rounds with the same
join+min-aggregate primitive. Label choice (min id) makes the
fixpoint unique, so results are independent of round count or
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    ``edges`` is an undirected pair list (each pair listed once is
    enough — it is symmetrized here). Returns (node, label) with one
    row per distinct endpoint; nodes in the same component share a
    label (the component's minimum id). Raises if ``max_iter``
    rounds do not reach the fixpoint, rather than returning a
    silently-wrong partial labeling.
    """
    half = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    # materialize the edge list once — every round joins against it,
    # and without the checkpoint each round would re-execute the full
    # upstream lineage that produced the pairs (e.g. the MinHash
    # pipeline), multiplying the dominant cost by the round count
    sym = (
        half.union(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = sym.join(
            labels.select(F.col("node").alias("dst"), F.col("label").alias("nbr_label")),
            "dst",
        )
        nmin = nbr.groupBy("src").agg(F.min("nbr_label").alias("nmin"))
        new_labels = (
            labels.join(nmin.select(F.col("src").alias("node"), "nmin"), "node", "left")
            .select(
                "node",
                F.least("label", F.coalesce("nmin", F.col("label"))).alias("label"),
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
            return labels
    raise RuntimeError(f"connected_components: no fixpoint after {max_iter} rounds")


def cluster_representatives(labels: DataFrame) -> DataFrame:
    """(node, label) -> (doc_id, cluster_id, cluster_size), the shape a
    curation pipeline joins back to keep one doc per cluster."""
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )
