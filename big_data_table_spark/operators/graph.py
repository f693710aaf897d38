"""Iterative graph operators — connected components for near-duplicate
clustering (the step after candidate generation: LSH pairs → duplicate
*groups*, keep one representative per group).

The reference has no iterative surface at all; this is the
training-data-pipeline extension where Spark's lazy-plan model needs a
driver-side convergence loop (bounded, O(graph diameter) iterations —
label-propagation / Pregel-lite).  Each iteration is one join + one
aggregate, fully distributed; the driver only checks the changed-row
count.  At 100 TB graphs you would switch the inner step to the
alternating small-star/large-star formulation (fewer rounds on
high-diameter graphs) and checkpoint every few rounds to truncate
lineage — noted inline where each applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src: str,
    dst: str,
    max_iter: int = 20,
) -> DataFrame:
    """Min-label propagation to fixpoint: every node ends with the
    minimum node id of its component (deterministic).

    ``nodes``: one column ``node_col`` (all nodes, including isolates —
    they keep their own id).  ``edges``: undirected pairs (symmetrized
    internally).  Converges in ≤ diameter iterations; ``max_iter`` bounds
    the loop (20 covers any near-dup cluster shape in practice).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionByName(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("label")
    ).persist()
    prev_sum: int | None = None
    try:
        for _ in range(max_iter):
            neigh = e.join(labels, e.src == labels.node).select(
                F.col("dst").alias("node"), "label"
            )
            # localCheckpoint (eager) BOTH materializes the round and
            # TRUNCATES lineage — without it the nested plan grows per
            # round and planning itself OOMs the driver after ~10 rounds
            # (observed on a 12-node path graph).  On a real cluster use
            # reliable .checkpoint() so executor loss can't lose rounds.
            new_labels = (
                labels.unionByName(neigh)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .localCheckpoint(eager=True)
            )
            # convergence check without a join: min-label propagation only
            # ever DECREASES labels, so an unchanged label sum means no
            # label moved — one cheap aggregate instead of join+filter
            new_sum = new_labels.agg(F.sum("label").alias("s")).collect()[0]["s"]
            labels.unpersist()
            labels = new_labels
            if prev_sum is not None and new_sum == prev_sum:
                break
            prev_sum = new_sum
        return labels
    finally:
        e.unpersist()


def dedup_keepers(components: DataFrame) -> DataFrame:
    """From (node, label) components: one keeper per duplicate group
    (the min id — same rule as exact dedup's keeper)."""
    return components.groupBy("label").agg(
        F.min("node").alias("keeper"), F.count(F.lit(1)).alias("group_size")
    )
