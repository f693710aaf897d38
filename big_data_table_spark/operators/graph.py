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
    return_rounds: bool = False,
) -> DataFrame:
    """Min-label propagation to fixpoint: every node ends with the
    minimum node id of its component (deterministic).

    ``nodes``: one column ``node_col`` (all nodes, including isolates —
    they keep their own id).  ``edges``: undirected pairs (symmetrized
    internally).  Converges in ≤ diameter iterations; ``max_iter`` bounds
    the loop (20 covers any near-dup cluster shape in practice).  If the
    loop exhausts ``max_iter`` without the label-sum fixpoint, labels may
    still be wrong — that raises rather than silently returning.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionByName(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
        .distinct()
        .persist()
    )
    # r16: iterate over the EDGE-INCIDENT subgraph only.  The loop's
    # per-round shuffle previously carried every corpus node's label
    # through every iteration; isolates (the overwhelming majority of a
    # near-dup corpus) never change label, so they are split off once
    # and re-attached after the fixpoint.  Per-round work is now
    # O(|V(edges)| + |E|), not O(|corpus|) — the shape that matters at
    # 100 TB, where the duplicate graph is orders of magnitude smaller
    # than the document set.
    # eagerly checkpointed: ev is tiny (edge-incident nodes) and feeds
    # BOTH the loop's initial labels and the post-loop isolate split —
    # without the checkpoint the returned plan would recompute the whole
    # edge pipeline after the finally-block unpersists ``e``
    ev = e.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    all_nodes = nodes.select(F.col(node_col).alias("node"))
    labels = (
        all_nodes.join(ev, "node", "left_semi")
        .select("node", F.col("node").alias("label"))
        .persist()
    )
    prev_sum: int | None = None
    converged = False
    rounds = 0
    try:
        for _ in range(max_iter):
            rounds += 1
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
            new_sum = (
                new_labels.agg(F.sum("label").alias("s")).collect()[0]["s"]
                or 0  # empty edge set: no loop nodes, SUM is NULL — fixpoint
            )
            labels.unpersist()
            labels = new_labels
            if prev_sum is not None and new_sum == prev_sum:
                converged = True
                break
            prev_sum = new_sum
        if not converged:
            raise RuntimeError(
                f"connected_components: no fixpoint after max_iter={max_iter} "
                "rounds — labels would be wrong; raise max_iter (diameter "
                "bound) or use connected_components_star for high-diameter "
                "graphs"
            )
        # isolates keep their own id; edge-incident nodes (plus any edge
        # endpoint absent from ``nodes``, which the old full-corpus loop
        # also labeled via its neighbors) take the loop's fixpoint label
        isolates = all_nodes.join(ev, "node", "left_anti").select(
            "node", F.col("node").alias("label")
        )
        return (
            (isolates.unionByName(labels), rounds)
            if return_rounds
            else isolates.unionByName(labels)
        )
    finally:
        e.unpersist()


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src: str,
    dst: str,
    max_iter: int = 30,
    return_rounds: bool = False,
) -> DataFrame:
    """Alternating large-star/small-star connected components
    (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected
    Components in MapReduce and Beyond", SoCC'14): O(log² n) rounds
    instead of min-label propagation's O(diameter), so path-shaped /
    high-diameter graphs converge in a handful of rounds.

    Both stars are one groupBy + one join per round, fully distributed;
    edge labels only ever decrease, so an unchanged (count, Σu, Σv)
    triple after a small-star round is the fixpoint.  At the fixpoint the
    edge set is a union of stars rooted at each component's minimum id —
    the same labels min-label propagation produces, so the two
    implementations are mutual oracles (tests/test_operators.py).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _neighbor_min(edges_df: DataFrame) -> DataFrame:
        # m(u) = min over Γ(u) ∪ {u}
        return (
            edges_df.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )

    prev_sig: tuple | None = None
    rounds = 0
    converged = False
    for _ in range(max_iter):
        rounds += 1
        # --- large-star: connect every strictly-larger neighbor of u to
        # m(u).  Operates on the symmetrized edge set.
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = _neighbor_min(sym)
        e = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # --- small-star: orient edges toward the smaller endpoint, then
        # connect every smaller neighbor AND u itself to m(u).
        d = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = _neighbor_min(d)
        star_nbrs = d.join(mins, "u").select(F.col("v").alias("u"), "m")
        star_self = mins.select("u", F.col("m").alias("m"))
        e = (
            star_nbrs.unionByName(star_self)
            .filter(F.col("u") != F.col("m"))
            .select("u", F.col("m").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # collision-proof fixpoint signature: count + sum of a per-edge
        # 64-bit hash.  A (count, SUM(u), SUM(v)) triple can collide for
        # distinct edge sets (e.g. {(5,1),(4,2)} vs {(4,1),(5,2)}) and
        # stop the loop one round early with wrong labels.  The hash sum
        # accumulates in DECIMAL(38,0): xxhash64 spans the full int64
        # range, so a BIGINT sum can overflow mid-partition — an ANSI
        # runtime error that comes and goes with partition layout.
        sig_row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("sh"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["sh"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star: no fixpoint after max_iter={max_iter}"
        )
    # fixpoint edges are stars (node → component-min root); isolates and
    # the roots themselves keep their own id
    roots = e.groupBy("u").agg(F.min("v").alias("root"))
    labels = (
        nodes.select(F.col(node_col).alias("node"))
        .join(roots, F.col("node") == F.col("u"), "left")
        .select("node", F.coalesce("root", "node").alias("label"))
    )
    return (labels, rounds) if return_rounds else labels


def dedup_keepers(components: DataFrame) -> DataFrame:
    """From (node, label) components: one keeper per duplicate group
    (the min id — same rule as exact dedup's keeper)."""
    return components.groupBy("label").agg(
        F.min("node").alias("keeper"), F.count(F.lit(1)).alias("group_size")
    )


def pagerank(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    iters: int = 3,
    round_scale: int = 12,
) -> DataFrame:
    """Decimal-exact PageRank power iteration over an UNDIRECTED edge
    set (damping 0.85, ``iters`` fixed rounds) — the classic importance
    ranking carried to cross-engine-reproducible arithmetic so a DuckDB
    unrolled-CTE oracle can hash-match it.

    Arithmetic discipline (the repo's ROUND-before-sum rule): each
    per-edge contribution is ``ROUND(rank/deg, 12)`` quantized to
    DECIMAL(32,12), so the shuffle-order-sensitive SUM runs on exact
    decimals (order-free); the damping update re-rounds to 12 dp.  Both
    engines therefore compute bit-identical ranks at every iteration.

    Scale design: one join + one hash aggregate per round, all keyed on
    node id (co-partitionable); per-round eager localCheckpoint
    truncates lineage exactly like ``connected_components`` (reliable
    ``.checkpoint()`` on a real cluster).  The only driver read is the
    1-row node count.  Dangling nodes cannot occur (every node of a
    symmetrized edge set has out-degree >= 1), so no dangling-mass
    redistribution term is needed.
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(
            edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
        )
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy(F.col("s").alias("v")).agg(F.count(F.lit(1)).alias("deg"))
    deg = deg.localCheckpoint(eager=True)
    n = deg.count()  # 1-row metadata read (loop bound input, not data)
    dec = f"decimal(32,{round_scale})"
    ranks = deg.select(
        "v", (F.round(F.lit(1.0) / F.lit(n), round_scale)).cast(dec).alias("r")
    )
    for _ in range(iters):
        contrib = (
            ranks.join(deg, "v")
            .join(sym, F.col("v") == F.col("s"))
            .select(
                F.col("d").alias("tv"),
                F.round(F.col("r").cast("double") / F.col("deg"), round_scale)
                .cast(dec)
                .alias("c"),
            )
        )
        summed = contrib.groupBy("tv").agg(F.sum("c").alias("sc"))
        ranks = (
            deg.join(summed, deg.v == summed.tv, "left")
            .select(
                "v",
                F.round(
                    F.lit(0.15) / F.lit(n)
                    + F.lit(0.85)
                    * F.coalesce(F.col("sc"), F.lit(0)).cast("double"),
                    round_scale,
                )
                .cast(dec)
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def kcore_edges(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    k: int = 2,
    rounds: int = 6,
) -> DataFrame:
    """Bounded-round k-core peeling over an UNDIRECTED edge set: each
    round drops every node whose current degree is < ``k`` (and all its
    edges), ``rounds`` times — the dense-core extraction used to find
    the boilerplate heart of a near-duplicate graph (peripheral
    one-off matches peel away; templated families survive).

    The round count is FIXED, not a convergence loop, so a DuckDB
    unrolled-CTE oracle computes the identical truncation (peeling is
    monotone — extra rounds past the fixpoint are no-ops, and the
    fixture graphs fix within the default; pinned in test_round9c).
    Each round is one degree aggregate + two semi-joins, all keyed on
    node id; per-round eager localCheckpoint truncates lineage (the
    connected_components pattern).  Returns the surviving symmetrized
    edge set."""
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(
            edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        keep = (
            sym.groupBy("s")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= k)
            .select("s")
        )
        sym = (
            sym.join(keep, "s", "left_semi")
            .join(keep.withColumnRenamed("s", "d"), "d", "left_semi")
            .localCheckpoint(eager=True)
        )
    return sym
