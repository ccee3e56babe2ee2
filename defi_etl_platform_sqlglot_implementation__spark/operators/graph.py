"""Iterative graph algorithms as DataFrame loops (scale extension).

The reference has no graph surface; a large-scale data platform needs at
least the two classics: connected components (operators/dedup.py, used
for near-dup cluster resolution) and PageRank-style score propagation
(entity importance over interaction graphs — e.g. ranking contracts by
token-flow connectivity at 100 TB).

PageRank here is the fixed-iteration damped form: one shuffle per
iteration (edges ⋈ scores on src, aggregate on dst), nodes without
out-edges contribute no mass (the simple leaky variant — both engines in
the oracle pair implement the identical recurrence, so parity is exact).
Per-iteration ``localCheckpoint`` (optional) truncates lineage for long
runs, same pattern as connected_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .materialize import disk_ckpt


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Damped PageRank over a directed edge list, ``iterations`` rounds
    from a uniform score of 1.0. Returns (node, score).

    score_{k+1}(n) = (1-d) + d * Σ_{(m,n) ∈ E} score_k(m) / outdeg(m)

    Distinct edges only (parallel edges collapse); nodes = src ∪ dst.
    Each iteration is one equi-join + one hash aggregate — no driver-side
    state beyond the loop counter. ``checkpoint_every > 0`` truncates
    lineage with ``localCheckpoint`` for high iteration counts.

    EAGER: the static inputs (edge list, node set, weighted edges) are
    materialized at CALL time so the loop never re-evaluates the edge
    producer — build the result only when you intend to run it. The
    truncation also means downstream ``explain`` bottoms out at
    checkpointed-RDD scans: plan-shape audits of the edge PRODUCER must
    target the producer expression itself, not this operator's output.
    """
    # Materialize the STATIC loop inputs once: every iteration joins both
    # `weighted` and `nodes`, so an expensive edge producer upstream would
    # otherwise re-evaluate 2x per round (the CC-edges lesson, SCALE.md —
    # pin what the loop RE-READS, not just the evolving state). The edge
    # producer itself runs exactly once: nodes/outdeg/weighted all derive
    # from the checkpointed distinct edge list.
    e = disk_ckpt(edges.select(F.col(src).alias("_s"),
                           F.col(dst).alias("_d")).distinct())
    outdeg = e.groupBy("_s").agg(F.count("*").alias("_deg"))
    nodes = disk_ckpt(
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    scores = nodes.withColumn("score", F.lit(1.0))
    weighted = disk_ckpt(e.join(outdeg, "_s"))  # (_s, _d, _deg): static per run
    for i in range(iterations):
        contribs = (
            weighted.join(scores.withColumnRenamed("node", "_s"), "_s")
            .groupBy("_d")
            .agg(F.sum(F.col("score") / F.col("_deg")).alias("_mass"))
        )
        scores = (
            nodes.join(contribs.withColumnRenamed("_d", "node"), "node", "left")
            .select(
                "node",
                (F.lit(1.0 - damping)
                 + F.lit(damping) * F.coalesce(F.col("_mass"), F.lit(0.0))
                 ).alias("score"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            scores = disk_ckpt(scores)
    return scores


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    max_iters: int = 30,
) -> DataFrame:
    """Single-source(-set) BFS over a directed edge list: (node, dist)
    for every node reachable from ``sources`` (dist 0), following
    ``edges`` (src, dst) columns.

    The third classic next to connected components and PageRank —
    frontier expansion: each round is ONE equi-join (frontier ⋈ edges on
    src) + a distinct + an anti-join against the settled set, i.e. two
    bounded shuffles keyed on node id, the shape that runs on
    billion-edge graphs (GraphX/Pregel's iteration, expressed as
    DataFrames so Catalyst handles partitioning).  The frontier is
    ``localCheckpoint``-ed per round: lineage stays constant-depth and
    the empty-frontier driver test is the only per-round action.
    Unreachable nodes are absent from the output (match semantics of the
    recursive-CTE oracle).

    EAGER, like :func:`pagerank`: sources and the edge projection
    materialize at call time, and downstream plans bottom out at
    checkpointed-RDD scans — audit the edge producer's plan directly."""
    dist = disk_ckpt(sources.select(
        F.col("node").cast("long").alias("node"),
        F.lit(0).cast("long").alias("dist"),
    ))
    frontier = dist.select("node")
    # static per run; pinned so each frontier expansion re-reads the
    # materialized edge list, not its producer (the CC-edges lesson)
    e = disk_ckpt(edges.select(
        F.col("src").alias("_s"), F.col("dst").alias("_d")))
    for d in range(1, max_iters + 1):
        nxt = disk_ckpt(
            frontier.join(e, frontier["node"] == e["_s"])
            .select(F.col("_d").cast("long").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
        )
        if nxt.limit(1).count() == 0:
            break
        dist = disk_ckpt(dist.unionByName(
            nxt.withColumn("dist", F.lit(d).cast("long"))))
        frontier = nxt
    return dist
