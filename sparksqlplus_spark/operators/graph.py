"""Iterative graph algorithms as DataFrame power iterations.

Engine extensions beyond the reference surface (its graph workload is
pattern *queries* — cycles, paths, counts; see SURVEY.md §2). These add
the iterative layer a graph-shaped corpus pipeline needs (rank-based
document/page scoring feeding quality filters). Connected components
for dedup clustering lives in operators/dedup.py:dedup_clusters.

Scale design shared by the iterations: per round exactly one join keyed
by the edge source + one aggregation keyed by the destination — the
standard shuffle-bound power iteration. The edge/degree table is
persisted once; each round's rank frame is persisted and the previous
round released (bounded cache: 2 x |nodes| rows at any moment). No
driver-side graph, no collect — rounds are fixed, not convergence-
polled, so the plan is static and AQE-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    prepartition: bool = False,
) -> DataFrame:
    """PageRank by fixed-round power iteration over an edge DataFrame.

    Node set = distinct sources ∪ destinations; ranks start at 1.0 and
    update as r(v) = (1 − d) + d · Σ_{(u,v)∈E} r(u)/outdeg(u). Nodes
    without in-edges settle at 1 − d; dangling nodes (no out-edges)
    simply don't contribute (no dangling-mass redistribution — ranks
    are scores, not a probability distribution; documented choice, and
    exactly reproducible in plain SQL for the oracle).

    Returns (node, rank) — deterministic up to float summation order.
    The returned frame is left persisted (it is the last iteration's
    state); callers that are done with it should ``unpersist()``.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    deg = edges.groupBy(src).agg(F.count("*").alias("__deg"))
    e = edges.join(deg, src).select(
        F.col(src).alias("__s"), F.col(dst).alias("__d"), F.col("__deg")
    )
    if prepartition:
        # hash-partition by the join key once so each iteration's rank
        # join reuses the layout. Measured OFF by default
        # (scripts/exp_pagerank_prepart.py, sf0.1: ratio 0.97x): at
        # bench scale the rank frame sits under the broadcast
        # threshold, edges never shuffle in either variant, and this
        # exchange is pure overhead. Flip it on when |nodes| is too
        # large to broadcast — that is when the per-round edge shuffle
        # it avoids actually exists.
        e = e.repartition("__s")
    e = e.persist()
    e.count()
    ranks = nodes.select("node", F.lit(1.0).alias("rank")).persist()
    ranks.count()
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["__s"] == ranks["node"])
            .select(
                F.col("__d").alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__m"))
        )
        new_ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce("__m", F.lit(0.0))
            ).alias("rank"),
        )
        new_ranks = new_ranks.persist()
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    e.unpersist()
    nodes.unpersist()
    return ranks
