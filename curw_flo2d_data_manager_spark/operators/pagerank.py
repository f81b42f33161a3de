"""PageRank over a document/vector graph (public method: Page et al.
1999 power iteration, expressed as DataFrame joins — the Pregel-free
formulation every MapReduce-era engine uses).

In a training-data pipeline the graph is the kNN graph from
:func:`operators.similarity.knn_graph` (rank ≈ retrieval authority /
centrality of a vector in embedding space) or a hyperlink graph from
URL extraction; rank feeds quality weighting and curriculum sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 5,
) -> DataFrame:
    """Fixed-iteration power-iteration PageRank on a directed graph.

    ``rank' (v) = (1−d)/N + d·(Σ_{u→v} rank(u)/outdeg(u) + D/N)`` where
    ``D`` is the total rank of dangling nodes (no out-edges),
    redistributed uniformly — the standard stochastic-matrix fixup, so
    ranks sum to exactly 1 every iteration.

    Deterministic: fixed iteration count (no convergence RNG), uniform
    ``1/N`` start, no randomness anywhere. Returns ``(node, rank)``,
    one row per distinct node appearing in ``edges``.

    Scale shape: per iteration, ONE shuffle of the edge relation keyed
    by ``src`` (the contribution join — ranks and out-degrees are
    node-sized relations) and one keyed by ``dst`` (the partial-
    aggregated contribution sum); the N and dangling scalars are 1-row
    aggregates broadcast via crossJoin, never collected. Ranks are
    ``localCheckpoint``-ed each round: each iteration references the
    previous ranks twice (contributions + dangling mass), so without
    lineage truncation the plan tree doubles per round. On a real
    cluster swap for a reliable ``checkpoint`` directory.
    """
    if iters < 1:
        raise ValueError(f"iters {iters} < 1")
    d = float(damping)
    # The edge relation is referenced every iteration — truncate its
    # lineage once so an expensive upstream (a kNN candidate join, an
    # LSH bucket join) is computed exactly once, not once per round.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("_deg"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    for _ in range(int(iters)):
        ranks = ranks.localCheckpoint(eager=True)
        contribs = (
            e.join(ranks.join(outdeg, ranks["node"] == outdeg["src"]), "src")
            .select("dst", (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_sum"))
        )
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(n))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - d) / F.col("_n")
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("_sum"), F.lit(0.0))
                        + F.col("_dang") / F.col("_n")
                    )
                ).alias("rank"),
            )
        )
    return ranks
