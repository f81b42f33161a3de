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


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str | None = None,
    iters: int = 5,
    scale: int = 10**12,
    d_num: int = 17,
    d_den: int = 20,
) -> DataFrame:
    """WEIGHTED PageRank in exact integer fixed-point — every
    operation is BIGINT multiply / integer-divide / sum, so the result
    is bit-identical on any engine and any partitioning (integer sums
    are associative; float PageRank's Σ rank·w/deg accumulates in
    shuffle order and drifts in the last ulps, which a cross-engine
    oracle over hundreds-of-edge nodes cannot round away).

    rank'·S = ((d_den−d_num)·S) DIV (d_den·N)
              + (d_num · Σ_{u→v} (rank_u·S · w_uv) DIV W_u) DIV d_den

    with S = ``scale`` (ranks carried as rank·S), damping d =
    d_num/d_den, W_u = Σ outgoing weight of u (``weight_col`` must be
    integral; None = 1 per edge). Truncation loses ≤ 1/S per term —
    the result is PageRank to ~12 decimal digits, deterministically.
    Dangling mass is NOT redistributed (dangling nodes keep receiving
    the teleport share only) — callers with dangling nodes and exact
    mass-conservation needs want the float :func:`pagerank`.

    Scale shape: per iteration one edge shuffle keyed by src and one
    partial-aggregated sum keyed by dst — but unlike the float
    :func:`pagerank` (whose dangling aggregate references ranks a
    SECOND time per round, doubling lineage without a checkpoint
    barrier), this recurrence reads ranks exactly once per round, so
    lineage grows LINEARLY and the whole ``iters``-round pipeline runs
    as ONE job with no per-round materialization barrier (the round-9
    LPA lesson: checkpointing a linear-lineage loop is pure overhead —
    removing it cut g_pagerank_weighted ~5.3 → ~4.5 s at sf0.1).
    Overflow headroom: rank·S ≤ S, so terms stay ≤ S·max_w ≪ 2⁶³ for
    any realistic integer weight.

    Returns (node, rank_fp) with rank_fp = rank·S as BIGINT.
    """
    if iters < 1:
        raise ValueError(f"iters {iters} < 1")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    # nonpositive weights have no PageRank meaning and a node whose
    # total outgoing weight is 0 would hit an ANSI division error in
    # the contribution DIV — drop such edges up front (documented
    # semantics: only positive-weight edges carry rank)
    e = (
        edges.select(
            F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("_w")
        )
        .filter(F.col("_w") > 0)
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.agg(F.count(F.lit(1)).alias("_n"))
    outw = e.groupBy("src").agg(F.sum("_w").alias("_degw"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", F.expr(f"{scale} DIV _n").alias("rank_fp")
    )
    teleport = F.expr(f"{(d_den - d_num) * scale} DIV ({d_den} * _n)")
    for _ in range(int(iters)):
        contribs = (
            e.join(ranks.join(outw, ranks["node"] == outw["src"]), "src")
            .select(
                "dst",
                F.expr("(rank_fp * _w) DIV _degw").alias("_c"),
            )
            .groupBy("dst")
            .agg(F.sum("_c").alias("_sum"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    teleport
                    + F.expr(
                        f"({d_num} * coalesce(_sum, 0L)) DIV {d_den}"
                    )
                ).alias("rank_fp"),
            )
        )
    return ranks


def hits_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    scale: int = 10**9,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, public method) in
    exact integer fixed-point with per-round L1 normalization:

        a'_v = Σ_{u→v} h_u              (raw authority)
        a_v  = (a'_v · S) DIV Σ a'      (L1-normalized, carried ·S)
        h'_u = Σ_{u→v} a_v              (raw hub)
        h_u  = (h'_u · S) DIV Σ h'

    Every operation is BIGINT multiply / integer-divide / sum, so the
    result is bit-identical on any engine and any partitioning — the
    same exactness recipe as :func:`pagerank_fixed_point`, which a
    float HITS (whose normalization denominator is a float sum in
    shuffle order) cannot offer a cross-engine oracle.

    Scale shape: per half-round one edge shuffle keyed by src or dst
    plus one partial-aggregated sum. UNLIKE the PageRank recurrence,
    each normalized relation is referenced TWICE (the join feeding the
    next half-round AND its own 1-row L1 total), so the raw aggregate
    is localCheckpoint-ed per half-round — without it lineage doubles
    per reference (the round-9/11 checkpoint rule: count references
    per loop body).

    Overflow headroom: the start vector is L1-normalized
    (h₀ = S DIV N), and every later vector is L1-normalized by
    construction, so any raw aggregate is ≤ Σ h ≤ S and the
    normalization product raw·S ≤ S² = 10¹⁸ < 2⁶³ at the default
    scale (requires N ≤ S nodes). Dangling/sourceless nodes keep
    score 0 through the DIV (COALESCE to 0 raw).

    Returns (node, hub_fp, auth_fp), one row per distinct node.
    """
    if iters < 1:
        raise ValueError(f"iters {iters} < 1")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Runtime guard (round-11 advice): with n > scale the integer
    # start value scale DIV n is 0 for every node, the L1 total is 0,
    # and the normalization DIV divides by zero — fail loudly instead.
    # The count is a 1-row aggregate over the already-checkpointed
    # node set; the collected value also replaces the former
    # broadcast-crossJoin (same integer DIV, one job cheaper).
    n_nodes = nodes.count()
    if n_nodes > scale:
        raise ValueError(
            f"n_nodes {n_nodes} > scale {scale}: fixed-point start "
            "value would be 0 (raise scale)"
        )
    hub = nodes.select(
        "node",
        F.lit(int(scale) // max(n_nodes, 1)).cast("long").alias("h"),
    )
    auth = None
    for _ in range(int(iters)):
        a_raw = (
            e.join(hub, e["src"] == hub["node"])
            .groupBy("dst")
            .agg(F.sum("h").alias("_raw"))
            .localCheckpoint(eager=True)  # consumed by total + join
        )
        a_tot = a_raw.agg(F.sum("_raw").alias("_tot"))
        auth = (
            nodes.join(a_raw, nodes["node"] == a_raw["dst"], "left")
            .crossJoin(F.broadcast(a_tot))
            .select(
                "node",
                F.expr(
                    f"(coalesce(_raw, 0L) * {int(scale)}) DIV _tot"
                ).alias("a"),
            )
        )
        h_raw = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum("a").alias("_raw"))
            .localCheckpoint(eager=True)
        )
        h_tot = h_raw.agg(F.sum("_raw").alias("_tot"))
        hub = (
            nodes.join(h_raw, nodes["node"] == h_raw["src"], "left")
            .crossJoin(F.broadcast(h_tot))
            .select(
                "node",
                F.expr(
                    f"(coalesce(_raw, 0L) * {int(scale)}) DIV _tot"
                ).alias("h"),
            )
        )
    return (
        hub.join(
            auth.select(F.col("node").alias("_n"), "a"),
            hub["node"] == F.col("_n"),
        )
        .select(
            "node",
            F.col("h").alias("hub_fp"),
            F.col("a").alias("auth_fp"),
        )
    )
