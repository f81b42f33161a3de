"""Connected components over a duplicate-pair graph.

The dedup operators (minhash LSH, SimHash, winnowing, embedding
near-dup) all emit PAIRS ``(id_a, id_b)``. Turning pairs into "keep
one document per duplicate CLUSTER" needs connected components:
transitive closure of the pair relation, labeling every node with the
minimum id in its component (the canonical survivor).

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — public
algorithm, implemented here from its published description):

* large-star: every node connects its STRICTLY LARGER neighbors to
  the minimum of its closed neighborhood;
* small-star: every node connects its not-larger neighbors (and
  itself) to that minimum.

Both steps are one ``groupBy(src).agg(min)`` + one re-expansion join —
pure shuffle-by-key operations, no driver-side graph state, so the
same plan runs on a 1000-executor cluster. The edge set shrinks
monotonically toward star graphs centered on each component's minimum;
convergence is O(log n) rounds (vs O(diameter) for naive label
propagation — a 1M-link chain converges in ~20 rounds, not 1M).

Driver involvement per round is ONE scalar action (the convergence
check on a multiset checksum of the edge set — no fixed-iteration
guess, no .collect() of data). Each round's edge set is
``localCheckpoint``-ed: both star steps reference the edge set twice,
so without lineage TRUNCATION (persist alone keeps the logical plan)
the plan tree quadruples per round and the driver dies on plan
handling long before data size matters. On a real cluster with
unreliable executors, swap ``localCheckpoint`` for a reliable
``checkpoint`` directory — same plan shape, storage-backed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Rounds taken by the most recent connected_components call (set after
# convergence) — observability for scale benches; not part of the API.
last_rounds: int = 0


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) symmetric → for each u: (v, m) for v > u, m = min(N(u) ∪ u)."""
    nbrs = edges.select(
        F.col("src"), F.col("dst")
    ).unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    m = (
        nbrs.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least("src", "_mn").alias("m"))
    )
    return (
        nbrs.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient u ≥ v; for each u: (v, m) for v in N(u) ∪ {u}, v ≠ m."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    re_pointed = (
        oriented.join(m, "src")
        .select(F.col("dst").alias("node"), F.col("m"))
        .unionByName(m.select(F.col("src").alias("node"), F.col("m")))
    )
    return (
        re_pointed.filter(F.col("node") != F.col("m"))
        .select(F.col("node").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
    driver_threshold: int = 500_000,
) -> DataFrame:
    """Label every node of the pair graph with its component minimum.

    Returns ``(id, component)`` — one row per distinct node appearing
    in ``pairs``, where ``component`` is the smallest id reachable via
    pair links (the canonical survivor for dedup: keep rows where
    ``id == component``). Deterministic; no randomness anywhere.

    ``max_rounds`` is a safety valve far above the O(log n) bound
    (2^50 nodes); hitting it raises rather than returning a partial
    labeling.

    **Adaptive small-graph path**: the distributed contraction pays a
    fixed per-round cost (localCheckpoint + convergence action) that
    dwarfs the data cost on small pair graphs — and dedup pair graphs
    are usually tiny relative to the corpus (only near-duplicates
    appear). When the edge count (one metadata-cheap count over the
    already-checkpointed edge set) is at most ``driver_threshold``,
    the labels come from a driver-side union-find over an Arrow
    collect instead — identical output, ~round-trip latency instead of
    O(log n) Spark jobs. Above the threshold (at most tens of MB on
    the driver) the star contraction runs as before; pass
    ``driver_threshold=0`` to force the distributed path.

    Ids of any type are accepted: integral ids run the contraction
    natively; string/UUID/other ids are xxhash64-mapped to long for
    the star rounds (collision-checked up front — one aggregate over
    the node set, which is tiny next to the edge rounds) and mapped
    back at the end, with ``component`` restored to the MINIMUM
    ORIGINAL id of the cluster so the documented canonical-survivor
    semantics hold for every id type (round-5 advice: the blind
    ``cast("long")`` crashed under ANSI mode on string ids and
    silently dropped every edge with ANSI off).
    """
    integral = {"tinyint", "smallint", "int", "bigint"}
    dtypes = dict(pairs.dtypes)
    native = dtypes[id_a] in integral and dtypes[id_b] in integral
    # ONE materialization of the (possibly expensive) pair plan, up
    # front: the returned labeling references the node set, which is
    # derived from ``pairs`` — without truncation here the CALLER's
    # final plan re-executes the entire upstream pair pipeline once
    # per branch it appears in (the sf0.1 LSH→CC→keep-one composite
    # ran its MinHash stage 3×: edge materialization + the two
    # cluster_assign branches — measured 15.1 s → 2.3 s end-to-end
    # after this truncation). Only the two id columns ride the
    # checkpoint.
    pairs = pairs.select(id_a, id_b).localCheckpoint(eager=True)
    # both endpoints from ONE scan of the checkpointed pair set
    # (explode of a 2-element array — identical node multiset to a
    # two-branch union, one traversal; the k_core/pagerank pattern)
    nodes = (
        pairs.select(F.explode(F.array(id_a, id_b)).alias("id"))
        .distinct()
    )
    if native:
        src, dst = F.col(id_a).cast("long"), F.col(id_b).cast("long")
    else:
        nodes = nodes.withColumn(
            "_h", F.xxhash64(F.col("id").cast("string"))
        ).localCheckpoint(eager=True)
        chk = nodes.agg(
            F.count(F.lit(1)).alias("n"), F.count_distinct("_h").alias("nh")
        ).collect()[0]
        if chk["n"] != chk["nh"]:
            raise ValueError(
                "connected_components: xxhash64 collision among "
                f"{chk['n']} non-integral ids — cannot map ids to long "
                "safely; pre-assign integral ids instead"
            )
        src = F.xxhash64(F.col(id_a).cast("string"))
        dst = F.xxhash64(F.col(id_b).cast("string"))
    # No up-front repartition: every round is shuffle-dominated (the
    # star groupBys), so parallelism comes from the shuffles and AQE
    # right-sizes the reducer count per round — a forced 32-way spread
    # of a small edge set only adds fixed per-round overhead.
    edges = (
        pairs.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=True)
    )

    global last_rounds
    if edges.count() <= driver_threshold:
        last_rounds = 0
        labels = _driver_union_find(edges)
        return _attach_labels(nodes, labels, native)

    # Convergence check: an order-insensitive multiset checksum of the
    # edge set (count + sum of per-edge hashes). The step function is
    # deterministic, so checksum-equal consecutive rounds means the
    # edge set is (with ~2^-64 hash-collision odds) the fixed point —
    # a star per component pointing at its minimum.
    prev_metric = None
    for last_rounds in range(1, max_rounds + 1):
        stepped = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        metric = stepped.agg(
            F.coalesce(
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        key = (metric["s"], metric["n"])
        edges = stepped
        if key == prev_metric:
            break
        prev_metric = key
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")

    # Fixed point: every edge is (node, component_min). Nodes that are
    # themselves the minimum appear only as dst — restore them via the
    # node set.
    labels = edges.select(
        F.col("src").alias("_lid"), F.col("dst").alias("_lcomp")
    )
    return _attach_labels(nodes, labels, native)


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Exact (node, min-reachable-id) labels for a SMALL edge set via
    a driver-side union-find over an Arrow collect. Same output shape
    as the star-contraction fixed point: one row per non-isolated
    node, ``(_lid, _lcomp)`` longs."""
    pdf = edges.toPandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for s, d in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            parent[rd] = rs
    comp_min: dict[int, int] = {}
    for x in list(parent):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    rows = [(x, comp_min[find(x)]) for x in parent]
    # deliberately createDataFrame, NOT plan_literals.literal_rows_df:
    # this fast path carries up to ~500k labels — a real (if small)
    # relation; inlining it as plan literals would bloat the plan tree
    # far past what the Python-RDD scan costs (round-14 audit).
    return edges.sparkSession.createDataFrame(
        rows, "_lid long, _lcomp long"
    )


def _attach_labels(nodes: DataFrame, labels: DataFrame, native: bool) -> DataFrame:
    """Join component labels back onto the node set. ``labels`` is
    ``(_lid, _lcomp)`` over the (possibly hashed) long node keys;
    isolated nodes (absent from labels) become their own component."""
    if native:
        return nodes.join(
            labels, nodes["id"] == labels["_lid"], "left"
        ).select(
            F.col("id"),
            F.coalesce(F.col("_lcomp"), F.col("id")).alias("component"),
        )
    # Hashed path: map hash labels back to original ids, then restore
    # the min-ORIGINAL-id canonical per cluster (the hash min is a
    # deterministic but arbitrary member). Two joins + one aggregate
    # over the label set — one row per node, tiny next to the rounds.
    with_comp = nodes.join(
        labels, nodes["_h"] == labels["_lid"], "left"
    ).select("id", F.coalesce("_lcomp", "_h").alias("_hcomp"))
    canon = with_comp.groupBy("_hcomp").agg(F.min("id").alias("component"))
    return with_comp.join(canon, "_hcomp").select("id", "component")


def cluster_assign(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Attach the dedup-cluster decision to every corpus row id:
    ``(id_col, component, cluster_size, keep)`` where ``component`` is
    the connected-component minimum over ``pairs`` (rows not in any
    pair form singleton clusters) and ``keep`` marks the per-cluster
    survivor. Join ``keep`` back onto the full corpus (or anti-join
    the drops) to materialize the deduplicated output.
    """
    comp = connected_components(pairs, pair_a, pair_b)
    labeled = (
        corpus.select(F.col(id_col))
        .join(comp, F.col(id_col) == F.col("id"), "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        )
    )
    # sizes has one row per cluster — unbounded at corpus scale, so no
    # broadcast hint: AQE picks broadcast when it actually fits.
    sizes = labeled.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labeled.join(sizes, "component").select(
        id_col,
        "component",
        "cluster_size",
        (F.col(id_col) == F.col("component")).alias("keep"),
    )


def label_propagation(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    n_iters: int = 3,
) -> DataFrame:
    """Synchronous label propagation (community detection): every node
    starts labeled with itself; each iteration relabels every node
    with the label MOST FREQUENT among its neighbors, ties broken by
    the smallest label. Where connected_components answers "reachable
    at all?" and PageRank answers "how central?", LPA answers "which
    densely-linked cluster?" — near-dup families inside one giant
    component, topic communities in a citation graph.

    Fixed ``n_iters`` synchronous rounds with a total tiebreak make
    the result fully deterministic (the classic async/random-order LPA
    is not) — the property that lets a SQL oracle replay it exactly.
    The standard synchronous caveat applies: bipartite-like structures
    can oscillate between rounds (a 2-node graph swaps labels every
    round — pinned in tests); communities denser than their cut edges
    converge, and even the oscillation is deterministic. Async LPA
    avoids oscillation by sacrificing exactly the determinism this
    operator exists to provide.

    Scale shape per iteration: one shuffle of the edge relation keyed
    (node, neighbor_label) with map-side partial counts, then the
    argmax collapses on (node) via a ``max(struct(cnt, -label))``
    aggregate — partial-aggregable, NO rank window, so a hub node's
    count rows spread across partials instead of sorting in one task.
    Labels' lineage grows LINEARLY (referenced once per round), so
    truncation happens only every 4th round — per-round checkpoints
    were pure job barriers; small fixed-iteration runs fuse into one
    job. Edges are symmetrized internally; isolated nodes never
    appear (every node in ``pairs`` has degree ≥ 1).

    Returns ``(id, label)``, one row per distinct node.
    """
    src, dst = F.col(id_a).cast("long"), F.col(id_b).cast("long")
    fwd = pairs.select(src.alias("u"), dst.alias("v"))
    rev = pairs.select(dst.alias("u"), src.alias("v"))
    edges = fwd.unionByName(rev).distinct().localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    for it in range(n_iters):
        nb = edges.join(
            labels.withColumnRenamed("id", "v"), "v"
        ).select(F.col("u").alias("id"), "label")
        cnt = nb.groupBy("id", "label").agg(F.count(F.lit(1)).alias("cnt"))
        labels = (
            cnt.groupBy("id")
            .agg(
                F.max(
                    F.struct(
                        F.col("cnt"), (-F.col("label")).alias("neg")
                    )
                ).alias("m")
            )
            .select("id", (-F.col("m.neg")).alias("label"))
        )
        # Lineage grows LINEARLY here (labels is referenced once per
        # round, unlike the star-contraction's double references), so
        # per-round truncation is pure overhead for the typical small
        # n_iters — an eager localCheckpoint is a full job barrier per
        # round (measured: 3-round LPA on 1.2M edges 5.2 s → ~3 s
        # without them). Truncate every 4th round so deep runs keep a
        # bounded plan, and let Spark fuse the rest into one job.
        if (it + 1) % 4 == 0 and (it + 1) < n_iters:
            labels = labels.localCheckpoint(eager=True)
    return labels


def k_core(
    edges: DataFrame,
    k: int = 4,
    n_rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core via ``n_rounds`` synchronous peeling rounds: each round
    drops every node with degree < k and the edges touching it. The
    peel is IDEMPOTENT once the core stabilizes, so a fixed round
    count past the graph's peel depth computes the exact k-core while
    keeping the computation (and its SQL oracle — unrolled CTE stages,
    the label_propagation pattern) engine-deterministic; under-budget
    rounds are still well-defined ("the graph after R peels").

    Scale shape: per round, one degree aggregation (partial-agg
    friendly) and two left-semi joins on the endpoint — key-partitioned
    shuffles of id pairs only. Unlike LPA's labels, the edge relation
    is referenced THREE times per round (degree + both semi joins), so
    lineage grows 3^R without truncation — each round's survivor set is
    localCheckpoint-ed (the star-contraction rationale, not the LPA
    one).

    Returns (node, degree) for nodes whose degree within the peeled
    graph is still ≥ k — the k-core membership with its core degree.

    Convergence (round-10 advice): each round's survivor edge count is
    already materialized by the per-round localCheckpoint, so the loop
    EARLY-EXITS the moment a peel removes nothing — the result is then
    the exact k-core regardless of ``n_rounds`` (the peel is
    idempotent, so stopping early equals running the remaining rounds).
    If the budget is exhausted while the last round still removed
    edges, the result is only "the graph after ``n_rounds`` peels" — a
    SUPERSET of the true k-core — and a ``UserWarning`` says so, so
    callers (CLI, graph pipelines) are never silently over-counting.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # count() over a checkpointed relation is a cheap metadata-ish job
    # (no recompute); one BIGINT per round buys the convergence proof.
    prev_edges = e.count()
    converged = prev_edges == 0
    for _ in range(n_rounds):
        if converged:
            break
        # both endpoints from ONE scan of the checkpointed edge set
        # (explode of a 2-element array - identical node multiset to
        # the old two-branch union, one traversal; guide §2.4)
        deg = (
            e.select(F.explode(F.array("a", "b")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_edges = e.count()
        converged = n_edges == prev_edges
        prev_edges = n_edges
    if not converged:
        import warnings

        warnings.warn(
            f"k_core(k={k}): round budget n_rounds={n_rounds} exhausted "
            "while peels were still removing edges — result is the graph "
            f"after {n_rounds} peels, a SUPERSET of the true {k}-core; "
            "raise n_rounds for the exact core.",
            UserWarning,
            stacklevel=2,
        )
    final_deg = (
        e.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return final_deg.filter(F.col("degree") >= k)


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    n_rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """Multi-source BFS hop distances: the exact distance (≤
    ``n_rounds``) from every node to its NEAREST source — the
    reachability/radius primitive the rest of the graph family
    (components / PageRank / k-core / link prediction) doesn't cover;
    "how far is every record from a trusted seed set" in provenance
    and contamination-spread analyses.

    Synchronous frontier relaxation: per round, every labeled node
    offers dist+1 to its neighbors and each node keeps the MIN —
    integer distances, deterministic on any engine/partitioning
    (min is associative), so an unrolled-CTE SQL oracle replays it
    exactly. Nodes farther than ``n_rounds`` hops are absent from the
    result (the documented horizon — callers pick the round budget
    like k_core's, and the relaxation is idempotent past the graph's
    true eccentricity).

    Scale shape per round: one key shuffle of the (neighbor, dist)
    offer relation + a partial-aggregable min. ``dists`` is referenced
    TWICE per round (the join and the union), so lineage doubles per
    round without truncation — checkpoint every second round (the
    k_core rationale, halved).

    Returns (node, dist), dist 0 for the sources themselves.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # symmetrize via ONE generator (the pagerank pattern): a union's
    # two branches each scan the checkpointed edge set — and adj is
    # re-derived in EVERY round's frontier join, so the union form
    # pays 2 scans per round; identical directed-edge multiset
    adj = e.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("node"), F.col("b").alias("nb")),
                F.struct(F.col("b").alias("node"), F.col("a").alias("nb")),
            )
        ).alias("p")
    ).select("p.node", "p.nb")
    dists = sources.select(
        F.col(id_col).cast("long").alias("node"), F.lit(0).alias("dist")
    ).distinct()
    for r in range(n_rounds):
        offers = adj.join(dists, "node").select(
            F.col("nb").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        dists = (
            dists.unionAll(offers)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if (r + 1) % 2 == 0 and (r + 1) < n_rounds:
            dists = dists.localCheckpoint(eager=True)
    return dists
