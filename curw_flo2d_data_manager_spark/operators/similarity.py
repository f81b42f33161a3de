"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — exact brute-force top-k: broadcast the query
  set, scan the corpus once, rank per query. The baseline and the
  verifier for the approximate paths.
* :func:`ivf_topk` — IVF-style scale path: KMeans coarse quantizer,
  corpus bucketed by nearest centroid (precomputed once), queries
  probe ``nprobe`` nearest centroids; the candidate join is an
  equi-join on centroid id, so compared pairs drop by ~n_clusters/nprobe.
* :func:`cosine_dedup_pairs` — embedding near-duplicate pairs above a
  cosine threshold (brute force within blocks).

Dot products are native expressions (``zip_with`` + ``aggregate``) —
they run in codegen; there is no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from curw_flo2d_data_manager_spark.functions.plan_literals import (
    lit_array,
    lit_cube,
    lit_matrix,
)
from curw_flo2d_data_manager_spark.operators.parallelism import ensure_min_partitions


def dot(a: Column, b: Column) -> Column:
    # cast BEFORE multiplying: float32 embeddings would otherwise lose
    # bits in the float product and drift from double-precision oracles
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` must be small enough to broadcast (the usual case —
    a query batch); the corpus streams through one scan. Norms are
    precomputed on both sides so the inner loop is one dot product.
    """
    c = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("_cv"),
    ).withColumn("_cn", l2_norm(F.col("_cv")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
    ).withColumn("_qn", l2_norm(F.col("_qv")))

    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", dot(F.col("_cv"), F.col("_qv")) / (F.col("_cn") * F.col("_qn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "corpus_id", "cosine", F.col("_rk").alias("rank"))
    )


def _unit(v: Column) -> Column:
    n = l2_norm(v)
    return F.transform(
        v.cast("array<double>"),
        lambda x: F.when(n == 0, F.lit(0.0)).otherwise(x / n),
    )


def _numpy_kmeans(X, k: int, seed: int, max_iter: int = 25, tol: float = 1e-6):
    """Seeded kmeans++ init + Lloyd iterations on a driver-side sample
    (NumPy). Deterministic for a given (sample, k, seed). Empty
    clusters keep their previous centroid."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = X.shape[0]
    k = min(k, n)
    # kmeans++ seeding
    centers = [X[rng.randint(n)]]
    d2 = ((X - centers[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        total = d2.sum()
        if total <= 0:
            centers.append(X[rng.randint(n)])
        else:
            centers.append(X[rng.choice(n, p=d2 / total)])
        d2 = np.minimum(d2, ((X - centers[-1]) ** 2).sum(axis=1))
    C = np.asarray(centers)
    for _ in range(max_iter):
        # pairwise squared distances via the expansion trick
        d = ((X**2).sum(1)[:, None] - 2 * X @ C.T + (C**2).sum(1)[None, :])
        assign = d.argmin(axis=1)
        newC = C.copy()
        for j in range(k):
            members = X[assign == j]
            if len(members):
                newC[j] = members.mean(axis=0)
        shift = float(((newC - C) ** 2).sum())
        C = newC
        if shift < tol:
            break
    return [list(map(float, c)) for c in C]


# Above this many centroids the in-plan HOF argmin (interpreted —
# higher-order functions don't codegen) loses to an Arrow-vectorized
# NumPy matmul: at k=62 × dim 64 the expression form made the 1M-vector
# assign pass ~1.8× slower than the old pyspark.ml transform, while the
# Arrow form beats both. Small k (every sf-test path uses k ≤ 8) stays
# pure-expression, keeping the oracle plans Python-free.
_EXPR_ASSIGN_MAX_K = 24


def _centroid_assign_arrow(unit_vec: Column, centers: list[list[float]]) -> Column:
    """Arrow-batched argmin assign for LARGE centroid matrices: one
    NumPy ``X @ C.T`` per batch (vectorized C), first-index tiebreak
    identical to :func:`centroid_assign_expr`. The centroid matrix is
    a closure constant (driver-bounded by construction).

    The matmul expansion (x² − 2x·c + c²) and the expression path's
    sequential fold of (x−y)² can disagree in the last ulp, so rows
    whose best-vs-second-best matmul gap is inside a conservative
    near-tie band are recomputed with a dimension-ordered accumulation
    — bit-identical to the JVM fold's summation order (verified by
    test) — making the assignment IDENTICAL across the
    ``_EXPR_ASSIGN_MAX_K`` boundary. The band (1e-9 relative) is ~1e4×
    wider than the worst-case rounding divergence (~dim·4·ulp for unit
    vectors) yet empty on any non-degenerate batch, so the fast path
    stays one matmul."""
    import numpy as np
    from pandas import Series
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centers, dtype="float64")
    c2 = (C * C).sum(axis=1)[None, :]
    k = C.shape[0]

    def _exact_d2(X):
        # same summation order as the expression fold: accumulate
        # (x_j - c_j)^2 over dimensions left-to-right in doubles
        d = np.zeros((X.shape[0], k))
        for j in range(C.shape[1]):
            t = X[:, j, None] - C[None, :, j]
            d += t * t
        return d

    def _assign(v):
        # NULL vectors must yield NULL cluster (parity with the k<=24
        # expression path, where null propagates through the fold) —
        # np.asarray on a list containing None raises instead
        out = Series([None] * len(v), dtype="Int32")
        mask = v.notna().to_numpy()
        if mask.any():
            X = np.asarray(v[mask].tolist(), dtype="float64")
            d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c2
            idx = d.argmin(axis=1).astype("int32")
            if k > 1:
                part = np.partition(d, 1, axis=1)
                near = (part[:, 1] - part[:, 0]) <= 1e-9 * np.maximum(
                    1.0, np.abs(part[:, 0])
                )
                if near.any():
                    idx[near] = (
                        _exact_d2(X[near]).argmin(axis=1).astype("int32")
                    )
            out[mask] = idx
        return out

    # module-wide `from __future__ import annotations` stringifies
    # inline hints, which pandas_udf's eval-type inference can't
    # resolve for locally-imported names — attach real objects instead
    _assign.__annotations__ = {"v": Series, "return": Series}
    return pandas_udf(_assign, "int")(unit_vec)


def assign_clusters_col(unit_vec: Column, centers: list[list[float]]) -> Column:
    """Cluster id for a UNIT vector column against stored centers —
    expression argmin for bounded k, Arrow/NumPy argmin past
    ``_EXPR_ASSIGN_MAX_K``. Identical assignment either way: same
    metric (squared euclidean on the unit sphere), same smallest-index
    tiebreak, and the Arrow path recomputes near-tie rows in the
    expression fold's exact summation order so the argmin cannot
    diverge across the k boundary (see _centroid_assign_arrow)."""
    if len(centers) <= _EXPR_ASSIGN_MAX_K:
        return centroid_assign_expr(unit_vec, centers)
    return _centroid_assign_arrow(unit_vec, centers)


def centroid_assign_expr(vec: Column, centers: list[list[float]]) -> Column:
    """Cluster id for ``vec`` against a literal centroid matrix: argmin
    of squared distance, first-index tiebreak — one in-plan array
    expression, JVM-side, no model object. Suited to bounded k (the
    centroid matrix is a plan literal).

    The matrix rides as k+1 plan nodes (one row Literal per centroid,
    see functions/plan_literals.py) instead of k·dim element
    expressions, and the argmin is ONE transform lambda template
    instead of k copies of the fold — both matter because Catalyst
    re-walks and codegen reprints the tree in every branch the
    expression appears in (IVF-PQ composes it into 3 join branches)."""
    centers_arr = lit_matrix(centers)
    d2s = F.transform(
        centers_arr,
        lambda ctr: F.aggregate(
            F.zip_with(vec, ctr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )
    return (F.array_position(d2s, F.array_min(d2s)) - 1).cast("int")


def build_ivf_index(
    corpus: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_sample_size: int | None = 100_000,
) -> tuple[DataFrame, list[list[float]]]:
    """One-time IVF index build (the expensive half of :func:`ivf_topk`,
    split out so the index is REUSABLE across query batches):
    spherical KMeans over L2-normalized vectors.

    The quantizer is trained on a bounded deterministic hash-sample of
    at most ``train_sample_size`` vectors (the standard IVF recipe:
    KMeans quality saturates long before the full corpus, and each
    KMeans iteration is otherwise a full-corpus pass), then ONE full
    assign pass places every corpus vector in its cell. The sample
    filter is a pure hash threshold on the id column — deterministic
    under any partitioning.

    Because the training sample is driver-bounded by construction
    (≤ ~train_sample_size × dim doubles, tens of MB), the fit itself
    runs DRIVER-SIDE: one Arrow collect of the sample, then seeded
    NumPy kmeans++ + Lloyd — deterministic for a given (corpus, seed),
    and zero per-iteration Spark jobs (the old distributed
    ``pyspark.ml`` fit paid ~20 scheduler round-trips to cluster a
    sample that fits in L3; measured 8.4 s → ~3 s on the sf0.1
    composite). The corpus-wide assign pass stays distributed: one
    scan with an in-plan argmin against the centroid literal
    (:func:`centroid_assign_expr`). Pass ``train_sample_size=None`` to
    train on everything with the distributed ``pyspark.ml`` KMeans
    (the unbounded-corpus path).

    Returns ``(assignments, centers)``:

    * ``assignments`` — DataFrame ``(corpus_id, embedding, cluster)``;
      persist it with
      ``assignments.write.partitionBy("cluster").parquet(path)`` so
      later query batches scan ONLY the probed clusters' partitions
      (partition pruning on the equi-join key — at 100 TB this is the
      difference between reading nprobe/n_clusters of the corpus and
      all of it);
    * ``centers`` — plain ``list[list[float]]`` (n_clusters × dim),
      JSON-serializable; store next to the parquet.

    Reload with ``spark.read.parquet(path)`` + ``json.load`` and hand
    both to :func:`ivf_query`.
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_cv")
    ).withColumn("_unit", _unit(F.col("_cv")))

    if train_sample_size is not None:
        import numpy as np

        n = c.count()
        train = c
        if n > train_sample_size:
            # keep ids whose hash lands under the per-million threshold;
            # expectation ≈ train_sample_size rows, exact set independent
            # of partitioning (ids hash the same everywhere)
            ppm = max(1, int(train_sample_size / n * 1_000_000))
            train = c.filter(
                F.pmod(F.xxhash64("corpus_id", F.lit(seed)), F.lit(1_000_000)) < ppm
            )
        sample = train.select("_unit").toPandas()
        X = np.asarray(sample["_unit"].tolist(), dtype="float64")
        centers = _numpy_kmeans(X, n_clusters, seed)
        assignments = c.select(
            "corpus_id",
            F.col("_cv").alias("embedding"),
            assign_clusters_col(F.col("_unit"), centers).alias("cluster"),
        )
        return assignments, centers

    # unbounded training set: distributed pyspark.ml fit
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = c.withColumn("_feat", array_to_vector(F.col("_unit")))
    train = feat.persist()
    try:
        km = KMeans(
            k=n_clusters, seed=seed, featuresCol="_feat", predictionCol="_cluster"
        )
        model = km.fit(train)
    finally:
        train.unpersist()
    assignments = model.transform(feat).select(
        "corpus_id",
        F.col("_cv").alias("embedding"),
        F.col("_cluster").alias("cluster"),
    )
    centers = [list(map(float, ctr)) for ctr in model.clusterCenters()]
    return assignments, centers


def ivf_assign(
    batch: DataFrame,
    centers: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign NEW vectors to an EXISTING IVF quantizer — the
    incremental-index-maintenance half of :func:`build_ivf_index`:
    ingest batches get their cluster id from the stored centers (the
    quantizer's normalized-euclidean metric, nearest center, smallest
    index on ties) with NO retraining and no shuffle, and the result
    appends directly into the ``partitionBy("cluster")`` parquet index
    (``.write.mode("append").partitionBy("cluster")``). Re-train only
    when drift makes cells unbalanced — the standard IVF operating
    recipe. Output schema matches ``build_ivf_index``'s assignments:
    ``(corpus_id, embedding, cluster)``.
    """
    return batch.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("embedding"),
        assign_clusters_col(_unit(F.col(vec_col)), centers).alias("cluster"),
    )


def ivf_query(
    assignments: DataFrame,
    centers: list[list[float]],
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a prebuilt IVF index (from :func:`build_ivf_index`,
    possibly round-tripped through parquet + JSON): rank centroids per
    query in the quantizer's own normalized-euclidean metric, keep
    ``nprobe``, equi-join into the probed clusters, exact-cosine
    re-rank. Same output schema as :func:`cosine_topk`."""
    c_assigned = assignments.select(
        "corpus_id",
        F.col(vec_col).alias("_cv"),
        F.col("cluster").alias("_cluster"),
    )
    # k+1 plan nodes — one row Literal per centroid (plan_literals.py)
    centers_arr = lit_matrix(centers)

    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    # rank centroids per query by euclidean distance of the NORMALIZED
    # query (the quantizer's own metric), keep nprobe
    sqdist = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    q_probes = (
        q.withColumn("_ctrs", centers_arr)
        .select(
            "query_id",
            "_qv",
            F.posexplode("_ctrs").alias("_cluster", "_ctr"),
        )
        .withColumn("_qdist", sqdist(_unit(F.col("_qv")), F.col("_ctr")))
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.asc("_qdist"), F.asc("_cluster"))
    q_sel = (
        q_probes.withColumn("_prk", F.row_number().over(w_probe))
        .filter(F.col("_prk") <= nprobe)
        .select("query_id", "_qv", "_cluster")
    )

    cand = c_assigned.join(F.broadcast(q_sel), "_cluster")
    scored = cand.withColumn(
        "cosine",
        dot(F.col("_cv"), F.col("_qv")) / (l2_norm(F.col("_cv")) * l2_norm(F.col("_qv"))),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "corpus_id", "cosine", F.col("_rk").alias("rank"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: spherical IVF coarse quantization via KMeans
    — :func:`build_ivf_index` + :func:`ivf_query` in one call (for
    one-shot use; batch deployments build once and reuse).

    Vectors are L2-normalized before the KMeans fit and cell
    assignment, and probe selection ranks centroids by euclidean
    distance in the SAME normalized space — on the unit sphere
    euclidean order is exactly cosine order, so the quantizer's
    assignment metric and the query's probe metric agree. (Ranking
    probes by one metric while assigning cells by another loses even
    a query's own cell — found by the planted-duplicate oracle.)

    Returns the same schema as :func:`cosine_topk`. Recall < 1.0 by
    construction; raise ``nprobe``/``n_clusters`` to trade cost for
    recall.
    """
    from curw_flo2d_data_manager_spark.operators.caching import persist_tracked

    assignments, centers = build_ivf_index(
        corpus, n_clusters=n_clusters, id_col=id_col, vec_col=vec_col, seed=seed
    )
    # materialize the assignment once (tracked; caller frees via
    # release_caches): the in-plan assign expression would otherwise be
    # recomputed — and recompiled — in every downstream join branch
    # (the one-shot analog of the batch recipe's partitionBy(cluster)
    # parquet persist)
    assignments = persist_tracked(assignments)
    return ivf_query(
        assignments,
        centers,
        queries,
        k=k,
        nprobe=nprobe,
        query_id_col=query_id_col,
        vec_col=vec_col,
    )


def cosine_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine ≥ threshold), id_a < id_b.

    Brute force within blocks; pass ``block_col`` (e.g. an IVF cluster
    or LSH bucket) at scale.
    """
    base = ensure_min_partitions(df).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        (F.col(block_col) if block_col else F.lit(1)).alias("_blk"),
    ).withColumn("_n", l2_norm(F.col("_v")))
    l, r = base.alias("l"), base.alias("r")
    pairs = l.join(
        r, (F.col("l._blk") == F.col("r._blk")) & (F.col("l._id") < F.col("r._id"))
    ).withColumn(
        "cosine",
        # try_divide: a zero-norm (all-zero) vector has no defined
        # cosine — NULL never clears the threshold, so such rows are
        # always kept rather than erroring under ANSI mode
        F.try_divide(
            dot(F.col("l._v"), F.col("r._v")),
            F.col("l._n") * F.col("r._n"),
        ),
    )
    return pairs.filter(F.col("cosine") >= threshold).select(
        F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"), "cosine"
    )


def knn_graph(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    mutual: bool = False,
) -> DataFrame:
    """k-nearest-neighbor graph over an embedding corpus: for every
    vector, directed edges to its ``k`` highest-cosine OTHER vectors —
    the input to graph-based clustering, kNN-LM retrieval, and
    connectivity-based semantic dedup.

    Returns ``(src, dst, cosine, rank)``, rank 1..k per src (fewer if
    the block has < k+1 members), ties broken by smallest dst id.
    ``mutual=True`` keeps only edges whose REVERSE edge is also a
    top-k edge — the mutual-kNN graph whose connected components are
    the classic density-robust clustering (a hub vector cannot chain
    unrelated regions together through one-directional edges); ranks
    are preserved from the forward edge.

    Scale shape: with ``block_col`` (an IVF cluster from
    ``build_ivf_index``, an LSH bucket, or any blocking key) the
    candidate join is an equi-join on the block — per-block quadratic,
    never corpus-quadratic, the same blocking argument as
    :func:`cosine_dedup_pairs`; the top-k window then partitions by
    src inside each block. ``block_col=None`` is the exact all-pairs
    baseline for oracle checks and small corpora only. Zero-norm
    vectors have no defined cosine (``try_divide`` → NULL) and emit no
    edges — as src or dst.
    """
    base = ensure_min_partitions(df).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        (F.col(block_col) if block_col else F.lit(1)).alias("_blk"),
    ).withColumn("_n", l2_norm(F.col("_v")))
    left, right = base.alias("l"), base.alias("r")
    scored = left.join(
        right,
        (F.col("l._blk") == F.col("r._blk")) & (F.col("l._id") != F.col("r._id")),
    ).withColumn(
        "cosine",
        F.try_divide(
            dot(F.col("l._v"), F.col("r._v")), F.col("l._n") * F.col("r._n")
        ),
    )
    w = Window.partitionBy(F.col("l._id")).orderBy(
        F.desc("cosine"), F.asc(F.col("r._id"))
    )
    edges = (
        scored.filter(F.col("cosine").isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(
            F.col("l._id").alias("src"),
            F.col("r._id").alias("dst"),
            "cosine",
            F.col("_rk").alias("rank"),
        )
    )
    if not mutual:
        return edges
    # keep (src, dst) iff (dst, src) is also a top-k edge: a left-semi
    # join of the edge set against its own transpose — shuffles only
    # (src, dst) pairs, never vectors.
    reverse = edges.select(
        F.col("dst").alias("_rs"), F.col("src").alias("_rd")
    )
    return edges.join(
        reverse,
        (edges["src"] == F.col("_rs")) & (edges["dst"] == F.col("_rd")),
        "left_semi",
    )


def hyperplane_signature(
    vec_col: Column | str, n_bits: int = 64, seed: int = 7
) -> Column:
    """Random-hyperplane (SRP) LSH signature: sign bits of the vector
    projected onto ``n_bits`` Gaussian hyperplanes, packed into one
    long. P(bit agrees) = 1 − θ/π, so high-cosine pairs share whole
    bands with high probability.

    Arrow-batched pandas UDF (one matmul per batch) — the projection
    matrix is re-derived from ``seed`` inside each executor, so there
    is nothing to broadcast and results are identical on any cluster
    layout. Per 4k-row Arrow batch the work is one (4096×dim)@(dim×64)
    BLAS call; this is the sanctioned Python path, not a per-row UDF.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _compute(vs):
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        V = np.stack(vs.to_numpy()).astype(np.float64)
        rng = np.random.default_rng(seed)
        R = rng.standard_normal((V.shape[1], n_bits))
        bits = (V @ R) > 0
        weights = 1 << np.arange(n_bits, dtype=np.uint64)
        packed = (bits.astype(np.uint64) * weights).sum(axis=1)
        return pd.Series(packed.view(np.int64))

    # explicit returnType + annotation-free callable: `from __future__
    # import annotations` would defeat pandas_udf's type-hint parsing
    _sig = pandas_udf(_compute, "long")
    return _sig(F.col(vec_col) if isinstance(vec_col, str) else vec_col)


def hyperplane_lsh_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 64,
    bands: int = 8,
    cosine_threshold: float = 0.8,
    seed: int = 7,
) -> DataFrame:
    """Near-duplicate embedding pairs via banded hyperplane LSH +
    exact-cosine verification (the third ANN path next to brute force
    and IVF: no training step, candidate join is ``bands`` equi-joins
    on 8-bit band keys — work scales with bucket sizes, never n²).

    Identical-direction vectors share every band by construction, so
    recall on true duplicates is 1; for cos ≈ 0.9 with 8×8-bit bands
    the single-shot recall is ≈ 0.93 (1 − (1 − p^8)^8, p = 1 − θ/π).
    Returns (id_a, id_b, cosine) with id_a < id_b.
    """
    if n_bits % bands != 0:
        raise ValueError(f"bands {bands} must divide n_bits {n_bits}")
    width = n_bits // bands
    mask = (1 << width) - 1
    base = ensure_min_partitions(df).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).withColumn("_sig", hyperplane_signature("_v", n_bits, seed))

    banded = base.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright("_sig", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band"),
    ).select("_id", "_band.band_idx", "_band.band_key")

    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    vecs = base.select("_id", "_v").withColumn("_n", l2_norm(F.col("_v")))
    verified = (
        cand.join(
            vecs.select(
                F.col("_id").alias("id_a"),
                F.col("_v").alias("va"),
                F.col("_n").alias("na"),
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col("_id").alias("id_b"),
                F.col("_v").alias("vb"),
                F.col("_n").alias("nb"),
            ),
            "id_b",
        )
        .withColumn("cosine", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
    )
    return verified.filter(F.col("cosine") >= cosine_threshold).select(
        "id_a", "id_b", "cosine"
    )


def vector_mean(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str = "embedding",
    out_col: str = "centroid",
) -> DataFrame:
    """Element-wise mean vector per group (class centroids).

    Spark has no native array-elementwise aggregate, so the vector is
    exploded to (group, dim_idx, component), averaged with an ordinary
    hash aggregate (map-side partials carry one float per (group,
    dim)), and reassembled with ``array_agg`` sorted by dim index.
    Shuffle volume is groups × dims rows — independent of corpus
    size — which is the 100 TB shape; a per-group ``collect_list`` of
    whole vectors would instead move every vector through the shuffle.
    """
    exploded = df.select(
        *group_cols, F.posexplode(F.col(vec_col).cast("array<double>"))
    )
    agg = exploded.groupBy(*group_cols, "pos").agg(F.avg("col").alias("_m"))
    return (
        agg.groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("_m")))
            ).alias("_pairs")
        )
        .select(
            *group_cols,
            F.transform(F.col("_pairs"), lambda p: p["_m"]).alias(out_col),
        )
    )


def centroid_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its max-cosine centroid from a PROVIDED
    list (no training pass — centroids come from :func:`build_ivf_index`,
    an offline clustering job, or a fixed codebook).

    Returns ``(id_col, vec_col, cluster)``. The argmax is an
    ``array_max`` over (score, -index) structs — one codegen
    expression, no per-row Python, no when-chain blowup; ties take the
    SMALLEST centroid index. Pure narrow projection, no shuffle.

    An all-zero vector has no defined cosine against any centroid
    (Spark's double division by zero yields NULL, which would make the
    argmax undefined); such rows get the sentinel ``cluster = -1`` so
    they stay visible downstream instead of silently escaping —
    semantic-dedup pairing on cluster -1 compares NULL cosines, which
    never clear the threshold, so zero vectors are always kept.
    """
    v = F.col(vec_col)
    vn = l2_norm(v)
    # row-Literal matrix + one norms Literal (plan_literals.py), one
    # transform lambda template; same (score, -index) struct-max, ties
    # to the smallest index
    cents = lit_matrix(centroids)
    norms = lit_array(
        [sum(float(x) * float(x) for x in c) ** 0.5 for c in centroids],
        dtype="float64",
    )
    scored = F.transform(
        cents,
        lambda c, i: F.struct(
            F.try_divide(
                dot(v, c), vn * F.element_at(norms, i + 1)
            ).alias("s"),
            (-i).alias("ni"),
        ),
    )
    best = F.array_max(scored)
    cluster = F.when(vn == 0, F.lit(-1)).otherwise(-best["ni"])
    return df.select(F.col(id_col), F.col(vec_col), cluster.alias("cluster"))


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023 —
    public method: cluster the embedding space, then prune near-
    duplicate pairs WITHIN clusters only): greedy keep-smallest-id —
    a row is dropped iff some smaller-id row in the SAME cluster has
    cosine ≥ ``threshold`` with it.

    Returns ``(id_col, cluster, keep)`` for every input row.

    Scale shape: assignment is a narrow projection; the candidate join
    is an equi-join on cluster id (never an all-pairs product), so
    compared pairs shrink by ~n_clusters versus brute force — the same
    blocking argument as IVF. Cluster sizes bound the quadratic term;
    at 100 TB use enough centroids that clusters stay ~10⁴-10⁵ rows
    (SemDeDup's published recipe) and use
    :func:`semantic_dedup_assigned` over the persisted
    ``build_ivf_index`` assignment instead of the literal-codebook
    argmax here (which is O(k·d) expression code per row — fine to
    ~100 centroids, codegen-hostile past that).
    """
    assigned = centroid_assign(df, centroids, id_col, vec_col)
    return semantic_dedup_assigned(assigned, threshold, id_col, vec_col)


def semantic_dedup_assigned(
    assigned: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """:func:`semantic_dedup` over a PRECOMPUTED cluster assignment —
    the scale path. :func:`centroid_assign` evaluates an O(k·d)
    expression per row, fine for codebooks up to ~100 entries but past
    that the literal expression tree defeats codegen; at real scale
    feed the persisted :func:`build_ivf_index` assignment (JVM-
    vectorized KMeans transform) or any (id, vec, cluster) relation
    here instead.
    """
    if cluster_col != "cluster":
        assigned = assigned.withColumnRenamed(cluster_col, "cluster")
    pairs = cosine_dedup_pairs(
        assigned, threshold, id_col=id_col, vec_col=vec_col, block_col="cluster"
    )
    dropped = pairs.select(F.col("id_b").alias("_drop")).distinct()
    return (
        assigned.join(
            dropped, assigned[id_col] == dropped["_drop"], "left"
        )
        .select(
            id_col,
            "cluster",
            F.col("_drop").isNull().alias("keep"),
        )
    )


def cross_corpus_decontam_pairs(
    train: DataFrame,
    evals: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 64,
    bands: int = 8,
    cosine_threshold: float = 0.95,
    seed: int = 7,
) -> DataFrame:
    """Embedding-space benchmark decontamination: training vectors
    whose cosine to ANY eval vector clears ``cosine_threshold`` —
    the vector-modality twin of ``dedup.ngram_contamination``.

    Both corpora get the SAME seeded hyperplane signatures (so a
    train/eval near-pair collides in a band with the usual SRP
    probability; identical-direction leaks collide in every band —
    recall 1 by construction), candidates come from cross-side band
    equi-joins only — never a train×eval product — and exact cosine
    verifies. Returns (train_id, eval_id, cosine).

    Unlike the broadcast n-gram variant, nothing here assumes the
    eval set is small: both sides shuffle by band key, so a
    million-example benchmark works the same as a hundred.
    """
    if n_bits % bands != 0:
        raise ValueError(f"bands {bands} must divide n_bits {n_bits}")
    width = n_bits // bands
    mask = (1 << width) - 1

    def _banded(df: DataFrame, tag: str) -> DataFrame:
        base = ensure_min_partitions(df).select(
            F.col(id_col).alias(f"{tag}_id"), F.col(vec_col).alias(f"{tag}_v")
        ).withColumn("_sig", hyperplane_signature(f"{tag}_v", n_bits, seed))
        return base.select(
            f"{tag}_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_idx"),
                            F.shiftright("_sig", b * width)
                            .bitwiseAND(F.lit(mask))
                            .alias("band_key"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("_band"),
        ).select(f"{tag}_id", "_band.band_idx", "_band.band_key")

    cand = (
        _banded(train, "train")
        .join(_banded(evals, "eval"), ["band_idx", "band_key"])
        .select("train_id", "eval_id")
        .dropDuplicates(["train_id", "eval_id"])
    )
    tv = train.select(
        F.col(id_col).alias("train_id"), F.col(vec_col).alias("_tv")
    ).withColumn("_tn", l2_norm(F.col("_tv")))
    ev = evals.select(
        F.col(id_col).alias("eval_id"), F.col(vec_col).alias("_ev")
    ).withColumn("_en", l2_norm(F.col("_ev")))
    return (
        cand.join(tv, "train_id")
        .join(ev, "eval_id")
        .withColumn(
            "cosine", dot(F.col("_tv"), F.col("_ev")) / (F.col("_tn") * F.col("_en"))
        )
        .filter(F.col("cosine") >= cosine_threshold)
        .select("train_id", "eval_id", "cosine")
    )


# --------------------------------------------- product quantization
def pq_assign(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Product-quantization code assignment (Jégou et al. 2011 —
    public method): split each vector into ``m = len(codebooks)``
    contiguous subvectors and replace every subvector by the index of
    its nearest sub-centroid (squared L2). Returns
    ``(id_col, pq_code)`` with the m sub-codes packed into one long
    (``code = Σ code_i · ksub^i``) — a 64-dim float32 vector (256 B)
    compresses to 8 B riding every downstream shuffle.

    The argmin per subspace is an ``array_min`` over (dist, idx)
    structs — one codegen expression per subspace, ties to the
    SMALLEST index. Like :func:`centroid_assign` the codebook is
    compiled into the plan: keep ``m · ksub`` to a few hundred
    entries; at larger codebooks assign via an ML-pipeline transform
    instead. Pure narrow projection — no shuffle, no Python.
    """
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    # per-subspace codebooks ride as ONE Literal each (see
    # centroid_assign_expr: Catalyst optimization time); argmin =
    # first index at the min distance — identical smallest-index
    # tiebreak to the old (dist, idx) struct-min
    total = None
    for i in range(m):
        sub = F.slice(v, i * dsub + 1, dsub)
        cb_i = lit_matrix(codebooks[i])
        d2s = F.transform(
            cb_i,
            lambda cent: F.aggregate(
                F.zip_with(sub, cent, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        code_i = (F.array_position(d2s, F.array_min(d2s)) - 1).cast("long")
        total = code_i if total is None else total + code_i * F.lit(ksub**i)
    # keep_cols ride the projection so callers never need a
    # corpus-sized join to re-attach columns they already had
    return df.select(
        F.col(id_col), *[F.col(c) for c in (keep_cols or [])],
        total.alias("pq_code"),
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: approximate
    ``||q − x||²`` as the sum over subspaces of the distance from the
    query's subvector to x's ASSIGNED sub-centroid. The corpus side of
    the ranking join is ``(id, 8-byte code)`` — the raw embeddings
    never ride it, which is the point: at 100 TB of vectors the
    candidate stream shrinks ~32x versus shipping float32 vectors,
    and the codes relation is small enough to persist hot.

    ``queries`` must be broadcastable (a query batch). Returns
    ``(query_id, corpus_id, adc, rank)``, rank 1..k per query by
    ascending ADC distance, ties to the smallest corpus id. Exactness
    is bounded by quantization error — rerank the top-k with true
    distances when recall matters (the standard IVF-PQ recipe).

    Ranking shape: although this LOOKS like one per-query window over
    the whole corpus, Spark's ``InferWindowGroupLimit`` rule rewrites
    the ``row_number() ≤ k`` pattern into a TWO-STAGE group limit — a
    ``WindowGroupLimit … Partial`` BELOW the exchange cuts each map
    partition to its own top-k per query, so at most k·P candidate
    rows per query ever ride the shuffle, and the reducer-side Final
    pass ranks only those survivors. No reducer ever sorts a full
    query's candidate stream. ``test_plan_quality.py`` pins the
    Partial operator's presence so a config or version change can't
    silently regress this back to a single-task sort per query. (A
    hand-rolled two-stage window keyed by (query_id,
    spark_partition_id) was benchmarked as the alternative — it
    shuffles the ENTIRE pair stream to rank stage 1, strictly worse
    than the native map-side cut.)
    """
    codes = pq_assign(corpus, codebooks, id_col, vec_col).select(
        F.col(id_col).alias("corpus_id"), "pq_code"
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("_lut", _pq_lut(F.col("_qv"), codebooks))
    pairs = codes.crossJoin(F.broadcast(q))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("corpus_id"))
    return (
        pairs.withColumn(
            "adc", _adc_from_lut(F.col("_lut"), F.col("pq_code"), codebooks)
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "adc", "rank")
    )


def pq_adc_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    candidate_mult: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """The standard PQ search recipe end-to-end: ADC over the 8-byte
    codes selects ``k·candidate_mult`` candidates per query (cheap —
    the corpus embeddings never ride that join), then ONLY the
    candidates join back to their true vectors for an exact-cosine
    rerank to the final top-k. Quantization error is confined to
    candidate SELECTION; the returned ranking is exact over the
    candidate set — recall loss happens only when a true top-k member
    falls outside the ADC candidates (tune ``candidate_mult`` /
    codebook size against that).

    Returns ``(query_id, corpus_id, cosine, rank)`` like
    :func:`cosine_topk`. Scale shape: candidates per query are
    ``k·candidate_mult`` rows, so the rerank join's stream side is
    tiny regardless of corpus size; the candidate→vector join is an
    equi-join on the corpus id (partition-prunable when the codes
    relation is co-partitioned with the vectors).
    """
    cands = pq_adc_topk(
        corpus,
        queries,
        codebooks,
        k=k * candidate_mult,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    ).select("query_id", "corpus_id")
    vecs = corpus.select(
        F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cv")
    ).withColumn("_cn", l2_norm(F.col("_cv")))
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv")
    ).withColumn("_qn", l2_norm(F.col("_qv")))
    scored = (
        cands.join(vecs, cands["corpus_id"] == F.col("_cid"))
        .join(F.broadcast(q), cands["query_id"] == F.col("_qid"))
        .withColumn(
            "cosine",
            F.try_divide(
                dot(F.col("_cv"), F.col("_qv")), F.col("_cn") * F.col("_qn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 20_000,
    iters: int = 12,
    seed: int = 7,
) -> list[list[list[float]]]:
    """Train PQ sub-codebooks with driver-side Lloyd's k-means over a
    bounded deterministic hash-sample — the same bounded-sample
    argument as :func:`build_ivf_index` (quantizer quality saturates
    far below corpus size; each distributed iteration would otherwise
    be a full-corpus pass). The sample is at most ``sample_size``
    vectors (a few MB on the driver); centroid components round to 6
    decimals so the returned codebook is a stable, JSON-serializable
    plan constant. Requires numpy; the vector dimension must divide
    evenly into ``m`` subspaces.
    """
    import numpy as np

    c = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    n = c.count()
    if n == 0:
        raise ValueError("train_pq_codebooks: empty corpus")
    if n > sample_size:
        ppm = max(1, int(sample_size / n * 1_000_000))
        c = c.filter(
            F.pmod(F.xxhash64("_id", F.lit(seed)), F.lit(1_000_000)) < ppm
        )
    sample = np.array([r["_v"] for r in c.select("_v").collect()])
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into m={m} subspaces")
    if len(sample) < ksub:
        raise ValueError(
            f"sample of {len(sample)} vectors cannot seed ksub={ksub} centroids"
        )
    rng = np.random.default_rng(seed)
    dsub = dim // m
    books = []
    for i in range(m):
        x = sample[:, i * dsub : (i + 1) * dsub]
        cent = x[rng.choice(len(x), ksub, replace=False)].copy()
        for _ in range(iters):
            d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for cidx in range(ksub):
                hit = x[a == cidx]
                if len(hit):
                    cent[cidx] = hit.mean(axis=0)
        books.append([[round(float(v), 6) for v in row] for row in cent])
    return books


def _pq_lut(qv: Column, codebooks: list[list[list[float]]]) -> Column:
    """Per-query ADC lookup table: ``lut[i][c] = ||q_sub_i −
    centroid(i, c)||²`` as an m × ksub nested array. Computed ONCE per
    query row (m·ksub·dsub multiplies per QUERY, evaluated while
    building the broadcast relation) so the per-candidate ADC reduces
    to m table lookups — the standard PQ fast-scan trick. Each cell
    uses the identical zip_with/aggregate expression the direct form
    would, and the final sum adds subspaces in the same order, so the
    LUT path is bit-for-bit the naive Σ_i ||q_sub_i − cent(code_i)||²."""
    dsub = len(codebooks[0][0])
    # m·(ksub+1)+1 plan nodes — one row Literal per sub-centroid
    # (plan_literals.py) — and ONE nested transform lambda template
    # instead of m·ksub aggregate copies; per-cell arithmetic is the
    # identical zip_with/aggregate, so values are unchanged bit-for-bit
    cb = lit_cube(codebooks)
    return F.transform(
        cb,
        lambda sub, i: F.transform(
            sub,
            lambda cent: F.aggregate(
                F.zip_with(
                    F.slice(qv, i * dsub + 1, dsub),
                    cent,
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        ),
    )


def _adc_from_lut(
    lut: Column, code: Column, codebooks: list[list[list[float]]]
) -> Column:
    """Asymmetric distance from a packed PQ code via the per-query
    LUT: unpack each sub-code and sum the m table cells — O(m) per
    candidate instead of O(m·dsub) arithmetic, so the work on the
    corpus-sized pair stream drops ~dsub×."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    total = None
    for i in range(m):
        code_i = F.pmod(F.floor(code / F.lit(ksub**i)), F.lit(ksub)).cast("int")
        d = F.element_at(F.element_at(lut, i + 1), code_i + 1)
        total = d if total is None else total + d
    return total


def ivfpq_query(
    assignments: DataFrame,
    centers: list[list[float]],
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 4,
    candidate_mult: int = 4,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """The full IVF-PQ retrieval stack (the 100-TB ANN recipe) as one
    operator: IVF partition pruning → ADC over packed codes inside the
    probed cells → exact-cosine rerank of the short candidate list.

    1. **Probe**: rank centroids per query in the quantizer's metric,
       keep ``nprobe`` — with the codes relation persisted
       ``partitionBy(cluster)``, the equi-join reads only
       nprobe/n_clusters of the index (partition pruning).
    2. **ADC**: candidates rank by asymmetric distance computed from
       the 8-byte code — the probed cells' float vectors are NOT read;
       only ``k·candidate_mult`` survivors per query continue.
    3. **Rerank**: the survivors join back to their true vectors for
       the exact top-k, so quantization error affects candidate
       SELECTION only.

    ``assignments`` is ``build_ivf_index`` output ``(corpus_id,
    embedding, cluster)``; pass ``codes`` (``(corpus_id, cluster,
    pq_code)``) to reuse a persisted code relation, else codes are
    derived in-plan. Output schema matches :func:`cosine_topk`.
    """
    if codes is None:
        # cluster rides the pq_assign projection (keep_cols) — no
        # corpus-sized join to re-attach a column the input already had
        codes = pq_assign(
            assignments.select(
                "corpus_id", F.col("cluster"), F.col(vec_col).alias("_v")
            ),
            codebooks,
            id_col="corpus_id",
            vec_col="_v",
            keep_cols=["cluster"],
        )

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    # k+1 plan nodes — one row Literal per centroid (plan_literals.py)
    centers_arr = lit_matrix(centers)
    sqdist = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    q_probes = (
        q.withColumn("_ctrs", centers_arr)
        .select("query_id", "_qv", F.posexplode("_ctrs").alias("cluster", "_ctr"))
        .withColumn("_qdist", sqdist(_unit(F.col("_qv")), F.col("_ctr")))
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.asc("_qdist"), F.asc("cluster")
    )
    q_sel = (
        q_probes.withColumn("_prk", F.row_number().over(w_probe))
        .filter(F.col("_prk") <= nprobe)
        .select("query_id", "_qv", "cluster")
        # ADC LUT computed once per (query, probe) row while building
        # the broadcast relation — the candidate stream then pays m
        # lookups per code, not m·dsub multiplies
        .withColumn("_lut", _pq_lut(F.col("_qv"), codebooks))
    )

    cand = codes.join(F.broadcast(q_sel), "cluster").withColumn(
        "_adc", _adc_from_lut(F.col("_lut"), F.col("pq_code"), codebooks)
    )
    # row_number ≤ limit triggers InferWindowGroupLimit: a Partial
    # WindowGroupLimit below the exchange cuts each map partition to
    # its own top-limit per query, so an unboundedly large probed
    # cell never funnels whole into one reducer task (plan-gated).
    w_adc = Window.partitionBy("query_id").orderBy(
        F.asc("_adc"), F.asc("corpus_id")
    )
    short = (
        cand.withColumn("_ark", F.row_number().over(w_adc))
        .filter(F.col("_ark") <= k * candidate_mult)
        .select("query_id", "corpus_id", "_qv")
    )

    vecs = assignments.select(
        F.col("corpus_id").alias("_cid"), F.col(vec_col).alias("_cv")
    ).withColumn("_cn", l2_norm(F.col("_cv")))
    scored = short.join(vecs, short["corpus_id"] == F.col("_cid")).withColumn(
        "cosine",
        F.try_divide(
            dot(F.col("_cv"), F.col("_qv")),
            F.col("_cn") * l2_norm(F.col("_qv")),
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


# ------------------------------------------------------- scalar quantization
def sq_bounds(
    corpus: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Per-dimension [min, max] of the corpus as ONE scalar-aggregate
    row (columns ``lo`` / ``step`` as arrays). 2·dim partial
    aggregates in a single pass — no posexplode, so training the
    quantizer never shuffles dim× the corpus row count."""
    # Expressions are generated as SQL strings and parsed JVM-side in
    # TWO py4j calls: the old per-column Column construction (2·dim
    # aggregates, each ~4 py4j round-trips, plus 2 dim-wide arrays)
    # spent ~0.8 s of DRIVER Python time per invocation at dim=64 —
    # guide §4's boundary cost shows up at expression-BUILD time too.
    # The parsed trees are identical to the old API-built ones (same
    # ops, same literals — `256.0D` is the double literal), so results
    # are bit-identical.
    v = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    aggs = []
    for j in range(dim):
        aggs.append(f"min(element_at({v}, {j + 1})) AS _lo{j}")
        aggs.append(f"max(element_at({v}, {j + 1})) AS _hi{j}")
    row = corpus.selectExpr(*aggs)
    lo = "array(" + ", ".join(f"_lo{j}" for j in range(dim)) + ") AS lo"
    step = (
        "array("
        + ", ".join(f"(_hi{j} - _lo{j}) / 256.0D" for j in range(dim))
        + ") AS step"
    )
    return row.selectExpr(lo, step)


def sq_assign(
    corpus: DataFrame,
    bounds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """int8 scalar quantization: ``code_j = clamp(floor((v_j - lo_j)
    / step_j), 0, 255)`` per dimension (degenerate constant dims →
    code 0). Output ``(corpus_id, sq_code array<int>)`` — 64 ints vs
    64 doubles, and the raw embeddings never need to ride a ranking
    join again. Codegen-only; the bounds row arrives by broadcast."""
    v = F.col(vec_col).cast("array<double>")
    code = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: F.when(
            F.element_at("step", j) == 0.0, F.lit(0)
        )
        .otherwise(
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.element_at(v, j) - F.element_at("lo", j))
                        / F.element_at("step", j)
                    ).cast("int"),
                ),
            )
        )
        .cast("int"),
    )
    return corpus.crossJoin(F.broadcast(bounds)).select(
        F.col(id_col).alias("corpus_id"), code.alias("sq_code")
    )


def sq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
) -> DataFrame:
    """Scalar-quantized ADC top-k: rank the corpus for each query by
    ``Σ_j (q_j − recon_j)²`` where ``recon_j = lo_j + (code_j + 0.5)
    · step_j`` (bin midpoint). The ranking join carries (id, int8
    codes) only — the 100-TB story is the same as PQ's (codes are 4×
    smaller in flight than doubles, 8× after int8 storage packing)
    with per-DIMENSION resolution instead of per-subspace, i.e.
    higher fidelity at larger code size — the classic SQ8 point on
    the recall/size curve (Faiss's ScalarQuantizer baseline, public
    docs). Ranking rides InferWindowGroupLimit exactly like
    ``pq_adc_topk`` (map-side partial top-k per query below the
    exchange; plan-gated in tests).

    Returns ``(query_id, corpus_id, adc, rank)``, rank 1..k per
    query, ties to the smallest corpus id."""
    bounds = sq_bounds(corpus, vec_col, dim)
    codes = sq_assign(corpus, bounds, id_col, vec_col, dim)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    ).crossJoin(F.broadcast(bounds))
    pairs = codes.crossJoin(F.broadcast(q))

    # UNROLLED static sum (literal indices), not an F.aggregate fold:
    # higher-order functions evaluate on the interpreted path, while a
    # flat expression tree rides whole-stage codegen — measured 7.6 s
    # → ~2 s on a 100k×20 ADC batch, bit-identical (same left-assoc
    # fold order, so the oracle's generated term chain still matches).
    # Built as ONE SQL string parsed JVM-side: the old per-term Column
    # chain was ~1,500 py4j round-trips ≈ 1.8 s of driver Python per
    # invocation at dim=64 (the parsed tree is identical — same ops,
    # same left-assoc order, `0.5D` the double literal — so the ADC
    # doubles are bit-identical and the oracle's term chain matches).
    def recon(j: int) -> str:
        return (
            f"(element_at(lo, {j}) + "
            f"((CAST(element_at(sq_code, {j}) AS DOUBLE) + 0.5D)"
            f" * element_at(step, {j})))"
        )

    def term(j: int) -> str:
        return (
            f"((element_at(_qv, {j}) - {recon(j)})"
            f" * (element_at(_qv, {j}) - {recon(j)}))"
        )

    adc = F.expr(
        "0.0D" + "".join(f" + {term(j)}" for j in range(1, dim + 1))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc"), F.asc("corpus_id")
    )
    # project to (query_id, corpus_id, adc) BEFORE the window: the
    # group-limit sort orders FULL rows, and dragging the 64-int code
    # arrays + query vectors through it multiplies sort width ~40×
    # (measured 161 s → ~35 s on the 1M×100 ADC batch)
    return (
        pairs.select("query_id", "corpus_id", adc.alias("adc"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "adc", "rank")
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "corpus_id",
    rel_col: str = "rel",
    vec_col: str = "vec",
    round_to: int = 9,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick ``k`` results per query maximizing
    ``lam·relevance − (1−lam)·max_similarity_to_already_selected`` —
    the standard diversification pass that stops a retrieval top-k
    from being five copies of the same page.

    Operates on the RETRIEVAL RESULT relation (per-query candidate
    sets, e.g. cosine_topk's output joined back to vectors), never the
    corpus: with N candidates per query the pairwise-similarity
    relation is N² per query, computed ONCE, and each of the k−1
    greedy rounds is three bounded shuffles on query_id — a max-sim
    aggregate over the selected set, then a type-agnostic argmax
    (per-query max score; null-safe equality filter back to the rows
    at that max, exact because scores are pre-rounded; min(corpus_id)
    as the total tiebreak). Every query advances in parallel per
    round; no per-query Python, no window sort. Selected sets are
    localCheckpoint-ed per round.

    Relevance, pairwise similarities, and combined scores are rounded
    to ``round_to`` BEFORE every argmax (the float-robust ranking
    pattern), with the id as total tiebreak — the greedy trace is
    deterministic and replayable by a SQL oracle. Queries with fewer
    than ``k`` candidates emit what they have.

    Returns (query_id, corpus_id, mmr_rank, mmr_score); rank 1's score
    is the (rounded) relevance itself, later ranks carry the combined
    objective at selection time.
    """
    cand = candidates.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("corpus_id"),
        F.round(F.col(rel_col), round_to).alias("rel"),
        F.col(vec_col).alias("_v"),
    ).localCheckpoint(eager=True)
    a = cand.select(
        "query_id",
        F.col("corpus_id").alias("id_a"),
        F.col("_v").alias("_va"),
    )
    b = cand.select(
        "query_id",
        F.col("corpus_id").alias("id_b"),
        F.col("_v").alias("_vb"),
    )
    sims = (
        a.join(b, "query_id")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "query_id",
            "id_a",
            "id_b",
            # try_divide: a zero-vector candidate has no defined cosine
            # — NULL (never compared above any threshold) instead of an
            # ANSI divide-by-zero crash of the whole rerank
            F.round(
                F.try_divide(
                    dot(F.col("_va"), F.col("_vb")),
                    l2_norm(F.col("_va")) * l2_norm(F.col("_vb")),
                ),
                round_to,
            ).alias(
                "sim"
            ),
        )
        .localCheckpoint(eager=True)
    )

    def argmax(df, score_col, rank):
        # Type-agnostic argmax (round-8 advice): the old
        # max(struct(score, -id)) tiebreak negated the id, which
        # silently assumed numeric ids — string ids (reachable via
        # query-ann-index --diversify with a user --id_col) cast to
        # null and corrupted corpus_id. Now: per-query max score,
        # filter to rows at the max (scores are pre-rounded, so the
        # equality is exact), min(corpus_id) as the total tiebreak.
        # Two bounded query_id shuffles instead of one; same
        # deterministic trace for numeric ids, so oracles unchanged.
        best = df.groupBy("query_id").agg(
            F.max(F.col(score_col)).alias("_best")
        )
        # eqNullSafe: when EVERY remaining candidate's score is NULL
        # (zero vectors -> try_divide -> NULL), _best is NULL and a
        # plain == would emit no row, silently dropping the query from
        # the round — the old struct-max emitted (min id, NULL score);
        # null-safe equality preserves that contract
        return (
            df.join(best, "query_id")
            .filter(F.col(score_col).eqNullSafe(F.col("_best")))
            .groupBy("query_id")
            .agg(
                F.min("corpus_id").alias("corpus_id"),
                F.min(F.col(score_col)).alias("mmr_score"),
            )
            .select(
                "query_id",
                "corpus_id",
                "mmr_score",
                F.lit(rank).alias("mmr_rank"),
            )
        )

    selected = argmax(cand, "rel", 1).localCheckpoint(eager=True)
    for step in range(2, k + 1):
        maxsim = (
            sims.join(
                selected.select(
                    "query_id", F.col("corpus_id").alias("id_b")
                ),
                ["query_id", "id_b"],
            )
            .groupBy("query_id", "id_a")
            .agg(F.max("sim").alias("_maxsim"))
            .withColumnRenamed("id_a", "corpus_id")
        )
        scored = (
            cand.join(
                selected.select("query_id", "corpus_id"),
                ["query_id", "corpus_id"],
                "left_anti",
            )
            .join(maxsim, ["query_id", "corpus_id"])
            .withColumn(
                "_score",
                F.round(
                    F.lit(lam) * F.col("rel")
                    - F.lit(1.0 - lam) * F.col("_maxsim"),
                    round_to,
                ),
            )
        )
        selected = selected.unionByName(
            argmax(scored, "_score", step)
        ).localCheckpoint(eager=True)
    return selected


def rrf_fuse(
    rankings: list[DataFrame],
    k_const: int = 60,
    topk: int = 10,
    round_to: int = 9,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009): combine several
    per-query rankings into one by ``score = Σ_r 1/(k + rank_r)`` —
    the standard hybrid-retrieval merge (BM25 ⊕ dense, cosine ⊕ L2)
    that needs NO score calibration because only ranks enter.

    Each input must carry (query_id, corpus_id, rank). Candidates
    missing from a ranking contribute 0 (full-outer joins on the
    bounded result relations — queries × topk rows each, the corpus
    never appears). Scores round to ``round_to`` before the final
    per-query top-k (float-robust ranking, id tiebreak); the window
    rides InferWindowGroupLimit so partial top-k happens map-side.
    """
    scored = None
    cols = []
    for i, r in enumerate(rankings):
        ri = r.select(
            "query_id",
            "corpus_id",
            (F.lit(1.0) / (F.lit(float(k_const)) + F.col("rank"))).alias(
                f"_s{i}"
            ),
        )
        scored = (
            ri
            if scored is None
            else scored.join(ri, ["query_id", "corpus_id"], "full_outer")
        )
        cols.append(f"_s{i}")
    total = None
    for c in cols:
        term = F.coalesce(F.col(c), F.lit(0.0))
        total = term if total is None else total + term
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("corpus_id")
    )
    return (
        scored.withColumn("rrf_score", F.round(total, round_to))
        .withColumn("rrf_rank", F.row_number().over(w))
        .filter(F.col("rrf_rank") <= topk)
        .select("query_id", "corpus_id", "rrf_rank", "rrf_score")
    )


# ------------------------------------------------- binary quantization
def bq_code(vec: Column, dim: int = 64) -> Column:
    """Sign-bit binary quantization: one BIGINT per vector, bit i set
    iff ``vec[i] > 0`` (zeros and negatives clear). The 1-bit point on
    the PQ/SQ/BQ quantization ladder — 64 dims collapse from 512 bytes
    of doubles to 8 bytes, and similarity becomes popcount(xor).

    ``dim`` must be ≤ 64 (one machine word; multi-word codes are a
    straightforward extension, not needed for this corpus). The weight
    table rides the plan as ONE numpy array Literal
    (functions/plan_literals.py rationale), and bit 63 is the wrapped
    min-long — the same value a SQL oracle spells literally.
    """
    if dim > 64:
        raise ValueError(f"bq_code packs at most 64 dims, got {dim}")
    import numpy as np

    weights = F.lit(np.left_shift(np.int64(1), np.arange(dim, dtype=np.int64)))
    bits = F.zip_with(
        F.slice(vec, 1, dim),
        weights,
        lambda x, w: F.when(x > 0, w).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, b: acc.bitwiseOR(b)
    )


def bq_hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    candidate_mult: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Binary-quantized ANN: Hamming-distance candidate generation
    over 8-byte sign codes, exact-cosine rerank of the short list.

    Scale shape: the brute-force stage crosses every corpus CODE with
    the broadcast query codes — 8 bytes per corpus row instead of the
    64-double vector (the scan that dominates at 10⁹ vectors shrinks
    ~64×), popcount(xor) is two JVM intrinsics, and the per-query
    candidate cut is a ``row_number() <= c`` window
    (InferWindowGroupLimit keeps at most c rows per query per map
    partition on the shuffle). Only k·candidate_mult candidates per
    query ever touch the full vectors, via an id equi-join back into
    the corpus.

    Returns (query_id, corpus_id, cosine, rank), rank 1..k by exact
    cosine over the candidate set (hamming asc, id asc as the
    candidate tiebreak — deterministic and SQL-replicable).
    """
    codes = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("corpus_id"),
        bq_code(F.col(vec_col), dim).alias("_code"),
        # NULL vectors yield NULL codes, and ASC ordering puts NULLs
        # FIRST — they would fill every candidate list ahead of real
        # neighbors; they can never produce a cosine, so drop them here
    ).filter(F.col("_code").isNotNull())
    qcodes = queries.select(
        F.col(query_id_col).alias("query_id"),
        bq_code(F.col(vec_col), dim).alias("_qcode"),
        F.col(vec_col).alias("_qv"),
        # mirror the corpus-side NULL-code drop (round-10 advice): a
        # NULL query code yields NULL hamming against EVERY corpus row,
        # so its candidate list would fill arbitrarily and emit k rows
        # of NULL cosine — a NULL query vector must produce no rows
    ).filter(F.col("_qcode").isNotNull())
    n_cand = k * candidate_mult
    ham = codes.crossJoin(
        F.broadcast(qcodes.select("query_id", "_qcode"))
    ).select(
        "query_id",
        "corpus_id",
        F.bit_count(F.col("_code").bitwiseXOR(F.col("_qcode"))).alias(
            "hamming"
        ),
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("corpus_id")
    )
    cand = (
        ham.withColumn("_crk", F.row_number().over(wc))
        .filter(F.col("_crk") <= n_cand)
        .select("query_id", "corpus_id", "hamming")
    )
    full = cand.join(
        corpus.select(
            F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_cv")
        ),
        "corpus_id",
    ).join(F.broadcast(qcodes.select("query_id", "_qv")), "query_id")
    scored = full.withColumn(
        "cosine",
        dot(F.col("_cv"), F.col("_qv"))
        / (l2_norm(F.col("_cv")) * l2_norm(F.col("_qv"))),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("query_id", "corpus_id", "cosine", F.col("_rk").alias("rank"))
    )


def gram_matrix_fixed_point(
    corpus: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 10_000,
) -> DataFrame:
    """EXACT Gram matrix Σ x·xᵀ over fixed-point embeddings — the
    aggregation behind PCA / whitening / covariance statistics, with
    the same exactness-first contract as the fixed-point PageRank and
    classifier trainer: elements become round(x·scale) BIGINTs, so
    every Gram entry is an exact integer sum (associative — identical
    on any engine and partitioning; a float Gram over 10⁹ rows drifts
    in shuffle order).

    Scale shape: the per-row upper-triangle products expand in the MAP
    stage only — Catalyst's partial aggregation collapses each
    partition to dim·(dim+1)/2 rows before the exchange, so the
    shuffle is matrix-sized (2,080 rows at dim 64) no matter the
    corpus. Pure JVM expressions (the oracle plan stays Python-free);
    at extreme row counts an Arrow ``X_intᵀ @ X_int`` per batch is the
    faster map side with the same exact integers.

    Overflow headroom: |x·scale| ≤ scale·max|x|, so an entry sum is
    ≤ rows·(scale·max|x|)² — at scale 10⁴ and unit-ish vectors that is
    ~10⁸ per row, 2⁶³ supports ~10¹⁰ rows; shrink ``scale`` for more.

    Returns (i, j, gram) for 0 ≤ i ≤ j < dim; NULL vectors are
    skipped.
    """
    ei = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * scale).cast("long"),
    )
    rows = corpus.filter(F.col(vec_col).isNotNull()).select(ei.alias("_e"))
    pairs = rows.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: F.transform(
                        F.sequence(i, F.lit(dim - 1)),
                        lambda j: F.struct(
                            i.alias("i"),
                            j.alias("j"),
                            (
                                F.element_at(F.col("_e"), i + 1)
                                * F.element_at(F.col("_e"), j + 1)
                            ).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("t")
    )
    return (
        pairs.groupBy(F.col("t.i").alias("i"), F.col("t.j").alias("j"))
        .agg(F.sum("t.p").alias("gram"))
    )
