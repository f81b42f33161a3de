"""Distributed Lloyd's k-means over an embedding column.

The cluster-scale shape: each iteration is ONE corpus scan ending in a
hash aggregation whose partial state is k x dim running (sum, count)
cells — so only k rows ever cross the shuffle — and the refreshed
centroid matrix returns to the executors as a broadcast literal.  The
driver holds exactly k x dim doubles; the corpus never leaves the
executors and is persisted once for the duration of the fit (released
via the operator cache ledger).

This complements the sample-trained ``pyspark.ml`` quantizer used by
:func:`operators.similarity.build_ivf_index`: that path trades
determinism for speed on a driver-side sample; this one is the exact,
full-corpus, deterministic fit (hash-seeded init, fixed iteration
count) whose every assignment is reproducible by an external oracle.

Determinism contract (what makes the DuckDB oracle able to replay the
fit bit-for-bit, see ``queries.sim_kmeans``):

* init: the k rows with the smallest ``(md5(id), id)`` — a seedless,
  engine-independent pseudo-random draw; cluster j is the j-th such
  row (0-based).
* after every mean step the centroids are rounded to
  ``centroid_round`` decimals, collapsing float summation-order noise
  (the only nondeterministic ingredient of a distributed mean) far
  below the rounding quantum.
* assignment compares distances rounded to ``dist_round`` decimals and
  breaks ties by the lower cluster index, so an assignment can only
  disagree across engines if an unrounded value lands within ~1e-12 of
  a quantum boundary.
* a cluster that loses all members keeps its previous centroid.

Intended for small/moderate k (the centroid matrix is an in-plan
literal, ~k x dim expressions); for k in the thousands use the IVF
sample-trained path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.functions.plan_literals import lit_matrix
from curw_flo2d_data_manager_spark.operators.caching import persist_tracked


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_round: int = 4,
    dist_round: int = 2,
) -> tuple[DataFrame, list[list[float]]]:
    """Run ``iters`` Lloyd iterations; return ``(assignments,
    centroids)`` where assignments has (``id_col``, ``cluster``,
    ``d2`` — the rounded squared distance to the winning centroid)
    and centroids is the final k x dim Python list. The pair is
    CONSISTENT: after the last mean update a final assignment pass
    runs against the returned centroid matrix, so every row's
    (cluster, d2) is its distance to the centroids this function
    returns (the oracle unrolls the same iters+1-th assignment).
    """
    if k < 1 or iters < 1:
        raise ValueError(f"need k >= 1 and iters >= 1, got k={k}, iters={iters}")
    pts = persist_tracked(
        df.select(
            F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
        )
    )
    first = pts.select(F.size("_v").alias("n")).first()
    if first is None:
        raise ValueError("kmeans_fit: empty input")
    dim = first["n"]

    # deterministic hash init: cluster j = j-th row by (md5(id), id) —
    # a distributed top-k (TakeOrderedAndProject), not a global sort
    hash_key = F.md5(F.col("_id").cast("string").cast("binary"))
    init = pts.orderBy(hash_key, "_id").limit(k).select("_v").collect()
    if len(init) < k:
        raise ValueError(f"kmeans_fit: k={k} exceeds corpus size {len(init)}")
    # HALF_UP like F.round and the oracle's ROUND — Python's builtin
    # round() is half-EVEN, which diverges on exact half-quantum
    # components and would break the cross-engine determinism contract
    centroids = [
        [_round_half_up(float(x), centroid_round) for x in r["_v"]]
        for r in init
    ]

    def assign(cents: list[list[float]]) -> DataFrame:
        # k+1 plan nodes — one row Literal per centroid
        # (functions/plan_literals.py; a python-list F.lit would expand
        # right back to k*dim element expressions)
        mat = lit_matrix(cents)
        d2s = F.transform(
            mat,
            lambda c: F.round(
                F.aggregate(
                    F.zip_with(F.col("_v"), c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                dist_round,
            ),
        )
        best = F.array_min(
            F.zip_with(
                d2s,
                F.sequence(F.lit(0), F.lit(len(cents) - 1)),
                lambda d, j: F.struct(d.alias("d2"), j.alias("j")),
            )
        )
        return pts.withColumn("_best", best).select(
            "_id", "_v", F.col("_best.j").alias("cluster"), F.col("_best.d2").alias("d2")
        )

    for _ in range(iters):
        assigned = assign(centroids)
        # k rows after partial aggregation; k x dim doubles to the driver
        means = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    F.round(F.avg(F.col("_v")[i]), centroid_round).alias(f"m{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        nxt = list(centroids)  # empty cluster keeps its previous centroid
        for r in means:
            nxt[r["cluster"]] = [float(r[f"m{i}"]) for i in range(dim)]
        centroids = nxt

    # final assignment against the RETURNED centroids, so the
    # (assignments, centroids) pair is internally consistent
    out = assign(centroids).select(F.col("_id").alias(id_col), "cluster", "d2")
    return out, centroids


def _round_half_up(x: float, nd: int) -> float:
    """round() with HALF_UP on the shortest decimal repr — the same
    rule as Spark's ``F.round`` (BigDecimal of Double.toString) and
    DuckDB's ``ROUND``, unlike builtin round()'s half-even."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))
