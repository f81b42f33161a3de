"""Scalar-quantization ANN: planted-truth ranking, code invariants,
and the two-stage group-limit plan shape."""

import random

from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.operators.similarity import (
    sq_adc_topk,
    sq_assign,
    sq_bounds,
)


def _vecs(spark, rows, dim):
    return spark.createDataFrame(
        rows, f"vec_id long, embedding array<double>"
    )


def test_sq_codes_identical_for_identical_vectors_and_clamped(spark):
    dim = 8
    rng = random.Random(3)
    base = [rng.uniform(-1, 1) for _ in range(dim)]
    rows = [
        (0, base),
        (1, list(base)),  # exact copy
        (2, [v + 2.0 for v in base]),  # the per-dim max
        (3, [v - 2.0 for v in base]),  # the per-dim min
    ]
    df = _vecs(spark, rows, dim)
    bounds = sq_bounds(df, dim=dim)
    codes = {
        r["corpus_id"]: r["sq_code"]
        for r in sq_assign(df, bounds, dim=dim).collect()
    }
    assert codes[0] == codes[1]
    assert all(0 <= c <= 255 for cs in codes.values() for c in cs)
    # the max vector hits the top clamp in every dim; min vector bin 0
    assert all(c == 255 for c in codes[2])
    assert all(c == 0 for c in codes[3])


def test_sq_constant_dimension_gets_code_zero(spark):
    rows = [(0, [1.0, 5.0]), (1, [2.0, 5.0]), (2, [3.0, 5.0])]
    df = _vecs(spark, rows, 2)
    codes = sq_assign(df, sq_bounds(df, dim=2), dim=2).collect()
    assert all(r["sq_code"][1] == 0 for r in codes)


def test_sq_adc_ranks_exact_copy_first(spark):
    dim = 16
    rng = random.Random(9)
    corpus = []
    for i in range(200):
        corpus.append((i, [rng.uniform(-1, 1) for _ in range(dim)]))
    # well-separated planted partner for query 0: exact copy of id 7
    target = corpus[7][1]
    df = _vecs(spark, corpus, dim)
    q = _vecs(spark, [(0, list(target))], dim).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = (
        sq_adc_topk(df, q, k=3, dim=dim)
        .orderBy("rank")
        .collect()
    )
    assert top[0]["corpus_id"] == 7
    assert top[0]["adc"] <= top[1]["adc"]


def test_sq_ranking_plan_has_partial_group_limit_and_no_embeddings(spark):
    dim = 4
    df = _vecs(spark, [(i, [float(i), 0.0, 1.0, 2.0]) for i in range(10)], dim)
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sq_adc_topk(df, q, k=2, dim=dim)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan
    # the ranked stream must carry codes, not the corpus vectors
    assert "sq_code" in plan
