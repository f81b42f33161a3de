"""zscore_normalize + suffix_prefix_pairs unit behavior."""

import math
import random

from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.operators.dedup import suffix_prefix_pairs
from curw_flo2d_data_manager_spark.operators.sampling import zscore_normalize


def test_zscore_matches_python_and_handles_degenerates(spark):
    rng = random.Random(5)
    rows = [("a", float(rng.randint(0, 100))) for _ in range(50)]
    rows += [("b", 7.0), ("b", 7.0)]  # sigma == 0
    rows += [("c", 3.0)]  # single row
    rows += [("a", None)]
    df = spark.createDataFrame(rows, "g string, score double")
    got = zscore_normalize(df, ["g"], "score").collect()
    a_vals = [v for g, v in rows if g == "a" and v is not None]
    mu = sum(a_vals) / len(a_vals)
    sigma = math.sqrt(sum((v - mu) ** 2 for v in a_vals) / len(a_vals))
    for r in got:
        if r["g"] == "a" and r["score"] is not None:
            assert abs(r["score_z"] - (r["score"] - mu) / sigma) < 1e-9
        else:
            assert r["score_z"] is None


def test_zscore_fact_side_never_shuffles(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, score double")
    plan = (
        zscore_normalize(df, ["g"], "score")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # stats side aggregates + broadcasts; no sort-merge/shuffled-hash
    # join (which would mean the fact was exchanged on the group key)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_suffix_prefix_finds_planted_continuation(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        # starts with doc 1's last 8 words
        (2, "gamma delta epsilon zeta eta theta iota kappa more words here"),
        (3, "unrelated text with eight distinct little words inside it"),
        (4, "short doc"),  # ineligible (< 8 words)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["prev_id"], r["next_id"])
        for r in suffix_prefix_pairs(df, k=8).collect()
    }
    assert got == {(1, 2)}


def test_suffix_prefix_join_carries_grams_not_text(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    out = suffix_prefix_pairs(df, k=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both sides project to (id, gram) before the join — the raw text
    # column must not appear in the join operator itself
    assert "CartesianProduct" not in plan
    # symmetric identical docs: tail == head, both directions pair
    got = {(r["prev_id"], r["next_id"]) for r in out.collect()}
    assert got == {(1, 2), (2, 1)}
