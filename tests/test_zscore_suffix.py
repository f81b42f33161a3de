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


def test_robust_scale_matches_python_and_handles_degenerates(spark):
    from curw_flo2d_data_manager_spark.operators.sampling import robust_scale

    rng = random.Random(9)
    rows = [("a", float(rng.randint(0, 100))) for _ in range(51)]
    rows += [("b", 7.0), ("b", 7.0), ("b", 7.0)]  # MAD == 0
    rows += [("a", None)]
    df = spark.createDataFrame(rows, "g string, score double")
    got = robust_scale(df, ["g"], "score").collect()

    def median(vals):
        s = sorted(vals)
        n = len(s)
        mid = n // 2
        return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2.0

    a_vals = [v for g, v in rows if g == "a" and v is not None]
    med = median(a_vals)
    mad = median([abs(v - med) for v in a_vals])
    for r in got:
        if r["g"] == "a" and r["score"] is not None:
            assert abs(r["score_robust"] - (r["score"] - med) / mad) < 1e-9
        else:
            assert r["score_robust"] is None  # MAD==0 group and NULL score


def test_robust_scale_outlier_resistance_vs_zscore(spark):
    # one enormous outlier: the z-score of a typical row collapses
    # toward 0 (sigma explodes) while the robust score is unmoved
    rows = [("a", float(v)) for v in range(1, 100)] + [("a", 1e9)]
    df = spark.createDataFrame(rows, "g string, score double")
    z = {
        r["score"]: r["score_z"]
        for r in zscore_normalize(df, ["g"], "score").collect()
    }
    from curw_flo2d_data_manager_spark.operators.sampling import robust_scale

    rb = {
        r["score"]: r["score_robust"]
        for r in robust_scale(df, ["g"], "score").collect()
    }
    # typical row 75.0: true robust score = (75 - 50.5) / 25 = 0.98
    assert abs(rb[75.0] - (75.0 - 50.5) / 25.0) < 1e-9
    assert abs(z[75.0]) < 0.2  # flattened by the outlier (≈ −0.1)


def test_robust_scale_fact_side_never_shuffles(spark):
    from curw_flo2d_data_manager_spark.operators.sampling import robust_scale

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, score double")
    plan = (
        robust_scale(df, ["g"], "score")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_zipf_slope_recovers_planted_power_law(spark):
    """A synthetic corpus whose term frequencies follow n(r) = C·r^s
    exactly must fit slope s; a flat (uniform-frequency) domain fits
    slope 0. Counts are planted via word repetition inside documents,
    so the tokenize → count → rank → regr path is exercised end to
    end."""
    from curw_flo2d_data_manager_spark.operators.textstats import zipf_slope

    docs = []
    # domain A: term_r appears round(64 / r) times (slope ≈ -1)
    for r in range(1, 17):
        docs.append(("A", " ".join([f"term{r:02d}"] * round(64 / r))))
    # domain B: every term appears exactly 5 times (slope 0)
    for r in range(1, 9):
        docs.append(("B", " ".join([f"tok{r}"] * 5)))
    df = spark.createDataFrame(docs, "source string, text string")
    got = {r["source"]: r for r in zipf_slope(df, ["source"]).collect()}
    assert got["B"].zipf_slope == 0.0 and got["B"].vocab == 8
    assert got["A"].vocab == 16
    # round(64/r) quantization bends the tail; the fit stays near -1
    assert -1.1 < got["A"].zipf_slope < -0.85
