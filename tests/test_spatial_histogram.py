"""radius_grid_join vs brute force (pair-exactness + uniqueness +
no-cartesian plan gate) and equi_width_histogram vs a Python binner."""

import math
import random

from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.operators.histogram import (
    equi_width_histogram,
)
from curw_flo2d_data_manager_spark.operators.spatial import radius_grid_join


def test_radius_join_matches_brute_force(spark):
    rng = random.Random(42)
    left = [(i, rng.uniform(0, 20), rng.uniform(0, 20)) for i in range(300)]
    right = [(j, rng.uniform(0, 20), rng.uniform(0, 20)) for j in range(200)]
    r = 1.7
    ldf = spark.createDataFrame(left, "lid long, x double, y double")
    rdf = spark.createDataFrame(right, "rid long, x double, y double")
    got = radius_grid_join(ldf, rdf, radius=r).select("lid", "rid").collect()
    got_pairs = [(g["lid"], g["rid"]) for g in got]
    want = {
        (i, j)
        for i, xl, yl in left
        for j, xr, yr in right
        if (xl - xr) ** 2 + (yl - yr) ** 2 <= r * r
    }
    assert len(got_pairs) == len(set(got_pairs)), "duplicate pairs emitted"
    assert set(got_pairs) == want
    assert len(want) > 50  # the test actually exercises matches


def test_radius_join_boundary_inclusive_and_cross_cell(spark):
    # points exactly radius apart, straddling a cell boundary
    ldf = spark.createDataFrame([(1, 0.75, 0.0)], "lid long, x double, y double")
    rdf = spark.createDataFrame(
        [(1, 1.75, 0.0), (2, 2.8, 0.0)], "rid long, x double, y double"
    )
    got = radius_grid_join(ldf, rdf, radius=1.0).select("rid", "dist").collect()
    assert [(g["rid"], g["dist"]) for g in got] == [(1, 1.0)]


def test_radius_join_plan_has_no_cartesian(spark):
    ldf = spark.createDataFrame([(1, 0.0, 0.0)], "lid long, x double, y double")
    rdf = spark.createDataFrame([(2, 1.0, 1.0)], "rid long, x double, y double")
    plan = (
        radius_grid_join(ldf, rdf, radius=2.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_histogram_matches_python_binner(spark):
    rng = random.Random(7)
    rows = [(("a", "b", "c")[i % 3], rng.uniform(-5, 5)) for i in range(2000)]
    rows += [("a", None)]
    df = spark.createDataFrame(rows, "g string, value double")
    bins = 8
    got = {
        (r["g"], r["bin"]): (r["n"], r["bin_lo"])
        for r in equi_width_histogram(df, "value", ["g"], bins=bins).collect()
    }
    vals = [v for _, v in rows if v is not None]
    lo, hi = min(vals), max(vals)
    w = (hi - lo) / bins
    want = {}
    for g, v in rows:
        if v is None:
            continue
        b = min(bins - 1, math.floor((v - lo) / w))
        want[(g, b)] = want.get((g, b), 0) + 1
    assert {k: n for k, (n, _) in got.items()} == want
    for (g, b), (_, bin_lo) in got.items():
        assert bin_lo == lo + b * w


def test_histogram_degenerate_single_value(spark):
    df = spark.createDataFrame([("a", 3.0), ("a", 3.0), ("b", 3.0)],
                               "g string, value double")
    got = equi_width_histogram(df, "value", ["g"], bins=10).collect()
    assert {(r["g"], r["bin"], r["bin_lo"], r["n"]) for r in got} == {
        ("a", 0, 3.0, 2), ("b", 0, 3.0, 1)
    }


def test_equi_depth_histogram_balanced_bins_and_nulls(spark):
    from curw_flo2d_data_manager_spark.operators.histogram import (
        equi_depth_histogram,
    )

    # 0..79 uniform → 4 bins of exactly 20; NULLs excluded
    rows = [(float(i),) for i in range(80)] + [(None,)] * 5
    df = spark.createDataFrame(rows, "value double")
    got = {r.bin: r for r in equi_depth_histogram(df, bins=4).collect()}
    assert sorted(got) == [0, 1, 2, 3]
    assert all(got[b].n == 20 for b in got)
    assert got[0].lo == 0.0 and got[3].hi == 79.0
    # long tail: equi-depth still balances where equi-width collapses
    tail = spark.createDataFrame(
        [(float(i),) for i in range(99)] + [(1e9,)], "value double"
    )
    depth = {r.bin: r.n for r in equi_depth_histogram(tail, bins=4).collect()}
    assert max(depth.values()) <= 26  # ~25 per bin despite the outlier


def test_equi_depth_histogram_bit_equal_to_percentile_form(spark):
    """Round-14 rewrite pin: the parallel order-statistics edge pass
    (global_row_number + lo*(1-d)+hi*d interpolation) must reproduce
    the old single-merge ``F.percentile`` form BIT-exactly — the bins
    only diverge if an edge differs in the last ulp AND a value sits
    exactly on it, so the fixture plants integer values (interpolated
    edges land exactly on data points), duplicates/ties, negatives,
    and non-integral positions across several n and bins choices."""
    import random

    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.histogram import (
        equi_depth_histogram,
    )

    random.seed(23)
    cases = [
        [float(i) for i in range(1, 10)],          # integral positions
        [1.0, 1.0, 1.0, 2.0],                      # heavy ties
        [-5.5, -1.25, 0.0, 0.0, 3.75, 100.0],      # negatives + dup
        [7.125],                                   # single row
        [round(random.uniform(-50, 50), 1) for _ in range(137)],
        [float(random.randint(0, 9)) for _ in range(64)],  # dense ties
    ]
    for bins in (4, 8):
        for vals in cases:
            df = spark.createDataFrame([(x,) for x in vals], "value double")
            v = F.col("value").cast("double")
            fracs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
            edges = df.filter(v.isNotNull()).agg(
                F.percentile(v, fracs).alias("_edges")
            )
            old = (
                df.filter(v.isNotNull())
                .crossJoin(F.broadcast(edges))
                .select(
                    v.alias("_v"),
                    F.aggregate(
                        F.col("_edges"),
                        F.lit(0),
                        lambda acc, e: acc
                        + F.when(v > e, F.lit(1)).otherwise(F.lit(0)),
                    ).alias("bin"),
                )
                .groupBy("bin")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.min("_v").alias("lo"),
                    F.max("_v").alias("hi"),
                )
            )
            got = equi_depth_histogram(df, bins=bins)
            assert sorted(map(tuple, got.collect())) == sorted(
                map(tuple, old.collect())
            ), (bins, vals)
    # empty input: no rows, no crash (exercises literal_rows_df([], ...))
    empty = spark.createDataFrame([], "value double")
    assert equi_depth_histogram(empty, bins=4).collect() == []
