"""Unit tests for the round-11 operators: exact statistics (mode,
weighted median, moments), exact normal-equation regression, KS
statistic, fixed-point NDCG, link prediction, PMI collocations,
moving median, rectangle containment join, frame-sampling plan."""

import math

import pytest
from pyspark.sql import functions as F


def test_group_mode_tie_breaks_to_min_value(spark):
    from curw_flo2d_data_manager_spark.operators.exactstats import group_mode

    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("a", 3.0), ("a", 3.0), ("a", 9.0),
         ("b", 7.0)],
        "g string, v double",
    )
    got = {r.g: (r.mode_value, r.mode_count)
           for r in group_mode(df, ["g"], "v").collect()}
    # a: 5.0 and 3.0 both appear twice -> tie breaks to the SMALLER
    assert got == {"a": (3.0, 2), "b": (7.0, 1)}


def test_weighted_median_lower_rule(spark):
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        weighted_median,
    )

    # values 1,2,3 with weights 1,1,2: total 4, 2*cum(2)=4 >= 4 -> 2
    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 2)],
        "g string, v double, w long",
    )
    r = weighted_median(df, ["g"], "v", F.col("w")).collect()[0]
    assert r.weighted_median == 2.0 and r.total_weight_fp == 4

    # dominant-weight tail: median jumps to the heavy value
    df2 = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 10)],
        "g string, v double, w long",
    )
    assert (
        weighted_median(df2, ["g"], "v", F.col("w")).collect()[0]
        .weighted_median == 3.0
    )


def test_moments_fixed_matches_direct_computation(spark):
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        moments_fixed,
    )

    vals = [1, 2, 2, 3, 7, 9, 9, 9, 15]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, x long")
    r = moments_fixed(df, ["g"], F.col("x")).collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    m2 = sum((v - mean) ** 2 for v in vals) / n
    m3 = sum((v - mean) ** 3 for v in vals) / n
    m4 = sum((v - mean) ** 4 for v in vals) / n
    assert r.n == n
    assert math.isclose(r.mean, mean, rel_tol=1e-12)
    assert math.isclose(r.m2, m2, rel_tol=1e-9)
    assert math.isclose(r.skewness, m3 / m2**1.5, rel_tol=1e-9)
    assert math.isclose(r.kurtosis, m4 / m2**2 - 3.0, rel_tol=1e-9)


def test_moments_fixed_degenerate_group_is_null(spark):
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        moments_fixed,
    )

    df = spark.createDataFrame([("g", 4), ("g", 4)], "g string, x long")
    r = moments_fixed(df, ["g"], F.col("x")).collect()[0]
    assert r.m2 == 0.0 and r.skewness is None and r.kurtosis is None


def test_linreg_normal_exact_recovers_planted_line(spark):
    from curw_flo2d_data_manager_spark.operators.mltrain import (
        linreg_normal_exact,
    )

    # y = 300*x + 5000 exactly -> slope/intercept recovered exactly
    rows = [("g", x, 300 * x + 5000) for x in range(1, 40)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = linreg_normal_exact(df, ["g"], F.col("x"), F.col("y")).collect()[0]
    assert r.n == 39
    assert math.isclose(r.slope_fp, 300.0, rel_tol=1e-12)
    assert math.isclose(r.intercept_fp, 5000.0, rel_tol=1e-12)
    assert math.isclose(r.corr, 1.0, rel_tol=1e-12)


def test_linreg_normal_exact_zero_variance_x_is_null(spark):
    from curw_flo2d_data_manager_spark.operators.mltrain import (
        linreg_normal_exact,
    )

    df = spark.createDataFrame(
        [("g", 2, 10), ("g", 2, 20)], "g string, x long, y long"
    )
    r = linreg_normal_exact(df, ["g"], F.col("x"), F.col("y")).collect()[0]
    assert r.slope_fp is None and r.intercept_fp is None and r.corr is None


def test_ks_statistic_exact_brute_force(spark):
    from curw_flo2d_data_manager_spark.operators.mltrain import (
        ks_statistic_exact,
    )

    pos = [1.0, 2.0, 2.0, 6.0, 7.0]
    neg = [2.0, 3.0, 4.0, 5.0]
    rows = [(s, 1) for s in pos] + [(s, 0) for s in neg]
    df = spark.createDataFrame(rows, "score double, y int")
    r = ks_statistic_exact(df, "score", "y").collect()[0]
    # brute force over distinct thresholds
    best = max(
        abs(
            sum(1 for s in pos if s <= t) * len(neg)
            - sum(1 for s in neg if s <= t) * len(pos)
        )
        for t in sorted(set(pos + neg))
    )
    assert r.n_pos == 5 and r.n_neg == 4
    assert r.ks_num == best
    assert math.isclose(
        r.ks_stat, best / (len(pos) * len(neg)), abs_tol=1e-6
    )


def test_ndcg_at_k_hand_case(spark):
    from curw_flo2d_data_manager_spark.operators.mltrain import ndcg_at_k

    # q1: rel at ranks 1 and 3 of 3 -> dcg = g(1)+g(3), idcg = g(1)+g(2)
    # q2: no relevant -> NULL ndcg
    rows = [(1, 1, 1), (1, 2, 0), (1, 3, 1), (2, 1, 0), (2, 2, 0)]
    df = spark.createDataFrame(rows, "query_id long, rank long, rel int")
    got = {r.query_id: r for r in ndcg_at_k(df, k=10).collect()}

    def g(r):
        return round(1_000_000 * math.log(2) / math.log(r + 1))

    assert got[1].n_rel == 2
    assert got[1].dcg_fp == g(1) + g(3)
    assert got[1].idcg_fp == g(1) + g(2)
    expect = round((g(1) + g(3)) / (g(1) + g(2)), 6)
    assert math.isclose(got[1].ndcg, expect, abs_tol=2e-6)
    assert got[2].n_rel == 0 and got[2].ndcg is None


def test_link_prediction_scores_hand_graph(spark):
    from curw_flo2d_data_manager_spark.operators.linkpredict import (
        link_prediction_scores,
    )

    # path 1-2-3 plus 2-4: non-adjacent pairs through shared neighbor
    # 2: (1,3), (1,4), (3,4); deg(2) = 3 -> ra_w = floor(1e6/3)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4)], "src long, dst long"
    )
    got = {(r.node_a, r.node_b): r
           for r in link_prediction_scores(edges).collect()}
    assert set(got) == {(1, 3), (1, 4), (3, 4)}
    for pair, r in got.items():
        assert r.common == 1
        assert r.ra_fp == 333333
        # deg(1)=deg(3)=deg(4)=1 -> jaccard = 1/(1+1-1) = 1.0
        assert r.jaccard == 1.0

    # adjacent pairs with shared neighbors are excluded
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    assert link_prediction_scores(tri).count() == 0


def test_pmi_bigrams_counts_and_ranking(spark):
    from curw_flo2d_data_manager_spark.operators.textstats import (
        pmi_bigrams,
    )

    # "x y" always together (5 times); "a b" frequent but a, b also
    # appear apart -> "x y" has the higher PMI
    docs = [(i, "x y a b") for i in range(5)]
    docs += [(100 + i, "a c b d") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = pmi_bigrams(df, min_count=5, k=10).collect()
    by_term = {r.term: r for r in rows}
    assert by_term["x y"].c_xy == 5
    assert by_term["x y"].c_x == 5 and by_term["x y"].c_y == 5
    assert by_term["a b"].c_x == 10 and by_term["a b"].c_y == 10
    assert by_term["x y"].pmi_fp > by_term["a b"].pmi_fp
    assert rows[0].rank == 1


def test_moving_median_matches_pandas(spark):
    import pandas as pd

    from curw_flo2d_data_manager_spark.operators.smoothing import (
        moving_median,
    )

    import random

    rng = random.Random(7)
    rows = [(u, i, rng.uniform(0, 100)) for u in range(3) for i in range(40)]
    df = spark.createDataFrame(rows, "u long, i long, v double")
    got = (
        moving_median(df, ["u"], ["i"], "v", window=5)
        .orderBy("u", "i")
        .collect()
    )
    pdf = pd.DataFrame(rows, columns=["u", "i", "v"]).sort_values(["u", "i"])
    expect = (
        pdf.groupby("u")["v"]
        .rolling(5, min_periods=1)
        .median()
        .reset_index(drop=True)
        .tolist()
    )
    for r, e in zip(got, expect):
        assert math.isclose(r.moving_median, e, rel_tol=1e-12)


def test_point_in_rect_join_boundaries_and_bucket_crossing(spark):
    from curw_flo2d_data_manager_spark.operators.spatial import (
        point_in_rect_join,
    )

    points = spark.createDataFrame(
        [(1, 150.0, 5.0), (2, 250.0, 5.0), (3, 150.0, 50.0),
         (4, 99.9, 5.0), (5, 300.0, 5.0)],
        "pid long, px double, py double",
    )
    # rect spans buckets 0..2 (x 99.9..300.0 inclusive), y 0..10
    rects = spark.createDataFrame(
        [(7, 99.9, 300.0, 0.0, 10.0)],
        "rid long, x_lo double, x_hi double, y_lo double, y_hi double",
    )
    got = sorted(
        r.pid
        for r in point_in_rect_join(points, rects, bucket_width=100.0)
        .collect()
    )
    # closed rectangle: boundary points 4 (x_lo) and 5 (x_hi) included;
    # 3 excluded on y
    assert got == [1, 2, 4, 5]


def test_point_in_rect_join_no_duplicate_pairs(spark):
    from curw_flo2d_data_manager_spark.operators.spatial import (
        point_in_rect_join,
    )

    points = spark.createDataFrame(
        [(1, 150.0, 5.0)], "pid long, px double, py double"
    )
    rects = spark.createDataFrame(
        [(7, 0.0, 1000.0, 0.0, 10.0)],
        "rid long, x_lo double, x_hi double, y_lo double, y_hi double",
    )
    # rect spans 11 buckets but the pair must appear exactly once
    assert point_in_rect_join(points, rects, bucket_width=100.0).count() == 1


def test_frame_sample_plan_exact_schedule(spark):
    from curw_flo2d_data_manager_spark.operators.multimodal import (
        frame_sample_plan,
    )

    assets = spark.createDataFrame(
        [
            (1, 2000, 2400),   # 2 s @ 24 fps -> 48 frames, 8 samples
            (2, 100, 3000),    # 0.1 s @ 30 fps -> 3 frames < k
            (3, 10, 2400),     # 0.24 frames -> 0 -> excluded
        ],
        "asset_id long, duration_ms long, fps_x100 long",
    )
    rows = frame_sample_plan(assets, k=8).orderBy(
        "asset_id", "frame_idx"
    ).collect()
    a1 = [r for r in rows if r.asset_id == 1]
    a2 = [r for r in rows if r.asset_id == 2]
    assert all(r.total_frames == 48 for r in a1)
    assert [r.frame_idx for r in a1] == [i * 48 // 8 for i in range(8)]
    # ts_ms = idx*100000 // fps_x100 (e.g. idx 6 -> 250 ms @ 24 fps)
    assert [r.ts_ms for r in a1] == [
        i * 48 // 8 * 100000 // 2400 for i in range(8)
    ]
    assert [r.frame_idx for r in a2] == [0, 1, 2]
    assert not [r for r in rows if r.asset_id == 3]


def test_bfs_hops_known_graph(spark):
    from curw_flo2d_data_manager_spark.operators.components import bfs_hops

    # path 1-2-3-4-5-6 with branch 3-7; sources {1, 7}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (3, 7)],
        "src long, dst long",
    )
    sources = spark.createDataFrame([(1,), (7,)], "id long")
    got = {r.node: r.dist
           for r in bfs_hops(edges, sources, n_rounds=4).collect()}
    # node 3 is 2 hops from 1 but 1 hop from 7 -> min wins
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3, 6: 4, 7: 0}

    # horizon: 2 rounds omit nodes farther than 2 hops (5 is 3 hops
    # from its nearest source 7, 6 is 4 -> both absent)
    got2 = {r.node: r.dist
            for r in bfs_hops(edges, sources, n_rounds=2).collect()}
    assert got2 == {1: 0, 2: 1, 3: 1, 4: 2, 7: 0}


def test_bfs_hops_idempotent_past_convergence(spark):
    from curw_flo2d_data_manager_spark.operators.components import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )
    sources = spark.createDataFrame([(1,)], "id long")
    a = {r.node: r.dist for r in bfs_hops(edges, sources, 2).collect()}
    b = {r.node: r.dist for r in bfs_hops(edges, sources, 7).collect()}
    assert a == b == {1: 0, 2: 1, 3: 2}


def test_streaming_windowed_distinct_matches_batch(spark):
    """Chained stateful operators (dedup -> windowed count): exact
    distinct ids per tumbling window over a finite replay must equal
    the batch COUNT(DISTINCT); the sentinel row flushes the real
    windows and its own window must NOT emit."""
    import os
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.streaming import (
        read_series_stream,
        streaming_windowed_distinct,
    )

    rows = [
        # window 0 (00:00-06:00): ids a, b (a twice)
        ("a", "2024-01-01 01:00:00", 1.0),
        ("a", "2024-01-01 02:00:00", 1.0),
        ("b", "2024-01-01 05:59:59", 1.0),
        # window 1 (06:00-12:00): id a only
        ("a", "2024-01-01 06:00:00", 1.0),
        # sentinel far future: flushes both real windows
        ("zz", "2024-03-01 00:00:00", 0.0),
    ]
    df = spark.createDataFrame(rows, "id string, time string, value double")
    df = df.select("id", F.col("time").cast("timestamp").alias("time"), "value")
    src = tempfile.mkdtemp(prefix="wdist_test_")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(src)
        name = "wdist_" + uuid.uuid4().hex[:8]
        q = (
            streaming_windowed_distinct(
                read_series_stream(spark, src), "6 hours", "1 hour"
            )
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(src, "_chk"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()
        got = {
            r.wstart_s: r.n_ids for r in spark.table(name).collect()
        }
    finally:
        shutil.rmtree(src, ignore_errors=True)
    import datetime as dt

    w0 = int(
        dt.datetime(2024, 1, 1, 0, 0, tzinfo=dt.timezone.utc)
        .astimezone()
        .timestamp()
    )
    # windows are epoch-aligned 6h buckets in session-local time; read
    # the buckets back from the keys instead of hand-computing offsets
    assert sorted(got.values()) == [1, 2]
    assert len(got) == 2  # the sentinel's own window never emitted


def test_welch_ttest_matches_textbook(spark):
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        welch_ttest,
    )

    a = [310, 295, 288, 305, 300, 292]   # label 1
    b = [270, 285, 276, 290, 265]        # label 0
    rows = [(v, 1) for v in a] + [(v, 0) for v in b]
    df = spark.createDataFrame(rows, "v long, y int")
    r = welch_ttest(df, F.col("v"), F.col("y")).collect()[0]
    n1, n0 = len(a), len(b)
    m1, m0 = sum(a) / n1, sum(b) / n0
    v1 = sum((x - m1) ** 2 for x in a) / (n1 - 1)
    v0 = sum((x - m0) ** 2 for x in b) / (n0 - 1)
    se2 = v1 / n1 + v0 / n0
    t = (m1 - m0) / se2**0.5
    dfree = se2**2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v0 / n0) ** 2 / (n0 - 1)
    )
    assert r.n1 == n1 and r.n0 == n0
    assert math.isclose(r.mean1, m1, rel_tol=1e-12)
    assert math.isclose(r.t_stat, t, rel_tol=1e-9)
    assert math.isclose(r.welch_df, dfree, rel_tol=1e-9)


def test_welch_ttest_degenerate_is_null(spark):
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        welch_ttest,
    )

    df = spark.createDataFrame([(5, 1), (7, 0), (8, 0)], "v long, y int")
    r = welch_ttest(df, F.col("v"), F.col("y")).collect()[0]
    assert r.t_stat is None and r.welch_df is None  # n1 < 2


def test_chi_square_fixed_matches_direct(spark):
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        chi_square_fixed,
    )

    # 2x2 with a planted association
    rows = (
        [("a", 0)] * 30 + [("a", 1)] * 10
        + [("b", 0)] * 10 + [("b", 1)] * 30
    )
    df = spark.createDataFrame(rows, "r string, c int")
    got = chi_square_fixed(df, F.col("r"), F.col("c")).collect()[0]
    n = len(rows)
    from collections import Counter

    o = Counter(rows)
    rt = Counter(r for r, _ in rows)
    ct = Counter(c for _, c in rows)
    chi2 = sum(
        (o[(r, c)] - rt[r] * ct[c] / n) ** 2 / (rt[r] * ct[c] / n)
        for r in rt for c in ct
    )
    assert got.n == n and got.dof == 1
    assert math.isclose(got.chi2, chi2, abs_tol=5e-6)  # 4 cells x 1e-6


def test_mutual_info_fixed_matches_direct(spark):
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        mutual_info_fixed,
    )

    # perfectly dependent -> MI = H(X) = ln 2 for a 50/50 split;
    # independent-ish noise cells pull it below
    rows = [("a", 0)] * 25 + [("b", 1)] * 25 + [("a", 1)] * 5 + [("b", 0)] * 5
    df = spark.createDataFrame(rows, "x string, y int")
    got = mutual_info_fixed(df, F.col("x"), F.col("y")).collect()[0]
    n = len(rows)
    from collections import Counter

    cxy = Counter(rows)
    cx = Counter(x for x, _ in rows)
    cy = Counter(y for _, y in rows)
    mi = sum(
        (c / n) * math.log(c * n / (cx[x] * cy[y]))
        for (x, y), c in cxy.items()
    )
    assert got.n == n and got.n_cells == 4
    # per-cell fixed-point rounding error <= cxy * 0.5 / (n * 1e6)
    assert math.isclose(got.mi_nats, mi, abs_tol=1e-6)
    assert got.mi_nats > 0.2  # strong planted dependence


def test_mutual_info_fixed_independent_is_near_zero(spark):
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        mutual_info_fixed,
    )

    # exactly independent cells (products factorize) -> MI exactly 0
    rows = (
        [("a", 0)] * 20 + [("a", 1)] * 20
        + [("b", 0)] * 10 + [("b", 1)] * 10
    )
    df = spark.createDataFrame(rows, "x string, y int")
    got = mutual_info_fixed(df, F.col("x"), F.col("y")).collect()[0]
    assert abs(got.mi_nats) < 1e-6


def test_null_handling_across_exactstats(spark):
    """Round-11 self-review: NULLs must be EXCLUDED consistently —
    counts must never include rows the sums skipped, NULL labels must
    not fall through CASE into class 0, NULL contingency keys must not
    inflate N while failing their marginal join."""
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        chi_square_fixed,
        group_mode,
        moments_fixed,
        mutual_info_fixed,
        weighted_median,
        welch_ttest,
    )
    from curw_flo2d_data_manager_spark.operators.mltrain import (
        ks_statistic_exact,
        linreg_normal_exact,
    )

    # mode: NULL-heavy column still reports the real mode
    df = spark.createDataFrame(
        [("g", None), ("g", None), ("g", None), ("g", 2.0), ("g", 2.0),
         ("g", 9.0)],
        "g string, v double",
    )
    r = group_mode(df, ["g"], "v").collect()[0]
    assert (r.mode_value, r.mode_count) == (2.0, 2)

    # weighted median: NULL value rows carry no weight
    wm = spark.createDataFrame(
        [("g", None, 100), ("g", 1.0, 1), ("g", 5.0, 1)],
        "g string, v double, w long",
    )
    row = weighted_median(wm, ["g"], "v", F.col("w")).collect()[0]
    assert row.weighted_median == 1.0 and row.total_weight_fp == 2

    # moments: n must equal the non-null count
    mo = spark.createDataFrame(
        [("g", 1), ("g", 3), ("g", None)], "g string, x long"
    )
    assert moments_fixed(mo, ["g"], F.col("x")).collect()[0].n == 2

    # welch: NULL label rows are dropped, not class 0
    wt = spark.createDataFrame(
        [(10, 1), (12, 1), (5, 0), (6, 0), (999, None)],
        "v long, y int",
    )
    r = welch_ttest(wt, F.col("v"), F.col("y")).collect()[0]
    assert r.n1 == 2 and r.n0 == 2

    # linreg: n equals rows where BOTH x and y are present
    lr = spark.createDataFrame(
        [("g", 1, 10), ("g", 2, 20), ("g", None, 30), ("g", 3, None)],
        "g string, x long, y long",
    )
    assert linreg_normal_exact(
        lr, ["g"], F.col("x"), F.col("y")
    ).collect()[0].n == 2

    # ks: NULL scores are excluded from both classes
    ks = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 0), (None, 0)],
        "score double, y int",
    )
    r = ks_statistic_exact(ks, "score", "y").collect()[0]
    assert r.n_pos == 2 and r.n_neg == 1

    # chi-square / MI: NULL keys excluded from N and cells
    cs = spark.createDataFrame(
        [("a", 0), ("a", 1), ("b", 0), ("b", 1), (None, 0), ("a", None)],
        "r string, c int",
    )
    assert chi_square_fixed(cs, F.col("r"), F.col("c")).collect()[0].n == 4
    assert mutual_info_fixed(cs, F.col("r"), F.col("c")).collect()[0].n == 4


def test_point_in_rect_join_degenerate_rect_is_dropped(spark):
    """x_lo > x_hi can never contain a point; it must be dropped
    BEFORE the bucket explode (a descending sequence() would fan out
    across every bucket in between)."""
    from curw_flo2d_data_manager_spark.operators.spatial import (
        point_in_rect_join,
    )

    points = spark.createDataFrame(
        [(1, 150.0, 5.0)], "pid long, px double, py double"
    )
    rects = spark.createDataFrame(
        [(7, 100000.0, -100000.0, 0.0, 10.0)],
        "rid long, x_lo double, x_hi double, y_lo double, y_hi double",
    )
    out = point_in_rect_join(points, rects, bucket_width=100.0)
    assert out.count() == 0
