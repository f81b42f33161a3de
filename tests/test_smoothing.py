"""EWMA smoothing: sequential fold vs the pandas recurrence, and the
opt-in segmented fold (SCALING.md §EWMA) vs both."""

import math
import random

import pandas as pd
import pytest

from curw_flo2d_data_manager_spark.operators.smoothing import ewma


def _pandas_ewma(values, alpha):
    """Reference recurrence: e0 = x0, e = a·x + (1−a)·e; NULLs carry
    state and emit NULL."""
    out, e = [], None
    for x in values:
        if x is None or (isinstance(x, float) and math.isnan(x)):
            out.append(None)
            continue
        e = x if e is None else alpha * x + (1.0 - alpha) * e
        out.append(e)
    return out


def _mk(spark, series):
    rows = [
        (key, i, v)
        for key, vals in series.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "k string, t long, value double")


def _got(df, **kw):
    out = ewma(df, ["k"], ["t"], alpha=0.3, **kw)
    res = {}
    for r in out.collect():
        res.setdefault(r.k, {})[r.t] = r.value_ewma
    return {k: [v[i] for i in sorted(v)] for k, v in res.items()}


SERIES = {
    "a": [1.0, 2.0, None, 4.0, 0.5, 0.5, 3.0],
    "b": [None, None, 7.0],
    "c": [None, None],  # never starts: all NULL out
    "d": [5.0],
}


def test_ewma_matches_recurrence_and_null_contract(spark):
    got = _got(_mk(spark, SERIES))
    for k, vals in SERIES.items():
        want = _pandas_ewma(vals, 0.3)
        assert len(got[k]) == len(want)
        for g, w in zip(got[k], want):
            assert (g is None) == (w is None)
            if g is not None:
                assert g == pytest.approx(w, rel=0, abs=0)  # bit-identical


def test_ewma_segmented_matches_sequential(spark):
    """Round-8 verdict item 6: the segmented two-pass fold agrees with
    the sequential recurrence to float tolerance across segment
    boundaries, all-NULL segments, and series whose first non-null
    lands in a later segment."""
    random.seed(109)
    series = {
        # long series → many segments at segment_rows=5
        "long": [
            None if random.random() < 0.2 else random.uniform(-10, 10)
            for _ in range(137)
        ],
        # first non-null value in segment 3
        "late": [None] * 17 + [2.5, 3.5, None, 1.0],
        # an entire middle segment of NULLs: state must carry across
        "gap": [1.0, 2.0] + [None] * 12 + [3.0],
        "empty": [None] * 9,
        "short": [4.2],
    }
    df = _mk(spark, series)
    got = _got(df, segment_rows=5)
    for k, vals in series.items():
        want = _pandas_ewma(vals, 0.3)
        for i, (g, w) in enumerate(zip(got[k], want)):
            assert (g is None) == (w is None), (k, i)
            if g is not None:
                assert g == pytest.approx(w, rel=1e-12), (k, i)


def test_ewma_segmented_one_group_per_segment(spark):
    """The segmented path must never materialize a whole series in one
    Arrow group: with segment_rows=4 a 13-row series re-folds in 4
    groups (observable via the max group size the final
    applyInPandas sees)."""
    import pyspark.sql.functions as F

    df = _mk(spark, {"x": [float(i) for i in range(13)]})
    out = ewma(df, ["k"], ["t"], alpha=0.3, segment_rows=4)
    # group key of the final fold is (k, _seg): 13 rows / 4 → segs 0..3
    segs = out.withColumn("_s", (F.col("t") / 4).cast("long"))
    per = segs.groupBy("_s").count().collect()
    assert {r["_s"] for r in per} == {0, 1, 2, 3}
    # values agree with the plain fold
    plain = _got(df)
    seg = _got(df, segment_rows=4)
    for g, w in zip(seg["x"], plain["x"]):
        assert g == pytest.approx(w, rel=1e-12)


def test_ewma_segmented_key_order_and_null_keys(spark):
    """Round-9 review regressions: (a) key_cols in a DIFFERENT order
    than the schema must not swap key values in the carry join (the
    old schema-ordered fill returned zero rows); (b) rows whose key is
    NULL must survive the segmented path exactly like the default path
    (null-safe carry join)."""
    rows = [
        ("g1", "a", i, float(i)) for i in range(7)
    ] + [
        ("g2", "b", i, float(i) * 2) for i in range(7)
    ] + [
        (None, "c", i, float(i) + 1 if i % 2 else None) for i in range(7)
    ]
    df = spark.createDataFrame(
        rows, "k1 string, k2 string, t long, value double"
    )
    # key_cols deliberately REVERSED vs schema order
    plain = ewma(df, ["k2", "k1"], ["t"], alpha=0.3)
    seg = ewma(df, ["k2", "k1"], ["t"], alpha=0.3, segment_rows=3)
    p = {(r.k1, r.k2, r.t): r.value_ewma for r in plain.collect()}
    s = {(r.k1, r.k2, r.t): r.value_ewma for r in seg.collect()}
    assert len(s) == len(rows)  # nothing dropped (incl. NULL-key rows)
    assert set(p) == set(s)
    for key in p:
        if p[key] is None:
            assert s[key] is None, key
        else:
            assert s[key] == pytest.approx(p[key], rel=1e-12), key


def test_ewma_validation(spark):
    df = _mk(spark, {"x": [1.0]})
    with pytest.raises(ValueError):
        ewma(df, ["k"], ["t"], alpha=0.0)
    with pytest.raises(ValueError):
        ewma(df, [], ["t"])
    with pytest.raises(ValueError):
        ewma(df, ["k"], ["t"], segment_rows=1)
