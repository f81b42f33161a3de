"""Extreme-value / drift operators: peaks_over_threshold declustering
against a brute-force Python clusterer, cusum_drift against the
textbook serial recurrence (the prefix-scan identity must be EXACT)."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.operators.extremes import (
    cusum_drift,
    peaks_over_threshold,
)


def _mk_rows(seed=7, n=300, keys=("a", "b")):
    rng = random.Random(seed)
    rows = []
    base = dt.datetime(2024, 5, 1)
    for k in keys:
        t = base
        for i in range(n):
            t += dt.timedelta(minutes=rng.choice([5, 15, 45, 90]))
            rows.append((k, i, t, round(rng.gauss(0.0, 2.0), 3)))
    return rows


def _pot_brute(rows, threshold, gap_s):
    """rows: [(ts, event_id, value)] one key, ts-sorted. Runs-method
    declustering, peak = max value (earliest ts on tie)."""
    exceed = [r for r in rows if r[2] > threshold]
    clusters = []
    for r in exceed:
        if clusters and (r[0] - clusters[-1][-1][0]).total_seconds() <= gap_s:
            clusters[-1].append(r)
        else:
            clusters.append([r])
    out = []
    for seq, cl in enumerate(clusters, start=1):
        peak = max(cl, key=lambda r: (r[2], -r[0].timestamp(), -r[1]))
        out.append((seq, peak[0], peak[1], peak[2], len(cl)))
    return out


def test_pot_matches_brute_force(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, "key string, event_id long, ts timestamp, value double")
    got = (
        peaks_over_threshold(
            df,
            value_col="value",
            ts_col="ts",
            key_cols=["key"],
            threshold=2.5,
            min_gap_seconds=3600.0,
            tiebreak_cols=["event_id"],
        )
        .orderBy("key", "cluster_seq")
        .collect()
    )
    by_key = {}
    for k, eid, t, v in rows:
        by_key.setdefault(k, []).append((t, eid, v))
    want = []
    for k in sorted(by_key):
        for seq, pts, peid, pv, size in _pot_brute(
            sorted(by_key[k]), 2.5, 3600.0
        ):
            want.append((k, seq, pts, peid, pv, size, round(pv - 2.5, 10)))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (
            g["key"], g["cluster_seq"], g["peak_ts"], g["peak_event_id"],
            g["peak_value"], g["cluster_size"],
        ) == w[:6]
        assert g["excess"] == pytest.approx(w[6])


def test_pot_value_tie_takes_earliest(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("k", 1, base, 5.0),
        ("k", 2, base + dt.timedelta(minutes=10), 5.0),
        ("k", 3, base + dt.timedelta(minutes=20), 4.0),
    ]
    df = spark.createDataFrame(rows, "key string, event_id long, ts timestamp, value double")
    out = peaks_over_threshold(
        df, key_cols=["key"], threshold=1.0, min_gap_seconds=3600.0,
        tiebreak_cols=["event_id"],
    ).collect()
    assert len(out) == 1
    assert out[0]["peak_event_id"] == 1 and out[0]["cluster_size"] == 3


def _cusum_serial(values, target, slack):
    sp = sn = 0.0
    out = []
    for x in values:
        sp = max(0.0, sp + (x - target - slack))
        sn = max(0.0, sn - (x - target + slack))
        out.append((sp, sn))
    return out


def test_cusum_matches_serial_recurrence(spark):
    rng = random.Random(11)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for k in ("u", "v"):
        vals = [round(rng.gauss(1.0, 1.5), 3) for _ in range(500)]
        # plant a drift segment so s+ actually accumulates
        vals[200:260] = [round(v + 4.0, 3) for v in vals[200:260]]
        for i, v in enumerate(vals):
            rows.append((k, i, base + dt.timedelta(minutes=i), v))
    df = spark.createDataFrame(rows, "key string, event_id long, ts timestamp, value double")
    got = (
        cusum_drift(
            df, key_cols=["key"], target=1.0, slack=0.5,
            tiebreak_cols=["event_id"],
        )
        .orderBy("key", "event_id")
        .collect()
    )
    by_key = {}
    for k, i, t, v in rows:
        by_key.setdefault(k, []).append(v)
    idx = {}
    for r in got:
        want = idx.setdefault(
            r["key"], _cusum_serial(by_key[r["key"]], 1.0, 0.5)
        )
        sp, sn = want[r["event_id"]]
        assert r["cusum_pos"] == pytest.approx(sp, abs=1e-9)
        assert r["cusum_neg"] == pytest.approx(sn, abs=1e-9)


def test_cusum_all_above_target_accumulates_from_first_row(spark):
    # regression for the implicit P_0 = 0 bound: a series that starts
    # already in drift must show a nonzero s+ on row one
    base = dt.datetime(2024, 1, 1)
    rows = [("k", i, base + dt.timedelta(minutes=i), 3.0) for i in range(4)]
    df = spark.createDataFrame(rows, "key string, event_id long, ts timestamp, value double")
    got = (
        cusum_drift(df, key_cols=["key"], target=0.0, slack=0.5,
                    tiebreak_cols=["event_id"])
        .orderBy("event_id").collect()
    )
    assert [r["cusum_pos"] for r in got] == pytest.approx([2.5, 5.0, 7.5, 10.0])
    assert all(r["cusum_neg"] == 0.0 for r in got)


def test_extremes_plans_use_running_frames_only(spark):
    df = spark.createDataFrame(
        [("k", 1, dt.datetime(2024, 1, 1), 1.0)],
        "key string, event_id long, ts timestamp, value double",
    )
    for out in (
        peaks_over_threshold(df, key_cols=["key"], tiebreak_cols=["event_id"]),
        cusum_drift(df, key_cols=["key"], tiebreak_cols=["event_id"]),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "following" not in plan.lower(), plan
