"""Unit tests for the late-round-11 operator family: rank statistics
(Spearman rho / Mann-Whitney U with tie-averaged doubled ranks), HITS
fixed-point, retrieval eval (MRR / AP), and domain JS divergence."""

import math

import pytest

from pyspark.sql import functions as F


def _avgranks(v):
    s = sorted(range(len(v)), key=lambda i: v[i])
    r = [0.0] * len(v)
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and v[s[j + 1]] == v[s[i]]:
            j += 1
        ar = (i + j) / 2 + 1
        for k in range(i, j + 1):
            r[s[k]] = ar
        i = j + 1
    return r


def _spearman(xs, ys):
    rx, ry = _avgranks(xs), _avgranks(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    return (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )


def test_spearman_rho_monotone_ties_and_degenerate(spark):
    """Perfect monotone series hit ±1 exactly, a tied-noisy series
    matches the tie-averaged reference formula to the rounding digit,
    an all-tied side and a too-short key return NULL."""
    from curw_flo2d_data_manager_spark.operators.rankstats import (
        spearman_rho,
    )

    xs = list(range(12))
    ys = [x + ((x * 5) % 4) for x in xs]  # noisy WITH ties in y
    rows = (
        [("up", i, float(2 * i)) for i in range(6)]
        + [("dn", i, float(9 - i)) for i in range(6)]
        + [("tied", i, 7.0) for i in range(5)]
        + [("short", i, float(i)) for i in range(2)]
        + [("noisy", x, float(y)) for x, y in zip(xs, ys)]
    )
    df = spark.createDataFrame(rows, "k string, x long, y double")
    got = {
        r.k: (r.n, r.rho)
        for r in spearman_rho(df, ["k"], "x", "y").collect()
    }
    assert got["up"] == (6, 1.0)
    assert got["dn"] == (6, -1.0)
    assert got["tied"][1] is None  # zero rank variance on y
    assert got["short"][1] is None  # n < min_n
    assert got["noisy"][1] == pytest.approx(
        round(_spearman(xs, [float(y) for y in ys]), 6), abs=1e-9
    )


def test_spearman_rho_drops_null_rows(spark):
    """NULL x or y rows are excluded before ranking — a key whose
    non-NULL remainder is perfectly monotone still scores 1.0."""
    from curw_flo2d_data_manager_spark.operators.rankstats import (
        spearman_rho,
    )

    rows = [("a", 1, 1.0), ("a", 2, None), ("a", 3, 3.0),
            ("a", None, 9.0), ("a", 4, 4.0)]
    df = spark.createDataFrame(rows, "k string, x long, y double")
    got = spearman_rho(df, ["k"], "x", "y").collect()[0]
    assert (got.n, got.rho) == (3, 1.0)


def test_mann_whitney_u_matches_reference_with_cross_group_tie(spark):
    """U in 2x fixed point equals the tie-averaged reference
    computation (including a cross-group tie producing a .5), and
    U_a + U_b == 2·n_a·n_b exactly."""
    from curw_flo2d_data_manager_spark.operators.rankstats import (
        mann_whitney_u,
    )

    vals = (
        [("A", float(v)) for v in (1, 3, 5, 7, 9, 11)]
        + [("B", float(v)) for v in (2, 4, 6, 8)]
        + [("A", 6.0)]  # cross-group tie with B's 6
    )
    df = spark.createDataFrame(vals, "g string, v double")
    got = mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    ranks = _avgranks([v for _, v in vals])
    sr1 = sum(r for (g, _), r in zip(vals, ranks) if g == "A")
    n1 = 7
    u1 = sr1 - n1 * (n1 + 1) / 2
    assert got.n_a == 7 and got.n_b == 4
    assert got.u_a_2x == int(u1 * 2)
    assert got.u_a_2x + got.u_b_2x == 2 * got.n_a * got.n_b


def test_mann_whitney_u_per_key_and_filters(spark):
    """Per-key form ranks within each key only; rows outside the two
    groups and NULL values never enter the ranking."""
    from curw_flo2d_data_manager_spark.operators.rankstats import (
        mann_whitney_u,
    )

    rows = [
        ("k1", "A", 1.0), ("k1", "B", 2.0), ("k1", "C", 99.0),
        ("k1", "A", None), ("k2", "A", 5.0), ("k2", "B", 1.0),
    ]
    df = spark.createDataFrame(rows, "k string, g string, v double")
    got = {
        r.k: (r.n_a, r.n_b, r.u_a_2x)
        for r in mann_whitney_u(
            df, "g", "v", "A", "B", key_cols=["k"]
        ).collect()
    }
    # k1: A=1.0 < B=2.0 -> U_A = 0; k2: A=5.0 > B=1.0 -> U_A = 1
    assert got["k1"] == (1, 1, 0)
    assert got["k2"] == (1, 1, 2)


def test_hits_fixed_point_structure_and_conservation(spark):
    """On 1->2, 1->3, 2->3, 3->1, 4->3: node 3 is the top authority,
    node 1 the top hub, node 4 (no in-links) has authority exactly 0,
    and each L1-normalized vector sums to ~scale (short only by
    integer-division truncation, < 1 unit per node)."""
    from curw_flo2d_data_manager_spark.operators.pagerank import (
        hits_fixed_point,
    )

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)], "src long, dst long"
    )
    scale = 10**9
    got = {
        r.node: (r.hub_fp, r.auth_fp)
        for r in hits_fixed_point(e, iters=3, scale=scale).collect()
    }
    assert len(got) == 4
    auth = {n: a for n, (_, a) in got.items()}
    hub = {n: h for n, (h, _) in got.items()}
    assert max(auth, key=auth.get) == 3
    assert max(hub, key=hub.get) == 1
    assert auth[4] == 0
    assert scale - len(got) < sum(auth.values()) <= scale
    assert scale - len(got) < sum(hub.values()) <= scale


def test_hits_fixed_point_is_deterministic_across_partitionings(spark):
    """The exact-integer recurrence is partition-invariant: 1 vs 8
    input partitions produce bit-identical scores."""
    from curw_flo2d_data_manager_spark.operators.pagerank import (
        hits_fixed_point,
    )

    rows = [(i % 23, (i * 7) % 19 + 100) for i in range(400)]
    base = spark.createDataFrame(rows, "src long, dst long")
    a = sorted(
        tuple(r)
        for r in hits_fixed_point(base.repartition(1), iters=3).collect()
    )
    b = sorted(
        tuple(r)
        for r in hits_fixed_point(base.repartition(8), iters=3).collect()
    )
    assert a == b


def test_mrr_and_average_precision_hand_computed(spark):
    """Hand-built run: q1 rel at ranks 2 and 4 -> RR 1/2,
    AP = (1/2 + 2/4)/2 = 1/2; q2 no rel -> NULLs; q3 rel at rank 1 ->
    RR 1, AP 1. All in 1e9 fixed point with DIV truncation."""
    from curw_flo2d_data_manager_spark.operators.mltrain import (
        average_precision_at_k,
        mrr_at_k,
    )

    rows = []
    rel = {(1, 2), (1, 4), (3, 1)}
    for qid in (1, 2, 3):
        for rank in range(1, 6):
            rows.append((qid, rank, 1 if (qid, rank) in rel else 0))
    df = spark.createDataFrame(rows, "query_id long, rank int, rel int")
    mrr = {r.query_id: (r.first_rel_rank, r.rr_fp)
           for r in mrr_at_k(df, k=5).collect()}
    assert mrr[1] == (2, 500_000_000)
    assert mrr[2] == (None, None)
    assert mrr[3] == (1, 1_000_000_000)
    ap = {r.query_id: (r.n_rel, r.ap_fp)
          for r in average_precision_at_k(df, k=5).collect()}
    assert ap[1] == (2, 500_000_000)
    assert ap[2] == (0, None)
    assert ap[3] == (1, 1_000_000_000)


def test_domain_js_divergence_matches_float_reference(spark):
    """Fixed-point JSD equals the float reference within the rounding
    budget (each vocab term rounds to 1e-9 before the sum, so the
    bound is ~0.5e-9 per corpus term plus the final DIV), identical
    domains score ~0, and disjoint vocabularies approach ln 2."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        domain_js_divergence,
    )
    from collections import Counter

    rows = [
        (1, "a", "x x y"), (2, "a", "x y z"),
        (3, "b", "z z z w"), (4, "c", "q q r r q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.domain: r.jsd_fp / 1e9
           for r in domain_js_divergence(df).collect()}

    corpus = "x x y x y z z z z w q q r r q".split()
    cc, nc = Counter(corpus), len(corpus)
    doms = {"a": "x x y x y z".split(), "b": "z z z w".split(),
            "c": "q q r r q".split()}
    for dom, toks in doms.items():
        cd, ndd = Counter(toks), len(toks)
        s = 0.0
        for t in cc:
            q = cc[t] / nc
            m = (cd.get(t, 0) / ndd + q) / 2
            if cd.get(t):
                s += 0.5 * (cd[t] / ndd) * math.log((cd[t] / ndd) / m)
            s += 0.5 * q * math.log(q / m)
        assert got[dom] == pytest.approx(s, abs=1e-8)
    # JSD is bounded: strictly positive here (no domain equals the
    # corpus) and below ln 2 (domains share the corpus mass they
    # contribute)
    assert all(0 < v < math.log(2) for v in got.values())


# ---- property tests: random small samples vs the pure-Python
# tie-averaged references (few examples — each is a Spark job)
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# values drawn from a tiny grid so ties are COMMON — the property is
# exactly about tie handling
_tied_floats = st.integers(min_value=0, max_value=6).map(
    lambda i: float(i) / 2
)


@_SETTINGS
@given(
    pts=st.lists(
        st.tuples(_tied_floats, _tied_floats), min_size=3, max_size=25
    )
)
def test_spearman_property_matches_reference(spark, pts):
    """spearman_rho == the tie-averaged rank-Pearson reference on any
    small sample (NULL when either side is all-tied)."""
    from curw_flo2d_data_manager_spark.operators.rankstats import (
        spearman_rho,
    )

    df = spark.createDataFrame(
        [("k", x, y) for x, y in pts], "k string, x double, y double"
    )
    got = spearman_rho(df, ["k"], "x", "y").collect()[0]
    xs = [x for x, _ in pts]
    ys = [y for _, y in pts]
    if len(set(xs)) == 1 or len(set(ys)) == 1:
        assert got.rho is None
    else:
        assert got.rho == pytest.approx(
            round(_spearman(xs, ys), 6), abs=1e-9
        )


@_SETTINGS
@given(
    a=st.lists(_tied_floats, min_size=1, max_size=15),
    b=st.lists(_tied_floats, min_size=1, max_size=15),
)
def test_mann_whitney_property_matches_reference(spark, a, b):
    """mann_whitney_u's 2x-fixed-point U equals the tie-averaged
    reference and U_a + U_b == 2·n_a·n_b on any sample."""
    from curw_flo2d_data_manager_spark.operators.rankstats import (
        mann_whitney_u,
    )

    vals = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(vals, "g string, v double")
    got = mann_whitney_u(df, "g", "v", "A", "B").collect()[0]
    ranks = _avgranks([v for _, v in vals])
    sr1 = sum(r for (g, _), r in zip(vals, ranks) if g == "A")
    u1_2x = int(2 * sr1) - len(a) * (len(a) + 1)
    assert (got.n_a, got.n_b) == (len(a), len(b))
    assert got.u_a_2x == u1_2x
    assert got.u_a_2x + got.u_b_2x == 2 * len(a) * len(b)


def test_mann_whitney_rejects_identical_groups(spark):
    """group_a == group_b would double-count every row into both
    samples — rejected loudly."""
    from curw_flo2d_data_manager_spark.operators.rankstats import (
        mann_whitney_u,
    )

    df = spark.createDataFrame([("A", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="must differ"):
        mann_whitney_u(df, "g", "v", "A", "A")


def test_gini_fixed_hand_computed_cases(spark):
    """Equal values -> 0; single holder of everything among n -> 
    (n-1)/n; the 1,2,3,4 textbook case -> 0.25; negative and NULL
    values are excluded; an all-zero key returns NULL gini."""
    from curw_flo2d_data_manager_spark.operators.exactstats import (
        gini_fixed,
    )

    rows = (
        [("eq", i, 10.0) for i in range(5)]
        + [("one", 1, 100.0)] + [("one", i, 0.0) for i in range(2, 6)]
        + [("mid", i, float(i)) for i in (1, 2, 3, 4)]
        + [("mid", 9, None), ("mid", 10, -5.0)]  # dropped
        + [("zero", 1, 0.0), ("zero", 2, 0.0)]
    )
    df = spark.createDataFrame(rows, "k string, id long, v double")
    got = {r.k: (r.n, r.total_cents, r.gini)
           for r in gini_fixed(df, ["k"], "v").collect()}
    assert got["eq"] == (5, 5000, 0.0)
    assert got["one"] == (5, 10000, 0.8)
    assert got["mid"] == (4, 1000, 0.25)
    assert got["zero"] == (2, 0, None)
