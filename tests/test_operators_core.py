"""Core operator semantics: spine join, cumulative fraction, fill-down,
nearest-neighbor, gap fill."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.operators import (
    cumulative_fraction,
    fill_down,
    gap_fill_cross,
    nearest_neighbor_join,
    spine_align,
)
from curw_flo2d_data_manager_spark.operators.nearest import euclidean_deg2


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_spine_align_exposes_gaps(spark):
    series = spark.createDataFrame(
        [(ts(0, 5), 1.0), (ts(0, 15), 2.0)], "time timestamp, value double"
    )
    out = spine_align(spark, series, "2024-01-01 00:00:00", "2024-01-01 00:20:00", 5)
    rows = {r["time"]: r["value"] for r in out.collect()}
    assert len(rows) == 5
    assert rows[ts(0, 10)] is None
    assert rows[ts(0, 15)] == 2.0


def test_cumulative_fraction(spark):
    df = spark.createDataFrame(
        [(ts(0), 1.0), (ts(1), 3.0), (ts(2), 0.0), (ts(3), 4.0)],
        "time timestamp, value double",
    )
    rows = cumulative_fraction(df).orderBy("time").collect()
    assert [r["cum_value"] for r in rows] == [1.0, 4.0, 4.0, 8.0]
    assert [r["cum_fraction"] for r in rows] == pytest.approx([0.125, 0.5, 0.5, 1.0])


def test_cumulative_fraction_zero_total(spark):
    # total == 0 → fraction 0 (reference guard, gen_rain.py:183-186)
    df = spark.createDataFrame(
        [(ts(0), 0.0), (ts(1), 0.0)], "time timestamp, value double"
    )
    rows = cumulative_fraction(df).collect()
    assert all(r["cum_fraction"] == 0.0 for r in rows)


def test_fill_down(spark):
    df = spark.createDataFrame(
        [(0, "a"), (1, None), (2, None), (3, "b"), (4, None)],
        "line_no long, hdr string",
    )
    rows = fill_down(df, ["hdr"]).orderBy("line_no").collect()
    assert [r["hdr"] for r in rows] == ["a", "a", "a", "b", "b"]


def test_nearest_neighbor_join(spark):
    pts = spark.createDataFrame([(1, 6.90, 79.85), (2, 6.95, 79.88)], "qid int, lat double, lon double")
    stations = spark.createDataFrame(
        [(10, 6.91, 79.85), (20, 6.99, 79.90)], "sid int, s_lat double, s_lon double"
    )
    out = nearest_neighbor_join(
        pts,
        stations,
        euclidean_deg2(F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon")),
        ["qid"],
    )
    got = {r["qid"]: r["sid"] for r in out.collect()}
    assert got == {1: 10, 2: 20}


def test_gap_fill_cross(spark):
    obs = spark.createDataFrame(
        [(ts(0), "24", 5.0), (ts(1), "24", 6.0), (ts(1), "153", 7.0)],
        "time timestamp, cell_id string, value double",
    )
    cells = spark.createDataFrame([("24",), ("153",)], "cell_id string")
    out = gap_fill_cross(obs, cells, fill=-999.0)
    rows = {(r["time"], r["cell_id"]): r["value"] for r in out.collect()}
    assert len(rows) == 4
    assert rows[(ts(0), "153")] == -999.0
    assert rows[(ts(1), "153")] == 7.0


def test_salted_sum_equals_direct_groupby(spark):
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.skew import salted_sum

    df = spark.range(0, 10000).select(
        (F.col("id") % 3).alias("k"),  # 3 hot keys
        (F.col("id") % 7).cast("double").alias("v"),
    )
    got = {
        r.k: r.v
        for r in salted_sum(df, ["k"], {"v": "sum"}, n_salts=8).collect()
    }
    want = {r.k: r.v for r in df.groupBy("k").agg(F.sum("v").alias("v")).collect()}
    assert got == want


def test_salted_join_equals_direct_join(spark):
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.skew import salted_join

    big = spark.range(0, 5000).select(
        (F.col("id") % 4).alias("k"), F.col("id").alias("payload")
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (3, "d")], "k long, tag string"
    )
    got = salted_join(big, small, ["k"], n_salts=5).orderBy("payload").collect()
    want = big.join(small, ["k"]).orderBy("payload").collect()
    assert [(r.k, r.payload, r.tag) for r in got] == [
        (r.k, r.payload, r.tag) for r in want
    ]


def test_jdbc_upsert_partition_sql_and_batches(spark):
    """jdbc_upsert_partition against a recording fake DB-API pool."""
    import tempfile, os, glob, json

    from curw_flo2d_data_manager_spark.sinks.upsert import jdbc_upsert_partition

    log_dir = tempfile.mkdtemp(prefix="upsert_log_")

    class FakeCursor:
        def __init__(self, path):
            self.path = path
        def executemany(self, sql, rows):
            with open(self.path, "a") as f:
                for r in rows:
                    f.write(json.dumps({"sql": sql, "row": list(r)}) + "\n")

    class FakeConn:
        def __init__(self, path):
            self.path = path
        def cursor(self):
            return FakeCursor(self.path)
        def commit(self):
            pass
        def close(self):
            pass

    def factory(d=log_dir):
        return FakeConn(os.path.join(d, f"conn_{os.getpid()}_{id(object())}.jsonl"))

    df = spark.createDataFrame(
        [("t1", 1, 1.5), ("t1", 2, 2.5), ("t2", 3, 3.5)],
        "tms_id string, t int, value double",
    ).repartition(2)
    jdbc_upsert_partition(df, "fcst", keys=["tms_id", "t"], connection_factory=factory, batch_size=2)

    rows = []
    for p in glob.glob(os.path.join(log_dir, "*.jsonl")):
        rows.extend(json.loads(line) for line in open(p))
    assert len(rows) == 3
    assert all("INSERT INTO fcst" in r["sql"] for r in rows)
    assert all("ON DUPLICATE KEY UPDATE value=VALUES(value)" in r["sql"] for r in rows)
    assert sorted(r["row"] for r in rows) == [["t1", 1, 1.5], ["t1", 2, 2.5], ["t2", 3, 3.5]]


def test_ivf_topk_recall_floor(spark):
    """IVF ANN must recover most of the exact top-k with nprobe=4/8
    clusters on the small corpus (recall floor pins the quality of the
    bucketed path, not exact parity)."""
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.corpus_id)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r.query_id, r.corpus_id)
        for r in ivf_topk(emb, queries, k=10, n_clusters=8, nprobe=4, seed=42).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall:.2f} below floor"


def test_asof_join_backward_with_tolerance(spark):
    import datetime as _dt

    from curw_flo2d_data_manager_spark.operators.asof import asof_join

    T = lambda m: _dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [("a", T(5), "l1"), ("a", T(10), "l2"), ("a", T(30), "l3"), ("b", T(7), "l4")],
        "k string, time timestamp, tag string",
    )
    right = spark.createDataFrame(
        [("a", T(4), 1.0), ("a", T(10), 2.0), ("b", T(9), 9.0)],
        "k string, time timestamp, v double",
    )
    got = {
        (r.k, r.tag): (r.v_right, r.time_right)
        for r in asof_join(left, right, by=["k"]).collect()
    }
    assert got[("a", "l1")] == (1.0, T(4))
    assert got[("a", "l2")] == (2.0, T(10))  # equal time matches
    assert got[("a", "l3")] == (2.0, T(10))
    assert got[("b", "l4")] == (None, None)  # right row is later

    # tolerance: l3 is 20 min after its match -> nulled at 600 s
    tol = {
        (r.k, r.tag): r.v_right
        for r in asof_join(left, right, by=["k"], tolerance_seconds=600).collect()
    }
    assert tol[("a", "l2")] == 2.0
    assert tol[("a", "l3")] is None


def test_point_in_interval_join(spark):
    import datetime as _dt

    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.rangejoin import point_in_interval_join

    T = lambda h, m=0: _dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    points = spark.createDataFrame(
        [("a", T(0, 30), 1), ("a", T(2, 30), 2), ("a", T(5), 3), ("b", T(0, 30), 4)],
        "k string, time timestamp, pid int",
    )
    intervals = spark.createDataFrame(
        [("a", 10, T(0), T(3)), ("a", 11, T(2), T(4)), ("b", 12, T(1), T(2))],
        "k string, iid int, start timestamp, end timestamp",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in point_in_interval_join(points, intervals, by=["k"]).collect()
    )
    # p1 in i10; p2 in i10 and i11 (overlap); p3 in none; p4 before i12
    assert got == [(1, 10), (2, 10), (2, 11)]
    # exactly one match row per (point, interval) even when an interval
    # spans many buckets
    wide = point_in_interval_join(
        points, intervals, by=["k"], bucket_seconds=60
    ).collect()
    assert sorted((r.pid, r.iid) for r in wide) == [(1, 10), (2, 10), (2, 11)]


def test_sessionize_gap_assignment(spark):
    from curw_flo2d_data_manager_spark.operators.sessionize import sessionize

    rows = [
        # user 1: two sessions (45-min gap between 00:10 and 00:55)
        (1, 1, dt.datetime(2024, 1, 1, 0, 0)),
        (1, 2, dt.datetime(2024, 1, 1, 0, 10)),
        (1, 3, dt.datetime(2024, 1, 1, 0, 55)),
        # user 2: one session; 30-min gap is NOT > gap_seconds
        (2, 4, dt.datetime(2024, 1, 1, 0, 0)),
        (2, 5, dt.datetime(2024, 1, 1, 0, 30)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = sessionize(
        df, ts_col="ts", key_cols=["user_id"], gap_seconds=1800.0,
        tiebreak_cols=["event_id"],
    )
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_sessionize_subsecond_gap(spark):
    from curw_flo2d_data_manager_spark.operators.sessionize import sessionize

    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0, 0, 0, 100000)),
        (1, 2, dt.datetime(2024, 1, 1, 0, 0, 1, 500000)),  # 1.4 s gap
        (1, 3, dt.datetime(2024, 1, 1, 0, 0, 2, 400000)),  # 0.9 s gap
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    out = sessionize(df, key_cols=["user_id"], gap_seconds=1.0,
                     tiebreak_cols=["event_id"])
    got = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 2}


def test_hash_sample_deterministic_and_proportional(spark):
    from curw_flo2d_data_manager_spark.operators.sampling import (
        hash_sample,
        stratified_hash_sample,
    )

    df = spark.range(10_000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in hash_sample(df, ["k"], 0.2).collect())
    b = sorted(r["k"] for r in hash_sample(df, ["k"], 0.2).collect())
    assert a == b  # reproducible
    assert 0.17 < len(a) / 10_000 < 0.23  # ~fraction
    # a larger fraction strictly contains a smaller one (same salt)
    big = set(r["k"] for r in hash_sample(df, ["k"], 0.5).collect())
    assert set(a) <= big
    # different salt → essentially independent subset
    c = set(r["k"] for r in hash_sample(df, ["k"], 0.2, salt="x").collect())
    assert c != set(a)
    # fraction 1.0 keeps ALL rows (even keys whose bucket is 'ffffffff')
    assert hash_sample(df, ["k"], 1.0).count() == 10_000

    strat = df.withColumn(
        "s", (F.col("k") % 2 == 0).cast("string")
    )
    kept = stratified_hash_sample(
        strat, ["k"], "s", {"true": 1.0}, default_fraction=0.0
    )
    rows = kept.collect()
    assert all(r["s"] == "true" for r in rows)
    assert len(rows) == 5_000


def test_hyperplane_lsh_recall_on_noisy_duplicates(spark):
    """Planted noisy near-dups (cos ≈ 0.95+) must be recovered with
    high recall by 8×8-bit banded hyperplane LSH, and every reported
    pair must actually clear the exact-cosine threshold (no false
    positives — candidates are verified)."""
    import numpy as np

    from curw_flo2d_data_manager_spark.operators.similarity import (
        hyperplane_lsh_pairs,
    )

    rng = np.random.default_rng(42)
    base = rng.standard_normal((200, 32))
    noisy = base + 0.15 * rng.standard_normal((200, 32))  # cos ≈ 0.97
    rows = [(i, base[i].tolist()) for i in range(200)] + [
        (1000 + i, noisy[i].tolist()) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = hyperplane_lsh_pairs(df, cosine_threshold=0.9).collect()
    found = {(r["id_a"], r["id_b"]) for r in got}
    planted = {(i, 1000 + i) for i in range(200)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, recall
    assert all(r["cosine"] >= 0.9 for r in got)


def test_pii_redaction_and_url_extraction(spark):
    from curw_flo2d_data_manager_spark.operators.textstats import (
        extract_urls,
        redact_pii,
        url_domain,
    )

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.io or call +94 (0)71-234 5678 now"),
            (2, "server 10.0.255.7 logs; visit https://Docs.Example.org:8080/a?b=1 plain"),
            (3, "no pii here"),
        ],
        "id long, text string",
    )
    red = {r.id: r.r for r in df.select("id", redact_pii("text").alias("r")).collect()}
    assert red[1] == "mail [EMAIL] or call [PHONE] now"
    assert red[2].startswith("server [IP] logs")
    assert red[3] == "no pii here"

    urls = df.select("id", F.explode(extract_urls("text")).alias("u"))
    got = [(r.id, r.u) for r in urls.collect()]
    assert got == [(2, "https://Docs.Example.org:8080/a?b=1")]
    dom = urls.select(url_domain("u").alias("d")).collect()[0].d
    assert dom == "docs.example.org"


def test_pii_phone_vertical_tab_engine_parity(spark):
    """The phone pattern uses an explicit whitespace class, not \\s:
    Java \\s matches \\x0B (vertical tab) but RE2/DuckDB's does not, so
    \\s would redact a VT-containing digit run in Spark and not in the
    oracle (r2 advice). A VT must break the run in BOTH engines."""
    import duckdb

    from curw_flo2d_data_manager_spark.operators.textstats import (
        PII_PATTERNS,
        redact_pii,
    )

    text = "call +94112345678\x0b901234567 now"
    got = (
        spark.createDataFrame([(text,)], "text string")
        .select(redact_pii("text", kinds=["phone"]).alias("r"))
        .collect()[0]
        .r
    )
    pat, repl = PII_PATTERNS["phone"]
    oracle = duckdb.sql(
        "SELECT regexp_replace(?, ?, ?, 'g') AS r", params=[text, pat, repl]
    ).fetchone()[0]
    assert got == oracle == "call [PHONE]\x0b[PHONE] now"


def test_repetition_and_gopher_gates(spark):
    from curw_flo2d_data_manager_spark.operators.textstats import (
        duplicate_line_fraction,
        duplicate_word_fraction,
        gopher_quality_flags,
    )

    body = " ".join(f"unique{i} token" for i in range(40))
    df = spark.createDataFrame(
        [
            (1, "line a\nline b\nline a\nline a\n"),
            (2, "all distinct words here"),
            (3, body),
        ],
        "id long, text string",
    )
    got = {
        r.id: (r.dl, r.dw)
        for r in df.select(
            "id",
            F.round(duplicate_line_fraction("text"), 4).alias("dl"),
            F.round(duplicate_word_fraction("text"), 4).alias("dw"),
        ).collect()
    }
    assert got[1][0] == 0.5          # 2 of 4 lines repeat an earlier line
    assert got[2] == (0.0, 0.0)
    assert got[3][1] == pytest.approx(0.4875)  # 'token' * 39 repeats

    flags = {r.id: r.f.asDict() for r in df.select("id", gopher_quality_flags("text").alias("f")).collect()}
    assert not flags[2]["word_count_ok"]     # too short
    assert flags[3]["word_count_ok"] and flags[3]["dup_lines_ok"]
    assert flags[3]["dup_words_ok"]          # 0.4875 < 0.6 bound


def test_vector_mean_centroids(spark):
    from curw_flo2d_data_manager_spark.operators.similarity import vector_mean

    df = spark.createDataFrame(
        [("a", [1.0, 2.0, 3.0]), ("a", [3.0, 4.0, 5.0]), ("b", [10.0, 0.0, -2.0])],
        "label string, embedding array<double>",
    )
    got = {r.label: r.centroid for r in vector_mean(df, ["label"]).collect()}
    assert got["a"] == [2.0, 3.0, 4.0]
    assert got["b"] == [10.0, 0.0, -2.0]


def test_minhash_bucket_cap_guards_hot_buckets(spark):
    """max_bucket_size drops oversized LSH buckets (the n-squared
    guard): 30 identical boilerplate docs + 2 planted near-identical
    docs — with the cap at 10 the boilerplate cluster produces no
    pairs, while the small bucket still matches."""
    from curw_flo2d_data_manager_spark.operators.dedup import minhash_lsh_pairs

    boiler = "lorem ipsum dolor sit amet " * 4
    rare = "a very distinctive document about rivers and rainfall grids"
    rows = [(i, boiler) for i in range(30)]
    rows += [(100, rare), (101, rare)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4,
        jaccard_threshold=1.0, max_bucket_size=10,
    ).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(100, 101)}

    uncapped = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, jaccard_threshold=1.0
    ).count()
    assert uncapped == 30 * 29 // 2 + 1


def test_minhash_hot_bucket_cap_stays_linear(spark):
    """10k identical documents land in ONE bucket per band; without a
    cap that is ~50M candidate pairs per band. The finite default cap
    drops the hot buckets (observable via the Observation metric) so
    candidate generation stays linear, while a normal-sized duplicate
    pair elsewhere in the corpus is still found, and exact dedup still
    collapses the identical cluster."""
    from pyspark.sql import Observation

    from curw_flo2d_data_manager_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
    )

    n = 10_000
    boiler = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "the same boilerplate navigation text repeated on every page"
        ).alias("text"),
    )
    planted = spark.createDataFrame(
        [
            (1_000_001, "a genuinely unique duplicated article body here"),
            (1_000_002, "a genuinely unique duplicated article body here"),
            (1_000_003, "an unrelated singleton document with other words"),
        ],
        "doc_id long, text string",
    )
    docs = boiler.unionByName(planted)

    obs = Observation()
    pairs = minhash_lsh_pairs(docs, "doc_id", observation=obs).collect()
    # hot-bucket pairs are gone; the planted normal pair survives
    assert [(r.id_a, r.id_b) for r in pairs] == [(1_000_001, 1_000_002)]
    m = obs.get
    bands = 8  # operator default
    assert m["max_bucket_rows"] == n
    assert m["rows_in_dropped_buckets"] == n * bands
    # candidate work is bounded by cap²·bands even in the worst case
    assert len(pairs) <= 2000 * 2000 * bands

    collapsed = {
        r.kept_id: r.n_dups for r in exact_dedup(docs, ["text"], "doc_id").collect()
    }
    assert collapsed[0] == n  # identical cluster still collapsed exactly


def test_winnowing_shared_substring_guarantee(spark):
    """Winnowing's local-sampling property (Schleimer et al. 2003):
    documents sharing a substring of length >= k + window - 1 share at
    least one fingerprint; documents over disjoint alphabets share
    none; short/empty docs degrade to singleton/empty sets."""
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.textstats import (
        winnow_fingerprints,
    )

    shared = "the quick brown fox jumps over it"  # 33 chars >> k+w-1=8
    rows = [
        (1, f"alpha beta {shared} gamma delta epsilon zeta"),
        (2, f"omega psi chi {shared} upsilon tau sigma rho"),
        (3, "0123 4567 8901 2345 6789 0123 4567"),  # digits only
        (4, "abc"),  # shorter than k -> zero grams
        (5, ""),  # empty
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string").withColumn(
        "fps", winnow_fingerprints("text", k=5, window=4)
    )
    fps = {r.doc_id: set(r.fps) for r in df.collect()}
    assert fps[1] & fps[2], "docs sharing a long substring must overlap"
    assert not (fps[1] & fps[3]), "disjoint alphabets cannot share grams"
    assert fps[4] == set() or len(fps[4]) == 0
    assert fps[5] == set()
    # determinism: same text -> identical fingerprint set
    again = {
        r.doc_id: set(r.fps)
        for r in spark.createDataFrame(rows, "doc_id int, text string")
        .withColumn("fps", winnow_fingerprints("text", k=5, window=4))
        .collect()
    }
    assert again == fps


def test_winnow_pairs_passage_sharing(spark):
    """winnow_pairs finds documents sharing a PASSAGE even when the
    rest of the text is unrelated, and the bucket cap drops degenerate
    boilerplate fingerprints without killing the job."""
    from curw_flo2d_data_manager_spark.operators.dedup import winnow_pairs

    passage = "rainfall intensities exceeded the design return period"
    rows = [
        (1, f"report one begins {passage} and then diverges wildly"),
        (2, f"a different story {passage} with another ending entirely"),
        (3, "completely unrelated text about supplier acct balances"),
        (4, "9812 3456 7788 9900 1122 3344 5566 7788 9911"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = {
        (r.id_a, r.id_b): r.shared_fps
        for r in winnow_pairs(df, "doc_id", min_shared=2).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all({a, b} == {1, 2} for a, b in pairs)
    # cap of 1 drops every fingerprint bucket with both docs -> empty
    assert (
        winnow_pairs(df, "doc_id", min_shared=1, max_bucket_size=1).count() == 0
    )


def test_pack_sequences_invariants(spark):
    """Greedy contiguous packing: matches the sequential cumsum
    exactly, is partition-count invariant (the two-phase prefix equals
    the sequential semantics), and every non-last bin carries at least
    budget - max_doc_tokens (a straddler both overflows its own bin
    and eats into the next bin's range)."""
    from curw_flo2d_data_manager_spark.operators.packing import (
        bin_stats,
        pack_sequences,
    )

    rows = [(i, 10 + (i * 7) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, n_tok int")

    packed = pack_sequences(df, "doc_id", "n_tok", budget=300)
    got = {r.doc_id: (r.bin_id, r.bin_offset, r.n_tokens) for r in packed.collect()}
    # sequential reference
    start, ref = 0, {}
    for i, t in rows:
        ref[i] = (start // 300, start, t)
        start += t
    assert got == ref
    # partition-count invariance: same result from 13 input partitions
    packed13 = pack_sequences(df.repartition(13), "doc_id", "n_tok", budget=300)
    assert {r.doc_id: (r.bin_id, r.bin_offset) for r in packed13.collect()} == {
        k: v[:2] for k, v in ref.items()
    }
    # every non-last bin carries >= budget - max_doc_tokens
    stats = {r.bin_id: r.bin_tokens for r in bin_stats(packed, 300).collect()}
    last = max(stats)
    max_tok = max(t for _, t in rows)
    assert all(v >= 300 - max_tok for b, v in stats.items() if b != last)
    # truncation caps per-doc tokens
    capped = pack_sequences(df, "doc_id", "n_tok", budget=300, truncate_to=50)
    assert max(r.n_tokens for r in capped.collect()) <= 50


def test_weighted_sample_bias_and_determinism(spark):
    """A-Res weighted sampling: 10x-weight rows are heavily
    oversampled relative to their population share, selection is
    deterministic, and non-positive weights never qualify."""
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(5000).select(
        "id",
        F.when(F.col("id") < 500, 10.0)
        .when(F.col("id") < 520, 0.0)  # zero weight: never sampled
        .otherwise(1.0)
        .alias("w"),
    )
    s = weighted_sample(df, ["id"], "w", 500)
    ids = sorted(r.id for r in s.collect())
    assert len(ids) == 500
    heavy = sum(1 for i in ids if i < 500)
    assert heavy > 200  # 10% of population, ~50% of sample mass
    assert not any(500 <= i < 520 for i in ids)
    again = sorted(r.id for r in weighted_sample(df, ["id"], "w", 500).collect())
    assert again == ids


def test_ivf_index_parquet_json_roundtrip(spark, tmp_path):
    """The split build/query API must survive the documented
    persistence round-trip (assignments → partitionBy(cluster)
    parquet, centers → JSON) and return exactly what the one-shot
    ivf_topk returns — the reuse-across-query-batches contract."""
    import json as _json

    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.similarity import (
        build_ivf_index,
        ivf_query,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    direct = sorted(
        (r.query_id, r.rank, r.corpus_id)
        for r in ivf_topk(emb, queries, k=5, n_clusters=8, nprobe=3, seed=42).collect()
    )

    assignments, centers = build_ivf_index(emb, n_clusters=8, seed=42)
    idx_dir = str(tmp_path / "ivf_index")
    assignments.write.partitionBy("cluster").parquet(idx_dir)
    with open(tmp_path / "centers.json", "w") as fh:
        _json.dump(centers, fh)

    # cold reload, as a later query batch would
    with open(tmp_path / "centers.json") as fh:
        centers2 = _json.load(fh)
    assignments2 = spark.read.parquet(idx_dir)
    reloaded = sorted(
        (r.query_id, r.rank, r.corpus_id)
        for r in ivf_query(assignments2, centers2, queries, k=5, nprobe=3).collect()
    )
    assert reloaded == direct


def test_ngram_contamination_planted_leak(spark):
    """Decontamination finds exactly the training docs embedding a
    benchmark n-gram, counts distinct overlapping grams, and ignores
    sub-n overlaps."""
    from curw_flo2d_data_manager_spark.operators.dedup import (
        ngram_contamination,
    )

    bench = spark.createDataFrame(
        [(1, "what is the capital of france paris obviously")],
        "bid int, text string",
    )
    train = spark.createDataFrame(
        [
            # full benchmark question embedded -> contaminated
            (10, "junk what is the capital of france paris obviously junk"),
            # only a 3-word overlap -> clean at n=5
            (11, "what is the answer to everything"),
            (12, "completely unrelated text about rivers and gauges"),
        ],
        "doc_id int, text string",
    )
    got = {
        r.train_id: r.n_hits
        for r in ngram_contamination(train, bench, "doc_id", n=5).collect()
    }
    assert set(got) == {10}
    assert got[10] >= 1


def test_ngram_contamination_shuffle_join_parity(spark):
    """broadcast=False (the big-benchmark fallback, round-4 advice)
    must return exactly the broadcast path's answer."""
    from curw_flo2d_data_manager_spark.operators.dedup import (
        ngram_contamination,
    )

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "bid int, text string",
    )
    train = spark.createDataFrame(
        [
            (10, "prefix the quick brown fox jumps over the lazy dog today suffix"),
            (11, "nothing in common with any benchmark"),
        ],
        "doc_id int, text string",
    )
    want = sorted(
        map(tuple, ngram_contamination(train, bench, "doc_id", n=5).collect())
    )
    got = sorted(
        map(
            tuple,
            ngram_contamination(
                train, bench, "doc_id", n=5, broadcast=False
            ).collect(),
        )
    )
    assert got == want and want
    # auto mode (broadcast=None) with a 1-gram ceiling must take the
    # same fallback and still agree (round-5 verdict item 5)
    auto = sorted(
        map(
            tuple,
            ngram_contamination(
                train, bench, "doc_id", n=5, max_broadcast_grams=1
            ).collect(),
        )
    )
    assert auto == want


def test_pack_sequences_without_exchange_reuse(spark):
    """With spark.sql.exchange.reuse disabled, pack_sequences must
    still match the sequential reference exactly — since round 13 the
    partition labeling is a pure data-derived expression, so plan
    reuse (or its absence) cannot change row→label assignment."""
    from curw_flo2d_data_manager_spark.operators.packing import pack_sequences

    rows = [(i, 10 + (i * 7) % 90) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, n_tok int").repartition(7)
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        packed = pack_sequences(df, "doc_id", "n_tok", budget=300)
        got = {r.doc_id: (r.bin_id, r.bin_offset) for r in packed.collect()}
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")
    start, ref = 0, {}
    for i, t in rows:
        ref[i] = (start // 300, start)
        start += t
    assert got == ref


def test_dedup_release_caches(spark):
    """Operators that persist intermediates register them for
    caller-owned release: after materializing results,
    release_caches() frees every tracked relation (round-4 advice)."""
    from curw_flo2d_data_manager_spark.operators import dedup

    dedup.release_caches()  # drop anything earlier tests cached
    docs = spark.createDataFrame(
        [(i, f"some shared passage text plus unique token {i} " * 3)
         for i in range(20)],
        "doc_id int, text string",
    )
    dedup.minhash_lsh_pairs(docs, "doc_id").collect()
    dedup.winnow_pairs(docs, "doc_id").collect()
    assert dedup.release_caches() == 2
    assert dedup.release_caches() == 0


def test_cache_scope_releases_only_inner_caches(spark):
    """cache_scope() / release_caches_since() free ONLY the caches
    persisted inside the scope — a co-resident caller-owned cache in
    the shared session ledger survives (round-6 advice: streaming
    micro-batches must not drain the global ledger)."""
    from curw_flo2d_data_manager_spark.operators import dedup
    from curw_flo2d_data_manager_spark.operators.caching import (
        cache_mark,
        cache_scope,
        release_caches,
        release_caches_since,
    )

    release_caches()
    docs = spark.createDataFrame(
        [(i, f"shared passage text with unique token {i} " * 3)
         for i in range(10)],
        "doc_id int, text string",
    )
    dedup.minhash_lsh_pairs(docs, "doc_id").collect()  # outer cache
    with cache_scope():
        dedup.winnow_pairs(docs, "doc_id").collect()   # inner cache
    # inner released by the scope; the outer cache must still be there
    assert release_caches() == 1

    dedup.minhash_lsh_pairs(docs, "doc_id").collect()
    mark = cache_mark()
    dedup.winnow_pairs(docs, "doc_id").collect()
    assert release_caches_since(mark) == 1
    assert release_caches() == 1


# ---------------------------------------------------------------------
# connected components (operators/components.py)
# ---------------------------------------------------------------------
def test_connected_components_chains_merges_and_singletons(spark):
    from curw_flo2d_data_manager_spark.operators.components import (
        connected_components,
    )

    # chain 1-2-3-4-5 merged with pair 10-11 via 5-10; isolated pair;
    # a 40-node path (multi-round contraction, not single-hop)
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (5, 10), (20, 21)]
    pairs += [(i, i + 1) for i in range(100, 140)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    comp = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert {comp[i] for i in [1, 2, 3, 4, 5, 10, 11]} == {1}
    assert comp[20] == 20 and comp[21] == 20
    assert {comp[i] for i in range(100, 141)} == {100}
    # every node labeled, label is a member of the node set
    assert set(comp.values()) <= set(comp.keys())


def test_connected_components_duplicate_and_reversed_pairs(spark):
    from curw_flo2d_data_manager_spark.operators.components import (
        connected_components,
    )

    df = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 1), (3, 3), (2, 3)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["component"] for r in connected_components(df).collect()}
    # self-loop (3,3) contributes the node only via its real link (2,3)
    assert comp == {1: 1, 2: 1, 3: 1}


def test_connected_components_string_ids(spark):
    """String/UUID doc ids (round-5 advice: the blind cast('long')
    crashed under ANSI and silently no-op'd without it): ids are
    xxhash64-mapped for the rounds and mapped BACK, with component =
    the min ORIGINAL id so canonical-survivor semantics match the
    integral path."""
    from curw_flo2d_data_manager_spark.operators.components import (
        cluster_assign,
        connected_components,
    )

    pairs = spark.createDataFrame(
        [("doc-b", "doc-a"), ("doc-b", "doc-c"), ("zz", "yy")],
        "id_a string, id_b string",
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {
        "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
        "yy": "yy", "zz": "yy",
    }
    corpus = spark.createDataFrame(
        [("doc-a",), ("doc-b",), ("doc-c",), ("solo",)], "doc_id string"
    )
    dec = {r["doc_id"]: r for r in
           cluster_assign(corpus, pairs, "doc_id").collect()}
    assert dec["doc-a"]["keep"] and not dec["doc-b"]["keep"]
    assert dec["solo"]["keep"] and dec["solo"]["cluster_size"] == 1
    assert dec["doc-c"]["component"] == "doc-a"


# ---------------------------------------------------------------------
# passage dedup (operators/dedup.py)
# ---------------------------------------------------------------------
def test_passage_dedup_first_occurrence_wins(spark):
    from curw_flo2d_data_manager_spark.operators.dedup import passage_dedup

    eight = "a b c d e f g h"
    other = "p q r s t u v w"
    docs = spark.createDataFrame(
        [
            (1, f"{eight} {other} tail words"),  # 3 passages (last short)
            (2, f"{eight} unique continuation here"),  # shares passage 1
            (3, ""),  # empty -> no rows
        ],
        "doc_id long, text string",
    )
    rows = passage_dedup(docs, "doc_id", "text", passage_words=8).collect()
    by = {(r["doc_id"], r["pos"]): r for r in rows}
    assert (3, 1) not in by and len({d for d, _ in by}) == 2
    assert by[(1, 1)]["keep"] is True
    assert by[(2, 1)]["keep"] is False  # same 8-word passage, later doc
    assert by[(1, 3)]["n_words"] == 2  # short tail chunk
    assert by[(1, 1)]["passage_hash"] == by[(2, 1)]["passage_hash"]


# ---------------------------------------------------------------------
# tf-idf + mixture (operators/textstats.py)
# ---------------------------------------------------------------------
def test_tfidf_top_terms_ranks_rare_terms_up(spark):
    from curw_flo2d_data_manager_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common common rareword"),
            (2, "common other stuff"),
            (3, "common other thing"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, "doc_id", "text", k=2).collect()
    top1 = {r["doc_id"]: r["term"] for r in out if r["rank"] == 1}
    # 'common' is in every doc -> lowest idf; doc 1's top term must be
    # the unique 'rareword' even though 'common' has tf=2
    assert top1[1] == "rareword"
    tfidf = {(r["doc_id"], r["term"]): r["tfidf"] for r in out}
    assert tfidf[(1, "rareword")] > tfidf.get((1, "common"), 0.0)


def test_domain_mixture_weights_sum_to_one_and_upweight_small(spark):
    from curw_flo2d_data_manager_spark.operators.textstats import domain_mixture

    docs = spark.createDataFrame(
        [("en", "web", "w " * 90), ("en", "web", "w " * 90), ("si", "news", "w " * 20)],
        "lang string, source string, text string",
    )
    rows = domain_mixture(docs, ["lang", "source"], "text", alpha=0.7).collect()
    by = {(r["lang"], r["source"]): r for r in rows}
    assert abs(sum(r["sample_weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    # temperature scaling: small domain's weight > its raw share
    small = by[("si", "news")]
    assert small["sample_weight"] > small["token_share"]


def test_passage_dedup_window_variant_matches_skew_safe(spark):
    from curw_flo2d_data_manager_spark.operators.dedup import passage_dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h tail one"), (2, "a b c d e f g h tail two"), (3, "x " * 20)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, passage_dedup(docs, "doc_id", skew_safe=True).collect()))
    b = sorted(map(tuple, passage_dedup(docs, "doc_id", skew_safe=False).collect()))
    assert a == b


def test_passage_dedup_rebuild_cuts_duplicates_and_reassembles(spark):
    from curw_flo2d_data_manager_spark.operators.dedup import passage_dedup_rebuild

    eight = "a b c d e f g h"
    docs = spark.createDataFrame(
        [
            (1, f"{eight} unique middle part here now yes ok fine tail"),
            (2, f"{eight} totally different continuation of words"),  # loses p1
            (3, eight),  # single passage, fully duplicated -> empty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in passage_dedup_rebuild(docs, "doc_id").collect()}
    assert out[1]["text"].startswith(eight) and out[1]["n_kept"] == out[1]["n_passages"]
    assert not out[2]["text"].startswith(eight)  # first passage removed
    assert out[2]["text"] == "totally different continuation of words"
    assert out[3]["text"] == "" and out[3]["n_kept"] == 0 and out[3]["n_passages"] == 1


def test_mixture_resample_budget_and_determinism(spark):
    from curw_flo2d_data_manager_spark.operators.sampling import mixture_resample

    rows = [(i, "en" if i % 4 else "si", "w " * 50) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    kept = mixture_resample(
        docs, ["lang"], ["doc_id"], "text", target_tokens=3000, alpha=0.7
    )
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in kept.collect())
    assert a == b and 0 < len(a) < 200  # deterministic, actually downsampled
    by_lang = {r["lang"]: 0 for r in docs.select("lang").distinct().collect()}
    for r in kept.collect():
        by_lang[r["lang"]] += 1
    # alpha<1 upweights the small 'si' domain: its keep RATE must
    # exceed the big domain's
    assert by_lang["si"] / 50 > by_lang["en"] / 150


def test_mixture_resample_zero_token_domain_kept(spark):
    """A domain whose every text normalizes to empty has n_tokens=0;
    the keep-fraction division would be NULL and silently drop the
    whole domain (round-5 advice) — such rows cost nothing against
    the token budget and must be kept explicitly."""
    from curw_flo2d_data_manager_spark.operators.sampling import mixture_resample

    rows = [(i, "en", "word " * 20) for i in range(50)] + [
        (100 + i, "blank", "   ") for i in range(5)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    kept = mixture_resample(
        docs, ["lang"], ["doc_id"], "text", target_tokens=200, alpha=0.7
    )
    by_lang: dict[str, int] = {}
    for r in kept.collect():
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    assert by_lang.get("blank", 0) == 5  # degenerate domain fully kept
    assert 0 < by_lang["en"] < 50  # real domain still downsampled


def test_cross_corpus_decontam_finds_leaks_and_respects_threshold(spark):
    from curw_flo2d_data_manager_spark.operators.similarity import (
        cross_corpus_decontam_pairs,
    )

    train = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0]),
         (3, [0.6, 0.8, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    evals = spark.createDataFrame(
        [(100, [2.0, 0.0, 0.0, 0.0]),    # scaled copy of 1 -> leak
         (101, [0.0, 0.0, 0.0, 1.0]),    # orthogonal to everything
         (102, [-1.0, 0.0, 0.0, 0.0])],  # negated 1: cosine -1, excluded
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["train_id"], r["eval_id"]): r["cosine"]
        for r in cross_corpus_decontam_pairs(
            train, evals, cosine_threshold=0.95
        ).collect()
    }
    assert set(got) == {(1, 100)}
    assert abs(got[(1, 100)] - 1.0) < 1e-9


# ---------------------------------------------------------------------
# bigram LM scoring + split assignment (round-6 additions)
# ---------------------------------------------------------------------
def test_bigram_logprob_exact_small_corpus(spark):
    """Hand-computed add-one bigram model: corpus 'a b a b' / 'a b c'
    gives cb(a,b)=3, cb(b,a)=1, cb(b,c)=1, cw(a)=3, cw(b)=2, V=2
    (contexts {a, b}); single-token docs have no bigrams and are
    absent."""
    import math

    from curw_flo2d_data_manager_spark.operators.caching import release_caches
    from curw_flo2d_data_manager_spark.operators.textstats import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id long, text string",
    )
    try:
        got = {r["doc_id"]: r for r in
               bigram_logprob(docs, "doc_id", "text").collect()}
    finally:
        release_caches()
    assert set(got) == {1, 2}
    lp_ab = math.log((3 + 1) / (3 + 2))   # p(b|a)
    lp_ba = math.log((1 + 1) / (2 + 2))   # p(a|b)
    lp_bc = math.log((1 + 1) / (2 + 2))   # p(c|b)
    assert got[1]["n_bigrams"] == 3
    assert got[1]["avg_logprob"] == round((2 * lp_ab + lp_ba) / 3, 4)
    assert got[2]["n_bigrams"] == 2
    assert got[2]["avg_logprob"] == round((lp_ab + lp_bc) / 2, 4)


def test_split_assign_partition_and_determinism(spark):
    from curw_flo2d_data_manager_spark.operators.sampling import split_assign

    docs = spark.createDataFrame(
        [(i, f"payload {i}") for i in range(1000)], "doc_id long, text string"
    )
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in
         split_assign(docs, ["doc_id"], fr).collect()}
    b = {r["doc_id"]: r["split"] for r in
         split_assign(docs, ["doc_id"], fr).collect()}
    assert a == b and len(a) == 1000
    counts = {}
    for s in a.values():
        assert s in fr  # fractions sum to 1 -> nobody unassigned
        counts[s] = counts.get(s, 0) + 1
    assert 700 < counts["train"] < 900  # ~80% within loose hash bounds
    assert 50 < counts["val"] < 170 and 50 < counts["test"] < 170

    # leak-free: rows sharing a key always share a split
    dup = spark.createDataFrame(
        [(7, "one copy"), (7, "another copy")], "doc_id long, text string"
    )
    splits = {r["split"] for r in split_assign(dup, ["doc_id"], fr).collect()}
    assert len(splits) == 1

    # sum < 1 -> explicit NULL holdout; sum > 1 -> raises
    part = {r["doc_id"]: r["split"] for r in
            split_assign(docs, ["doc_id"], {"train": 0.5}).collect()}
    assert sum(1 for v in part.values() if v is None) > 300
    import pytest as _pytest
    with _pytest.raises(ValueError):
        split_assign(docs, ["doc_id"], {"a": 0.8, "b": 0.4})


def test_split_assign_salt_reshuffles(spark):
    from curw_flo2d_data_manager_spark.operators.sampling import split_assign

    docs = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    fr = {"train": 0.5, "test": 0.5}
    a = {r["doc_id"]: r["split"] for r in
         split_assign(docs, ["doc_id"], fr).collect()}
    c = {r["doc_id"]: r["split"] for r in
         split_assign(docs, ["doc_id"], fr, salt="v2").collect()}
    moved = sum(1 for k in a if a[k] != c[k])
    assert 100 < moved < 400  # independent resample, not a no-op


def test_semantic_dedup_custom_centroids_greedy_keep(spark):
    """SemDeDup blocking + greedy smallest-id-wins with arbitrary
    (non-one-hot) centroids: scaled copies collapse onto their
    original; near-but-below-threshold neighbors survive."""
    from curw_flo2d_data_manager_spark.operators.similarity import (
        centroid_assign,
        semantic_dedup,
    )

    rows = [
        (1, [1.0, 0.1]),   # cluster 0
        (2, [2.0, 0.2]),   # scaled copy of 1 -> dropped
        (3, [0.1, 1.0]),   # cluster 1, lone -> kept
        (4, [1.0, 0.9]),   # cluster 0 but cosine(1,4) ~ 0.81 -> kept
        (5, [4.0, 0.4]),   # another copy of 1 -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = [[1.0, 0.0], [0.0, 1.0]]
    clusters = {r["vec_id"]: r["cluster"] for r in
                centroid_assign(df, centroids).collect()}
    assert clusters == {1: 0, 2: 0, 3: 1, 4: 0, 5: 0}
    got = {r["vec_id"]: (r["cluster"], r["keep"]) for r in
           semantic_dedup(df, centroids, threshold=0.95).collect()}
    assert got == {1: (0, True), 2: (0, False), 3: (1, True),
                   4: (0, True), 5: (0, False)}

    # the precomputed-assignment scale path must agree exactly
    from curw_flo2d_data_manager_spark.operators.similarity import (
        semantic_dedup_assigned,
    )

    assigned = centroid_assign(df, centroids)
    got2 = {r["vec_id"]: (r["cluster"], r["keep"]) for r in
            semantic_dedup_assigned(assigned, threshold=0.95).collect()}
    assert got2 == got


def test_centroid_assign_zero_vector_sentinel(spark):
    """An all-zero embedding has no defined cosine to any centroid —
    it must land in sentinel cluster -1 and always be KEPT by
    semantic dedup rather than silently escaping with an undefined
    cluster (round-6 advice)."""
    from curw_flo2d_data_manager_spark.operators.similarity import (
        centroid_assign,
        semantic_dedup,
    )

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 0.0]),   # zero vector
        (3, [0.0, 0.0]),   # second zero vector — must not pair with 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = [[1.0, 0.0], [0.0, 1.0]]
    clusters = {r["vec_id"]: r["cluster"] for r in
                centroid_assign(df, centroids).collect()}
    assert clusters == {1: 0, 2: -1, 3: -1}
    got = {r["vec_id"]: (r["cluster"], r["keep"]) for r in
           semantic_dedup(df, centroids, threshold=0.95).collect()}
    assert got == {1: (0, True), 2: (-1, True), 3: (-1, True)}


def test_semantic_dedup_cross_cluster_pairs_not_compared(spark):
    """Identical vectors in DIFFERENT clusters are never compared —
    the blocking contract (SemDeDup trades that recall for the
    n_clusters speedup)."""
    from curw_flo2d_data_manager_spark.operators.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.95]), (2, [0.95, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["keep"] for r in
           semantic_dedup(df, [[1.0, 0.0], [0.0, 1.0]], 0.9).collect()}
    assert got == {1: True, 2: True}  # cosine ~0.999 but blocked apart


# ---------------------------------------------------------------------
# z-order layout (operators/zorder.py)
# ---------------------------------------------------------------------
def test_zorder_layout_clusters_every_column(spark, tmp_path):
    """Each z-ordered file must cover a compact rectangle of (x, y):
    versus an x-sorted layout, the per-file y-span collapses while the
    x-span stays far below the full range — the property that lets
    parquet row-group stats prune range scans on EITHER column."""
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.zorder import write_zordered

    n, rng = 20000, 10007
    rows = [(i, (i * 2654435761) % rng, (i * 40503) % rng) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    p_z = str(tmp_path / "zorder.parquet")
    frame = write_zordered(df, p_z, ["x", "y"], n_files=16)
    assert frame["x"][0] == 0.0 and frame["x"][1] >= rng - 100

    p_x = str(tmp_path / "xsort.parquet")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(p_x)

    def spans(path):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                (F.max("x") - F.min("x")).alias("dx"),
                (F.max("y") - F.min("y")).alias("dy"),
            )
            .collect()
        )
        k = len(per_file)
        return sum(r["dx"] for r in per_file) / k, sum(r["dy"] for r in per_file) / k

    zx, zy = spans(p_z)
    xx, xy = spans(p_x)
    # rows survive the round-trip
    assert spark.read.parquet(p_z).count() == n
    # x-sorted: near-perfect on x, no clustering on y
    assert xy > 0.9 * rng
    # z-ordered: BOTH dims clustered (16 files ~ 4x4 quadrants =>
    # spans ~ rng/4; allow boundary-straddling slack)
    assert zy < 0.45 * xy, (zy, xy)
    assert zx < 0.5 * rng, (zx, rng)


def test_zorder_index_nulls_and_degenerate_span(spark):
    from curw_flo2d_data_manager_spark.operators.zorder import zorder_index

    df = spark.createDataFrame(
        [(None, 5.0), (3.0, None), (0.0, 0.0)], "a double, b double"
    )
    out = df.select(
        zorder_index(["a", "b"], [0.0, 0.0], [10.0, 10.0], bits=4).alias("z")
    ).collect()
    assert all(r["z"] is not None and r["z"] >= 0 for r in out)
    # zero span -> constant 0 contribution, no division blow-up
    one = df.select(
        zorder_index(["a", "b"], [0.0, 0.0], [0.0, 10.0], bits=4).alias("z")
    ).collect()
    assert all(r["z"] is not None for r in one)


def test_connected_components_driver_path_matches_distributed(spark):
    """The adaptive driver-side union-find (small edge sets) must
    produce EXACTLY the distributed star contraction's labels — for
    both integral and string ids."""
    from curw_flo2d_data_manager_spark.operators.components import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(2, 1), (3, 2), (10, 11), (12, 12), (11, 13), (20, 21)],
        "id_a long, id_b long",
    )
    fast = sorted(map(tuple, connected_components(pairs).collect()))
    dist = sorted(
        map(tuple, connected_components(pairs, driver_threshold=0).collect())
    )
    assert fast == dist and fast

    spairs = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("y", "z")], "id_a string, id_b string"
    )
    sfast = sorted(map(tuple, connected_components(spairs).collect()))
    sdist = sorted(
        map(tuple, connected_components(spairs, driver_threshold=0).collect())
    )
    assert sfast == sdist == [("a", "a"), ("b", "a"), ("c", "a"),
                              ("y", "y"), ("z", "y")]


def test_ivf_assign_appends_compatibly_with_built_index(spark, tmp_path):
    """Incremental IVF maintenance: a new batch assigned via
    ivf_assign against the STORED centers must (a) agree with the
    KMeans model's own assignment for vectors the build saw, and
    (b) make appended vectors findable by ivf_query at rank 1."""
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.similarity import (
        build_ivf_index,
        ivf_assign,
        ivf_query,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    assignments, centers = build_ivf_index(emb, n_clusters=8, seed=42)
    built = {r["corpus_id"]: r["cluster"] for r in assignments.collect()}

    # (a) re-assigning the SAME vectors through the stored centers
    # reproduces the model's clusters
    re_assigned = {r["corpus_id"]: r["cluster"] for r in
                   ivf_assign(emb, centers).collect()}
    assert re_assigned == built

    # (b) append a scaled copy of vector 0 under a new id; the merged
    # index must return it for a query equal to vector 0
    idx = str(tmp_path / "ivf")
    assignments.write.partitionBy("cluster").parquet(idx)
    batch = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 900000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    ivf_assign(batch, centers).write.mode("append").partitionBy(
        "cluster"
    ).parquet(idx)
    merged = spark.read.parquet(idx)
    assert merged.count() == emb.count() + 1
    q0 = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = ivf_query(merged, centers, q0, k=2, nprobe=2).collect()
    assert {r["corpus_id"] for r in top} == {0, 900000}


def test_chunk_documents_boundaries_and_overlap(spark):
    from curw_flo2d_data_manager_spark.operators.textstats import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))),  # 10 words
         (2, "solo"),                                 # 1 word -> 1 chunk
         (3, "   ")],                                 # 0 words -> absent
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["chunk_idx"]): r for r in
           chunk_documents(docs, "doc_id", chunk_words=4, overlap=1).collect()}
    # stride 3: ceil((10-1)/3) = 3 chunks at starts 0,3,6 cover all 10
    assert {k for k in got if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert got[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert got[(1, 1)]["chunk_text"] == "w3 w4 w5 w6"  # 1-word overlap
    assert got[(1, 2)]["chunk_text"] == "w6 w7 w8 w9"
    assert got[(2, 0)]["chunk_text"] == "solo"
    assert not any(k[0] == 3 for k in got)
    # every word appears in at least one chunk
    covered = set()
    for (d, _), r in got.items():
        if d == 1:
            covered.update(r["chunk_text"].split())
    assert covered == {f"w{i}" for i in range(10)}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", chunk_words=4, overlap=4)


def test_frequent_terms_exact_under_adversarial_partitioning(spark):
    """Misra-Gries candidates + exact verify must equal brute-force
    groupBy heavy hitters regardless of how rows are partitioned, and
    the caches must release."""
    from curw_flo2d_data_manager_spark.operators.caching import release_caches
    from curw_flo2d_data_manager_spark.operators.textstats import frequent_terms

    # skewed synthetic corpus: "hot" in ~1/3 of docs, "warm" in 1/10,
    # long tail of unique terms
    rows = []
    for i in range(600):
        toks = [f"tail{i}a", f"tail{i}b"]
        if i % 3 == 0:
            toks += ["hot", "hot"]
        if i % 10 == 0:
            toks.append("warm")
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(13)
    try:
        got = {(r["term"], r["cnt"]) for r in
               frequent_terms(df, "text", min_share=0.02).collect()}
    finally:
        release_caches()
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.textstats import words

    toks = df.select(F.explode(words("text")).alias("t"))
    n = toks.count()
    import math

    thr = math.ceil(0.02 * n)
    want = {(r["t"], r["c"]) for r in
            toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= thr).collect()}
    assert got == want and ("hot", 400) in got
    assert not any(t.startswith("tail") for t, _ in got)


def test_frequent_terms_threshold_exact_on_integer_boundary(spark):
    """When min_share·n_tok lands EXACTLY on an integer, a term whose
    count equals the threshold must pass — the gate is exact rational
    math, not double-rounded ceil (round-6 advice: double product can
    round up and drop the boundary term)."""
    from curw_flo2d_data_manager_spark.operators.caching import release_caches
    from curw_flo2d_data_manager_spark.operators.textstats import frequent_terms

    # 500 tokens total, min_share=0.002 -> threshold exactly 1 token;
    # and a 8-token corpus at 0.25 -> threshold exactly 2.
    rows = [(0, " ".join(f"u{i}" for i in range(500)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    try:
        got = {r["term"] for r in
               frequent_terms(df, "text", min_share=0.002).collect()}
        # every unique term has cnt=1 = exact threshold -> all pass
        assert len(got) == 500

        df2 = spark.createDataFrame(
            [(0, "a a b c d e f g")], "doc_id long, text string"
        )
        got2 = {(r["term"], r["cnt"]) for r in
                frequent_terms(df2, "text", min_share=0.25).collect()}
        assert got2 == {("a", 2)}  # cnt 2 == ceil(0.25*8) passes; 1s don't
    finally:
        release_caches()


def test_frequent_terms_hash_candidacy_filters_false_candidates(spark):
    """The hash-bucket candidacy only prunes: the output is the exact
    per-term threshold set (a near-miss term like "warm" below must
    not appear even though its bucket WOULD qualify if it collided
    with "hot"'s mass — the exact per-term pass removes any
    collision-made candidate), and the executed plan contains no
    Python evaluation nodes (the point of replacing the Misra-Gries
    mapInPandas candidacy)."""
    from curw_flo2d_data_manager_spark.operators.caching import release_caches
    from curw_flo2d_data_manager_spark.operators.textstats import frequent_terms

    # 100 tokens, min_share=0.25 -> exact threshold 25:
    # "hot" (30) passes, "warm" (20) and the tail must not.
    rows = [(0, " ".join(["hot"] * 30 + ["warm"] * 20 +
                         [f"t{i}" for i in range(50)]))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    try:
        got = {(r["term"], r["cnt"]) for r in
               frequent_terms(df, "text", min_share=0.25).collect()}
        assert got == {("hot", 30)}
        plan = frequent_terms(df, "text", min_share=0.25)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "EvalPython" not in plan and "MapInPandas" not in plan
    finally:
        release_caches()


def test_epoch_plan_two_sided(spark):
    """Oversized domains downsample (keep_fraction<1, epochs=1);
    undersized domains repeat (keep_fraction=1, epochs>1); zero-token
    domains are inert."""
    rows = (
        [(i, "big", "word " * 100) for i in range(90)]
        + [(100 + i, "small", "term " * 100) for i in range(10)]
        + [(200, "blank", "  ")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    from curw_flo2d_data_manager_spark.operators.textstats import epoch_plan

    plan = {r["lang"]: r for r in
            epoch_plan(docs, ["lang"], "text", target_tokens=10_000,
                       alpha=0.5).collect()}
    big, small, blank = plan["big"], plan["small"], plan["blank"]
    # alpha=0.5 pulls shares toward each other: big gets < its 90%
    assert big["keep_fraction"] < 1.0 and big["epochs"] == 1.0
    assert small["keep_fraction"] == 1.0 and small["epochs"] > 1.0
    assert blank["keep_fraction"] == 1.0 and blank["epochs"] == 1.0
    # plan is self-consistent: target ~= n_tokens * keep * epochs
    for d in (big, small):
        recon = d["n_tokens"] * d["keep_fraction"] * d["epochs"]
        assert abs(recon - d["target_domain_tokens"]) <= max(
            2.0, 0.001 * d["target_domain_tokens"]
        )


def test_materialize_mixture_epochs_and_downsample(spark):
    """Undersized domains come back whole with ⌊epochs⌋ or ⌈epochs⌉
    copies each (epoch column 1..n); oversized domains come back at
    most once per row; total token mass lands near the plan's target;
    the multiset is deterministic across runs."""
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.sampling import (
        materialize_mixture,
    )
    from curw_flo2d_data_manager_spark.operators.textstats import epoch_plan

    rows = (
        [(i, "big", "word " * 100) for i in range(90)]
        + [(100 + i, "small", "term " * 100) for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = materialize_mixture(
        docs, ["lang"], ["doc_id"], "text", target_tokens=10_000, alpha=0.5
    )
    a = sorted((r["doc_id"], r["epoch"]) for r in out.collect())
    b = sorted((r["doc_id"], r["epoch"]) for r in out.collect())
    assert a == b  # deterministic multiset

    plan = {r["lang"]: r for r in
            epoch_plan(docs, ["lang"], "text", target_tokens=10_000,
                       alpha=0.5).collect()}
    per_doc: dict[int, int] = {}
    for d, _ in a:
        per_doc[d] = per_doc.get(d, 0) + 1
    import math

    ep = plan["small"]["epochs"]
    small_counts = {per_doc.get(100 + i, 0) for i in range(10)}
    assert small_counts <= {math.floor(ep), math.ceil(ep)} and ep > 1
    big_counts = [per_doc.get(i, 0) for i in range(90)]
    assert all(c <= 1 for c in big_counts) and 0 < sum(big_counts) < 90
    # realized token mass tracks the per-domain targets within ~15%
    for lang, n_docs in (("big", 90), ("small", 10)):
        realized = sum(c for d, c in per_doc.items()
                       if (d >= 100) == (lang == "small")) * 100
        target = plan[lang]["target_domain_tokens"]
        assert abs(realized - target) <= 0.15 * target + 200, (lang, realized, target)


def test_knn_graph_exact_and_blocked(spark):
    """knn_graph: exact mode ranks every other vector by cosine;
    blocked mode only connects same-block vectors; zero vectors emit
    and receive no edges."""
    from curw_flo2d_data_manager_spark.operators.similarity import knn_graph

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 0),
        (4, [0.0, 0.0], 0),   # zero vector
        (5, [1.0, 0.0], 1),   # other block, same direction as 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    exact = {(r["src"], r["rank"]): r["dst"] for r in knn_graph(df, k=2).collect()}
    # 1's nearest is 2 (cos~0.994) then 5 (identical dir but larger id
    # than 2? no: cos(1,5)=1.0 > cos(1,2)) -> rank1=5, rank2=2
    assert exact[(1, 1)] == 5 and exact[(1, 2)] == 2
    assert not any(s == 4 for s, _ in exact)           # zero vec: no out-edges
    assert not any(d == 4 for d in exact.values())     # ... and no in-edges

    blocked = {(r["src"], r["rank"]): r["dst"]
               for r in knn_graph(df, k=2, block_col="label").collect()}
    assert blocked[(1, 1)] == 2          # 5 is in another block now
    assert not any(s == 5 for s, _ in blocked)  # 5's block is a singleton


def test_bloom_blocklist_filter_exact_even_with_tiny_filter(spark):
    """bloom_blocklist_filter must equal the plain anti-join EXACTLY
    even with an adversarially tiny filter (m_bits=64 over 40 keys →
    heavy false-positive traffic through the verify phase), and the
    probe must never produce a false negative."""
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.dedup import (
        bloom_blocklist_filter,
        bloom_build,
        bloom_might_contain,
    )

    corpus = spark.range(100).select(
        F.col("id"), F.concat(F.lit("key-"), F.col("id")).alias("fp")
    )
    blocklist = spark.range(0, 80, 2).select(
        F.concat(F.lit("key-"), F.col("id")).alias("fp")
    )
    got = {r["id"] for r in
           bloom_blocklist_filter(corpus, blocklist, "fp", m_bits=64, k=2).collect()}
    want = set(range(1, 80, 2)) | set(range(80, 100))
    assert got == want

    # no false negatives: every blocklisted key probes true
    words = bloom_build(blocklist, "fp", m_bits=64, k=2)
    probe = bloom_might_contain(words, F.col("fp"), 64, k=2)
    hits = corpus.withColumn("_h", probe)
    assert hits.filter((F.col("id") % 2 == 0) & (F.col("id") < 80)
                       & ~F.col("_h")).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bloom_build(blocklist, "fp", m_bits=100)  # not a multiple of 64
    with _pytest.raises(ValueError):
        bloom_build(blocklist, "fp", k=0)


def test_length_bucketed_batches_shape_and_determinism(spark):
    """Batches respect bucket edges, never exceed batch_size, never
    cross (bucket, shard), and re-runs produce identical assignments;
    n_shards=1 reproduces the single-stream md5 order."""
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.packing import (
        length_bucketed_batches,
    )

    df = spark.range(200).select(
        F.col("id"), (F.col("id") % 97 + 1).alias("len")
    )
    out = length_bucketed_batches(
        df, "id", "len", batch_size=5, boundaries=[10, 50], n_shards=3
    )
    rows = out.collect()
    assert len(rows) == 200
    for r in rows:
        if r["length"] < 10:
            assert r["bucket"] == 0
        elif r["length"] < 50:
            assert r["bucket"] == 1
        else:
            assert r["bucket"] == 2
        assert 0 <= r["shard"] < 3 and 0 <= r["batch_pos"] < 5
    # batch occupancy: positions within each batch are 0..n-1, n<=5
    from collections import defaultdict

    batches = defaultdict(list)
    for r in rows:
        batches[(r["bucket"], r["shard"], r["batch_idx"])].append(r["batch_pos"])
    for pos in batches.values():
        assert sorted(pos) == list(range(len(pos))) and len(pos) <= 5
    # determinism
    again = {(r["id"], r["bucket"], r["shard"], r["batch_idx"], r["batch_pos"])
             for r in length_bucketed_batches(
                 df, "id", "len", batch_size=5, boundaries=[10, 50], n_shards=3
             ).collect()}
    assert again == {(r["id"], r["bucket"], r["shard"], r["batch_idx"],
                      r["batch_pos"]) for r in rows}
    # n_shards=1: order within a bucket is exactly the sorted md5 order
    single = length_bucketed_batches(
        df, "id", "len", batch_size=1000, boundaries=[], n_shards=1
    ).collect()
    import hashlib

    want_order = sorted(
        (hashlib.md5(str(r["id"]).encode()).hexdigest(), r["id"])
        for r in single
    )
    got_order = sorted(
        ((r["batch_idx"], r["batch_pos"]), r["id"]) for r in single
    )
    assert [i for _, i in want_order] == [i for _, i in got_order]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        length_bucketed_batches(df, "id", "len", batch_size=0)
    with _pytest.raises(ValueError):
        length_bucketed_batches(df, "id", "len", batch_size=5, n_shards=0)


def test_dsir_log_ratio_scores_target_like_docs_higher(spark):
    """DSIR importance weight must rank a doc written in the target
    domain's vocabulary above one written in the off-domain
    vocabulary, with target-flagged docs defining the target LM."""
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.caching import release_caches
    from curw_flo2d_data_manager_spark.operators.textstats import dsir_log_ratio

    rows = (
        [(i, "alpha beta gamma delta", True) for i in range(10)]        # target
        + [(100 + i, "omega sigma tau rho", False) for i in range(10)]  # off
        + [(900, "alpha beta alpha gamma", False),                      # target-like
           (901, "omega tau omega sigma", False)]                       # off-like
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    try:
        got = {r["doc_id"]: r for r in
               dsir_log_ratio(df, "doc_id", "is_tgt").collect()}
    finally:
        release_caches()
    assert got[900]["n_tokens"] == 4 and got[901]["n_tokens"] == 4
    assert got[900]["avg_logratio"] > 0 > got[901]["avg_logratio"]
    # every pure-target doc scores above every pure-off-domain doc
    assert min(got[i]["avg_logratio"] for i in range(10)) > max(
        got[100 + i]["avg_logratio"] for i in range(10)
    )


def test_pq_assign_and_adc_recover_planted_codes(spark):
    """A vector assembled FROM sub-centroids must get exactly those
    sub-codes, and ADC must rank it at distance ~0 for a query equal
    to it — the quantize/search contract of product quantization."""
    from curw_flo2d_data_manager_spark.operators.similarity import (
        pq_adc_topk,
        pq_assign,
    )

    # 2 subspaces x 3 centroids x 2 dims
    cbs = [
        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
        [[5.0, 5.0], [6.0, 5.0], [5.0, 6.0]],
    ]
    rows = [
        (1, [1.0, 0.0, 5.0, 6.0]),    # codes (1, 2) -> packed 1 + 2*3 = 7
        (2, [0.0, 0.0, 5.0, 5.0]),    # codes (0, 0) -> 0
        (3, [0.9, 0.1, 5.9, 5.1]),    # nearest (1, 1) -> 1 + 1*3 = 4
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes = {r["vec_id"]: r["pq_code"] for r in pq_assign(df, cbs).collect()}
    assert codes == {1: 7, 2: 0, 3: 4}

    q = spark.createDataFrame(
        [(100, [1.0, 0.0, 5.0, 6.0])], "query_id long, embedding array<float>"
    )
    got = {r["rank"]: r for r in pq_adc_topk(df, q, cbs, k=3).collect()}
    assert got[1]["corpus_id"] == 1 and abs(got[1]["adc"]) < 1e-12
    # vectors 2 and 3 both land at ADC 2.0 (codes (0,0): 1+1; codes
    # (1,1): 0+2) — the tie must break to the smaller corpus id
    assert got[2]["corpus_id"] == 2 and abs(got[2]["adc"] - 2.0) < 1e-9
    assert got[3]["corpus_id"] == 3 and abs(got[3]["adc"] - 2.0) < 1e-9


def test_logprob_buckets_terciles_and_tie_cohesion(spark):
    """logprob_buckets: thresholds split the corpus ~evenly, equal
    scores always share a bucket (no ntile tie-splitting), and all
    input columns pass through."""
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.textstats import logprob_buckets

    rows = [(i, float(-(i % 30)) / 10.0) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, avg_logprob double")
    got = logprob_buckets(df).collect()
    assert len(got) == 300 and {r["bucket"] for r in got} == {
        "head", "middle", "tail",
    }
    by_score = {}
    for r in got:
        by_score.setdefault(r["avg_logprob"], set()).add(r["bucket"])
    assert all(len(b) == 1 for b in by_score.values())  # ties cohere
    # ordering: higher logprob never lands in a lower bucket
    rank = {"tail": 0, "middle": 1, "head": 2}
    pairs = sorted((r["avg_logprob"], rank[r["bucket"]]) for r in got)
    assert all(pairs[i][1] <= pairs[i + 1][1] for i in range(len(pairs) - 1))


def test_hash_classifier_score_separates_by_weights(spark):
    """hash_classifier_score: a doc made of positively-weighted terms
    scores above 0.5+bias territory while negatively-weighted terms
    score low; scores are deterministic re-run to re-run."""
    import hashlib

    from curw_flo2d_data_manager_spark.operators.textstats import (
        hash_classifier_score,
    )

    dim = 16

    def bucket(term):
        return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % dim

    # craft weights so 'goodword' is strongly positive, 'badword' negative
    weights = [0.0] * dim
    weights[bucket("goodword")] = 3.0
    weights[bucket("badword")] = -3.0
    df = spark.createDataFrame(
        [(1, "goodword goodword goodword"), (2, "badword badword")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           hash_classifier_score(df, "doc_id", weights).collect()}
    assert got[1]["score"] > 0.9 and got[2]["score"] < 0.1
    assert got[1]["n_tokens"] == 3 and got[2]["n_tokens"] == 2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_classifier_score(df, "doc_id", [])


def test_ivfpq_query_selective_cut_finds_planted_partner(spark):
    """ivfpq_query with a SELECTIVE ADC cut (small candidate_mult) and
    data-trained discriminative codebooks: planted near-duplicate
    partners survive the probe AND the ADC cut and land at rank 2
    behind the query itself — the full IVF-PQ stack working as a
    retrieval system, not just as a composition."""
    import numpy as np
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.similarity import (
        build_ivf_index,
        ivfpq_query,
    )

    rng = np.random.default_rng(11)
    n, dim = 800, 16
    base = rng.normal(size=(n, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i in range(n):
        v = base[i].copy()
        if i % 100 == 1:  # partner of i-1
            v = base[i - 1] + rng.normal(scale=0.02, size=dim)
            v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # train 4x8 codebooks on the data itself (tiny Lloyd's on driver)
    sample = np.array([r[1] for r in rows])
    books = []
    for s in range(4):
        x = sample[:, s * 4: (s + 1) * 4]
        cent = x[rng.choice(n, 8, replace=False)].copy()
        for _ in range(8):
            d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for c in range(8):
                if (a == c).any():
                    cent[c] = x[a == c].mean(axis=0)
        books.append([[round(float(v), 6) for v in row] for row in cent])

    assigned, centers = build_ivf_index(df, n_clusters=4)
    queries = df.filter(F.col("vec_id") % 100 == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfpq_query(
        assigned, centers, queries, books, k=2, nprobe=2, candidate_mult=8
    ).collect()
    got = {(r["query_id"], r["rank"]): r["corpus_id"] for r in out}
    for q in range(1, n, 100):
        assert got[(q, 1)] == q          # the query itself
        assert got[(q, 2)] == q - 1      # its planted partner


def test_knn_graph_mutual_filters_one_directional_hub_edges(spark):
    """mutual=True drops edges whose reverse is not also top-k: a hub
    that everyone points at keeps only the reciprocated links."""
    from curw_flo2d_data_manager_spark.operators.similarity import knn_graph

    # directions at 0°, 10°, 25°: the pair (0°, 10°) is mutual under
    # k=1, but 25° points at 10° WITHOUT reciprocation (10° prefers
    # 0°) — the classic one-directional chain edge mutual-kNN cuts
    import math

    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    rows = [(1, at(0.0)), (2, at(10.0)), (3, at(25.0))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plain = {(r["src"], r["dst"]) for r in knn_graph(df, k=1).collect()}
    assert plain == {(1, 2), (2, 1), (3, 2)}
    mut = {(r["src"], r["dst"]) for r in knn_graph(df, k=1, mutual=True).collect()}
    assert mut == {(1, 2), (2, 1)}  # 3's one-directional edge is gone


def test_repeated_spans_merges_maximal_runs(spark):
    """A shared multi-gram boilerplate block surfaces as ONE maximal
    span per document (not per-window fragments); unique text emits
    nothing; spans sit at the right token offsets on both sides."""
    from curw_flo2d_data_manager_spark.operators.caching import release_caches
    from curw_flo2d_data_manager_spark.operators.dedup import repeated_spans

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, f"intro one two three {boiler} outro alpha beta"),
        (2, f"different head words here and more {boiler}"),
        (3, "totally unrelated content with no shared grams at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    try:
        got = {r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
               for r in repeated_spans(df, "doc_id", k=4).collect()}
    finally:
        release_caches()
    # boiler = 12 tokens; doc 1 prefix 4 tokens, doc 2 prefix 6 tokens
    assert got[1] == (4, 15, 12)
    assert got[2] == (6, 17, 12)
    assert 3 not in got

    import pytest as _pytest

    with _pytest.raises(ValueError):
        repeated_spans(df, "doc_id", k=0)


def test_remove_repeated_spans_rebuild(spark):
    """Strict span removal: shared boilerplate is cut from EVERY doc,
    unique docs pass through untouched (normalized join), a fully-
    repeated doc comes back empty but present, empty docs survive."""
    from curw_flo2d_data_manager_spark.operators.caching import release_caches
    from curw_flo2d_data_manager_spark.operators.dedup import (
        remove_repeated_spans,
    )

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, f"intro one two three {boiler} outro alpha beta"),
        (2, f"head words are here {boiler}"),
        (3, "totally unrelated content with no shared grams at all"),
        (4, boiler),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    try:
        got = {r["doc_id"]: (r["text"], r["n_tokens_cut"]) for r in
               remove_repeated_spans(df, "doc_id", k=4).collect()}
    finally:
        release_caches()
    assert got[1] == ("intro one two three outro alpha beta", 12)
    assert got[2] == ("head words are here", 12)
    assert got[3] == ("totally unrelated content with no shared grams at all", 0)
    assert got[4] == ("", 12)
    assert got[5] == ("", 0)


def test_hampel_despike_flags_planted_spike(spark):
    """A 999.9 spike inside a smooth series is flagged and replaced by
    the rolling median; smooth neighbors are untouched; NULLs pass
    through unflagged; a constant neighborhood (MAD 0) flags any
    deviation."""
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.despike import hampel_despike

    rows = (
        [("a", t, float(10 + (t % 3))) for t in range(10)]  # smooth 10..12
        + [("a", 10, 999.9)]                                # spike
        + [("a", t, float(10 + (t % 3))) for t in range(11, 20)]
        + [("a", 20, None)]                                 # NULL survives
        + [("b", t, 5.0) for t in range(5)]                 # constant
        + [("b", 5, 5.1)]                                   # MAD 0 deviation
    )
    df = spark.createDataFrame(rows, "id string, t int, value double")
    got = {(r["id"], r["t"]): r for r in
           hampel_despike(df, ["id"], ["t"], "value", half_window=2).collect()}
    spike = got[("a", 10)]
    assert spike["is_spike"] and spike["value_clean"] == spike["rolling_median"]
    assert spike["value_clean"] < 100
    assert not got[("a", 5)]["is_spike"] and got[("a", 5)]["value_clean"] == 12.0
    assert got[("a", 20)]["is_spike"] is None
    assert got[("a", 20)]["value_clean"] is None
    assert got[("b", 5)]["is_spike"]  # MAD 0: any nonzero deviation flags

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hampel_despike(df, ["id"], ["t"], "value", half_window=0)


def test_contamination_spans_locates_benchmark_text(spark):
    """A benchmark sentence embedded mid-document surfaces as one
    span at the right token offsets; clean documents emit nothing;
    the benchmark side carries its own text column name."""
    from curw_flo2d_data_manager_spark.operators.caching import release_caches
    from curw_flo2d_data_manager_spark.operators.dedup import (
        contamination_spans,
        remove_repeated_spans,
    )

    bench_sent = "what is the capital of france paris is the capital"
    corpus = spark.createDataFrame(
        [
            (1, f"some training text here {bench_sent} and more text after"),
            (2, "entirely clean document with no benchmark overlap at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, f"quiz item {bench_sent}")], "qid long, prompt string"
    )
    try:
        got = {r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
               for r in contamination_spans(
                   corpus, bench, "doc_id", bench_text_col="prompt", k=4
               ).collect()}
    finally:
        release_caches()
    # bench_sent = 10 tokens at positions 4..13 of doc 1
    assert got[1] == (4, 13, 10)
    assert 2 not in got


def test_linear_interpolate_time_weighted_brackets(spark):
    """An interior gap fills proportionally by TIME fraction (not row
    position); leading/trailing gaps stay NULL; non-NULL rows pass
    through; was_gap marks every originally-NULL row."""
    from curw_flo2d_data_manager_spark.operators.interpolate import (
        linear_interpolate,
    )

    rows = [
        ("a", 0.0, None),    # leading gap: no left bracket -> NULL
        ("a", 10.0, 1.0),
        ("a", 12.0, None),   # 2/10 of the way 1.0 -> 11.0 => 3.0
        ("a", 20.0, 11.0),
        ("a", 30.0, None),   # trailing gap: no right bracket -> NULL
        ("b", 0.0, 7.0),     # other key untouched
    ]
    df = spark.createDataFrame(rows, "id string, t double, value double")
    got = {
        (r["id"], r["t"]): r
        for r in linear_interpolate(df, ["id"], "t", "value").collect()
    }
    assert got[("a", 0.0)]["value_interp"] is None
    assert got[("a", 0.0)]["was_gap"]
    assert got[("a", 12.0)]["value_interp"] == 3.0
    assert got[("a", 12.0)]["was_gap"]
    assert got[("a", 30.0)]["value_interp"] is None
    assert got[("a", 10.0)]["value_interp"] == 1.0
    assert not got[("a", 10.0)]["was_gap"]
    assert got[("b", 0.0)]["value_interp"] == 7.0


def test_linear_interpolate_multirow_gap_and_tiebreak(spark):
    """Every NULL of a multi-row gap interpolates against the SAME
    bracket pair; duplicate timestamps resolve deterministically via
    tiebreak_cols."""
    from curw_flo2d_data_manager_spark.operators.interpolate import (
        linear_interpolate,
    )

    rows = [
        ("a", 0.0, 1, 0.0),
        ("a", 1.0, 2, None),
        ("a", 2.0, 3, None),
        ("a", 4.0, 4, 8.0),
        # duplicate timestamp: id 6 (NULL) sits AFTER id 5 in tiebreak
        # order, so its left bracket is id 5's value
        ("b", 0.0, 5, 2.0),
        ("b", 0.0, 6, None),
        ("b", 1.0, 7, 4.0),
    ]
    df = spark.createDataFrame(rows, "id string, t double, seq int, value double")
    got = {
        r["seq"]: r["value_interp"]
        for r in linear_interpolate(
            df, ["id"], "t", "value", tiebreak_cols=["seq"]
        ).collect()
    }
    assert got[2] == 2.0  # 1/4 of 0->8
    assert got[3] == 4.0  # 2/4 of 0->8
    # t == t_prev: fraction 0/1 of 2.0 -> 4.0 = 2.0
    assert got[6] == 2.0


def test_seasonal_baseline_min_obs_and_anomaly(spark):
    """Cell means and anomalies are exact; a cell under min_obs yields
    NULL climatology and NULL anomaly but keeps its count."""
    from pyspark.sql import functions as F

    from curw_flo2d_data_manager_spark.operators.seasonal import (
        seasonal_baseline,
    )

    rows = [
        ("g1", 0, 1.0), ("g1", 0, 3.0), ("g1", 0, 5.0),  # mean 3.0
        ("g1", 1, 10.0), ("g1", 1, 20.0),                # thin cell
    ]
    df = spark.createDataFrame(rows, "station string, hod int, value double")
    out = seasonal_baseline(
        df, ["station"], F.col("hod"), "value", min_obs=3
    ).collect()
    full = [r for r in out if r["_period"] == 0]
    thin = [r for r in out if r["_period"] == 1]
    assert all(r["clim_mean"] == 3.0 and r["clim_n"] == 3 for r in full)
    assert {r["anomaly"] for r in full} == {-2.0, 0.0, 2.0}
    assert all(r["clim_mean"] is None and r["anomaly"] is None for r in thin)
    assert all(r["clim_n"] == 2 for r in thin)


def test_pagerank_matches_power_iteration_with_dangling(spark):
    """A 5-node graph with a dangling node: the DataFrame ranks match
    a pure-Python power iteration (same dangling redistribution) to
    1e-12 and sum to exactly 1 per iteration semantics."""
    from curw_flo2d_data_manager_spark.operators.pagerank import pagerank

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 1), (2, 5)]
    # node 5 is dangling (no out-edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=7).collect()}

    nodes = sorted({n for e in edges for n in e})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    d, n = 0.85, len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(7):
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += rank[s] / outdeg[s]
        dang = sum(rank[v] for v in nodes if v not in outdeg)
        rank = {
            v: (1.0 - d) / n + d * (contrib[v] + dang / n) for v in nodes
        }
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - rank[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-12
    # the cycle hub (node 1, fed by the full 3->4->1 chain) outranks
    # the dangling leaf
    assert got[1] > got[5]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(df, iters=0)


def test_bm25_ranks_tf_and_idf_sensibly(spark):
    """More query-term occurrences rank higher at equal length; a doc
    without any query term never appears; a rare term outweighs a
    common one through idf; empty query raises."""
    from curw_flo2d_data_manager_spark.operators.textstats import bm25_topk

    docs = [
        (1, "spark spark spark pad pad pad pad pad"),
        (2, "spark pad pad pad pad pad pad pad"),
        (3, "pad pad pad pad pad pad pad pad"),
        (4, "vector pad pad pad pad pad pad pad"),  # 'vector' df=1
        (5, "spark pad pad pad pad pad pad pad"),   # 'spark' df=3
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = bm25_topk(df, "doc_id", ["spark", "vector"], k=10).collect()
    by_id = {r["doc_id"]: r for r in got}
    assert 3 not in by_id
    assert by_id[1]["score"] > by_id[2]["score"]          # tf monotone
    assert by_id[4]["score"] > by_id[2]["score"]          # idf: rare > common
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == list(
        range(1, len(got) + 1)
    )
    assert by_id[2]["score"] == by_id[5]["score"]         # identical docs tie
    assert by_id[2]["rank"] < by_id[5]["rank"]            # id tiebreak

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bm25_topk(df, "doc_id", [])


def test_interval_overlap_join_dedups_multibucket_pairs(spark):
    """A pair overlapping many buckets surfaces exactly once; ends are
    inclusive; by-keys separate; non-overlapping intervals never pair;
    overlap bounds are exact."""
    from curw_flo2d_data_manager_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [
            ("k1", 1, 0.0, 5000.0),    # spans many 600s buckets
            ("k1", 2, 9000.0, 9100.0),
            ("k2", 3, 0.0, 100.0),     # other key
        ],
        "event_type string, id int, start double, end double",
    )
    right = spark.createDataFrame(
        [
            ("k1", 10, 1000.0, 6000.0),  # overlaps id 1 across buckets
            ("k1", 11, 5000.0, 5500.0),  # touches id 1 exactly at end
            ("k1", 12, 9200.0, 9300.0),  # gap after id 2
            ("k2", 13, 50.0, 60.0),      # overlaps id 3 in k2 only
        ],
        "event_type string, id int, start double, end double",
    )
    got = interval_overlap_join(
        left, right, "start", "end", by=["event_type"], bucket_seconds=600
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in got}
    assert set(pairs) == {(1, 10), (1, 11), (3, 13)}  # each exactly once
    assert len(got) == 3
    r = pairs[(1, 10)]
    assert (r["overlap_start"], r["overlap_end"], r["overlap_seconds"]) == (
        1000.0, 5000.0, 4000.0,
    )
    # inclusive ends: the point-touch pair appears, overlap length 0
    assert pairs[(1, 11)]["overlap_seconds"] == 0.0


def test_winsorize_exact_percentiles_and_null_passthrough(spark):
    """Band edges match continuous-percentile interpolation; values
    clamp both ways; NULLs pass through unclamped and unflagged; bad
    bounds raise."""
    from curw_flo2d_data_manager_spark.operators.despike import winsorize

    rows = [("a", i, float(i)) for i in range(1, 11)] + [("a", 99, None)]
    df = spark.createDataFrame(rows, "k string, id int, value double")
    got = {r["id"]: r for r in
           winsorize(df, ["k"], "value", 0.1, 0.9).collect()}
    # quantile_cont over 1..10: p10 = 1.9, p90 = 9.1
    assert abs(got[1]["p_lo"] - 1.9) < 1e-12
    assert abs(got[1]["p_hi"] - 9.1) < 1e-12
    assert abs(got[1]["value_wins"] - 1.9) < 1e-12 and got[1]["is_clipped"]
    assert abs(got[10]["value_wins"] - 9.1) < 1e-12 and got[10]["is_clipped"]
    assert got[5]["value_wins"] == 5.0 and not got[5]["is_clipped"]
    assert got[99]["value_wins"] is None and got[99]["is_clipped"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        winsorize(df, ["k"], "value", 0.9, 0.1)


def test_kmeans_pair_consistency_and_half_up_init(spark):
    """(assignments, centroids) are internally consistent — every
    row's d2 is its rounded squared distance to the RETURNED centroid
    matrix, not the penultimate one — and init components round
    HALF_UP like F.round / the DuckDB oracle (builtin round()'s
    half-even would turn 0.00005 into 0.0, diverging engines)."""
    from curw_flo2d_data_manager_spark.operators.kmeans import (
        _round_half_up,
        kmeans_fit,
    )

    # half-up on exact half-quantum values (banker's would give 0.0 / 0.1_2)
    assert _round_half_up(0.00005, 4) == 0.0001
    assert _round_half_up(0.12345, 4) == 0.1235
    assert _round_half_up(-0.00005, 4) == -0.0001

    rows = [(i, [float(i % 7), float((3 * i) % 5)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out, cents = kmeans_fit(df, k=3, iters=2, id_col="vec_id")
    got = {r["vec_id"]: r for r in out.collect()}
    for i, vec in rows:
        d2s = [
            round(sum((a - b) * (a - b) for a, b in zip(vec, c)), 2)
            for c in cents
        ]
        best = min(range(3), key=lambda j: (d2s[j], j))
        assert got[i]["cluster"] == best, (i, got[i], d2s)
        assert abs(got[i]["d2"] - d2s[best]) < 1e-9


def test_rangejoin_inverted_intervals_match_plain_semantics(spark):
    """Malformed (end < start) intervals follow the documented plain
    range-predicate semantics instead of silently corrupting bucket
    coverage: point_in_interval_join drops them (BETWEEN can never
    hold), and interval_overlap_join still finds the pairs the exact
    predicate ``L.start <= R.end AND R.start <= L.end`` admits — a
    partner spanning [end, start]."""
    from curw_flo2d_data_manager_spark.operators.rangejoin import (
        interval_overlap_join,
        point_in_interval_join,
    )

    pts = spark.createDataFrame(
        [(1, 7000.0)], "pid int, time double"
    )
    inv = spark.createDataFrame(
        [(10, 9000.0, 5000.0)], "iid int, start double, end double"
    )
    assert point_in_interval_join(pts, inv, bucket_seconds=3600).count() == 0

    left = spark.createDataFrame(
        [(1, 9000.0, 5000.0),      # inverted: partner must span [5000, 9000]
         (2, 1000.0, 2000.0)],     # normal
        "lid int, start double, end double",
    )
    right = spark.createDataFrame(
        [(10, 4000.0, 10000.0),    # spans the inverted one -> matches
         (11, 6000.0, 6500.0),     # inside [5000,9000] but doesn't span -> no
         (12, 1500.0, 1600.0)],    # overlaps the normal one
        "rid int, start double, end double",
    )
    got = {
        (r["lid_a"], r["rid_b"])
        for r in interval_overlap_join(
            left, right, bucket_seconds=1000
        ).collect()
    }
    # plain-predicate truth set computed by hand:
    # (1,10): 9000<=10000 & 4000<=5000 ✓   (1,11): 6000<=5000 ✗
    # (1,12): 1500<=5000 but 9000<=1600 ✗  (2,12): ✓  (2,10): 1000<=10000 & 4000<=2000 ✗
    assert got == {(1, 10), (2, 12)}


def test_domain_cap_keep_and_annotate_modes(spark):
    """keep_only retains exactly cap best rows per domain (determined
    by order + tiebreak); annotate mode keeps every row with its true
    rank and an over_cap flag; cap < 1 raises."""
    from curw_flo2d_data_manager_spark.operators.sampling import domain_cap

    rows = [(d, i, float(100 - i)) for d in ("a", "b") for i in range(5)]
    df = spark.createDataFrame(rows, "source string, doc_id int, q double")
    kept = domain_cap(
        df, ["source"], [F.col("q").desc(), "doc_id"], cap=2
    ).collect()
    assert sorted((r["source"], r["doc_id"]) for r in kept) == [
        ("a", 0), ("a", 1), ("b", 0), ("b", 1),
    ]
    ann = {
        (r["source"], r["doc_id"]): r
        for r in domain_cap(
            df, ["source"], [F.col("q").desc(), "doc_id"],
            cap=2, keep_only=False,
        ).collect()
    }
    assert len(ann) == 10
    assert ann[("a", 0)]["domain_rank"] == 1 and not ann[("a", 0)]["over_cap"]
    assert ann[("a", 4)]["domain_rank"] == 5 and ann[("a", 4)]["over_cap"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        domain_cap(df, ["source"], ["doc_id"], cap=0)


def test_quantile_normalize_ties_nulls_and_domain_independence(spark):
    """percent_rank within each domain: 0 for the minimum, 1 for the
    maximum, tied scores share a rank, NULL scores get NULL, and the
    normalization of one domain is unaffected by another's scale."""
    from curw_flo2d_data_manager_spark.operators.sampling import (
        quantile_normalize,
    )

    rows = [
        ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 20.0), ("a", 4, 40.0),
        ("a", 5, None),
        # domain b on a 1000x scale: same shape, same normalized ranks
        ("b", 6, 10000.0), ("b", 7, 20000.0), ("b", 8, 20000.0),
        ("b", 9, 40000.0),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id int, s double")
    got = {
        r["doc_id"]: r["score_norm"]
        for r in quantile_normalize(df, ["source"], "s").collect()
    }
    third = 1.0 / 3.0
    assert got[1] == 0.0 and got[4] == 1.0
    assert abs(got[2] - third) < 1e-12 and got[2] == got[3]  # tie shares
    assert got[5] is None
    for a_id, b_id in [(1, 6), (2, 7), (3, 8), (4, 9)]:
        assert got[a_id] == got[b_id], (a_id, b_id)


def test_char_entropy_known_distributions(spark):
    """Hand-computable entropies: single-char runs -> 0 bits, a 50/50
    two-char mix -> 1 bit, four equiprobable chars -> 2 bits;
    out-of-alphabet chars fold into ONE bucket (so '!@#$' is a single
    class -> 0 bits); case folds; empty/NULL -> NULL."""
    import math

    from curw_flo2d_data_manager_spark.operators.textstats import char_entropy

    rows = [
        (1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "!@#$"),
        (5, "AaAa"), (6, ""), (7, None), (8, "aab!"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r["id"]: r["h"]
        for r in df.select(
            "id", F.round(char_entropy("text"), 9).alias("h")
        ).collect()
    }
    assert got[1] == 0.0
    assert got[2] == 1.0
    assert got[3] == 2.0
    assert got[4] == 0.0          # all four chars share the OTHER bucket
    assert got[5] == 0.0          # lowercased first
    assert got[6] is None and got[7] is None
    # 'aab!' -> a:1/2, b:1/4, other:1/4
    want = -(0.5 * math.log2(0.5) + 0.25 * math.log2(0.25) * 2)
    assert abs(got[8] - want) < 1e-9


# fuzzy name matching (operators/dedup.fuzzy_name_pairs)

def test_fuzzy_name_pairs_distinct_first_and_thresholds(spark):
    from curw_flo2d_data_manager_spark.operators.dedup import fuzzy_name_pairs

    rows = (
        [("acme corp",)] * 3
        + [("acme corpx",)] * 2   # dist 1 from "acme corp"
        + [("acme corporation",)]  # dist 7 — past max_dist
        + [("zenith ltd",)]        # different block
        + [("acme corp",)]         # more exact dupes (fold into n_rows)
    )
    df = spark.createDataFrame(rows, "name string")
    got = fuzzy_name_pairs(df, "name", max_dist=2).collect()
    assert len(got) == 1
    r = got[0]
    # ordered pair, group sizes carried from the row relation
    assert (r.name_a, r.name_b, r.dist) == ("acme corp", "acme corpx", 1)
    assert (r.n_a, r.n_b) == (4, 2)


def test_fuzzy_name_pairs_is_blocked_equi_join_no_cartesian(spark):
    from curw_flo2d_data_manager_spark.operators.dedup import fuzzy_name_pairs

    df = spark.createDataFrame(
        [("alpha one",), ("alpha two",), ("beta one",)], "name string"
    )
    out = fuzzy_name_pairs(df, "name", max_dist=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # cross-block pairs never form, even at a permissive distance
    got = {(r.name_a, r.name_b) for r in out.collect()}
    assert got == {("alpha one", "alpha two")}


# table profiling (operators/profile.py)

def test_profile_columns_stats_and_single_scan(spark):
    from curw_flo2d_data_manager_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (2.0, 30.0), (None, 30.0)],
        "a double, b double",
    )
    out = profile_columns(df, ["a", "b"])
    rows = {r.col_name: r for r in out.collect()}
    a, b = rows["a"], rows["b"]
    assert a.n_rows == 4 and a.n_null == 1 and a.n_distinct == 2
    assert (a.min_v, a.max_v) == (1.0, 2.0)
    assert abs(a.avg_v - 5.0 / 3) < 1e-3  # rounded to 4
    assert b.n_null == 1 and b.n_distinct == 2 and b.max_v == 30.0
    # one scan: a single leaf in the (AQE final) physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") == 1


def test_profile_columns_hostile_column_names(spark):
    """Round-8 advice regression: names with spaces, hyphens, and
    embedded quotes must survive the stack() reshape (positional
    intermediate aliases + escaped name literals)."""
    from curw_flo2d_data_manager_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1.0, 2.0, 3.0)], "`my col` double, `a-b` double, `q'uote` double"
    )
    out = profile_columns(df, ["my col", "a-b", "q'uote"])
    rows = {r.col_name: r for r in out.collect()}
    assert set(rows) == {"my col", "a-b", "q'uote"}
    assert rows["my col"].min_v == 1.0
    assert rows["a-b"].max_v == 2.0
    assert rows["q'uote"].avg_v == 3.0


def test_profile_columns_approx_mode_has_no_expand(spark):
    from curw_flo2d_data_manager_spark.operators.profile import profile_columns

    df = spark.createDataFrame([(float(i), float(i % 3)) for i in range(100)],
                               "a double, b double")
    exact_plan = (
        profile_columns(df, ["a", "b"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    approx = profile_columns(df, ["a", "b"], exact_distinct=False)
    approx_plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan       # the documented exact-distinct cost
    assert "Expand" not in approx_plan  # HLL path: one pass, no replication
    rows = {r.col_name: r for r in approx.collect()}
    assert rows["b"].n_distinct == 3    # HLL exact at tiny cardinality


# label propagation (operators/components.label_propagation)

def test_label_propagation_separates_bridged_communities(spark):
    """Two 5-cliques joined by ONE bridge edge: connected_components
    merges everything into one component, but LPA keeps two
    communities — each clique's majority vote overwhelms the single
    bridge neighbor. Labels converge to each clique's minimum id."""
    from curw_flo2d_data_manager_spark.operators.components import (
        connected_components,
        label_propagation,
    )

    clique_a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    clique_b = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    bridge = [(4, 10)]
    df = spark.createDataFrame(
        clique_a + clique_b + bridge, "id_a long, id_b long"
    )
    cc = {r.component for r in connected_components(df).collect()}
    assert cc == {0}  # one giant component
    labels = {
        r.id: r.label for r in label_propagation(df, n_iters=4).collect()
    }
    assert set(labels) == set(range(5)) | set(range(10, 15))
    assert all(labels[i] == 0 for i in range(5))
    assert all(labels[i] == 10 for i in range(10, 15))


def test_label_propagation_sync_oscillation_is_deterministic(spark):
    """The documented synchronous-LPA caveat, pinned: a 2-node graph
    OSCILLATES (each round both nodes adopt the other's label — swap
    after odd rounds, back to self after even rounds). The point of
    fixed synchronous rounds is that even this pathology is fully
    deterministic and oracle-replayable, not hidden by randomness."""
    from curw_flo2d_data_manager_spark.operators.components import (
        label_propagation,
    )

    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    odd = sorted(
        (r.id, r.label) for r in label_propagation(df, n_iters=1).collect()
    )
    assert odd == [(1, 2), (2, 1)]  # swapped
    even = sorted(
        (r.id, r.label) for r in label_propagation(df, n_iters=2).collect()
    )
    assert even == [(1, 1), (2, 2)]  # swapped back
    again = sorted(
        (r.id, r.label) for r in label_propagation(df, n_iters=2).collect()
    )
    assert even == again  # no randomness anywhere


# MMR diversified re-ranking (operators/similarity.mmr_rerank)

def test_mmr_rerank_skips_near_duplicates(spark):
    """Planted diversification: the three top candidates by relevance
    are near-identical vectors; plain top-3 would return all three,
    MMR must interleave the orthogonal docs at ranks 2-3 because the
    copies' similarity-to-selected wipes out their relevance edge."""
    from curw_flo2d_data_manager_spark.operators.similarity import mmr_rerank

    rows = [
        # (query, id, relevance, vector): ids 1-3 are clones along e1
        (0, 1, 0.99, [1.0, 0.0, 0.0]),
        (0, 2, 0.98, [1.0, 0.001, 0.0]),
        (0, 3, 0.97, [1.0, 0.0, 0.001]),
        (0, 4, 0.60, [0.0, 1.0, 0.0]),
        (0, 5, 0.50, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, corpus_id long, rel double, vec array<double>"
    )
    got = {
        r.mmr_rank: r.corpus_id
        for r in mmr_rerank(df, k=3, lam=0.5).collect()
    }
    assert got == {1: 1, 2: 4, 3: 5}
    # λ high enough and relevance wins the third slot back — the knob
    # behaves as documented (clone 2: 0.7·0.98 − 0.3·1 ≈ 0.386 beats
    # doc 5's 0.7·0.5 − 0 = 0.35)
    high = {
        r.mmr_rank: r.corpus_id
        for r in mmr_rerank(df, k=3, lam=0.7).collect()
    }
    assert high == {1: 1, 2: 4, 3: 2}


def test_mmr_rerank_string_ids(spark):
    """Round-8 advice regression: the argmax tiebreak must be
    type-agnostic — string corpus ids (reachable via query-ann-index
    --diversify with a user --id_col) used to null-corrupt under the
    old -corpus_id negation. Ties broken by MIN id."""
    from curw_flo2d_data_manager_spark.operators.similarity import mmr_rerank

    rows = [
        ("q1", "doc-b", 0.9, [1.0, 0.0]),
        ("q1", "doc-a", 0.9, [1.0, 0.0]),  # tie: doc-a wins rank 1
        ("q1", "doc-c", 0.5, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id string, corpus_id string, rel double, vec array<double>"
    )
    got = {
        r.mmr_rank: r.corpus_id
        for r in mmr_rerank(df, k=2, lam=0.5).collect()
    }
    assert got[1] == "doc-a"  # min-id tiebreak, no nulls
    assert got[2] == "doc-c"  # orthogonal doc beats the clone


def test_mmr_rerank_all_null_scores_keep_query(spark):
    """Round-9 review regression: a query whose candidates all have
    NULL relevance (zero vectors → try_divide → NULL) must still emit
    a row per rank (min-id, NULL score) — a plain == against the NULL
    max silently dropped the query from the round."""
    from curw_flo2d_data_manager_spark.operators.similarity import mmr_rerank

    rows = [
        (0, 2, None, [1.0, 0.0]),
        (0, 1, None, [0.0, 1.0]),
        (1, 5, 0.9, [1.0, 0.0]),
        # query 2: zero vectors — sims must be NULL, not an ANSI
        # divide-by-zero crash
        (2, 7, None, [0.0, 0.0]),
        (2, 8, None, [0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, corpus_id long, rel double, vec array<double>"
    )
    got = {
        (r.query_id, r.mmr_rank): (r.corpus_id, r.mmr_score)
        for r in mmr_rerank(df, k=1, lam=0.5).collect()
    }
    assert got[(0, 1)] == (1, None)  # min-id tiebreak, NULL score kept
    assert got[(1, 1)] == (5, pytest.approx(0.9))
    assert got[(2, 1)] == (7, None)  # zero vectors: NULL, no crash


def test_arrow_assign_large_k_matches_expression_and_handles_nulls(spark):
    """Round-9 review regression: past _EXPR_ASSIGN_MAX_K the Arrow
    argmin path must (a) agree with the expression argmin on every
    vector and (b) yield NULL cluster for NULL vectors instead of
    crashing the executor on np.asarray."""
    import random

    from curw_flo2d_data_manager_spark.operators.similarity import (
        _centroid_assign_arrow,
        _unit,
        centroid_assign_expr,
    )
    import pyspark.sql.functions as F

    rng = random.Random(5)
    centers = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(30)]
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    rows.append((99, None))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    u = _unit(F.col("embedding"))
    both = df.select(
        "vec_id",
        centroid_assign_expr(u, centers).alias("c_expr"),
        _centroid_assign_arrow(u, centers).alias("c_arrow"),
    ).collect()
    for r in both:
        if r.vec_id == 99:
            assert r.c_expr is None and r.c_arrow is None
        else:
            assert r.c_expr == r.c_arrow, r.vec_id


def test_arrow_assign_near_ties_bit_identical_to_expression(spark):
    """Round-9 advice: the matmul expansion (x²−2x·c+c²) and the
    expression fold of (x−y)² can diverge in the last ulp on
    near-ties. The Arrow path now recomputes near-tie rows in the
    fold's exact summation order, so assignment must be IDENTICAL to
    the expression path even on vectors sitting on (or within 1e-12
    of) the perpendicular bisector of two centers — the worst case
    for the old code."""
    import random

    from curw_flo2d_data_manager_spark.operators.similarity import (
        _centroid_assign_arrow,
        centroid_assign_expr,
    )
    import pyspark.sql.functions as F

    rng = random.Random(11)
    dim = 6
    # 30 centers (> _EXPR_ASSIGN_MAX_K) with two duplicated and two
    # nearly-duplicated pairs planted at known indices
    centers = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(30)]
    centers[7] = list(centers[3])  # exact duplicate -> exact tie
    centers[19] = [v + 1e-13 for v in centers[12]]  # last-ulp-ish pair
    rows = []
    for i in range(60):
        # vectors very close to a planted center: distance to the twin
        # differs by ~0 — squarely inside the near-tie band
        base = centers[(3, 12)[i % 2]]
        rows.append((i, [v + rng.uniform(-1e-9, 1e-9) for v in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v = F.col("embedding")
    both = df.select(
        "vec_id",
        centroid_assign_expr(v, centers).alias("c_expr"),
        _centroid_assign_arrow(v, centers).alias("c_arrow"),
    ).collect()
    assert both
    for r in both:
        assert r.c_expr == r.c_arrow, (r.vec_id, r.c_expr, r.c_arrow)
        # first-index tiebreak on the exact-duplicate pair
        assert r.c_arrow != 7


def test_mmr_rerank_short_candidate_sets_and_parallel_queries(spark):
    """A query with fewer candidates than k emits what it has; two
    queries advance independently in the same greedy rounds."""
    from curw_flo2d_data_manager_spark.operators.similarity import mmr_rerank

    rows = [
        (0, 1, 0.9, [1.0, 0.0]),
        (0, 2, 0.8, [0.0, 1.0]),
        (1, 7, 0.5, [1.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, corpus_id long, rel double, vec array<double>"
    )
    got = sorted(
        (r.query_id, r.mmr_rank, r.corpus_id)
        for r in mmr_rerank(df, k=3, lam=0.5).collect()
    )
    assert got == [(0, 1, 1), (0, 2, 2), (1, 1, 7)]


# global row numbering (operators/rownum.py)

def test_global_row_number_matches_naive_without_single_partition(spark):
    """Distributed global numbering equals the single-partition-window
    answer row-for-row, while its physical plan carries NO
    SinglePartition exchange (the naive form's scale-killer — asserted
    present there as the contrast)."""
    from pyspark.sql import Window

    from curw_flo2d_data_manager_spark.operators.rownum import (
        global_row_number,
    )

    rows = [((i * 37) % 1000, i) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, uid long").repartition(8)
    out = global_row_number(df, ["k", "uid"], num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan

    naive = df.withColumn(
        "row_num",
        F.row_number().over(Window.orderBy("k", "uid")).cast("long"),
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in naive_plan  # the shape being avoided

    got = {(r.k, r.uid): r.row_num for r in out.collect()}
    want = {(r.k, r.uid): r.row_num for r in naive.collect()}
    assert got == want
    assert sorted(got.values()) == list(range(1, 1001))  # contiguous


# reciprocal rank fusion (operators/similarity.rrf_fuse)

def test_rrf_fuse_missing_candidates_and_consensus(spark):
    """A candidate ranked by BOTH rankers outscores one ranked first
    by only a single ranker (1/61 + 1/62 > 1/61); absent-candidate
    terms contribute exactly 0 via the full-outer join."""
    from curw_flo2d_data_manager_spark.operators.similarity import rrf_fuse

    ra = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, corpus_id long, rank int",
    )
    rb = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2), (0, 10, 3)],
        "query_id long, corpus_id long, rank int",
    )
    got = {
        r.corpus_id: (r.rrf_rank, r.rrf_score)
        for r in rrf_fuse([ra, rb], k_const=60, topk=4).collect()
    }
    # 11: 1/62 + 1/61 ; 10: 1/61 + 1/63 ; 13: 1/62 ; 12: 1/63
    assert [got[c][0] for c in (11, 10, 13, 12)] == [1, 2, 3, 4]
    assert abs(got[13][1] - round(1 / 62, 9)) < 1e-12  # single-ranker term
    assert abs(got[11][1] - round(1 / 62 + 1 / 61, 9)) < 1e-12


# asymmetric containment dedup (operators/dedup.containment_pairs)

def test_containment_catches_quote_that_jaccard_misses(spark):
    """A short doc quoted verbatim inside a much longer page:
    containment 1.0 (caught) while token Jaccard is tiny (a
    resemblance dedup at any sane threshold misses it). The reverse
    direction (big in small) must NOT appear, nor unrelated docs."""
    from curw_flo2d_data_manager_spark.operators.dedup import (
        containment_pairs,
    )

    quote = "ancient mariner stoppeth one of three galleon"
    filler = " ".join(f"word{i:03d}" for i in range(200))
    rows = [
        (1, quote),                          # 7 distinct tokens
        (2, filler + " " + quote),           # contains the quote
        (3, "completely different content about seven other things"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_small, r.id_big): r.containment
        for r in containment_pairs(df, "doc_id", threshold=0.8).collect()
    }
    assert got == {(1, 2): 1.0}
    # the Jaccard the resemblance family would see: 7 / 207
    assert 7 / 207 < 0.05


def test_containment_min_tokens_and_threshold(spark):
    from curw_flo2d_data_manager_spark.operators.dedup import (
        containment_pairs,
    )

    rows = [
        (1, "tiny doc"),                       # < 5 tokens: ignored
        (2, "alpha beta gamma delta epsilon zeta"),
        # 5 of doc 2's 6 tokens (containment of 2 in 3 = 5/6 ≈ 0.83)
        (3, "alpha beta gamma delta epsilon eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_small, r.id_big): r.containment
        for r in containment_pairs(df, "doc_id", threshold=0.8).collect()
    }
    assert got == {(2, 3): round(5 / 6, 6)}
    none = containment_pairs(df, "doc_id", threshold=0.9).collect()
    assert none == []


# cross-document boilerplate stripping (textstats.strip_boilerplate_lines)

def test_strip_boilerplate_cross_doc_only_and_order_preserved(spark):
    """A footer shared by every doc is stripped; a line repeated many
    times INSIDE one doc survives (in-doc repetition is not
    boilerplate); blank lines are never counted or stripped; line
    order is restored exactly after the reassembly."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        strip_boilerplate_lines,
    )

    footer = "all rights reserved"
    rows = [
        (1, f"alpha\n\nbeta\n{footer}"),
        (2, f"gamma\n{footer}"),
        (3, f"{footer}\ndelta"),
        # doc 4: 'echo' repeated 3x in-doc — must survive
        (4, f"echo\necho\necho\n{footer}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in strip_boilerplate_lines(
            df, "doc_id", min_doc_freq=3
        ).collect()
    }
    assert got[1].text_clean == "alpha\n\nbeta"  # blank line kept
    assert got[1].n_removed == 1 and got[1].n_lines == 4
    assert got[2].text_clean == "gamma"
    assert got[3].text_clean == "delta"  # leading footer stripped
    assert got[4].text_clean == "echo\necho\necho"
    assert got[4].n_removed == 1


def test_strip_boilerplate_keeps_all_boilerplate_doc(spark):
    """Round-8 advice regression: a document whose EVERY non-blank
    line is boilerplate must still appear in the output (empty
    text_clean, n_removed = n_lines) — the old inner join dropped it,
    diverging from the LEFT-JOIN oracle."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        strip_boilerplate_lines,
    )

    footer = "all rights reserved"
    banner = "cookie banner"
    rows = [
        (1, f"alpha\n{footer}\n{banner}"),
        (2, f"beta\n{footer}\n{banner}"),
        # doc 3 is ONLY boilerplate lines
        (3, f"{footer}\n{banner}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in strip_boilerplate_lines(
            df, "doc_id", min_doc_freq=3
        ).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[3].text_clean == ""
    assert got[3].n_lines == 2 and got[3].n_removed == 2
    assert got[1].text_clean == "alpha" and got[1].n_removed == 2


# round-10: triangle counting (operators/triangles.py)

def test_triangle_counts_known_graphs(spark):
    """K4 (every node in C(3,2)=3 triangles), a triangle with a
    pendant edge, and a square (no triangles); reversed/duplicate
    edges and self-loops must not change the answer."""
    from curw_flo2d_data_manager_spark.operators.triangles import (
        triangle_counts,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    # noise: duplicates, reversed orientation, a self-loop
    edges = k4 + [(b, a) for a, b in k4[:3]] + [(2, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    tri_pendant = [(1, 2), (2, 3), (1, 3), (3, 4)]
    df = spark.createDataFrame(tri_pendant, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}  # pendant node 4 omitted

    square = [(1, 2), (2, 3), (3, 4), (1, 4)]
    df = spark.createDataFrame(square, "src long, dst long")
    assert triangle_counts(df).count() == 0


def test_triangle_counts_matches_bruteforce_on_random_graph(spark):
    """Degree-oriented counts equal the itertools brute force on a
    random-ish deterministic graph (the orientation/tiebreak logic is
    where off-by-one bugs live)."""
    import itertools
    import random

    from curw_flo2d_data_manager_spark.operators.triangles import (
        triangle_counts,
    )

    rng = random.Random(7)
    nodes = list(range(30))
    edges = sorted(
        {(a, b) for a in nodes for b in nodes
         if a < b and rng.random() < 0.2}
    )
    eset = set(edges)
    want: dict[int, int] = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in eset and (x, z) in eset and (y, z) in eset:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == want


# round-10: sparse all-pairs cosine (operators/textstats.py)

def test_sparse_cosine_pairs_planted_duplicates_and_threshold(spark):
    """Exact copies hit cosine 1.0; unrelated documents never pair
    (no shared 3-gram terms); the threshold drops weak pairs."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        sparse_cosine_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base),  # exact duplicate
        (3, "completely different words about spark catalyst plans"),
        (4, base + " with a small trailing addition here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in sparse_cosine_pairs(
            df, "doc_id", min_sim=0.2, max_df_frac=1.0, ngram=3
        ).collect()
    }
    assert got[(1, 2)] == 1.0
    # doc 4 extends the base text: its unique cross-boundary 3-grams
    # carry high idf, so the cosine is well below 1 but the shared
    # prefix keeps it above the threshold
    assert (1, 4) in got and 0.2 <= got[(1, 4)] < 1.0
    assert not any(3 in pair for pair in got)


def test_sparse_cosine_pairs_df_cap_prunes_stopword_terms(spark):
    """With a tight max_df_frac every term shared by ALL docs is
    pruned from vectors, so docs that only share ubiquitous terms
    cannot pair at all."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        sparse_cosine_pairs,
    )

    common = "alpha beta gamma"
    rows = [
        (1, common + " one two three"),
        (2, common + " four five six"),
        (3, common + " seven eight nine"),
        # doc 4 shares nothing, so common's df=3 < N=4 and its
        # smoothed idf ln(5/4) stays positive (df = N would zero it)
        (4, "unrelated filler payload"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # unigrams: 'alpha'/'beta'/'gamma' have df=3; cap at 0.5 (df<=2)
    # prunes them and nothing else can generate a pair
    loose = sparse_cosine_pairs(
        df, "doc_id", min_sim=0.01, max_df_frac=1.0, ngram=1
    ).count()
    tight = sparse_cosine_pairs(
        df, "doc_id", min_sim=0.01, max_df_frac=0.5, ngram=1
    ).count()
    assert loose >= 3 and tight == 0


def test_sparse_cosine_prefix_filter_is_lossless_and_prunes(spark):
    """Bayardo prefix filtering (round-10 verdict item 2): the
    prefix-filtered path returns BIT-IDENTICAL rows to the unfiltered
    full-index join (candidate generation is a provable superset of
    the true pairs; scoring is the same exact-integer verify), while
    indexing strictly fewer postings — observable as fewer candidate
    pairs than the full join generates on a corpus with overlapping
    but dissimilar documents."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        sparse_cosine_pairs,
    )

    # Docs share a few common words (candidate-generating terms) but
    # only 1/2 are near-duplicates at the 0.6 threshold.
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "alpha kappa lumen mosaic nectar oasis prism quartz"),
        (4, "beta kappa rhubarb stone tulip umber violet willow"),
        (5, "gamma lumen stone xylem yonder zephyr anchor basil"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_sim=0.6, max_df_frac=1.0, ngram=1)
    cand_out: dict = {}
    on = sorted(
        tuple(r)
        for r in sparse_cosine_pairs(
            df, "doc_id", candidates_out=cand_out, **kw
        ).collect()
    )
    off = sorted(
        tuple(r)
        for r in sparse_cosine_pairs(
            df, "doc_id", prefix_filter=False, **kw
        ).collect()
    )
    assert on == off and len(on) >= 1
    assert any(a == 1 and b == 2 for a, b, *_ in on)
    # Full-join candidate volume: every pair sharing ANY df>=2 term —
    # recomputed here rather than pinned by hand.
    n_cand = cand_out["candidates"].count()
    from collections import defaultdict

    terms = defaultdict(set)
    for did, text in rows:
        for t in set(text.split()):
            terms[t].add(did)
    full_pairs = {
        (a, b)
        for docs in terms.values()
        if len(docs) >= 2
        for a in docs
        for b in docs
        if a < b
    }
    assert n_cand < len(full_pairs)
    # and losslessness at the candidate level: every emitted pair was
    # a candidate
    cands = {(r.id_a, r.id_b) for r in cand_out["candidates"].collect()}
    assert {(a, b) for a, b, *_ in on} <= cands


def test_word_ngram_terms_short_and_empty_docs(spark):
    """A doc shorter than n words yields its full join once; empty
    text yields an empty array (never a null row explosion)."""
    import pyspark.sql.functions as F

    from curw_flo2d_data_manager_spark.operators.textstats import (
        word_ngram_terms,
    )

    rows = [(1, "only two"), (2, ""), (3, "a b c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.terms
        for r in df.select(
            "doc_id", word_ngram_terms("text", 3).alias("terms")
        ).collect()
    }
    assert got[1] == ["only two"]
    assert got[2] == []
    assert got[3] == ["a b c", "b c d"]


# round-10: inverted index (operators/textstats.py)

def test_inverted_index_postings_and_plan_gate(spark):
    """Known tf/df plus the InferWindowGroupLimit plan shape: the
    row_number <= k filter must produce a map-side Partial
    WindowGroupLimit so at most k postings per term per map partition
    ride the shuffle."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        inverted_index,
    )

    rows = [
        (1, "spark spark spark flink"),
        (2, "spark flink flink"),
        (3, "spark trino"),
        (4, "spark"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = inverted_index(df, "doc_id", k=2, min_df=2, ngram=1)
    got = {
        (r.term, r.rank): (r.df, r.corpus_tf, r.doc_id, r.tf)
        for r in out.collect()
    }
    # spark: df=4, corpus_tf=6, top postings (1, tf3) then (2, tf1 min id)
    assert got[("spark", 1)] == (4, 6, 1, 3)
    assert got[("spark", 2)] == (4, 6, 2, 1)
    assert got[("flink", 1)] == (2, 3, 2, 2)
    assert got[("flink", 2)] == (2, 3, 1, 1)
    assert ("trino", 1) not in got  # df=1 < min_df
    # plan gate on a FRESH (unexecuted) frame — the post-collect
    # queryExecution prints the AQE final plan, whose shape depends on
    # session history (flaked in the full suite). On this tiny
    # in-memory input only the Final group-limit appears (no exchange
    # below it); the map-side Partial shape is gated on real parquet in
    # test_plan_quality.py::test_inverted_index_partial_group_limit.
    fresh = inverted_index(df, "doc_id", k=2, min_df=2, ngram=1)
    plan = fresh._sc._jvm.PythonSQLUtils.explainString(
        fresh._jdf.queryExecution(), "simple"
    )
    assert "WindowGroupLimit" in plan, plan


# round-10: Count-Min sketch (operators/sketches.py)

def test_countmin_bound_and_exactness(spark):
    """est >= exact always (the CM one-sided bound); with a roomy
    sketch and a tiny vocabulary estimates are exact; shrinking the
    width forces collisions that only ever push estimates UP."""
    import pyspark.sql.functions as F

    from curw_flo2d_data_manager_spark.operators.sketches import (
        countmin_build,
        countmin_estimate,
    )

    rows = [(f"t{i % 7}",) for i in range(700)] + [("rare",)] * 3
    toks = spark.createDataFrame(rows, "term string")
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_n"))

    roomy = countmin_build(toks, depth=4, width=256)
    est = countmin_estimate(exact.select("term"), roomy,
                            depth=4, width=256)
    merged = {r.term: (r.exact_n, r.cm_estimate)
              for r in exact.join(est, "term").collect()}
    assert len(merged) == 8
    assert all(e == c for e, c in merged.values())

    tight = countmin_build(toks, depth=2, width=2)
    est2 = countmin_estimate(exact.select("term"), tight,
                             depth=2, width=2)
    merged2 = {r.term: (r.exact_n, r.cm_estimate)
               for r in exact.join(est2, "term").collect()}
    assert all(c >= e for e, c in merged2.values())
    # 8 terms in 2x2 cells MUST collide somewhere
    assert any(c > e for e, c in merged2.values())


# round-10: k-core peeling (operators/components.py)

def test_k_core_peels_to_fixpoint_and_is_idempotent_past_it(spark):
    """A 5-clique with a pendant chain: every chain node peels (the
    peel CASCADES — removing the tail drops the next node under k),
    the clique survives with degree 4; extra rounds past fixpoint
    change nothing; k above the max degree empties the graph."""
    from curw_flo2d_data_manager_spark.operators.components import k_core

    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    chain = [(4, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + chain, "src long, dst long")
    got = {r.node: r.degree for r in k_core(df, k=4, n_rounds=6).collect()}
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}
    # idempotence past fixpoint
    got2 = {r.node: r.degree for r in k_core(df, k=4, n_rounds=9).collect()}
    assert got2 == got
    assert k_core(df, k=5, n_rounds=6).count() == 0


def test_k_core_matches_bruteforce_on_random_graph(spark):
    """Fixed-round k_core equals the classic loop-to-fixpoint peel on
    a random graph whose peel depth is under the round budget."""
    import random

    from curw_flo2d_data_manager_spark.operators.components import k_core

    rng = random.Random(13)
    edges = sorted(
        {(a, b) for a in range(40) for b in range(40)
         if a < b and rng.random() < 0.12}
    )
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    k = 3
    while True:
        drop = [n for n, ns in adj.items() if len(ns) < k]
        if not drop:
            break
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    want = {n: len(ns) for n, ns in adj.items()}
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.degree for r in k_core(df, k=k, n_rounds=12).collect()}
    assert got == want


# round-10: binary quantization (operators/similarity.py)

def test_bq_code_bits_and_word_boundary(spark):
    """Known sign patterns produce the expected packed word, including
    bit 63 (the wrapped min-long) and the zero-is-clear convention."""
    import pyspark.sql.functions as F

    from curw_flo2d_data_manager_spark.operators.similarity import bq_code

    v_all = [1.0] * 64
    v_none = [-1.0] * 32 + [0.0] * 32
    v_bit0 = [1.0] + [-1.0] * 63
    v_bit63 = [-1.0] * 63 + [0.5]
    df = spark.createDataFrame(
        [(1, v_all), (2, v_none), (3, v_bit0), (4, v_bit63)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: r.code
        for r in df.select(
            "vec_id", bq_code(F.col("embedding"), 64).alias("code")
        ).collect()
    }
    assert got[1] == -1          # all 64 bits set
    assert got[2] == 0           # negatives and zeros clear
    assert got[3] == 1
    assert got[4] == -(1 << 63)  # bit 63 alone = min long


def test_bq_hamming_topk_planted_copy_rank1(spark):
    """An exact copy of the query vector shares its full sign pattern
    (hamming 0) and must come back rank 1 with cosine 1.0; the rerank
    is exact cosine so candidate order beyond the copy follows true
    similarity within the short list."""
    import random

    from curw_flo2d_data_manager_spark.operators.similarity import (
        bq_hamming_topk,
    )
    import pyspark.sql.functions as F

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(200)
    ]
    rows.append((999, list(rows[5][1])))  # planted copy of vec 5
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.filter(F.col("vec_id") == 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = bq_hamming_topk(corpus, queries, k=3, candidate_mult=5).collect()
    top = {r.rank: (r.corpus_id, round(r.cosine, 6)) for r in got}
    # rank 1/2 are the vector and its planted copy (id tiebreak), both 1.0
    assert top[1] == (5, 1.0)
    assert top[2] == (999, 1.0)


# round-10: fixed-point weighted PageRank (operators/pagerank.py)

def test_pagerank_fixed_point_matches_float_unweighted(spark):
    """With unit weights and no dangling nodes the fixed-point ranks
    must equal the float operator's to ~1e-9 (truncation loses at most
    a few units in 10^12 per iteration)."""
    from curw_flo2d_data_manager_spark.operators.pagerank import (
        pagerank,
        pagerank_fixed_point,
    )

    # directed triangle plus a chord — strongly connected, no dangling
    edges = [(1, 2), (2, 3), (3, 1), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    f = {r.node: r.rank for r in pagerank(df, iters=5).collect()}
    fp = {
        r.node: r.rank_fp / 1e12
        for r in pagerank_fixed_point(df, iters=5).collect()
    }
    assert set(f) == set(fp)
    for n in f:
        assert abs(f[n] - fp[n]) < 1e-9, (n, f[n], fp[n])


def test_pagerank_fixed_point_weights_shift_rank(spark):
    """On a symmetric 3-cycle (both directions), uniform weights give
    equal ranks; skewing one edge's weight pulls rank toward its
    head. Re-running gives bit-identical BIGINTs (determinism is the
    operator's whole point)."""
    from curw_flo2d_data_manager_spark.operators.pagerank import (
        pagerank_fixed_point,
    )

    sym = []
    for a, b in [(1, 2), (2, 3), (3, 1)]:
        sym += [(a, b, 1), (b, a, 1)]
    df = spark.createDataFrame(sym, "src long, dst long, w long")
    even = {r.node: r.rank_fp
            for r in pagerank_fixed_point(df, weight_col="w").collect()}
    assert len(set(even.values())) == 1  # symmetry -> identical ranks

    skew = [(s, d, 10 if (s, d) == (1, 2) else 1) for s, d, _ in sym]
    df2 = spark.createDataFrame(skew, "src long, dst long, w long")
    got = {r.node: r.rank_fp
           for r in pagerank_fixed_point(df2, weight_col="w").collect()}
    assert got[2] > got[3] and got[2] > got[1]
    again = {r.node: r.rank_fp
             for r in pagerank_fixed_point(df2, weight_col="w").collect()}
    assert got == again


# round-10: fixed-point classifier training (operators/mltrain.py)

def test_train_linear_classifier_matches_python_reference(spark):
    """The distributed fixed-point recurrence equals a pure-Python
    replay of the same integer updates EXACTLY (no tolerance) — the
    operator's whole claim is engine/partitioning-independence."""
    import pyspark.sql.functions as F

    from curw_flo2d_data_manager_spark.operators.mltrain import (
        hash_bucket,
        train_linear_classifier,
        words,
    )

    rows = [
        (1, "alpha beta alpha", 1),
        (2, "beta gamma", 0),
        (3, "alpha delta delta", 1),
        (4, "gamma gamma epsilon", 0),
        (5, "zeta", 1),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, y int")
    B, S, ITERS, LR_DEN = 8, 10**8, 4, 4
    got = {
        r.bucket: r.w_fp
        for r in train_linear_classifier(
            docs, F.col("y"), n_buckets=B, iters=ITERS, scale=S,
            lr_den=LR_DEN,
        ).collect()
    }
    # pure-Python replay over the identical (doc, bucket, count) counts
    feats = docs.select(
        "doc_id", "y", F.explode(words("text")).alias("term")
    ).select("doc_id", "y", hash_bucket(F.col("term"), B).alias("b"))
    x: dict = {}
    ys: dict = {}
    for r in feats.collect():
        x[(r.doc_id, r.b)] = x.get((r.doc_id, r.b), 0) + 1
        ys[r.doc_id] = r.y
    n = len(ys)

    def tdiv(a, b):  # truncating integer division (Spark DIV semantics)
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    w = [0] * B
    for _ in range(ITERS):
        err = {}
        for d in ys:
            m = sum(w[b] * c for (dd, b), c in x.items() if dd == d)
            p = min(max(tdiv(m, 4) + S // 2, 0), S)
            err[d] = p - ys[d] * S
        g = [0] * B
        for (d, b), c in x.items():
            g[b] += err[d] * c
        w = [w[b] - tdiv(g[b], LR_DEN * n) for b in range(B)]
    want = {b: w[b] for b in range(B)}
    assert got == want


def test_train_linear_classifier_separates_planted_labels(spark):
    """A linearly separable toy corpus: the learned weights score
    every positive doc above every negative one, and re-training is
    bit-identical."""
    import pyspark.sql.functions as F

    from curw_flo2d_data_manager_spark.operators.mltrain import (
        hash_bucket,
        train_linear_classifier,
    )

    rows = [(i, "goodword " * 3, 1) for i in range(10)]
    rows += [(100 + i, "badword " * 3, 0) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, y int")
    w = train_linear_classifier(docs, F.col("y"), n_buckets=16, iters=3)
    wm = {r.bucket: r.w_fp for r in w.collect()}
    gb = spark.createDataFrame(
        [("goodword",), ("badword",)], "term string"
    ).select("term", hash_bucket(F.col("term"), 16).alias("b")).collect()
    buckets = {r.term: r.b for r in gb}
    assert buckets["goodword"] != buckets["badword"]  # no hash collision
    assert wm[buckets["goodword"]] > 0 > wm[buckets["badword"]]
    w2 = {r.bucket: r.w_fp
          for r in train_linear_classifier(
              docs, F.col("y"), n_buckets=16, iters=3).collect()}
    assert w2 == wm


def test_auc_exact_matches_pairwise_bruteforce(spark):
    """The per-score-group Mann-Whitney formula equals the O(P·N)
    pairwise definition (1 per correctly-ordered pair, 0.5 per tie) —
    including heavy ties and a perfect / inverted / random mix. The
    oracle shares the same formula, so this independent brute force is
    the test that actually pins it."""
    import itertools
    import random

    from curw_flo2d_data_manager_spark.operators.mltrain import auc_exact

    rng = random.Random(17)
    cases = [
        # heavy ties: two scores only
        [(0.5, 1)] * 3 + [(0.5, 0)] * 2 + [(0.9, 1)] * 2 + [(0.9, 0)],
        # perfect separation and perfect inversion
        [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)],
        [(0.9, 0), (0.8, 0), (0.1, 1), (0.2, 1)],
        # random mix with tie clusters
        [(round(rng.choice([0.2, 0.4, 0.6, 0.8]), 1), rng.randint(0, 1))
         for _ in range(60)],
    ]
    for rows in cases:
        pos = [s for s, y in rows if y == 1]
        neg = [s for s, y in rows if y == 0]
        if not pos or not neg:
            continue
        brute = sum(
            1.0 if p > n else (0.5 if p == n else 0.0)
            for p, n in itertools.product(pos, neg)
        ) / (len(pos) * len(neg))
        df = spark.createDataFrame(rows, "score double, y int")
        got = auc_exact(df, "score", "y").collect()[0]
        assert got.n_pos == len(pos) and got.n_neg == len(neg)
        assert got.auc_num2 == round(brute * 2 * len(pos) * len(neg))
        assert abs(got.auc - round(brute, 6)) < 1e-12


# round-10 self-review regressions

def test_countmin_unseen_term_estimates_zero(spark):
    """A probe term the build never saw must come back with estimate 0
    (its cells are implicit zeros), not silently vanish — and a term
    sharing SOME cells with real mass still takes the min including
    the zero cells."""
    from curw_flo2d_data_manager_spark.operators.sketches import (
        countmin_build,
        countmin_estimate,
    )

    toks = spark.createDataFrame([("seen",)] * 5, "term string")
    sketch = countmin_build(toks, depth=4, width=256)
    probes = spark.createDataFrame(
        [("seen",), ("never_seen_term",)], "term string"
    )
    got = {
        r.term: r.cm_estimate
        for r in countmin_estimate(probes, sketch, depth=4,
                                   width=256).collect()
    }
    assert got == {"seen": 5, "never_seen_term": 0}


def test_bq_hamming_topk_null_embeddings_never_candidates(spark):
    """NULL corpus vectors produce NULL codes, which ASC ordering
    would rank FIRST in every candidate list — they must be dropped
    before candidate generation."""
    import random

    from curw_flo2d_data_manager_spark.operators.similarity import (
        bq_hamming_topk,
    )
    import pyspark.sql.functions as F

    rng = random.Random(9)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)]
    rows += [(900 + i, None) for i in range(5)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = corpus.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = bq_hamming_topk(corpus, queries, k=5, candidate_mult=2).collect()
    assert len(got) == 5
    assert all(r.corpus_id < 900 for r in got)
    assert got[0].corpus_id != 3 or any(r.corpus_id == 3 for r in got)


def test_bq_hamming_topk_null_query_vector_emits_no_rows(spark):
    """Round-10 advice: a NULL QUERY embedding yields NULL hamming
    against every corpus row — its candidate list would fill
    arbitrarily and emit k rows of NULL cosine. NULL query vectors
    must be excluded exactly like NULL corpus vectors; real queries
    in the same batch are unaffected."""
    import random

    from curw_flo2d_data_manager_spark.operators.similarity import (
        bq_hamming_topk,
    )

    rng = random.Random(11)
    corpus = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [
            (1, [rng.uniform(-1, 1) for _ in range(64)]),
            (2, None),
        ],
        "query_id long, embedding array<double>",
    )
    got = bq_hamming_topk(corpus, queries, k=5, candidate_mult=2).collect()
    assert len(got) == 5
    assert all(r.query_id == 1 for r in got)
    assert all(r.cosine is not None for r in got)


def test_k_core_early_exit_and_budget_warning(spark):
    """Round-10 advice: k_core must early-exit once a peel removes
    nothing (result == exact core regardless of n_rounds) and warn
    when the round budget is exhausted mid-peel (result is then a
    superset). A path graph peels one node per round from each end at
    k=2, so a long path is a guaranteed deep-peel fixture."""
    import warnings

    from curw_flo2d_data_manager_spark.operators.components import k_core

    # 12-node path: true 2-core is empty, peel depth is 6 rounds.
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "src long, dst long"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # converged runs must NOT warn
        got = k_core(path, k=2, n_rounds=8).collect()
    assert got == []

    # Budget of 2 rounds leaves a non-empty superset AND warns.
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        partial = k_core(path, k=2, n_rounds=2).collect()
    assert len(partial) > 0
    assert any("SUPERSET" in str(x.message) for x in w)

    # A graph that IS its own 2-core converges on round 1, no warning.
    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        core = {r.node for r in k_core(tri, k=2, n_rounds=3).collect()}
    assert core == {1, 2, 3}


def test_auc_exact_single_class_is_null_not_inf(spark):
    """All-positive (or all-negative) labels have no ranking to
    measure: auc must be NULL, never inf/nan."""
    from curw_flo2d_data_manager_spark.operators.mltrain import auc_exact

    df = spark.createDataFrame(
        [(0.2, 1), (0.9, 1)], "score double, y int"
    )
    r = auc_exact(df, "score", "y").collect()[0]
    assert r.n_pos == 2 and r.n_neg == 0
    assert r.auc is None


def test_pagerank_fixed_point_drops_nonpositive_weights(spark):
    """Zero/negative-weight edges are excluded (a zero total outgoing
    weight would be an ANSI division error); the remaining graph ranks
    normally."""
    from curw_flo2d_data_manager_spark.operators.pagerank import (
        pagerank_fixed_point,
    )

    edges = [(1, 2, 1), (2, 1, 1), (1, 3, 0), (3, 1, -5)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.node: r.rank_fp
           for r in pagerank_fixed_point(df, weight_col="w").collect()}
    # node 3's only edges are nonpositive -> not in the graph at all
    assert set(got) == {1, 2}
    assert got[1] == got[2]  # symmetric 2-cycle


# round-10: exact Gram matrix (operators/similarity.py)

def test_gram_matrix_fixed_point_matches_numpy_exactly(spark):
    """The distributed Gram equals numpy's int64 X.T @ X on the same
    fixed-point elements EXACTLY (no tolerance); NULL vectors are
    skipped; repartitioning cannot change a bit."""
    import random

    import numpy as np

    from curw_flo2d_data_manager_spark.operators.similarity import (
        gram_matrix_fixed_point,
    )

    rng = random.Random(21)
    dim = 6
    vecs = [[rng.uniform(-2, 2) for _ in range(dim)] for _ in range(40)]
    rows = [(i, v) for i, v in enumerate(vecs)] + [(999, None)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(7)
    got = {
        (r.i, r.j): r.gram
        for r in gram_matrix_fixed_point(df, dim=dim, scale=10_000).collect()
    }
    X = np.array(
        [[round(x * 10_000) for x in v] for v in vecs], dtype=np.int64
    )
    G = X.T @ X
    assert len(got) == dim * (dim + 1) // 2
    for i in range(dim):
        for j in range(i, dim):
            assert got[(i, j)] == int(G[i, j]), (i, j)
