"""Round-14 operator changes: JVM-native lang scores (regexp_count over
the joined token stream) and hashed shingles built from per-word hashes
— both must be EXACTLY equivalent to the interpreted-HOF forms they
replace (the text_lang_id and minhash oracles replay the old semantics).
"""

import pytest
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.functions.plan_literals import lit_array
from curw_flo2d_data_manager_spark.operators.textstats import (
    LANG_MARKERS,
    lang_id,
    lang_scores,
    words,
)
from curw_flo2d_data_manager_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signature,
    shingle_hashes_from_word_hashes,
    with_shingle_hashes,
    word_shingles,
)


# the pre-round-14 reference implementation: one interpreted
# filter(w, array_contains(markers, x)) pass per language
def _hof_lang_scores(col, tokenized=False):
    w = (F.col(col) if isinstance(col, str) else col) if tokenized else words(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = lit_array(markers)
        out[lang] = F.size(F.filter(w, lambda x: F.array_contains(arr, x)))
    return out


EDGE_TEXTS = [
    (1, ""),
    (2, "the the the"),                      # multiplicity
    (3, "el la de que los"),
    (4, "the el the el"),                    # en/es tie → dict order
    (5, "  De   QUE  nao   "),               # normalization
    (6, "的 是 了 在 我"),                    # CJK markers
    (7, "и в не на что"),                    # Cyrillic markers
    (8, "xyzzy plugh"),                      # zero hits → unknown
    (9, None),                               # NULL text
    (10, "the-quick la-la"),                 # hyphens survive normalize
    (11, "thé thê the's the, the."),         # punctuation boundaries
    (12, "la los las les el il den"),        # prefix-overlapping markers
    (13, "the und die der von och att"),
]


def test_lang_scores_exact_multiplicity_vs_hof(spark):
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id int, text string").withColumn(
        "_w", words("text")
    )
    checks = []
    for lang in LANG_MARKERS:
        checks.append(
            _hof_lang_scores("text")[lang]
            .eqNullSafe(lang_scores("text")[lang])
            .alias(f"raw_{lang}")
        )
        checks.append(
            _hof_lang_scores(F.col("_w"), tokenized=True)[lang]
            .eqNullSafe(lang_scores(F.col("_w"), tokenized=True)[lang])
            .alias(f"tok_{lang}")
        )
    checks.append(
        _hof_lang_scores("text")["en"].eqNullSafe(lang_scores("text")["en"]).alias("c")
    )
    res = df.select(*checks)
    agg = res.agg(
        *[F.sum(F.when(F.col(c), 0).otherwise(1)).alias(c) for c in res.columns]
    ).collect()[0]
    bad = {k: v for k, v in agg.asDict().items() if v != 0}
    assert not bad, f"lang score mismatches vs HOF reference: {bad}"


def test_lang_id_argmax_and_ties_unchanged(spark):
    df = spark.createDataFrame(EDGE_TEXTS, "doc_id int, text string")
    rows = {
        r["doc_id"]: r["l"]
        for r in df.select("doc_id", lang_id("text").alias("l")).collect()
    }
    assert rows[2] == "en"
    assert rows[4] == "en"          # tie breaks by LANG_MARKERS order
    assert rows[6] == "zh"
    assert rows[7] == "ru"
    assert rows[8] == "unknown"
    assert rows[1] == "unknown"
    # multiplicity matters: 'de que nao' — pt needs repeated markers
    assert rows[5] in ("es", "pt")  # both share 'de'/'que'; pinned below
    # exact counts: es scores de+que=2, pt scores de+que+nao(unaccented
    # form not a marker)=2 → tie → dict order puts es first
    assert rows[5] == "es"


def test_xxhash64_null_children_are_skipped(spark):
    """shingle_hashes_from_word_hashes' short-document convention
    depends on hash expressions skipping NULL children."""
    r = spark.range(1).select(
        F.xxhash64(F.lit(7).cast("long")).alias("a"),
        F.xxhash64(F.lit(7).cast("long"), F.lit(None).cast("long")).alias("b"),
        F.xxhash64(
            F.lit(None).cast("long"), F.lit(7).cast("long"), F.lit(None).cast("long")
        ).alias("c"),
    ).collect()[0]
    assert r.a == r.b == r.c


def test_shingle_hashes_match_string_shingles_structurally(spark):
    """Hashed shingles must be a bijective image of the string shingle
    set per document: same cardinality, and identical texts (incl.
    short docs) map to identical hash sets."""
    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e f"),          # verbatim copy
        (3, "a b"),                  # shorter than n
        (4, "a b"),
        (5, "one"),                  # single word
        (6, ""),                     # empty
        (7, "x y z x y z x y z"),    # repeated grams collapse
        (8, "a b c a b c"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = (
        with_shingle_hashes(df, "text", "_sh", 3)
        .withColumn("_str_sh", word_shingles("text", 3))
        .select("doc_id", "_sh", "_str_sh")
        .collect()
    )
    by = {r["doc_id"]: r for r in out}
    for r in out:
        assert len(set(r["_sh"])) == len(r["_sh"])  # distinct
        assert len(r["_sh"]) == len(r["_str_sh"]), r
    assert sorted(by[1]["_sh"]) == sorted(by[2]["_sh"])
    assert sorted(by[3]["_sh"]) == sorted(by[4]["_sh"])
    assert sorted(by[1]["_sh"]) != sorted(by[3]["_sh"])
    # repeated-gram doc: distinct grams only
    assert len(by[7]["_sh"]) == len(set(by[7]["_str_sh"]))


def test_shingle_word_hash_projection_not_collapsed(spark):
    """The per-word-hash array must be materialized ONCE — if
    CollapseProject inlined it into the shingle lambda, the word-hash
    transform would appear n times (O(words × positions) rehash)."""
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
    out = with_shingle_hashes(df, "text", "_sh", 3)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # exactly one word-hash transform over the split output
    assert plan.count("lambdafunction(xxhash64(lambda") == 1, plan


def test_minhash_planted_copies_still_collide(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "completely different text with no overlap at all here"),
            (4, "another unrelated document about spark partitioning plans"),
        ],
        "doc_id int, text string",
    )
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, bands=4, jaccard_threshold=1.0
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert all(r["jaccard"] == 1.0 for r in pairs)


def test_minhash_signature_over_hashed_shingles(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "q r s t u v w x")],
        "doc_id int, text string",
    )
    sigs = (
        with_shingle_hashes(df, "text", "_sh", 3)
        .withColumn("_sig", minhash_signature(F.col("_sh"), 8))
        .select("doc_id", "_sig")
        .collect()
    )
    by = {r["doc_id"]: r["_sig"] for r in sigs}
    assert by[1] == by[2]
    assert by[1] != by[3]
    assert all(len(s) == 8 for s in by.values())


# ---------------------------------------------------------------- packing
def test_pack_label_count_capped_independent_of_shuffle_partitions(spark):
    """Round-14 fix: the per-row label expression must be O(64) struct
    compares even when the session runs 2,000 shuffle partitions —
    labels need balance, not a 1:1 partition mapping."""
    from curw_flo2d_data_manager_spark.operators.packing import pack_sequences

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2000")
    try:
        rows = [(i, 10 + (i * 7) % 90) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id int, n_tok int")
        packed = pack_sequences(
            df, "doc_id", "n_tok", budget=300, label_col="_lbl"
        ).collect()
        labels = {r["_lbl"] for r in packed}
        assert len(labels) <= 65, f"{len(labels)} labels leaked through the cap"
        # bins still exactly match the sequential reference
        start, ref = 0, {}
        for i, t in rows:
            ref[i] = (start // 300, start)
            start += t
        got = {r.doc_id: (r.bin_id, r.bin_offset) for r in packed}
        assert got == ref
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_pack_null_order_rows_kept_and_packed_first(spark):
    """ADVICE r13: a nullable order_col (e.g. a quality score) must
    neither crash the boundary sample (TypeError on sorted()) nor drop
    rows through a NULL label in the equi-join — NULLs sort first."""
    from curw_flo2d_data_manager_spark.operators.packing import pack_sequences

    rows = [(i, 10 + (i * 7) % 90, None if i % 50 == 3 else float(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id int, n_tok int, score double")
    packed = pack_sequences(df, "doc_id", "n_tok", budget=300, order_col="score")
    got = {r.doc_id: (r.bin_id, r.bin_offset) for r in packed.collect()}
    assert len(got) == 300, "NULL-order rows were dropped"
    # sequential reference: NULLs first (by id), then by (score, id)
    ordered = sorted(rows, key=lambda r: (r[2] is not None, r[2] if r[2] is not None else 0.0, r[0]))
    start, ref = 0, {}
    for i, t, _ in ordered:
        ref[i] = (start // 300, start)
        start += t
    assert got == ref


def test_session_shuffle_partitions_tolerates_non_numeric(spark):
    from curw_flo2d_data_manager_spark.operators.packing import (
        _session_shuffle_partitions,
    )

    class _Conf:
        def get(self, k, d=None):
            return "auto"

    class _SC:
        defaultParallelism = 12

    class _Fake:
        conf = _Conf()
        sparkContext = _SC()

    assert _session_shuffle_partitions(_Fake()) == 12
    assert _session_shuffle_partitions(spark) >= 1


def test_tiny_host_cap_beats_floor(monkeypatch):
    """ADVICE r13: on a 3-GiB host the MemTotal-2GiB cap must win over
    the 2g floor (1g, not 2g)."""
    from curw_flo2d_data_manager_spark import session as sess

    real_open = open

    def fake_meminfo(path, *a, **k):
        if path == "/proc/meminfo":
            import io

            return io.StringIO("MemTotal:        3145728 kB\n")
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", fake_meminfo)
    assert sess._default_driver_memory() == "1g"


def test_mean_word_length_identity_no_fold(spark):
    """Round-14: Σlen(words) == length(norm) - (n_words - 1) on the
    single-spaced normalized string — the closed form must equal the
    per-word fold exactly on every edge case."""
    from curw_flo2d_data_manager_spark.operators.textstats import (
        mean_word_length,
        words,
    )

    rows = [
        (1, "plain words here"),
        (2, "  doubled   spaces\tand\ntabs  "),
        (3, "punct!!! stripped??? here..."),
        (4, "hyphen-ated stays one-word"),
        (5, "的 是 了 cjk survives"),
        (6, ""),
        (7, "x"),
        (8, None),
        (9, "ALL CAPS 123 mixed99"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    w = words("text")
    fold = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ) / F.greatest(F.size(w), F.lit(1))
    bad = df.select(
        F.sum(
            F.when(mean_word_length("text").eqNullSafe(fold), 0).otherwise(1)
        ).alias("b")
    ).collect()[0].b
    assert bad == 0


def test_stopword_ratio_matches_hof_form(spark):
    from curw_flo2d_data_manager_spark.operators.textstats import (
        EN_STOPWORDS,
        stopword_ratio,
        words,
    )
    from curw_flo2d_data_manager_spark.functions.plan_literals import lit_array

    rows = [(i, t) for i, (_, t) in enumerate(EDGE_TEXTS)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    w = words("text")
    sw = lit_array(EN_STOPWORDS)
    old = F.size(F.filter(w, lambda x: F.array_contains(sw, x))) / F.greatest(
        F.size(w), F.lit(1)
    )
    bad = df.select(
        F.sum(
            F.when(stopword_ratio("text").eqNullSafe(old), 0).otherwise(1)
        ).alias("b")
    ).collect()[0].b
    assert bad == 0


def test_literal_rows_df_matches_createdataframe(spark):
    """literal_rows_df must be row- and schema-identical to the
    spark.createDataFrame it replaces (incl. None cells), while keeping
    the plan a pure JVM projection — no Python-RDD scan."""
    from curw_flo2d_data_manager_spark.functions.plan_literals import (
        literal_rows_df,
    )

    rows = [
        (0, 0, "K              268", None),
        (1, 5, None, 2.5),
        (2, -1, "x", -99999.0),
    ]
    ddl = "block_rank int, intra_rank long, line string, v double"
    a = literal_rows_df(spark, rows, ddl)
    b = spark.createDataFrame(rows, ddl)
    # names+types identical; nullability is intentionally tighter
    # (literal columns without NULLs infer non-nullable — accurate)
    assert [(f.name, f.dataType) for f in a.schema.fields] == [
        (f.name, f.dataType) for f in b.schema.fields
    ]
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan and "PythonRDD" not in plan


def test_simhash_pairs_match_brute_force_and_dedupe_by_first_band(spark):
    """simhash_near_pairs' first-matching-band predicate (which replaced
    the dropDuplicates shuffle) must yield exactly the brute-force
    popcount pair set — one row per qualifying pair even when the pair
    collides in several bands — and the pairing plan must read the
    signature from the tracked persist, not recompute the fold per
    join side."""
    import random

    from curw_flo2d_data_manager_spark.operators.dedup import (
        release_caches,
        simhash64,
        simhash_near_pairs,
    )

    random.seed(42)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(200):
        base = [random.choice(vocab) for _ in range(30)]
        rows.append((i, " ".join(base)))
        if i % 3 == 0:  # verbatim copy: hamming 0, all 4 bands collide
            rows.append((10_000 + i, " ".join(base)))
        if i % 5 == 0:  # light mutation: small hamming, 1-3 bands
            mut = list(base)
            mut[0] = random.choice(vocab)
            rows.append((20_000 + i, " ".join(mut)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    pairs = simhash_near_pairs(df, "doc_id", max_hamming=3)
    got = sorted((r.id_a, r.id_b, r.hamming) for r in pairs.collect())

    sigs = simhash64(df, "doc_id")
    a = sigs.select(F.col("doc_id").alias("ia"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("ib"), F.col("simhash").alias("sb"))
    want = sorted(
        (r.ia, r.ib, r.h)
        for r in a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("h", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("h") <= 3)
        .collect()
    )
    assert got == want
    # multi-band collisions were actually exercised (verbatim copies
    # collide in all 4 bands) and produced exactly one row each
    keys = [(x[0], x[1]) for x in got]
    assert len(keys) == len(set(keys))
    assert any(h == 0 for _, _, h in got)
    # plan gate: both self-join sides read the persisted signature
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2
    release_caches()
