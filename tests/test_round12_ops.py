"""Round-12 operators: BPE subword token counting (greedy
longest-match over a fixed merge table) and HTML/markup stripping."""

import duckdb
import pytest
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.operators.bpe import (
    DEFAULT_BPE_VOCAB,
    bpe_piece_count,
    bpe_piece_count_sql,
    bpe_token_counts,
)
from curw_flo2d_data_manager_spark.operators.markup import (
    strip_html,
    strip_html_sql,
    strip_markup,
)
from curw_flo2d_data_manager_spark.operators.textstats import epoch_plan


def _greedy_pieces(word: str, vocab: list[str]) -> int:
    """Reference greedy longest-match encoder (plain Python) — same
    MAX_STEPS horizon + residue-chars-count-1-each rule as the
    expression fold AND the pandas carve-out (round-12 advice: the
    three paths must agree on >horizon words)."""
    from curw_flo2d_data_manager_spark.operators.bpe import MAX_STEPS

    pos, cnt = 0, 0
    while pos < len(word) and cnt < MAX_STEPS:
        best = 1
        for t in vocab:
            if word.startswith(t, pos):
                best = max(best, len(t))
        pos += best
        cnt += 1
    return cnt + (len(word) - pos)


def py_strip_replay(t):
    """Plain-`re` replay of the full markup chain (regex strips,
    named entities, numeric character references, final ampersand
    pass, whitespace collapse) — the third engine in the agreement
    tests."""
    import re as _re

    from curw_flo2d_data_manager_spark.operators.markup import (
        _AMP_FINAL_PAT,
        _ENTITY_STEPS,
        _NUMREF_PAT,
        _REGEX_STEPS,
    )

    for pat, rep in _REGEX_STEPS:
        t = _re.sub(pat, rep, t)
    for lit, rep in _ENTITY_STEPS:
        t = t.replace(lit, rep)

    def dec(m):
        body = m.group(1)
        n = int(body[1:], 16) if body[0] in "xX" else int(body)
        if 1 <= n <= 0x10FFFF and not (0xD800 <= n <= 0xDFFF) and n != 38:
            return chr(n)
        return m.group(0)

    t = _re.sub(_NUMREF_PAT, dec, t)
    t = _re.sub(_AMP_FINAL_PAT, "&", t)
    return _re.sub(r"\s+", " ", t).strip()


class TestBpe:
    def test_planted_merges(self, spark):
        # hand-traced greedy segmentations against the default vocab
        cases = {
            # th-e? no: 'the' in vocab -> 1 piece
            "the": 1,
            # inter-n-a-tion-al-i-z-a-tion? greedy from pos0: 'in'(2)
            # vs 'it'? longest prefix match: 'in' len2... but 'ing'?
            # not a prefix. Use the reference encoder as truth below;
            # here pin a few tiny fully-derivable ones:
            "a": 1,   # no match -> 1 char
            "ed": 1,  # exact vocab token
            "": 0,
        }
        df = spark.createDataFrame(
            [(w,) for w in cases], "word string"
        ).withColumn("pieces", bpe_piece_count("word"))
        got = {r["word"]: r["pieces"] for r in df.collect()}
        for w, want in cases.items():
            assert got[w] == want, w

    def test_matches_reference_encoder(self, spark):
        words = [
            "internationalization", "supercalifragilistic",
            "running", "jumped", "station", "antidisestablishment",
            "xyzzy", "q", "corporation", "the", "theater",
            "a" * 60,  # past the fold horizon: residue chars count 1
        ]
        df = spark.createDataFrame(
            [(w,) for w in words], "word string"
        ).withColumn("pieces", bpe_piece_count("word"))
        got = {r["word"]: r["pieces"] for r in df.collect()}
        for w in words:
            assert got[w] == _greedy_pieces(w, DEFAULT_BPE_VOCAB), w

    def test_sql_twin_bit_identical(self, spark):
        words = ["internationalization", "the", "xyzzy", "rotation",
                 "perpendicular", "contentment", "z" * 50]
        df = spark.createDataFrame(
            [(w,) for w in words], "word string"
        ).withColumn("pieces", bpe_piece_count("word"))
        sp = {r["word"]: r["pieces"] for r in df.collect()}
        con = duckdb.connect()
        expr = bpe_piece_count_sql("word")
        for w in words:
            du = con.execute(
                f"SELECT {expr} FROM (SELECT '{w}' AS word)"
            ).fetchone()[0]
            assert sp[w] == du, w

    def test_doc_counts_and_custom_vocab(self, spark):
        df = spark.createDataFrame(
            [(1, "aa bb aa"), (2, "aabb"), (3, "")],
            "doc_id int, text string",
        )
        out = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
            for r in bpe_token_counts(df, vocab=["aa", "b"]).collect()
        }
        # doc1: aa(1) bb(2: b+b) aa(1) -> 3 words, 4 pieces
        assert out[1] == (3, 4)
        # doc2: aabb -> aa + b + b = 3 pieces
        assert out[2] == (1, 3)
        # empty docs have no word rows and are omitted
        assert 3 not in out

    def test_epoch_plan_accepts_bpe_column(self, spark):
        docs = spark.createDataFrame(
            [(1, "the the the the", "en"), (2, "xyzzy", "de")],
            "doc_id int, text string, lang string",
        )
        with_bpe = docs.join(
            bpe_token_counts(docs), "doc_id"
        )
        plan = epoch_plan(
            with_bpe, ["lang"], target_tokens=100,
            token_count_col="n_bpe_tokens",
        )
        rows = {r["lang"]: r for r in plan.collect()}
        # n_tokens must be the BPE counts, not whitespace words —
        # derive expected from the operator itself
        exp = {
            r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_token_counts(docs).collect()
        }
        assert rows["en"]["n_tokens"] == exp[1]
        assert rows["de"]["n_tokens"] == exp[2]


class TestBpeLargeVocab:
    def test_pandas_path_matches_expression_and_reference(self, spark):
        # >EXPR_VOCAB_LIMIT tokens forces the Arrow hash-set encoder;
        # the two paths and the plain-Python reference must agree
        # word-for-word on the same vocab.
        import random

        from curw_flo2d_data_manager_spark.operators.bpe import (
            EXPR_VOCAB_LIMIT,
        )

        rng = random.Random(12)
        alpha = "abcdefgh"
        big_vocab = sorted(
            {
                "".join(rng.choice(alpha) for _ in range(rng.randint(2, 5)))
                for _ in range(EXPR_VOCAB_LIMIT * 3)
            }
        )
        assert len(big_vocab) > EXPR_VOCAB_LIMIT
        docs = [
            (i, " ".join(
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
                for _ in range(rng.randint(1, 8))
            ))
            for i in range(40)
        ]
        df = spark.createDataFrame(docs, "doc_id int, text string")
        large = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
            for r in bpe_token_counts(df, vocab=big_vocab).collect()
        }
        # expression path on the same vocab (bypass the size switch)
        from curw_flo2d_data_manager_spark.operators import bpe as bpe_mod
        from pyspark.sql import functions as SF

        occ = (
            df.select(SF.col("doc_id").alias("_id"),
                      SF.explode(bpe_mod.words("text")).alias("word"))
            .groupBy("_id", "word").agg(SF.count(SF.lit(1)).alias("cnt"))
        )
        enc = occ.select("word").distinct().withColumn(
            "pieces", bpe_mod.bpe_piece_count("word", big_vocab)
        )
        expr = {
            r["_id"]: (r["n_words"], r["n_bpe_tokens"])
            for r in occ.join(enc, "word").groupBy("_id").agg(
                SF.sum("cnt").cast("long").alias("n_words"),
                SF.sum(SF.col("pieces") * SF.col("cnt")).cast("long")
                .alias("n_bpe_tokens"),
            ).collect()
        }
        assert large == expr
        # spot-check vs the plain-Python reference on the word level
        for _, text in docs[:10]:
            exp = sum(_greedy_pieces(w, big_vocab) for w in text.split())
            did = [d for d, t in docs if t == text][0]
            if did in large:
                assert large[did][1] == exp


class TestBpeHorizon:
    def test_over_horizon_word_all_paths_agree(self, spark):
        """The round-12 advice's verified divergence ('x'*40+'the'*4:
        fold=52 vs unbounded-greedy=44) — all four paths now apply the
        same MAX_STEPS horizon + residue rule."""
        import pandas as pd

        from curw_flo2d_data_manager_spark.operators.bpe import (
            MAX_STEPS,
            _encode_words_pandas,
        )

        words = [
            "x" * MAX_STEPS + "the" * 4,
            "x" * (MAX_STEPS + 25),
            "the" * (MAX_STEPS + 3),
            "a" * 39 + "tion" * 5,
        ]
        df = spark.createDataFrame([(w,) for w in words], "word string")
        sp = {
            r["word"]: r["p"]
            for r in df.select(
                "word", bpe_piece_count("word").alias("p")
            ).collect()
        }
        con = duckdb.connect()
        expr = bpe_piece_count_sql("word")
        enc = _encode_words_pandas(DEFAULT_BPE_VOCAB)
        pandas_counts = list(enc(pd.Series(words, dtype=object)))
        for w, pc in zip(words, pandas_counts):
            du = con.execute(
                f"SELECT {expr} FROM (SELECT '{w}' AS word)"
            ).fetchone()[0]
            ref = _greedy_pieces(w, DEFAULT_BPE_VOCAB)
            assert sp[w] == du == pc == ref, w
        # 40 one-char steps consume the x-run; 12 residue chars
        assert sp["x" * MAX_STEPS + "the" * 4] == MAX_STEPS + 12


class TestMarkup:
    def test_basic_strip(self, spark):
        html = (
            '<html><head><style>p {color: red}</style></head>'
            '<body><!-- note --><p class="x">A &amp; B</p>'
            '<script>var x = "<p>ignored</p>";</script>'
            "tail</body></html>"
        )
        df = spark.createDataFrame([(html,)], "h string")
        got = df.select(strip_html("h").alias("t")).collect()[0]["t"]
        assert got == "A & B tail"

    def test_entities_and_escaped_markup(self, spark):
        # &amp;lt; is escaped TEXT and must render as '&lt;' -> wait:
        # one decode pass: &amp;lt; -> &lt; (amp decoded last, single
        # pass, no re-scan) and &lt;b&gt; -> <b> (not stripped: tags
        # were removed before entity decode).
        df = spark.createDataFrame(
            [("&lt;b&gt;bold&lt;/b&gt; &amp; &quot;q&quot; &#39;s&#39; &nbsp;x",)],
            "h string",
        )
        got = df.select(strip_html("h").alias("t")).collect()[0]["t"]
        assert got == "<b>bold</b> & \"q\" 's' x"

    def test_malformed_markup(self, spark):
        cases = {
            "<unclosed tag": "<unclosed tag",  # no '>' -> left alone
            "a <b>nested <i>deep</i></b> z": "a nested deep z",
            # no closing </script>: the block pattern can't match,
            # but the opening TAG itself still strips (step 3)
            "<script>never closed": "never closed",
            # '<>' has no tag-start char -> text; '</>' is a tag
            "<>empty</>": "<>empty",
            # loose angle brackets in prose survive (round-12 advice:
            # the old <[^>]*> swallowed everything between them)
            "x < y and z > 0 stays": "x < y and z > 0 stays",
            # script/style PREFIXED tags are ordinary tags -- content
            # survives (round-12 advice)
            "<script-loader>keep</script-loader>": "keep",
            "<styleguide>and me</styleguide>": "and me",
            "<?xml version='1'?>pi<!DOCTYPE html>doc": "pi doc",
        }
        df = spark.createDataFrame(
            [(k,) for k in cases], "h string"
        ).select(F.col("h"), strip_html("h").alias("t"))
        got = {r["h"]: r["t"] for r in df.collect()}
        for k, want in cases.items():
            assert got[k] == want, k

    def test_sql_twin_bit_identical(self, spark):
        samples = [
            '<html><style>a{}</style><p x="1">T &amp; U</p><!--c--></html>',
            "&lt;b&gt; &amp;amp; <script a>s</script >done",
            "plain text, no markup & loose < b > angle",
            "<SCRIPT>UPPER</SCRIPT><STYLE>s</STYLE><P>k</P>",
        ]
        df = spark.createDataFrame(
            [(s,) for s in samples], "h string"
        ).select("h", strip_html("h").alias("t"))
        sp = {r["h"]: r["t"] for r in df.collect()}
        con = duckdb.connect()
        expr = strip_html_sql("h")
        for s in samples:
            q = s.replace("'", "''")
            du = con.execute(
                f"SELECT {expr} FROM (SELECT '{q}' AS h)"
            ).fetchone()[0]
            assert sp[s] == du, s

    def test_strip_markup_df(self, spark):
        df = spark.createDataFrame(
            [(1, "<p>hi</p>")], "id int, text string"
        )
        out = strip_markup(df).collect()[0]
        assert out["text"] == "hi"

    def test_numeric_character_references(self, spark):
        cases = {
            # decimal / hex / astral decode to the real codepoint
            "H&#72;I&#x49;": "HHII",
            "dash&#8212;here": "dash—here",
            "poo&#128169;&#x1F4A9;done": "poo\U0001f4a9\U0001f4a9done",
            # every ampersand spelling decodes in the LAST pass
            "&#38; &#038; &#x26; &#X026; &amp;": "& & & & &",
            # a decoded '&' never creates a new decodable sequence
            "&#38;amp;": "&amp;",
            "&amp;#65;": "&#65;",
            # invalid: zero, surrogates, out of range, malformed --
            # verbatim on both engines (documented)
            "&#0;z": "&#0;z",
            "&#xD800;z": "&#xD800;z",
            "&#1114112;z": "&#1114112;z",
            "&#999999999;z": "&#999999999;z",
            "&#;&#x;&#xyz;": "&#;&#x;&#xyz;",
            # top of range decodes
            "&#x10FFFF;&#1114111;": "\U0010ffff\U0010ffff",
            # old literal-step forms still decode (now numerically)
            "&#34;dq&#39;sq": '"dq\'sq',
        }
        df = spark.createDataFrame(
            [(k,) for k in cases], "h string"
        ).select("h", strip_html("h").alias("t"))
        got = {r["h"]: r["t"] for r in df.collect()}
        con = duckdb.connect()
        expr = strip_html_sql("h")
        for k, want in cases.items():
            assert got[k] == want, (k, got[k])
            q = k.replace("'", "''")
            du = con.execute(
                f"SELECT {expr} FROM (SELECT '{q}' AS h)"
            ).fetchone()[0]
            assert du == want, (k, du)
            assert py_strip_replay(k) == want, k


# ---------------------------------------------------------------- property
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# max_size 60 > MAX_STEPS so the fold's horizon + residue rule is
# exercised by the property, not just the dedicated unit test
# (round-12 advice: the old bound of 18 never crossed the horizon).
_word_st = st.text(alphabet="abcdeioqxz", min_size=0, max_size=60)


class TestRound12Properties:
    @_PROP
    @given(ws=st.lists(_word_st, min_size=1, max_size=15, unique=True))
    def test_bpe_fold_four_way_agreement(self, spark, ws):
        """Spark fold == DuckDB list_reduce twin == plain-Python greedy
        reference == pandas carve-out encoder, on arbitrary lowercase
        words incl. empty strings and >horizon lengths."""
        import pandas as pd

        from curw_flo2d_data_manager_spark.operators.bpe import (
            _encode_words_pandas,
        )

        df = spark.createDataFrame(
            [(w,) for w in ws], "word string"
        ).withColumn("pieces", bpe_piece_count("word"))
        sp = {r["word"]: r["pieces"] for r in df.collect()}
        con = duckdb.connect()
        expr = bpe_piece_count_sql("word")
        enc = _encode_words_pandas(DEFAULT_BPE_VOCAB)
        pandas_counts = dict(zip(ws, enc(pd.Series(ws, dtype=object))))
        for w in ws:
            ref = _greedy_pieces(w, DEFAULT_BPE_VOCAB)
            du = con.execute(
                f"SELECT {expr} FROM (SELECT '{w}' AS word)"
            ).fetchone()[0]
            assert sp[w] == ref == du == pandas_counts[w], w

    @_PROP
    @given(
        frags=st.lists(
            st.sampled_from([
                "plain text", "<b>", "</b>", "<script>", "</script>",
                "<style>x{}</style>", "<!--c-->", "&amp;", "&lt;", "&gt;",
                "&nbsp;", "a < b", "x>y", '<p class="k">', "&#39;",
                "<unclosed", "  ", "Z",
                # numeric character references (round-13): ascii, bmp,
                # astral, ampersand forms, invalid/out-of-range
                "&#65;", "&#x42;", "&#8212;", "&#x1F4A9;", "&#38;",
                "&#x26;", "&#0;", "&#xD800;", "&#999999999;", "&#;",
                "<script-loader>k</script-loader>", "<?pi?>",
            ]),
            min_size=1,
            max_size=12,
        )
    )
    def test_strip_html_cross_engine_agreement(self, spark, frags):
        """Spark chain == DuckDB chain == Python `re` replay on random
        concatenations of markup fragments (incl. malformed)."""
        s = "".join(frags)
        df = spark.createDataFrame([(s,)], "h string")
        sp = df.select(strip_html("h").alias("t")).collect()[0]["t"]
        con = duckdb.connect()
        q = s.replace("'", "''")
        du = con.execute(
            f"SELECT {strip_html_sql('h')} FROM (SELECT '{q}' AS h)"
        ).fetchone()[0]
        assert sp == py_strip_replay(s) == du, s
