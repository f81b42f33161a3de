"""Tokenizer-aware (BPE-style subword) token counting.

Training-data pipelines budget corpora in TOKENIZER tokens, not
whitespace words (a 100-char German compound is one "word" but many
subwords; CJK text has no whitespace at all).  This module implements
greedy longest-match subword segmentation against a fixed merge
vocabulary — the public WordPiece/BPE-inference scheme (Sennrich et
al. 2016; Wu et al. 2016): at each position consume the LONGEST
vocabulary token that prefixes the remainder, falling back to one
character when nothing matches.

Everything is integer arithmetic over a pure-expression fold
(`aggregate` higher-order function), so counts are bit-exact
cross-engine and the DuckDB oracle replays the identical fold with
``list_reduce`` — no Python UDF anywhere.

Scale shape (100 TB): the fold runs over the DISTINCT word
vocabulary, not the corpus token stream — Zipf makes |vocab| orders
of magnitude smaller than |occurrences|, so the expensive encode is
vocabulary-scaled while the corpus only pays one (doc_id, word)
partial-aggregated count shuffle plus one word-keyed join.  The
distinct-word relation scales with the corpus vocabulary, so the join
is explicitly ``shuffle_merge``-hinted (the round-11 AQE
compressed-stats auto-broadcast hazard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.operators.textstats import words

# Fixed default merge vocabulary: frequent English subword units.
# Greedy longest-match means order is irrelevant — only the token SET
# matters.  A trained tokenizer would broadcast its own (typically
# 32k-256k entries); the fold below only assumes the table fits in an
# array literal / broadcast, which any production vocab does.
DEFAULT_BPE_VOCAB = [
    "the", "tion", "ing", "ment", "able", "ally", "ness", "ous",
    "and", "ed", "er", "es", "re", "in", "on", "at", "en", "an",
    "or", "ar", "al", "st", "nt", "th", "he", "le", "de", "se",
    "it", "is", "ou", "ro", "ic", "of", "to", "ve", "ly", "un",
    "co", "con", "pro", "per", "ter", "ent", "ion", "ate", "ity",
]

# pos advances <= max(len(token)) per step, so after MAX_STEPS steps
# pos <= MAX_STEPS * 8 < 1000 — the base-1000 (pos, cnt) packing in
# the fold below cannot collide.  Residue chars past the fold horizon
# count 1 token each (the finish lambda), so counts stay well-defined
# for arbitrarily long "words".
MAX_STEPS = 40
_PACK = 1000


def _vocab_sql_array(vocab: list[str]) -> str:
    toks = ", ".join("'" + t.replace("'", "''") + "'" for t in vocab)
    return f"array({toks})"


def bpe_piece_count(word: str, vocab: list[str] | None = None) -> Column:
    """Expression: number of greedy longest-match subword pieces of
    the string column ``word`` (an SQL identifier/expression string).

    The fold carries ``pos * 1000 + cnt`` as one BIGINT through
    ``aggregate`` — a single runtime-iterated lambda, NOT an unrolled
    expression tree (the round-1 2^n fold hazard does not apply to
    higher-order functions).  The finish lambda adds one token per
    character left past the MAX_STEPS horizon.
    """
    vocab = DEFAULT_BPE_VOCAB if vocab is None else vocab
    va = _vocab_sql_array(vocab)
    return F.expr(
        f"""aggregate(
  sequence(1, {MAX_STEPS}),
  0L,
  (acc, i) -> IF(acc DIV {_PACK} >= length({word}), acc,
    (acc DIV {_PACK} + greatest(coalesce(array_max(transform(
        filter({va},
               t -> substring({word}, CAST(acc DIV {_PACK} AS INT) + 1,
                              length(t)) = t),
        t -> length(t))), 1), 1)) * {_PACK} + acc % {_PACK} + 1),
  acc -> acc % {_PACK}
         + greatest(CAST(length({word}) AS BIGINT) - acc DIV {_PACK}, 0L)
)"""
    )


def bpe_piece_count_sql(word: str, vocab: list[str] | None = None) -> str:
    """DuckDB twin of :func:`bpe_piece_count` — the identical integer
    fold via ``list_reduce`` (seeded by a prepended 0), so Spark and
    the oracle agree bit-for-bit on every word."""
    vocab = DEFAULT_BPE_VOCAB if vocab is None else vocab
    toks = ", ".join("'" + t.replace("'", "''") + "'" for t in vocab)
    fold = f"""list_reduce(list_prepend(0, range(1, {MAX_STEPS + 1})),
  (acc, i) -> CASE WHEN acc // {_PACK} >= length({word}) THEN acc
    ELSE (acc // {_PACK} + greatest(coalesce(list_max(list_transform(
        list_filter([{toks}],
                    t -> substr({word}, acc // {_PACK} + 1,
                                length(t)) = t),
        t -> length(t))), 1), 1)) * {_PACK} + acc % {_PACK} + 1 END)"""
    return (
        f"(({fold}) % {_PACK}"
        f" + greatest(length({word}) - ({fold}) // {_PACK}, 0))"
    )


def load_merges(path: str) -> list[str]:
    """Parse a PUBLIC-format BPE merges file: one ``left right`` merge
    pair per line, ``#``-prefixed header lines (e.g. ``#version``)
    and blank lines skipped.  Greedy longest-match inference only
    needs the merge RESULTS (the token set), so each line contributes
    ``left + right``; order is irrelevant to this scheme.

    This is the text format published with the original subword
    tokenizers (Sennrich et al. 2016; the GPT-2 release ships the
    same ``merges.txt`` shape), so a user can point the engine at a
    tokenizer they already have."""
    toks: list[str] = []
    with open(path, encoding="utf-8") as fh:
        for lineno, ln in enumerate(fh, 1):
            ln = ln.rstrip("\n")
            if not ln or ln.startswith("#"):
                continue
            parts = ln.split(" ")
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(
                    f"{path}:{lineno}: expected 'left right', got {ln!r}"
                )
            toks.append(parts[0] + parts[1])
    if not toks:
        raise ValueError(f"{path}: no merge pairs found")
    return toks


def byte_unicode_table() -> dict[int, str]:
    """The public byte-level BPE alphabet (Radford et al. 2019,
    GPT-2): a bijection from the 256 byte values onto printable
    unicode codepoints — the 188 printable latin-1 bytes map to
    themselves, the 68 control/whitespace bytes map to U+0100+i.
    Byte-level pretokenization makes ANY string (CJK, emoji, binary
    junk) expressible over a closed 256-symbol base alphabet, the
    standard trick for vocabulary-complete tokenizers."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    table: dict[int, str] = {b: chr(b) for b in keep}
    shift = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + shift)
            shift += 1
    return table


_BYTE_TABLE = byte_unicode_table()


def byte_pretokenize(word: str) -> str:
    """Map a word onto the byte-level alphabet (UTF-8 bytes through
    :func:`byte_unicode_table`) — the representation a byte-level
    merges table is trained over."""
    return "".join(_BYTE_TABLE[b] for b in word.encode("utf-8"))


# Past this vocabulary size the expression fold's per-character
# whole-array scan loses to a hash-set lookup: the fold evaluates
# filter(VOCAB, ...) — O(|V|) — at every position, fine for a
# lexicon-sized merge set but catastrophic at a trained tokenizer's
# 32k-256k merges.  Same selection rule as the IVF assign path
# (expression to k≈24 centroids, Arrow NumPy past that): keep the
# plan Python-free wherever the oracle gates it, switch to the
# documented Arrow carve-out where the expression shape stops
# scaling.  256 ≈ where |V| · avg_word_len work per word overtakes
# the pandas set-probe constant.
EXPR_VOCAB_LIMIT = 256


def _encode_words_pandas(vocab: list[str], byte_level: bool = False):
    """Arrow-batched greedy longest-match encoder for LARGE merge
    tables: O(max_token_len) set probes per position instead of the
    fold's O(|V|) array scan.  Returns an (iterator of Series) →
    (iterator of Series) function for ``mapInPandas``-style use via
    ``pandas_udf``; the vocab ships once per executor inside the
    cloudpickled closure (broadcast-equivalent for a ≤few-MB merge
    set).  ``byte_level`` maps each word onto the byte-level alphabet
    (:func:`byte_pretokenize`) before encoding — for merges tables
    trained over that alphabet."""
    vset = frozenset(vocab)
    maxlen = max((len(t) for t in vocab), default=1)
    table = byte_unicode_table() if byte_level else None

    def encode(batch):
        import pandas as pd

        out = []
        for w in batch:
            if table is not None:
                w = "".join(table[b] for b in w.encode("utf-8"))
            pos, cnt = 0, 0
            n = len(w)
            # Same MAX_STEPS horizon + residue-chars-count-1-each rule
            # as the expression fold, so crossing EXPR_VOCAB_LIMIT can
            # never change a count (round-12 advice: the unbounded
            # greedy here diverged from the fold past 40 steps).
            while pos < n and cnt < MAX_STEPS:
                step = 1
                for ln in range(min(maxlen, n - pos), 1, -1):
                    if w[pos:pos + ln] in vset:
                        step = ln
                        break
                pos += step
                cnt += 1
            out.append(cnt + (n - pos))
        return pd.Series(out, dtype="int64")

    encode.__annotations__ = {}
    return encode


def bpe_token_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: list[str] | None = None,
    byte_level: bool = False,
) -> DataFrame:
    """Per-document subword token budget: (id, n_words, n_bpe_tokens).

    Plan: explode the normalized word stream, partial-aggregate to
    (doc, word, cnt), encode the DISTINCT words once, then one
    word-keyed join + per-doc sum.  The encode cost is
    vocabulary-scaled; the corpus pays two keyed shuffles with
    map-side combine.

    Encode path by merge-table size: pure-expression fold (zero
    Python, DuckDB-oracle-able) up to ``EXPR_VOCAB_LIMIT`` tokens;
    past that an Arrow-batched hash-set encoder (identical greedy
    semantics, unit-tested bit-equal) — a trained 32k-256k tokenizer
    would melt the fold's per-character whole-array scan.  The
    oracle-gated query uses the default 47-token table, so gated
    plans stay Python-free (§2.12 discipline; this is a documented
    carve-out like the IVF large-k assign).

    ``byte_level`` (for merges tables trained over the public
    byte-level alphabet — :func:`byte_pretokenize`) routes through
    the Arrow encoder regardless of vocabulary size: the byte→
    alphabet remap is a per-character data-dependent transform with
    no reasonable pure-expression twin, and real byte-level tables
    are 32k+ entries anyway."""
    occ = (
        df.select(F.col(id_col).alias("_id"),
                  F.explode(words(text_col)).alias("word"))
        .groupBy("_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    v = DEFAULT_BPE_VOCAB if vocab is None else vocab
    if byte_level or len(v) > EXPR_VOCAB_LIMIT:
        from pyspark.sql.functions import pandas_udf

        enc_udf = pandas_udf(
            _encode_words_pandas(v, byte_level=byte_level), "long"
        )
        encoded = (
            occ.select("word")
            .distinct()
            .withColumn("pieces", enc_udf(F.col("word")))
        )
    else:
        encoded = (
            occ.select("word")
            .distinct()
            .withColumn("pieces", bpe_piece_count("word", v))
        )
    return (
        occ.join(encoded.hint("shuffle_merge"), "word")
        .groupBy("_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("pieces") * F.col("cnt")).cast("long")
            .alias("n_bpe_tokens"),
        )
        .select(F.col("_id").alias(id_col), "n_words", "n_bpe_tokens")
    )
