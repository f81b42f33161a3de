"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, codegen-friendly) — language-ID,
quality scoring, token counting, and document fingerprinting run at
full scan speed with zero Python in the hot path. Designed for the
``documents(doc_id, text, lang, source, n_chars)`` table but generic
over any text column.
"""

from __future__ import annotations

import re as _re
from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.functions.plan_literals import (
    literal_rows_df,
)
from curw_flo2d_data_manager_spark.functions.exactmath import ln_ratio_det

# High-frequency function-word marker lexicons for the stopword
# language heuristic (drawn from public frequency lists — the usual
# top-of-corpus closed-class words per language). Still deterministic
# and small enough to live in the plan as array literals; the scoring
# plumbing is generic over this dict, and the DuckDB oracle SQL is
# GENERATED from it (queries._text_lang_sql) so the two can't drift.
# Dict order is the tie-break order (first max wins) — append new
# languages at the end to keep old predictions stable.
# Note on zh/ja: whitespace tokenization only matches pre-segmented
# CJK text; unsegmented CJK scores 0 and falls to 'unknown' — the
# documented limit of the whitespace heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "for",
           "it", "was", "with", "as", "his", "on", "be", "at"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con",
           "las", "del", "se", "no", "más", "como", "pero", "sus"],
    "fr": ["le", "les", "des", "une", "est", "dans", "pour", "sur",
           "que", "qui", "pas", "avec", "plus", "par", "mais", "aux"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein",
           "den", "von", "zu", "sich", "auf", "für", "auch", "dem"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不",
           "这", "他", "们", "就", "也", "都", "说", "要"],
    "pt": ["de", "que", "não", "uma", "os", "como", "mas", "foi",
           "ele", "das", "mais", "às", "pelo", "isso", "ela", "são"],
    "it": ["di", "che", "il", "non", "per", "una", "del", "con",
           "gli", "della", "più", "anche", "come", "sono", "nel", "alla"],
    "nl": ["de", "het", "een", "van", "en", "dat", "niet", "met",
           "zijn", "voor", "aan", "maar", "ook", "als", "dan", "bij"],
    "ru": ["и", "в", "не", "на", "что", "он", "как", "это",
           "по", "но", "его", "к", "из", "у", "за", "от"],
    "sv": ["och", "att", "det", "som", "en", "på", "är", "av",
           "för", "med", "den", "till", "inte", "om", "han", "var"],
    "tr": ["bir", "ve", "bu", "da", "için", "ile", "olarak", "çok",
           "daha", "gibi", "kadar", "sonra", "ama", "en", "ne", "var"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """lower + strip ASCII punctuation (keep letters, digits, and
    all non-ASCII codepoints so CJK text survives) + collapse whitespace."""
    s = F.lower(_c(col))
    s = F.regexp_replace(s, "[^a-z0-9\\x80-\\uffff-]+", " ")
    return F.trim(s)


def words(col: Column | str) -> Column:
    """Whitespace word array of the normalized text ([] for empty)."""
    n = normalize_text(col)
    return F.when(n == "", F.array().cast("array<string>")).otherwise(
        F.split(n, r"\s+")
    )


def whitespace_token_count(col: Column | str) -> Column:
    return F.size(words(col)).cast("long")


def regex_token_count(col: Column | str) -> Column:
    """Count of BPE-ish tokens (letter runs / digit runs / punct)."""
    return F.regexp_count(_c(col), F.lit(TOKEN_REGEX)).cast("long")


def punctuation_ratio(col: Column | str) -> Column:
    c = _c(col)
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]"))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Stopword fraction of the normalized word stream — the same
    anchored ``regexp_count`` form as :func:`lang_scores` (exact
    word-equality multiplicities, no interpreted per-word HOF pass)."""
    w = words(col)
    padded = F.concat(F.lit(" "), normalize_text(col), F.lit(" "))
    hits = F.regexp_count(
        padded, F.lit(_marker_count_pattern(stopwords or EN_STOPWORDS))
    )
    return hits / F.greatest(F.size(w), F.lit(1))


def mean_word_length(col: Column | str) -> Column:
    """Mean normalized-word length WITHOUT the per-word aggregate
    fold: ``normalize_text`` output is trimmed and single-spaced, so
    the total word length is exactly ``length(norm) - (n_words - 1)``
    — one length() instead of an interpreted HOF pass (the fold
    measured ~2.9 s/1M docs in the round-13 composed-projection
    decomposition; identical values, pinned in tests)."""
    n = normalize_text(col)
    w = words(col)
    # empty → 0; NULL text propagates NULL (length(NULL) is NULL),
    # exactly like the old fold did under ANSI
    total = F.when(n == "", F.lit(0)).otherwise(
        F.length(n) - (F.size(w) - F.lit(1))
    ).cast("long")
    return total / F.greatest(F.size(w), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: long enough, sane punctuation,
    some stopwords, sane mean word length. Weights are fixed and
    documented so the score is reproducible in plain SQL."""
    c = _c(col)
    len_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    punct = punctuation_ratio(c)
    punct_score = F.when(punct > 0.2, F.lit(0.0)).otherwise(1.0 - punct * 5.0)
    sw_score = F.least(stopword_ratio(c) * F.lit(5.0), F.lit(1.0))
    mwl = mean_word_length(c)
    mwl_score = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (len_score * 0.3 + punct_score * 0.2 + sw_score * 0.3 + mwl_score * 0.2)


def _marker_count_pattern(markers: list[str]) -> str:
    """Full-token-anchored alternation counting exact word occurrences
    in a single-space-joined token stream. The leading space is
    CONSUMED (literal first char → the regex engine skip-scans to the
    next boundary instead of attempting a lookbehind at every
    position; measured ~20% faster than ``(?<= )``), while the
    trailing boundary stays a ``(?= )`` lookahead so consecutive
    marker words ("the the") are both counted — the unconsumed space
    doubles as the next match's leading space. The lookahead also
    makes prefix-overlapping alternatives (es ``la`` vs word ``los``)
    irrelevant, so alternation order can't change counts. Markers are
    metachar-escaped even though today's lexicons are plain words."""
    alts = "|".join(_re.escape(m) for m in markers)
    return f" (?:{alts})(?= )"


def lang_scores(col: Column | str, tokenized: bool = False) -> dict[str, Column]:
    """Marker-hit count per language — EXACT word-equality
    multiplicities, identical to filtering the word array per
    language, but computed as one JVM-native ``regexp_count`` scan
    per language over the space-padded normalized stream.

    The previous form (11 interpreted ``filter(w,
    array_contains(...))`` HOF passes) measured 33 s/1M docs — ~50%
    of the composed-projection cost (SCALING.md round-13
    decomposition); ``regexp_count`` runs inside whole-stage codegen
    with zero per-word allocation, and the consumed leading-space
    literal lets the matcher skip-scan between word boundaries.

    ``tokenized=True`` treats ``col`` as an already-computed word
    array: ``concat_ws`` rebuilds the normalized stream (``words``
    output joined on single spaces IS ``normalize_text``), one cheap
    join instead of 11 array passes.
    """
    if tokenized:
        arr = _c(col)
        # concat_ws maps a NULL array to '' — keep NULL in → NULL
        # scores, exactly like the filter/size form did under ANSI
        s = F.when(arr.isNull(), F.lit(None).cast("string")).otherwise(
            F.concat_ws(" ", arr)
        )
    else:
        s = normalize_text(col)
    padded = F.concat(F.lit(" "), s, F.lit(" "))
    return {
        lang: F.regexp_count(padded, F.lit(_marker_count_pattern(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column | str, default: str = "unknown", tokenized: bool = False) -> Column:
    """argmax language by marker-hit count; ties break by the fixed
    LANG_MARKERS key order; zero hits → ``default``.

    Implemented as ``array_max`` over (score, -order, lang) structs so
    every score expression appears in the plan exactly ONCE. The naive
    fold (``best = when(score > best, …).otherwise(best)``) references
    ``best`` twice per language, doubling the expression tree per
    iteration — at 11 languages that is ~2^11 copies of the first
    score and a measured 35× slowdown (bench r4: text_lang_id 30.5 s
    vs 0.9 s)."""
    scores = lang_scores(col, tokenized=tokenized)
    candidates = F.array(
        *[
            F.struct(
                score.alias("s"),
                F.lit(-i).alias("nord"),  # ties: earlier lang wins
                F.lit(lang).alias("lang"),
            )
            for i, (lang, score) in enumerate(scores.items())
        ]
    )
    best = F.array_max(candidates)
    return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit(default))


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: sha256 of the sorted
    distinct normalized word set (the classic 'fingerprint' dedup key)."""
    w = F.array_sort(F.array_distinct(words(col)))
    return F.sha2(F.concat_ws(" ", w), 256)


def _winnow_gram_hashes(col: Column | str, k: int) -> Column:
    """Array of k-gram rolling hashes of the normalized text (first 8
    md5 hex chars as a long, so DuckDB can recompute them exactly)."""
    norm = normalize_text(col)
    n_grams = F.length(norm) - k + 1
    # guard: sequence(1, 0) yields a DESCENDING [1, 0], not empty — a
    # sub-k-length document must produce zero grams
    grams = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams), lambda i: norm.substr(i, F.lit(k))
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
    )


def _winnow_select(hashes: Column, window: int) -> Column:
    """Windowed-min selection over an ALREADY-MATERIALIZED hash-array
    column (see with_winnow_fingerprints for why that matters)."""
    n_windows = F.size(hashes) - window + 1
    selected = F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
            lambda j: F.array_min(F.slice(hashes, j, window)),
        ),
    ).otherwise(
        F.when(F.size(hashes) > 0, F.array(F.array_min(hashes))).otherwise(
            F.array().cast("array<long>")
        )
    )
    return F.array_sort(F.array_distinct(selected))


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "fps",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003): hash every character ``k``-gram of the normalized
    text, slide a ``window`` over the hash sequence taking each
    window's minimum; ``out_col`` is the distinct selected hashes as a
    sorted ``array<long>``.

    Guarantee: two documents sharing any substring of length
    ``k + window - 1`` (post-normalization) share at least one
    fingerprint — the local-sampling property that makes winnowing the
    standard near-copy detector. Density is ~2/(window+1) of all
    k-gram hashes. Short documents (fewer than ``window`` grams but at
    least one) yield the single global-min hash; empty text an empty
    array.

    TWO projections on purpose: the gram-hash array is materialized as
    its own column, and the windowed-min pass reads that column. Fused
    into one expression (the old Column-returning form), Catalyst
    inlines the hash array into every window's lambda — O(grams ×
    windows) md5 evaluations per document, measured 100×+ slower on
    ~400-gram documents. Catalyst's CollapseProject keeps the split
    because the reference is non-cheap and multiply-used."""
    tmp = f"_winnow_h_{out_col}"
    return (
        df.withColumn(tmp, _winnow_gram_hashes(text_col, k))
        .withColumn(out_col, _winnow_select(F.col(tmp), window))
        .drop(tmp)
    )


def winnow_fingerprints(
    col: Column | str, k: int = 5, window: int = 4
) -> Column:
    """Single-Column form of winnowing — ONLY for tiny inputs/tests:
    the fused expression re-evaluates the gram-hash chain once per
    window (O(grams × windows) md5 calls). Use
    ``with_winnow_fingerprints`` on any real corpus."""
    return _winnow_select(_winnow_gram_hashes(col, k), window)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis profile: adds token counts, quality,
    predicted language, fingerprint."""
    return (
        df.withColumn("n_tokens_ws", whitespace_token_count(text_col))
        .withColumn("n_tokens_re", regex_token_count(text_col))
        .withColumn("punct_ratio", punctuation_ratio(text_col))
        .withColumn("stopword_ratio", stopword_ratio(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("pred_lang", lang_id(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
    )


# ------------------------------------------------------ PII / extraction
# Pure Column regex chains — full scan speed, no Python. The patterns
# use only syntax shared by Java regex (Spark) and RE2 (DuckDB/engines
# used as oracles), so redaction is engine-portable and auditable.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # order matters: emails before bare digit runs, etc.
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
    # NB: explicit whitespace class, not \s — Java's \s includes \x0B
    # (vertical tab) while RE2's does not, so \s would redact a
    # VT-containing digit run differently across engines (r2 advice).
    "phone": (r"\+?[0-9][0-9()\- \t\n\r\f]{7,}[0-9]", "[PHONE]"),
}

URL_PATTERN = r"https?://[^\s\"'<>]+"


def redact_pii(col: Column | str, kinds: list[str] | None = None) -> Column:
    """Replace emails / IPv4 addresses / phone-like digit runs with
    typed placeholders. A corpus-cleaning must-have before training;
    applied as a chain of ``regexp_replace`` so the whole scan stays
    in codegen."""
    out = _c(col)
    for kind in kinds or list(PII_PATTERNS):
        pat, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, repl)
    return out


def extract_urls(col: Column | str) -> Column:
    """Array of http(s) URLs found in the text (for link-density
    quality filters and crawl lineage)."""
    return F.regexp_extract_all(_c(col), F.lit(URL_PATTERN), F.lit(0))


def normalize_for_dedup(col: Column | str) -> Column:
    """AGGRESSIVE normalization for dedup KEYS (distinct from
    :func:`normalize_text`, the tokenizer's gentler pass that keeps
    unicode and hyphens): lowercase, every non-ASCII-alphanumeric run
    → one space, trim. Case / punctuation / whitespace / separator
    variants of the same prose collapse to one key — the standard
    pre-hash step for web-corpus exact dedup (a raw md5 of the bytes
    misses trivially-reformatted copies).

    Pure Column expressions (codegen, no UDF); idempotent
    (normalize(normalize(x)) == normalize(x))."""
    return F.trim(
        F.regexp_replace(F.lower(_c(col)), r"[^a-z0-9]+", " ")
    )


#: query parameters stripped by canonicalize_url — click-tracking
#: params that vary per crawl fetch but never change the resource
TRACKING_PARAM_RE = r"^(utm_[a-z0-9]+|fbclid|gclid|ref)="


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of a URL for crawl-level dedup: lowercase, strip
    scheme + leading ``www.`` + fragment, drop click-tracking query
    params (``utm_*``, ``fbclid``, ``gclid``, ``ref``), sort the
    surviving params, strip trailing slashes. The same resource
    fetched via http/https, with/without www, with different tracking
    decorations and param orders maps to ONE key.

    Entirely array/regexp Column expressions — no UDF, no shuffle;
    at 100 TB this rides the scan inside whole-stage codegen."""
    u = F.lower(F.trim(_c(col)))
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"#.*$", "")
    base = F.regexp_replace(F.substring_index(u, "?", 1), r"/+$", "")
    has_q = F.instr(u, "?") > 0
    q = F.when(has_q, F.substr(u, F.instr(u, "?") + 1)).otherwise(F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.when(
        F.size(params) > 0,
        F.concat(base, F.lit("?"), F.array_join(params, "&")),
    ).otherwise(base)


def url_domain(url: Column | str) -> Column:
    """Registrable host of a URL (lowercased, port stripped)."""
    return F.lower(F.regexp_extract(_c(url), r"https?://([^/:\s]+)", 1))


# ------------------------------------------------- repetition / quality gates
def duplicate_line_fraction(col: Column | str) -> Column:
    """Fraction of non-empty lines that are duplicates of an earlier
    line (0 for docs with ≤1 line) — the classic repetition filter
    from published web-corpus curation rules (Gopher-style)."""
    lines = F.filter(
        F.transform(F.split(_c(col), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    n = F.size(lines)
    d = F.size(F.array_distinct(lines))
    return F.when(n <= 1, F.lit(0.0)).otherwise((n - d) / n)


def duplicate_word_fraction(col: Column | str) -> Column:
    """Fraction of words that repeat an earlier word."""
    w = words(col)
    n = F.size(w)
    d = F.size(F.array_distinct(w))
    return F.when(n <= 1, F.lit(0.0)).otherwise((n - d) / n)


def gopher_quality_flags(col: Column | str) -> Column:
    """Struct of boolean pass/fail gates in the style of published
    web-corpus rules: word-count bounds, mean word length bounds,
    symbol-to-word ratio, and repetition. Combine with
    ``F.col("flags.*")`` or reduce to a single keep decision."""
    c = _c(col)
    n_words = whitespace_token_count(c)
    mwl = mean_word_length(c)
    symbols = F.regexp_count(c, F.lit(r"[#@/\\{}<>|~^]"))
    return F.struct(
        n_words.between(50, 100_000).alias("word_count_ok"),
        mwl.between(3.0, 10.0).alias("mean_word_len_ok"),
        (symbols / F.greatest(n_words, F.lit(1)) < 0.1).alias("symbol_ratio_ok"),
        (duplicate_line_fraction(c) < 0.3).alias("dup_lines_ok"),
        (duplicate_word_fraction(c) < 0.6).alias("dup_words_ok"),
    )


# ----------------------------------------------------------- tf-idf
def tfidf_top_terms(
    df: "DataFrame",
    id_col: str,
    text_col: str = "text",
    k: int = 3,
) -> "DataFrame":
    """Top-``k`` characteristic terms per document by smoothed tf-idf.

    ``tfidf = tf * ln((N + 1) / (df + 1))`` with N = documents having
    at least one token. The corpus is tokenized exactly ONCE and the
    (doc, term, tf) relation has LINEAR lineage: document frequency is
    a count-over-window on the term partition — the same term-keyed
    exchange the old ``tf ⋈ dfreq`` sort-merge join already paid, but
    with no second tokenize pass behind the join's build arm
    (differently-pruned branches never ReuseExchange) and no
    vocabulary-scaled join at all. N comes from a cheap
    single-character-class ``rlike`` scan of the raw text — a doc has
    ≥1 token iff ``lower(text)`` contains one kept character (the
    exact emptiness predicate of ``normalize_text``) — so no third
    tokenize pass either. tfidf is rounded to 6 decimals BEFORE
    ranking so the ordering (and the cross-engine oracle) never
    depends on the last bits of ``ln``.

    Returns (id, term, tf, df, tfidf, rank), rank 1..k.
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = (
        df.filter(F.lower(_c(text_col)).rlike("[a-z0-9\\x80-\\uffff-]"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def bm25_topk(
    df: "DataFrame",
    id_col: str,
    query_terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> "DataFrame":
    """Okapi BM25 retrieval: the ``k`` highest-scoring documents for a
    bag of query terms (Robertson & Zaragoza 2009, the classic
    ``idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))`` with
    ``idf = ln(1 + (N−df+0.5)/(df+0.5))``).

    The plan is corpus-linear with NO per-token rows at all: document
    length and every query term's tf are computed per document in one
    tokenize projection (``size`` of the word array / of its
    equality-filtered views — ``id_col`` is assumed unique, the
    retrieval-corpus contract), so nothing doc-keyed is ever shuffled
    or joined — the per-(doc, term) hit rows fall out of a 4-element
    array explode. Document frequencies and the (N, avgdl) scalars are
    tiny aggregates broadcast onto the scored rows; the final global
    top-k is one ordered limit. Scores are rounded to 6 decimals
    BEFORE ranking so the ordering never depends on the last bits of
    ``ln`` — ties break by smallest id.

    Returns (id, score, n_terms_hit, rank), rank 1..k; documents
    matching no query term never appear.
    """
    if not query_terms:
        raise ValueError("query_terms is empty")
    from curw_flo2d_data_manager_spark.operators.caching import persist_tracked

    terms = [str(t) for t in query_terms]
    qw = F.col("_qw")
    # two projections on purpose (the with_shingle_hashes lesson): _qw
    # is referenced len(terms)+1 times, so CollapseProject keeps the
    # split and the corpus is tokenized exactly once
    per_doc = (
        df.withColumn("_qw", words(text_col))
        .select(
            F.col(id_col),
            F.size(qw).alias("dl"),
            F.array(*[
                F.struct(
                    F.lit(t).alias("term"),
                    F.size(F.filter(qw, lambda x: x == F.lit(t)))
                    .cast("long")
                    .alias("tf"),
                )
                for t in terms
            ]).alias("_tfs"),
        )
        .filter(F.col("dl") > 0)
    )
    # consumed by the corpus stats AND the hit explode — persist the
    # ~40 B/doc projection rather than tokenizing twice
    per_doc = persist_tracked(per_doc)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        per_doc.select(F.col(id_col), F.col("dl"), F.explode("_tfs").alias("_t"))
        .filter(F.col("_t.tf") > 0)
        .select(id_col, "dl", F.col("_t.term").alias("term"),
                F.col("_t.tf").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.lit(1.0) - F.lit(float(b)) + F.lit(float(b)) * F.col("dl") / F.col(
        "avgdl"
    )
    term_score = idf * (
        F.col("tf") * F.lit(float(k1) + 1.0)
        / (F.col("tf") + F.lit(float(k1)) * norm)
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(term_score), 6).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    from pyspark.sql import Window

    # orderBy().limit() compiles to TakeOrdered (per-partition top-k,
    # k-row driver merge) — the single-partition window below then
    # ranks only those k rows, never the full scored corpus.
    top = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(int(k))
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "score", "n_terms_hit", "rank"
    )


# -------------------------------------------------- mixture planning
def domain_mixture(
    df: "DataFrame",
    group_cols: list[str],
    text_col: str = "text",
    alpha: float = 0.7,
    token_count_col: str | None = None,
) -> "DataFrame":
    """Training-mixture statistics per domain (e.g. (lang, source)):
    document and token counts, the domain's token share, and a
    temperature-scaled sampling weight ``share**alpha`` renormalized
    to 1 (alpha < 1 upweights small domains — the standard multilingual
    rebalancing rule). One hash aggregation over the corpus + one
    broadcast of the tiny per-domain table back onto itself for the
    normalizers; nothing per-document leaves the first shuffle.

    ``token_count_col``: name of a precomputed per-row token-count
    column (e.g. ``n_bpe_tokens`` from
    :func:`~curw_flo2d_data_manager_spark.operators.bpe.bpe_token_counts`)
    to budget in TOKENIZER tokens instead of whitespace words — real
    pipelines budget in the unit their tokenizer emits.
    """
    tok = (
        F.col(token_count_col)
        if token_count_col is not None
        else whitespace_token_count(text_col)
    )
    per = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok).alias("n_tokens"),
    )
    totals = per.agg(
        F.sum("n_tokens").alias("_tot_tokens"),
    )
    shared = per.join(F.broadcast(totals)).withColumn(
        "token_share", F.col("n_tokens") / F.col("_tot_tokens")
    )
    wsum = shared.agg(
        F.sum(F.pow("token_share", F.lit(alpha))).alias("_wsum")
    )
    return (
        shared.join(F.broadcast(wsum))
        .select(
            *group_cols,
            "n_docs",
            "n_tokens",
            F.round("token_share", 6).alias("token_share"),
            F.round(
                F.pow("token_share", F.lit(alpha)) / F.col("_wsum"), 6
            ).alias("sample_weight"),
        )
    )


def epoch_plan(
    df: "DataFrame",
    group_cols: list[str],
    text_col: str = "text",
    target_tokens: int = 1_000_000,
    alpha: float = 0.7,
    token_count_col: str | None = None,
) -> "DataFrame":
    """Turn :func:`domain_mixture`'s weights into a per-domain TRAINING
    PLAN against a token budget: each domain's desired token mass is
    ``sample_weight · target_tokens``; domains LARGER than their share
    downsample (``keep_fraction < 1``, feed
    ``sampling.mixture_resample``), domains SMALLER than it repeat for
    ``epochs > 1`` passes — the standard two-sided mixture rule
    (downsample by selection, upsample by epoch repetition, never by
    row duplication). One hash aggregate + window normalizers over the
    tiny per-domain table; nothing per-document moves.

    Returns (group_cols…, n_tokens, target_domain_tokens,
    keep_fraction, epochs); ``epochs`` = desired/available (≥1 means
    repeat, rounded to 4), keep_fraction = min(1, desired/available).
    Zero-token domains get keep_fraction 1 / epochs 1 (nothing to
    repeat or cut).

    ``token_count_col`` budgets in a precomputed tokenizer-token
    column (see :func:`domain_mixture`) instead of whitespace words.
    """
    mix = domain_mixture(df, group_cols, text_col, alpha, token_count_col)
    desired = F.col("sample_weight") * F.lit(float(target_tokens))
    safe = F.col("n_tokens") > 0
    return mix.select(
        *group_cols,
        "n_tokens",
        F.round(desired).cast("long").alias("target_domain_tokens"),
        F.when(safe, F.round(F.least(F.lit(1.0), desired / F.col("n_tokens")), 6))
        .otherwise(F.lit(1.0))
        .alias("keep_fraction"),
        F.when(safe, F.round(F.greatest(F.lit(1.0), desired / F.col("n_tokens")), 4))
        .otherwise(F.lit(1.0))
        .alias("epochs"),
    )


# --------------------------------------------- heavy hitters
def frequent_terms(
    df: "DataFrame",
    text_col: str = "text",
    min_share: float = 0.001,
) -> "DataFrame":
    """All terms with corpus frequency ≥ ``min_share`` of total tokens,
    with EXACT counts — the heavy-hitters query without ever shuffling
    tail terms as strings.

    Plan: (1) candidate generation by exact counts per 64-bit term
    hash — one partial-aggregable groupBy of ``xxhash64(term)``, so
    the shuffle carries 16-byte (hash, count) rows, never the term
    strings, and the total token count falls out of the same relation
    (``sum(hc)``) with no second corpus pass. A hash bucket's count is
    ≥ every member term's count, so "bucket meets the threshold" is a
    strict SUPERSET of "some member term meets it" — collisions can
    only ADD candidates, never lose one, and at most
    ``⌊1/min_share⌋`` buckets can qualify. (2) One exact counting pass
    over the corpus restricted to the broadcast candidate buckets
    (left-semi on the hash — a Bloom-exact pre-filter), filtered by
    the true per-term threshold — so the OUTPUT is exact and
    deterministic (candidacy only prunes, and false candidates are
    filtered by their exact counts). Returns (term, cnt).
    """
    if not 0.0 < min_share <= 1.0:
        raise ValueError(f"min_share {min_share} outside (0, 1]")
    from curw_flo2d_data_manager_spark.operators.caching import persist_tracked

    # two consumers (hash-count pass, exact count pass) — tokenize once
    toks = persist_tracked(
        df.select(F.explode(words(text_col)).alias("term"))
    )
    # vocab-sized, 16 B/row; consumed by totals AND the candidate
    # filter, so persist rather than re-aggregating the corpus
    hcnt = persist_tracked(
        toks.groupBy(F.xxhash64("term").alias("h"))
        .agg(F.count(F.lit(1)).alias("hc"))
    )
    totals = hcnt.agg(F.sum("hc").alias("n_tok"))
    # Exact rational threshold: for integer cnt, cnt >= ceil(x) iff
    # cnt >= x, so compare cnt·den >= num·n_tok in integer math —
    # no double rounding to flip the gate when min_share·n_tok lands
    # exactly on an integer (e.g. n_tok divisible by 500 at 0.002).
    frac = Fraction(str(min_share)).limit_denominator(10**9)
    candidates = (
        hcnt.join(F.broadcast(totals))
        .filter(
            F.col("hc") * F.lit(frac.denominator)
            >= F.lit(frac.numerator) * F.col("n_tok")
        )
        .select("h")
    )
    return (
        toks.join(
            F.broadcast(candidates),
            F.xxhash64("term") == F.col("h"),
            "left_semi",
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(totals))
        .filter(
            F.col("cnt") * F.lit(frac.denominator)
            >= F.lit(frac.numerator) * F.col("n_tok")
        )
        .select("term", "cnt")
    )


# --------------------------------------------- document chunking
def chunk_documents(
    df: "DataFrame",
    id_col: str,
    text_col: str = "text",
    chunk_words: int = 256,
    overlap: int = 0,
) -> "DataFrame":
    """Split long documents into fixed-size word windows with optional
    overlap — the chunking step between raw documents and
    ``packing.pack_sequences`` (models take bounded contexts; chunk
    first, pack the chunks).

    Chunk ``k`` covers words ``[k·stride, k·stride + chunk_words)``
    with ``stride = chunk_words − overlap``; every document with ≥1
    word yields ≥1 chunk, and every word belongs to at least one
    chunk. Pure Column expressions: the word array is built once in
    the scan and chunk slices are ``transform``+``slice`` over it, so
    the only data movement is the explode — no shuffle, no Python.
    Returns (id, chunk_idx, n_words, chunk_text), chunk_idx 0-based.
    """
    if overlap >= chunk_words:
        raise ValueError(f"overlap {overlap} must be < chunk_words {chunk_words}")
    stride = chunk_words - overlap
    w = words(text_col)
    n = F.size(w)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(float(stride)))
    ).cast("int")
    # chunk indices dropped in-expression for empty/NULL texts instead
    # of a separate size(words(text)) > 0 pre-filter: the filter is
    # its own operator, so its tokenize is never shared with the
    # projection's (subexpression elimination is per-operator) — the
    # corpus was tokenized twice per row. An empty/NULL text makes the
    # predicate false/NULL, the array empties, and explode drops the
    # row — exactly what the filter did.
    idx = F.filter(F.sequence(F.lit(0), n_chunks - 1), lambda k: n > 0)
    chunks = F.transform(
        idx,
        lambda k: F.struct(
            k.cast("int").alias("chunk_idx"),
            F.slice(w, k * stride + 1, chunk_words).alias("cw"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.size("c.cw").alias("n_words"),
            F.concat_ws(" ", F.col("c.cw")).alias("chunk_text"),
        )
    )


# --------------------------------------------- bigram LM scoring
def bigram_logprob(
    df: "DataFrame",
    id_col: str,
    text_col: str = "text",
) -> "DataFrame":
    """Per-document average conditional bigram log-probability under
    the corpus's own add-one-smoothed bigram model — one rung up from
    :func:`unigram_logprob` toward the KenLM-perplexity filters of
    public web-corpus pipelines: word-salad documents whose unigram
    mix looks normal still read as low avg_logprob because their
    TRANSITIONS are rare.

    ``p(w2 | w1) = (c(w1 w2) + 1) / (c(w1·) + V)`` where ``c(w1·)``
    sums the bigram counts with context ``w1`` and ``V`` is the number
    of distinct context terms.

    Plan shape mirrors the reshaped unigram scorer: tokenize ONCE in
    the scan — bigrams are built JVM-side from the word array
    (zip_with over two slices, no self-join on positions) — into a
    persisted per-(doc, w1, w2) ``tf`` relation (tracked; see
    ``operators.caching.release_caches``) that feeds the model counts
    AND the scoring join, so the corpus text never rides a shuffle and
    is never re-tokenized. Model relations are aggregate-compressed
    (one row per bigram/context TYPE); the scoring join shuffles
    (doc, bigram, tf) — skew on stop-word bigrams is AQE territory.
    Docs with fewer than two tokens have no bigrams and are absent
    from the output. avg_logprob is the tf-weighted mean rounded to 4
    decimals. Returns (id, n_bigrams, avg_logprob).
    """
    from curw_flo2d_data_manager_spark.operators.caching import persist_tracked

    w = words(text_col)
    n = F.greatest(F.size(w) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(w, 1, n),
        F.slice(w, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    # no size(words) >= 2 pre-filter: it re-tokenized the corpus in
    # its own operator, and it was redundant — a 0/1-word or NULL text
    # yields an empty/NULL bigram array and explode drops the row
    tf = persist_tracked(
        df.select(F.col(id_col), F.explode(bigrams).alias("bg"))
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # model counts as sums-over-window on the SAME key exchanges the
    # old tf ⋈ cb ⋈ cw sort-merge joins already paid: c(w1 w2) is
    # SUM(tf) over the (w1, w2) partition and c(w1·) is SUM(tf) over
    # the w1 partition — the two vocab-scaled aggregate subtrees and
    # both joins disappear (the tfidf window-df pattern; measured
    # 3.59 → 2.27 s warm, rows bit-identical). V is one tiny
    # count_distinct aggregate over the persisted tf, broadcast.
    from pyspark.sql import Window

    vocab = tf.agg(F.count_distinct("w1").alias("vocab"))
    return (
        tf.withColumn("cb", F.sum("tf").over(Window.partitionBy("w1", "w2")))
        .withColumn("cw", F.sum("tf").over(Window.partitionBy("w1")))
        .join(F.broadcast(vocab))
        .withColumn(
            "lp",
            F.log((F.col("cb") + F.lit(1.0)) / (F.col("cw") + F.col("vocab"))),
        )
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.round(F.sum(F.col("tf") * F.col("lp")) / F.sum("tf"), 4).alias(
                "avg_logprob"
            ),
        )
    )


# --------------------------------------------- unigram LM scoring
def unigram_logprob(
    df: "DataFrame",
    id_col: str,
    text_col: str = "text",
) -> "DataFrame":
    """Per-document average unigram log-probability under the corpus's
    own add-one-smoothed unigram model — the cheap in-corpus stand-in
    for the KenLM-perplexity quality filter of public web-corpus
    pipelines (CCNet-style): documents whose token distribution is
    far from the corpus's read as low avg_logprob and get filtered.

    ``p(term) = (count(term) + 1) / (total_tokens + vocab_size)``.

    Plan shape (round-5 verdict item 4): tokenize ONCE in the scan
    into per-(doc, term) counts ``tf`` — persisted (tracked; see
    ``operators.caching.release_caches``) because both the unigram
    model and the scoring join consume it. Unigram counts aggregate
    the tf relation (partial aggregates before the term shuffle), a
    1-row broadcast carries the normalizer, and the model joins back
    onto the (doc, term, tf) relation — NOT the raw token stream, so
    the term-keyed join input shrinks by the per-document term
    multiplicity and the corpus is never tokenized twice. The per-doc
    average is tf-weighted, which is exactly the token-stream average.
    avg_logprob is rounded to 4 decimals so the result doesn't hinge
    on float summation order. Returns (id, n_tokens, avg_logprob).
    """
    from curw_flo2d_data_manager_spark.operators.caching import persist_tracked

    tf = persist_tracked(
        df.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # unigram model count as a sum-over-window on the SAME term
    # exchange the old tf ⋈ uni sort-merge join already paid — the
    # vocab-scaled aggregate subtree and the join disappear (the
    # tfidf/bigram window pattern). The (n_tok, vocab) normalizer is
    # one tiny aggregate over the persisted tf, broadcast.
    from pyspark.sql import Window

    totals = tf.agg(
        F.sum("tf").alias("n_tok"), F.count_distinct("term").alias("vocab")
    )
    return (
        tf.withColumn("cnt", F.sum("tf").over(Window.partitionBy("term")))
        .join(F.broadcast(totals))
        .withColumn(
            "lp",
            F.log((F.col("cnt") + F.lit(1.0)) / (F.col("n_tok") + F.col("vocab"))),
        )
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(F.sum(F.col("tf") * F.col("lp")) / F.sum("tf"), 4).alias(
                "avg_logprob"
            ),
        )
    )


def dsir_log_ratio(
    df: "DataFrame",
    id_col: str,
    target_col: str,
    text_col: str = "text",
) -> "DataFrame":
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023 — public method): per-document average
    log-ratio of an add-one-smoothed TARGET-domain unigram LM to the
    RAW-corpus unigram LM. Documents whose token distribution looks
    like the target domain score high; feed the weights into
    ``sampling.weighted_sample``/``mixture_resample`` to select
    pretraining data that matches a small high-quality target set.

    ``target_col`` is a boolean column marking the target-domain rows
    (e.g. a curated subset, or ``lang == 'en'``). Both models smooth
    over the SAME raw-corpus vocabulary ``V`` so the ratio is defined
    for every term::

        p_t(w) = (c_target(w) + 1) / (N_target + V)
        p_r(w) = (c_raw(w)    + 1) / (N_raw    + V)
        weight(doc) = Σ_w tf(doc,w)·(ln p_t(w) − ln p_r(w)) / n_tokens(doc)

    Plan shape mirrors :func:`unigram_logprob`: tokenize ONCE into a
    persisted per-(doc, term) ``tf`` relation (tracked — see
    ``operators.caching.release_caches``) that carries the doc's
    target flag; ONE term-level aggregate produces both models'
    counts (``c_raw = Σ tf``, ``c_target = Σ tf·flag`` — partial
    aggregates before the term shuffle); a 1-row broadcast carries the
    normalizers; the model joins back onto ``tf``, never the raw token
    stream. Returns (id, n_tokens, avg_logratio) — rounded to 4
    decimals so the result doesn't hinge on float summation order.
    """
    from curw_flo2d_data_manager_spark.operators.caching import persist_tracked

    tf = persist_tracked(
        df.select(
            F.col(id_col),
            F.col(target_col).cast("boolean").alias("_tgt"),
            F.explode(words(text_col)).alias("term"),
        )
        .groupBy(id_col, "_tgt", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # both models' counts as sums-over-window on the SAME term
    # exchange the old tf ⋈ lm sort-merge join already paid — the
    # vocab-scaled aggregate subtree and the join disappear (the
    # tfidf/unigram/bigram window pattern). The 1-row normalizer is
    # one tiny aggregate over the persisted tf, broadcast.
    from pyspark.sql import Window

    tgt_tf = F.when(F.col("_tgt"), F.col("tf")).otherwise(F.lit(0))
    totals = tf.agg(
        F.sum("tf").alias("n_raw"),
        F.sum(tgt_tf).alias("n_tgt"),
        F.count_distinct("term").alias("vocab"),
    )
    w_term = Window.partitionBy("term")
    return (
        tf.withColumn("c_raw", F.sum("tf").over(w_term))
        .withColumn("c_tgt", F.sum(tgt_tf).over(w_term))
        .join(F.broadcast(totals))
        .withColumn(
            "lr",
            F.log(
                (F.col("c_tgt") + F.lit(1.0)) / (F.col("n_tgt") + F.col("vocab"))
            )
            - F.log(
                (F.col("c_raw") + F.lit(1.0)) / (F.col("n_raw") + F.col("vocab"))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            # + 0.0 collapses IEEE -0.0 to +0.0 (a doc whose rounded
            # ratio is a signed zero must compare equal everywhere)
            (F.round(F.sum(F.col("tf") * F.col("lr")) / F.sum("tf"), 4)
             + F.lit(0.0)).alias("avg_logratio"),
        )
    )


def logprob_buckets(
    scored: "DataFrame",
    score_col: str = "avg_logprob",
    labels: tuple[str, str, str] = ("tail", "middle", "head"),
) -> "DataFrame":
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 — public
    method): split a scored corpus into head/middle/tail terciles of
    LM log-probability (head = most fluent under the LM). Feed
    :func:`unigram_logprob`/:func:`bigram_logprob` output in.

    Buckets are assigned by comparing against the corpus's exact
    continuous tercile THRESHOLDS (one 2-value aggregate, broadcast
    back) rather than a global ``ntile`` sort: ties stay together, the
    assignment is engine-portable, and the plan has no corpus-wide
    single-reducer window — the 100-TB shape. Adds a ``bucket``
    column; all input columns pass through.
    """
    cuts = scored.agg(
        F.expr(
            f"percentile({score_col}, array(1.0D/3.0D, 2.0D/3.0D))"
        ).alias("_cuts")
    )
    return (
        scored.join(F.broadcast(cuts))
        .withColumn(
            "bucket",
            F.when(F.col(score_col) <= F.element_at("_cuts", 1), labels[0])
            .when(F.col(score_col) <= F.element_at("_cuts", 2), labels[1])
            .otherwise(labels[2]),
        )
        .drop("_cuts")
    )


def hash_classifier_score(
    df: "DataFrame",
    id_col: str,
    weights: list[float],
    bias: float = 0.0,
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> "DataFrame":
    """Linear text classifier over HASHED bag-of-words features — the
    fastText-style quality-classifier shape used by public pretraining
    pipelines (train the weights offline, score the corpus at scale):

        score(doc) = sigmoid(bias + Σ_w tf(doc,w)·W[h(w)] / n_tokens)

    ``h(w)`` buckets terms by the first 8 hex digits of ``md5(w)``
    modulo ``len(weights)`` — engine-portable (any SQL engine can
    re-derive it) and partition-independent. The weight table joins as
    a broadcast relation rather than a literal array lookup (a
    ``lit(list)`` is a per-row CreateArray — the Bloom-filter lesson),
    so the plan is: one tokenize into per-(doc, term) counts, one
    broadcast join, one doc aggregate. Returns
    (id, [keep_cols,] n_tokens, score) with score rounded to 6
    decimals.

    ``keep_cols``: per-document attribute columns (each functionally
    determined by ``id_col`` — the caller's contract) to pass through
    onto the output. They ride the token projection and the two
    aggregation key sets, so a downstream eval (AUC, calibration,
    confusion) never needs a corpus-sized join back to the input just
    to re-attach its label — the pq_assign pass-through lesson.
    """
    dim = len(weights)
    if dim < 1:
        raise ValueError("weights must be non-empty")
    spark = df.sparkSession
    keep = list(keep_cols or [])
    wtab = literal_rows_df(
        spark, [(i, float(w)) for i, w in enumerate(weights)], "bucket int, w double"
    )
    tf = (
        df.select(F.col(id_col), *keep, F.explode(words(text_col)).alias("term"))
        .groupBy(id_col, *keep, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    bucket = (
        F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long")
        % dim
    ).cast("int")
    scored = tf.withColumn("bucket", bucket).join(F.broadcast(wtab), "bucket")
    return (
        scored.groupBy(id_col, *keep)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            F.lit(float(bias))
                            + F.sum(F.col("tf") * F.col("w")) / F.sum("tf")
                        )
                    )
                ),
                6,
            ).alias("score"),
        )
    )


# Fixed alphabet for char_entropy: counting by length-difference keeps
# the whole computation a zero-shuffle projection (no explode of the
# corpus into per-character rows). Chars outside the classes fold into
# one OTHER bucket, so the distribution always sums to the text length.
ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def char_entropy(col: Column | str) -> Column:
    """Shannon entropy (bits/char) of the lowercased character
    distribution over a FIXED alphabet (a-z, 0-9, space) plus one
    OTHER bucket — the gibberish/encoded-blob detector: natural text
    sits ~3.5-4.3 bits, base64/hex blobs and single-char padding runs
    fall far outside.

    Scale shape: each class count is ``length(t) − length(replace(t,
    ch))`` — ~40 codegen expressions, ZERO shuffle, no explode of the
    corpus into per-char rows (the naive explode→groupBy shape ships
    one row per CHARACTER of the corpus through a shuffle). Empty or
    NULL text yields NULL.
    """
    t = F.lower(_c(col))
    n = F.length(t).cast("double")
    counts = [
        (F.length(t) - F.length(F.replace(t, F.lit(ch)))).cast("double")
        for ch in ENTROPY_ALPHABET
    ]
    known = None
    for c in counts:
        known = c if known is None else known + c
    counts.append(F.length(t).cast("double") - known)  # OTHER bucket
    ent = None
    for c in counts:
        p = c / n
        term = F.when(c > 0, -p * F.log2(p)).otherwise(F.lit(0.0))
        ent = term if ent is None else ent + term
    return F.when(F.length(t) > 0, ent)


def zipf_slope(
    df: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Per-domain Zipf (rank-frequency power-law) slope — the
    vocabulary-health signal: natural text sits near −1; templated or
    machine-generated domains flatten (boilerplate dominating) or
    steepen (tiny synthetic vocabularies), so the slope is a cheap
    per-domain drift alarm alongside entropy and quality gates.

    Shape: one tokenize, term counts collapse the corpus to its
    per-domain vocabulary (partial agg before the shuffle), a rank
    window runs over VOCAB rows (never the corpus), and
    ``regr_slope(ln n, ln rank)`` is a partial-aggregable least-
    squares fold. ``min_count`` trims the hapax tail, which both
    stabilizes the fit and bounds the ranked relation. Ranks tie-break
    by term so the fit is deterministic across engines.

    Returns one row per group: (group_cols…, zipf_slope, vocab).
    """
    from pyspark.sql import Window

    toks = df.select(
        *group_cols, F.explode(words(text_col)).alias("term")
    ).filter(F.col("term") != "")
    counts = (
        toks.groupBy(*group_cols, "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    w = Window.partitionBy(*group_cols).orderBy(F.desc("n"), "term")
    ranked = counts.withColumn("rank", F.row_number().over(w))
    return ranked.groupBy(*group_cols).agg(
        F.round(
            F.regr_slope(F.ln("n"), F.ln("rank")), 6
        ).alias("zipf_slope"),
        F.count(F.lit(1)).alias("vocab"),
    )


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_doc_freq: int = 50,
) -> DataFrame:
    """Cross-document boilerplate LINE removal — the CCNet/RefinedWeb
    cleaning step: a line (trimmed) appearing in ≥ ``min_doc_freq``
    DISTINCT documents is site furniture (nav, footer, cookie banner)
    and is stripped from every document; in-document repetition alone
    never marks a line (that's dedup_repeated_spans' job).

    Scale shape: one explode of the corpus into (doc, pos, line); the
    boilerplate relation reduces to DISTINCT (line-hash) rows above
    the threshold — tiny by construction (a line must recur across
    ≥ min_doc_freq docs) and broadcast into a LEFT ANTI join; the one
    corpus-lines shuffle is the per-doc reassembly
    (array_sort(collect_list(pos, line)) — order restored exactly).
    Line identity is the xxhash64 of the trimmed line, so the anti
    join ships 8-byte hashes, never line text. Blank lines are
    position holders: never counted, never stripped.

    Returns (id, text_clean, n_lines, n_removed).
    """
    lines = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "_pos", "_line"
        ),
    ).withColumn("_t", F.trim("_line"))
    hashed = lines.withColumn("_h", F.xxhash64("_t"))
    boiler = (
        hashed.filter(F.col("_t") != "")
        .select("_doc", "_h")
        .distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_doc_freq)
        .select("_h")
    )
    kept = hashed.join(F.broadcast(boiler), "_h", "left_anti")
    # per-doc line totals as a ROW EXPRESSION on the input, not a third
    # explode+groupBy pass over the corpus: size(split(text)) is the
    # exploded row count by construction. NULL-text docs were absent
    # from the exploded relation (posexplode drops them), so the
    # filter keeps the driving row set identical.
    n_lines = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_doc"),
        # cast: size() is int, the old count() output was bigint —
        # the declared output schema must not drift
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
    )
    kept_agg = (
        kept.groupBy("_doc")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_pos", "_line"))
            ).alias("_k")
        )
        .select(
            "_doc",
            F.concat_ws(
                "\n", F.transform(F.col("_k"), lambda s: s["_line"])
            ).alias("text_clean"),
            F.size("_k").alias("n_kept"),
        )
    )
    # LEFT join from the per-doc totals (round-8 advice): a document
    # whose every non-blank line is boilerplate has no kept-lines row,
    # and the old inner join dropped it entirely — the oracle (and the
    # per-document contract) emit it with empty text_clean and
    # n_removed = n_lines.
    return n_lines.join(kept_agg, "_doc", "left").select(
        F.col("_doc").alias(id_col),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        "n_lines",
        (
            F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0))
        ).alias("n_removed"),
    )


def word_ngram_terms(col: Column | str, n: int = 1) -> Column:
    """Multiset word n-gram term array ([] for empty text). A document
    shorter than n words contributes its full word-join once — the
    same short-document convention as :func:`word_shingles`, but
    KEEPING repeats (term frequencies matter to tf-idf; shingle sets
    don't)."""
    w = words(col)
    if n <= 1:
        return w
    grams = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size(w) - F.lit(n - 1), F.lit(1))
        ),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    return F.when(F.size(w) == 0, F.array().cast("array<string>")).otherwise(
        grams
    )


def inverted_index(
    df: "DataFrame",
    id_col: str,
    text_col: str = "text",
    k: int = 3,
    min_df: int = 2,
    ngram: int = 1,
) -> "DataFrame":
    """Flattened inverted-index construction: for every term with
    document frequency ≥ ``min_df``, the per-term stats (df, corpus
    tf) plus the top-``k`` postings by (tf desc, id asc) — the build
    step behind BM25/tf-idf retrieval (reference parity n/a; this is
    the LLM-pipeline IR extension family).

    Scale shape: text leaves the plan at tokenization — only
    (id, term, tf) rides the shuffles. One (id, term) aggregation, one
    term aggregation, and a per-term top-k expressed as
    ``row_number() <= k`` so Spark's InferWindowGroupLimit inserts the
    map-side Partial group-limit (at most k postings per term per map
    partition reach the exchange — the difference between shipping the
    full posting lists of 10¹¹-token corpora and shipping k rows per
    term). ``min_df`` drops the hapax tail (typically >40% of the
    vocabulary) before the window.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col),
        F.explode(word_ngram_terms(text_col, ngram)).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("corpus_tf"),
    ).filter(F.col("df") >= min_df)
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc(id_col))
    # No pre-window semi join: ranking hapax terms costs ~1 row each
    # under the map-side Partial group limit, while a term-keyed semi
    # join BEFORE the window forces the raw token stream through an
    # early term exchange and collapses the Partial into a single
    # Final (measured — the plan gate caught it). The single inner
    # join against stats below both prunes min_df losers and attaches
    # (df, corpus_tf); it is hint-forced SMJ because stats is
    # vocabulary-scaled (AQE's broadcast auto-conversion sizes on
    # compressed shuffle bytes and materializes web-scale vocabularies
    # driver-side — the measured sparse_cosine_pairs failure mode).
    top = (
        tf.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    return top.join(stats.hint("shuffle_merge"), "term").select(
        "term", "df", "corpus_tf", F.col(id_col), "tf", "rank"
    )


def sparse_cosine_pairs(
    df: "DataFrame",
    id_col: str,
    text_col: str = "text",
    min_sim: float = 0.5,
    max_df_frac: float = 0.25,
    weight_scale: int = 10_000,
    ngram: int = 1,
    prefix_filter: bool = True,
    candidates_out: dict | None = None,
) -> "DataFrame":
    """All-pairs sparse tf-idf cosine similarity via an inverted-index
    self-join (Bayardo et al., WWW'07 — "Scaling Up All Pairs
    Similarity Search"): candidate pairs are generated ONLY through
    shared terms, never by a corpus cross join, which is what makes
    text similarity search feasible where dense-embedding ANN isn't
    available or wanted.

    Scale levers, in the order they bound the work:
    - terms with df > ``max_df_frac``·N (stopwords — the quadratic
      killers, since a term in f docs contributes f² candidate rows)
      are dropped from the VECTORS (both numerator and norms), the
      standard stopword-pruning semantics;
    - hapax terms (df = 1) stay in the norms but can't generate pairs,
      so the join side filters df ≥ 2;
    - ``prefix_filter`` (Bayardo's probe-vs-index asymmetry — round-10
      verdict item 2): candidate generation indexes only each doc's
      PREFIX — the smallest term subset whose excluded remainder has
      Σ x̂ᵢ·maxwᵢ < ``min_sim`` (x̂ = L2-normalized weight, maxw = the
      term's corpus max normalized weight). Any partner's cosine
      contribution from excluded terms is bounded by that sum, so a
      pair ≥ min_sim MUST share an indexed term of its smaller-id
      member — the index-side join arm shrinks from every posting to
      the prefix postings, while scoring still uses FULL vectors (an
      exact verify join over the surviving candidate pairs; output is
      bit-identical with the filter on or off). Excluded mass is
      accumulated in ascending x̂·maxw order, dropping the maximum
      number of postings per doc. The pruning threshold is
      ``min_sim - 5e-7 - 1e-9``, not ``min_sim``: the FINAL output
      filter keeps pairs whose cosine ROUNDED to 6dp is >= min_sim,
      so a pair with true cosine in [min_sim - 5e-7, min_sim)
      survives the unfiltered path — the prefix bound must not prune
      it (round-11 advice); the extra 1e-9 absorbs float error in
      the running bound itself.
    - the pair aggregation shuffles on (id_a, id_b) with map-side
      partial sums.

    ``candidates_out``: pass a dict to receive
    ``{"candidates": DataFrame(id_a, id_b)}`` — the distinct candidate
    pairs generated before exact scoring (observability for the scale
    smoke's before/after candidate-volume comparison; only populated
    on the prefix-filtered path).

    Float robustness across engines: weights are fixed-point
    ``round(tf·idf·weight_scale)`` BIGINTs, so dot products and
    squared norms are EXACT integer sums (associative — immune to
    Spark-vs-DuckDB summation order). The idf itself is computed by
    ``functions/exactmath.ln_ratio_det`` — a basic-ops-only (+ - * /)
    log with an identical expression tree on both engines, so the
    weight doubles are bit-identical BEFORE rounding (a libm
    ``F.log`` could differ from DuckDB's ``ln`` in the last ulp and
    flip a ``round()`` at a half-way boundary — round-10 advice).
    The remaining floating ops are one sqrt and one divide on the
    final exact integers, both correctly rounded IEEE and therefore
    bit-identical cross-engine, then rounded to 6 decimals.

    ``ngram`` > 1 switches the vocabulary from unigrams to word
    n-grams (multiset, a document shorter than n words contributing
    its full word-join once) — on small or templated vocabularies the
    unigram df distribution is too flat to discriminate, while n-gram
    vocabulary grows combinatorially and restores the sparse-vector
    regime ApSS assumes.

    Returns (id_a, id_b, n_shared_terms, cosine) for pairs with
    cosine ≥ ``min_sim``, id_a < id_b.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(word_ngram_terms(text_col, ngram)).alias("term"),
    )
    from pyspark.sql import Window

    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # N from a single-char-class rlike scan, not a third tokenize:
    # lower(text) containing a kept character is exactly
    # normalize_text's emptiness predicate, so the count matches
    # size(words(text)) > 0 row for row (the tfidf_top_terms pattern)
    n_docs = (
        df.filter(F.lower(_c(text_col)).rlike("[a-z0-9\\x80-\\uffff-]"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    weighted = (
        # df as a count-over-window on the term partition (the tfidf
        # window pattern): the old vocabulary-scaled dfreq aggregate +
        # SMJ re-tokenized the corpus on its build arm — the window
        # rides the same term exchange and tf's lineage stays linear
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .join(F.broadcast(n_docs))
        .filter(F.col("df") <= F.col("n_docs") * F.lit(max_df_frac))
        .withColumn(
            "w",
            F.round(
                F.col("tf").cast("double")
                * ln_ratio_det(
                    F.col("n_docs") + F.lit(1), F.col("df") + F.lit(1)
                )
                * F.lit(float(weight_scale))
            ).cast("long"),
        )
        .select("_id", "term", "df", "w")
        # consumed by THREE branches (norms + both join arms); without
        # a checkpoint the tokenize + tf + df aggregations re-execute
        # per branch (round-9 lesson — the term-keyed exchange is
        # reused across the join arms, but the norm aggregation's
        # _id-keyed branch recomputes the whole lineage)
        .localCheckpoint(eager=True)
    )
    norms = weighted.groupBy("_id").agg(
        F.sum(F.col("w") * F.col("w")).alias("norm2")
    )
    if prefix_filter and min_sim > 0:
        # on the prefix path norms feeds THREE branches (na/nb joins +
        # the filter's normalization) — without its own checkpoint each
        # branch re-aggregates the full weighted relation; on the
        # two-consumer direct path the barrier costs more than the one
        # recompute it saves at bench scale
        norms = norms.localCheckpoint(eager=True)
    postings = weighted.filter(F.col("df") >= 2).select("_id", "term", "w")
    a = postings.select(
        F.col("_id").alias("id_a"), "term", F.col("w").alias("w_a")
    )
    b = postings.select(
        F.col("_id").alias("id_b"), "term", F.col("w").alias("w_b")
    )
    if prefix_filter and min_sim > 0:
        from pyspark.sql import Window

        # Per-posting L2-normalized weight and per-term corpus max of
        # it: a partner's coordinate on this term is <= maxw, so the
        # pair's cosine mass from a set S of this doc's terms is
        # <= sum(nw * maxw for S). Exclude postings in ascending
        # contribution order while that running bound stays below
        # min_sim; the kept remainder is the doc's INDEX prefix.
        # merge hint: norms scales with the corpus — it must not
        # auto-convert to a driver broadcast (compressed-stats hazard).
        # NOTE norms aggregates ALL weighted terms (df >= 1) while
        # postings filters df >= 2, so the norm canNOT be a window over
        # postings — the join stays.
        nw = postings.join(norms.hint("shuffle_merge"), "_id").withColumn(
            "nw", F.col("w") / F.sqrt(F.col("norm2").cast("double"))
        )
        # the per-term corpus max IS window-expressible: max-over-term
        # partition on nw itself — the vocabulary-scaled maxw
        # aggregate + SMJ disappear (identical double, exact max)
        contrib = nw.withColumn(
            "maxw", F.max("nw").over(Window.partitionBy("term"))
        ).withColumn(
            "c", F.col("nw") * F.least(F.col("maxw"), F.lit(1.0))
        )
        roll = (
            Window.partitionBy("_id")
            .orderBy(F.asc("c"), F.asc("term"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        indexed = (
            contrib.withColumn("cum", F.sum("c").over(roll))
            # Second, independent bound on the excluded set's cosine
            # mass (round-15, guide §3 — tighten the prefix): by
            # Cauchy–Schwarz the contribution of excluded terms E is
            # <= ||x̂_E||·||ŷ|| <= sqrt(Σ_E nw²), so postings may be
            # excluded while EITHER running bound stays below the
            # threshold.  Both cumulative sums are nondecreasing over
            # the same window order, so the kept set is still a
            # suffix; candidates remain a provable superset of true
            # pairs and the exact verify keeps the output
            # bit-identical (pinned by the 202k planted smoke and the
            # prefix-vs-unfiltered equality test).
            .withColumn("cum2", F.sqrt(F.sum(F.col("nw") * F.col("nw")).over(roll)))
            # slack = 6dp-rounding half-ulp (the output filter keeps
            # ROUNDED cosine >= min_sim, i.e. true cosine down to
            # min_sim - 5e-7) + 1e-9 float error in the running bound
            .filter(
                F.least(F.col("cum"), F.col("cum2"))
                >= F.lit(min_sim - 5e-7 - 1e-9)
            )
            .select("_id", "term")
        )
        cand = (
            indexed.select(F.col("_id").alias("id_a"), "term")
            .join(b.select("id_b", "term"), "term")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        if candidates_out is not None:
            candidates_out["candidates"] = cand
        # Exact verify: full-vector dot over the surviving pairs only
        # (n_shared_terms still counts ALL shared df>=2 terms — the
        # same relation the unfiltered path aggregates).
        dots = (
            cand.join(a, "id_a")
            .join(b, ["id_b", "term"])
            .groupBy("id_a", "id_b")
            .agg(
                F.count(F.lit(1)).alias("n_shared_terms"),
                F.sum(F.col("w_a") * F.col("w_b")).alias("dot"),
            )
        )
    else:
        dots = (
            a.join(b.hint("shuffle_merge"), "term")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(
                F.count(F.lit(1)).alias("n_shared_terms"),
                F.sum(F.col("w_a") * F.col("w_b")).alias("dot"),
            )
        )
    return (
        dots.join(norms.select(F.col("_id").alias("id_a"),
                               F.col("norm2").alias("na"))
                  .hint("shuffle_merge"), "id_a")
        .join(norms.select(F.col("_id").alias("id_b"),
                           F.col("norm2").alias("nb"))
              .hint("shuffle_merge"), "id_b")
        .withColumn(
            "cosine",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("na").cast("double"))
                   * F.sqrt(F.col("nb").cast("double"))),
                6,
            ),
        )
        .filter(F.col("cosine") >= min_sim)
        .select("id_a", "id_b", "n_shared_terms", "cosine")
    )


def pmi_bigrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
    pmi_scale: int = 1_000_000,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over word
    bigrams:

        PMI(x, y) = ln P(x,y) − ln P(x) − ln P(y)
                  = ln c_xy − ln N_bi − ln c_x − ln c_y + 2·ln N_uni

    Every log is the DETERMINISTIC basic-ops ln
    (functions/exactmath.ln_ratio_det over (count, 1)), and the five
    terms are combined in ONE fixed order, so the PMI double is
    bit-identical cross-engine; ordering is frozen through
    ``pmi_fp = round(pmi·pmi_scale)`` BIGINTs with a term tiebreak.
    Computing each ln separately (instead of ln of one big rational)
    also keeps every integer argument ≤ max(count) — no N²·c overflow.

    Scale shape: two token aggregations (unigram, bigram counts — both
    partial-aggregable) and two broadcast joins of the bigram relation
    against the unigram counts keyed on each word; the ``min_count``
    floor prunes the hapax tail BEFORE the joins. Top-k is a global
    sort of the surviving collocations only.

    Returns (term, c_xy, c_x, c_y, pmi_fp, rank), rank 1..k by
    (pmi_fp desc, term asc).
    """
    from curw_flo2d_data_manager_spark.functions.exactmath import (
        ln_ratio_det,
    )
    from pyspark.sql import Window

    # ONE tokenize pass and ONE shuffle for BOTH count relations
    # (guide §2.4/§1.1): the old form ran words() twice (unigram
    # explode + bigram terms — the regex normalize/split is the cost
    # center) and shuffled twice. Tokens never contain spaces, so
    # unigrams and bigram terms share one groupBy keyspace disjointly;
    # a 1-word document's "bigram" (its bare word-join, the
    # word_ngram_terms short-doc convention) is space-free and is
    # dropped by the same contains-space test the old
    # size(split)==2 filter applied. The combined counts relation is
    # checkpointed because its five consumers (n_uni, n_bi, the
    # min_count slice, two join arms) would otherwise push DIFFERENT
    # term filters below the aggregate and defeat exchange reuse —
    # tokenizing the corpus five times (the ApSS-postings lesson);
    # only (term, count) rides the checkpoint, vocabulary-scale.
    w_arr = F.col("_w")
    grams = F.when(
        F.size(w_arr) == 0, F.array().cast("array<string>")
    ).otherwise(
        F.filter(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(w_arr) - 1, F.lit(1))
                ),
                lambda i: F.concat_ws(" ", F.slice(w_arr, i, 2)),
            ),
            lambda t: t.contains(" "),
        )
    )
    toks = df.select(words(text_col).alias("_w")).select(
        F.explode(F.concat(w_arr, grams)).alias("term")
    )
    cnt = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    is_bi = F.col("term").contains(" ")
    uni = cnt.filter(~is_bi).select(
        F.col("term").alias("word"), "c"
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    bi_all = cnt.filter(is_bi).select(
        "term", F.col("c").alias("c_xy")
    )
    # N_bi is the UNFILTERED bigram mass (P(x,y) denominator); the
    # min_count floor only prunes which collocations are scored
    n_bi = bi_all.agg(F.sum("c_xy").alias("n_bi"))
    bi = bi_all.filter(F.col("c_xy") >= min_count)
    parts = bi.select(
        "term",
        "c_xy",
        F.split(F.col("term"), " ").getItem(0).alias("w1"),
        F.split(F.col("term"), " ").getItem(1).alias("w2"),
    )
    # the unigram-count joins are hint-forced to SORT-MERGE: the
    # vocabulary scales with the corpus, and AQE's broadcast
    # auto-conversion sizes on COMPRESSED shuffle bytes — measured on
    # the 1M-doc ApSS probe, a 38M-row term relation compresses under
    # the 64MB threshold and gets materialized driver-side (OOM at the
    # old 8g heap; wasteful at any heap). Only the two single-row
    # totals are hint-broadcast. A bare no-hint join is NOT safe here
    # — the forced broadcast this replaced and AQE's auto-conversion
    # fail the same way at web-scale vocabularies.
    joined = (
        parts.join(
            uni.select(F.col("word").alias("w1"),
                       F.col("c").alias("c_x"))
            .hint("shuffle_merge"),
            "w1",
        )
        .join(
            uni.select(F.col("word").alias("w2"),
                       F.col("c").alias("c_y"))
            .hint("shuffle_merge"),
            "w2",
        )
        .join(F.broadcast(n_uni))
        .join(F.broadcast(n_bi))
    )
    one = F.lit(1)
    pmi = (
        (
            (
                (
                    ln_ratio_det(F.col("c_xy"), one)
                    + F.lit(2.0) * ln_ratio_det(F.col("n_uni"), one)
                )
                - ln_ratio_det(F.col("n_bi"), one)
            )
            - ln_ratio_det(F.col("c_x"), one)
        )
        - ln_ratio_det(F.col("c_y"), one)
    )
    scored = joined.select(
        "term",
        "c_xy",
        "c_x",
        "c_y",
        F.round(pmi * F.lit(float(pmi_scale))).cast("long").alias(
            "pmi_fp"
        ),
    )
    wr = Window.orderBy(F.desc("pmi_fp"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
    )


def signed_ln_ratio_det(num: Column, den: Column) -> Column:
    """Deterministic ``ln(num/den)`` for POSITIVE integer columns with
    ratio on either side of 1: routes through
    :func:`functions.exactmath.ln_ratio_det` (whose contract is
    num >= den >= 1) with the arguments swapped and the sign flipped
    when the ratio is below 1 — the same expression tree both ways, so
    the double stays bit-identical cross-engine."""
    from curw_flo2d_data_manager_spark.functions.exactmath import (
        ln_ratio_det,
    )

    return F.when(num >= den, ln_ratio_det(num, den)).otherwise(
        -ln_ratio_det(den, num)
    )


def domain_js_divergence(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    scale: int = 10**9,
) -> DataFrame:
    """Jensen-Shannon divergence (nats) between each domain's unigram
    distribution P and the whole-corpus distribution Q — the standard
    domain-shift / mixture-drift signal for training-data curation
    (how far a source's token distribution sits from the corpus it
    feeds; DSIR/CCNet-adjacent, reference n/a):

        JSD(P‖Q) = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m),  m = (p+q)/2

    Exactness: with integer counts c_d (term in domain), N_d (domain
    tokens), c_c, N_c (corpus), each ratio is RATIONAL —
    p/m = 2·c_d·N_c / (c_d·N_c + c_c·N_d) — so every log is the
    deterministic basic-ops :func:`signed_ln_ratio_det` of two
    BIGINTs, p and q are single correctly-rounded divides, and every
    summand is frozen to ``round(scale·term)`` BIGINT before the sum:
    the aggregate is an exact integer, immune to engine summation
    order. Final ``DIV 2`` folds the two halves.

    Scale shape: two token aggregations (domain-term, corpus-term),
    one domain-total and one 1-row corpus-total broadcast, and ONE
    vocab x n_domains expansion (domains are the bounded dimension —
    a corpus has tens of sources, not millions) joined left to the
    domain-term counts; all sums partial-aggregate.

    Returns (domain, n_terms, n_tokens, jsd_fp) with
    jsd_fp = round-trip fixed point at ``scale`` (divide by scale for
    nats; 0 <= JSD <= ln 2 ≈ 0.6931).
    """
    toks = df.select(
        F.col(domain_col).alias("_dom"),
        F.explode(words(text_col)).alias("term"),
    )
    # ONE tokenize pass and ONE token-scale shuffle (guide §2.3
    # "aggregate before you shuffle" / §2.4): the corpus-term counts
    # are EXACTLY the domain-term counts summed over domains (integer
    # sums), so cc derives from cd instead of re-tokenizing; cd is
    # checkpointed because its three consumers (nd, the cc subtree,
    # the grid join) would otherwise each re-run tokenize+explode+agg.
    # Only (domain, term, count) rides the checkpoint — vocab x
    # domains scale, not the token stream.
    cd = (
        toks.groupBy("_dom", "term")
        .agg(F.count(F.lit(1)).alias("c_d"))
        .localCheckpoint(eager=True)
    )
    nd = cd.groupBy("_dom").agg(
        F.sum("c_d").alias("n_d"), F.count(F.lit(1)).alias("n_terms")
    )
    cc = cd.groupBy("term").agg(F.sum("c_d").alias("c_c"))
    nc = cc.agg(F.sum("c_c").alias("n_c"))

    # vocab x domains expansion (domains broadcast), left join the
    # domain's own counts; the corpus side q contributes on EVERY
    # term, the domain side p only where c_d > 0
    grid = (
        cc.crossJoin(F.broadcast(nd.select("_dom", "n_d")))
        .join(cd.hint("shuffle_merge"), ["_dom", "term"], "left")
        .crossJoin(F.broadcast(nc))
        .withColumn("c_d", F.coalesce(F.col("c_d"), F.lit(0)))
    )
    den = F.col("c_d") * F.col("n_c") + F.col("c_c") * F.col("n_d")
    p = F.col("c_d").cast("double") / F.col("n_d").cast("double")
    q = F.col("c_c").cast("double") / F.col("n_c").cast("double")
    term_p = F.when(
        F.col("c_d") > 0,
        F.round(
            F.lit(float(scale))
            * p
            * signed_ln_ratio_det(2 * F.col("c_d") * F.col("n_c"), den),
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    term_q = F.round(
        F.lit(float(scale))
        * q
        * signed_ln_ratio_det(2 * F.col("c_c") * F.col("n_d"), den),
    ).cast("long")
    agg = grid.groupBy("_dom").agg(
        F.sum(term_p + term_q).alias("_sum_fp")
    )
    return (
        agg.join(F.broadcast(nd), "_dom")
        .select(
            F.col("_dom").alias("domain"),
            "n_terms",
            F.col("n_d").alias("n_tokens"),
            F.expr("_sum_fp DIV 2").alias("jsd_fp"),
        )
    )
