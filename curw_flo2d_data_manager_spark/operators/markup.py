"""HTML/markup stripping for crawl ingestion.

Web-crawl corpora arrive as HTML; every downstream text operator
(quality scoring, dedup, language ID, token budgeting) wants the
rendered text.  This is a pure regexp/replace chain that rides the
scan — single projection, no shuffle, no Python — applied BEFORE the
text operators in an import pipeline.

Semantics (identical on Spark/Java regex and DuckDB/RE2 — patterns
avoid backreferences and lookaround, which RE2 lacks):

1. drop ``<script>...</script>`` and ``<style>...</style>`` blocks
   including their contents (case-insensitive, dot-matches-newline);
   the open tag must be exactly ``script``/``style`` optionally
   followed by whitespace+attributes — ``<script-loader>`` or
   ``<styleguide>`` are ordinary tags, their content survives;
2. drop ``<!-- ... -->`` comments;
3. drop every remaining ``<...>`` span that LOOKS like markup: the
   character after ``<`` must be a tag-start (letter, ``/``, ``!``
   or ``?``).  A loose ``<`` in prose (``x < y and z > 0``) is text,
   not markup, and survives — as does a malformed ``<`` with no
   closing ``>``;
4. decode the common named entities (``&lt; &gt; &quot; &apos;
   &nbsp;``), then ALL well-formed numeric character references —
   decimal ``&#NNN;`` (≤8 digits) and hex ``&#xHH;``/``&#XHH;``
   (≤8 digits) — to their Unicode codepoint, and LAST the ampersand
   forms (``&amp;``, ``&#38;``, ``&#x26;``).  Decoding the ampersand
   last keeps escaped text like ``&amp;lt;`` from turning into
   markup; numeric references to the ampersand get the same
   last-pass treatment so a decode can never create a new decodable
   sequence.  The ampersand forms follow the SAME case and length
   rules as the rest of the chain: ``&amp;`` is case-sensitive like
   every other named entity, and the zero-padded numeric spellings
   are bounded to the ≤8-digit budget (``&AMP;`` or a 9+-digit
   padded form passes through verbatim).  References that are out of Unicode range, surrogates,
   ``&#0;``, or longer than 8 digits pass through verbatim
   (documented: the HTML spec maps these to U+FFFD; we keep the
   source text instead — deterministically, on both engines).
   Adversarial split references (``&am&#112;;``) double-decode on
   both engines identically (documented divergence from the spec's
   single-pass rule);
5. collapse whitespace runs to one space and trim.

Step 3 runs BEFORE step 4 on purpose: ``&lt;b&gt;`` is escaped TEXT
in the source document and must survive as ``<b>`` in the output,
not be stripped as a tag.

The numeric decode (step 4b) is split-and-reassemble: split the text
on the reference pattern, extract the matched references, map each to
its character (Spark: ``decode(unhex(lpad(hex(n), 8, '0')),
'UTF-32')`` — correct for any codepoint incl. astral planes, unlike
``char()`` which is mod-256; DuckDB: ``chr(n)``), and interleave.
Rows without ``&#`` skip the machinery via a lazy CASE, so the common
path stays one regexp chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) applied in order with replace-all semantics.
_REGEX_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script(\s[^>]*)?>.*?</script\s*>", " "),
    (r"(?is)<style(\s[^>]*)?>.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[a-zA-Z/!?][^>]*>", " "),
]

# literal (not regex) named-entity replacements, in order; the
# ampersand forms are handled LAST by _AMP_FINAL (regex, after the
# numeric decode).
_ENTITY_STEPS: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&nbsp;", " "),
]

# Well-formed numeric character reference (bounded digit runs: longer
# runs are left verbatim rather than risking overflow).
_NUMREF_PAT = r"&#([0-9]{1,8}|[xX][0-9a-fA-F]{1,8});"

# The final ampersand pass: &amp; plus every numeric spelling of '&'
# the bounded reference pattern defers here — decimal 38 / hex 26
# with leading zeros up to the same ≤8-digit budget as _NUMREF_PAT.
# Case-SENSITIVE like every other named entity (round-14: the old
# ``(?i)`` made '&AMP;' the only case-insensitive entity, and ``0*``
# decoded >8-digit zero-padded forms that the numeric stage documents
# as pass-through-verbatim).
_AMP_FINAL_PAT = r"&amp;|&#0{0,6}38;|&#[xX]0{0,6}26;"

_MAX_CODEPOINT = 0x10FFFF
_SURR_LO, _SURR_HI = 0xD800, 0xDFFF


def _decode_numref(e: Column) -> Column:
    """Map one matched reference string (e.g. ``&#8212;`` or
    ``&#x1F4A9;``) to its character; invalid codepoints (0,
    surrogates, > U+10FFFF) and the ampersand (deferred to the final
    pass) stay verbatim."""
    body = F.substr(e, F.lit(3), F.length(e) - F.lit(3))
    is_hex = F.lower(F.substr(body, F.lit(1), F.lit(1))) == "x"
    n = F.when(
        is_hex,
        F.conv(F.substr(body, F.lit(2), F.length(body)), 16, 10)
        .try_cast("bigint"),
    ).otherwise(body.try_cast("bigint"))
    valid = (
        n.isNotNull()
        & (n >= 1)
        & (n <= _MAX_CODEPOINT)
        & ~n.between(_SURR_LO, _SURR_HI)
        & (n != 38)
    )
    ch = F.decode(F.unhex(F.lpad(F.hex(n), 8, "0")), "UTF-32")
    return F.when(valid, ch).otherwise(e)


def _decode_numeric_refs(c: Column) -> Column:
    """Split on the reference pattern, decode each match, interleave
    the segments back.  ``split(..., -1)`` keeps trailing empty
    segments, so segments = matches + 1 always and the zip is exact."""
    seg = F.split(c, _NUMREF_PAT, -1)
    ents = F.regexp_extract_all(c, F.lit(_NUMREF_PAT), F.lit(0))
    joined = F.concat(
        F.element_at(seg, 1),
        F.array_join(
            F.zip_with(
                F.transform(ents, _decode_numref),
                F.slice(seg, 2, F.greatest(F.size(seg) - 1, F.lit(0))),
                lambda d, s: F.concat(d, s),
            ),
            "",
        ),
    )
    return F.when(c.contains("&#"), joined).otherwise(c)


def strip_html(col: Column | str) -> Column:
    """Rendered-text projection of an HTML string column.

    Two lazy-CASE fast paths (round-14): rows without ``<`` skip all
    four tag/comment/script regex passes, and rows without ``&``
    after stripping skip the whole entity/numeric/ampersand chain —
    a clean document pays two ``contains`` probes plus the final
    whitespace collapse. Pure short-circuits: every skipped stage is
    a no-op on its gated input, so output is byte-identical to the
    ungated chain (pinned against the plain-``re`` replay in
    tests/tools)."""
    c = F.col(col) if isinstance(col, str) else col
    s = c
    for pat, rep in _REGEX_STEPS:
        s = F.regexp_replace(s, pat, rep)
    stripped = F.when(c.contains("<"), s).otherwise(c)
    e = stripped
    for lit, rep in _ENTITY_STEPS:
        e = F.replace(e, F.lit(lit), F.lit(rep))
    e = _decode_numeric_refs(e)
    e = F.regexp_replace(e, _AMP_FINAL_PAT, "&")
    decoded = F.when(stripped.contains("&"), e).otherwise(stripped)
    return F.trim(F.regexp_replace(decoded, r"\s+", " "))


def strip_html_pre_sql(expr: str) -> str:
    """DuckDB twin, stage 1: regex strips + named entities.  Kept
    separate so an oracle can materialize this once in a subquery —
    the numeric-decode stage references its input several times."""
    s = expr
    for pat, rep in _REGEX_STEPS:
        p = pat.replace("'", "''")
        s = f"regexp_replace({s}, '{p}', '{rep}', 'g')"
    # same lazy tag gate as the Spark side (pure short-circuit)
    s = f"(CASE WHEN contains({expr}, '<') THEN {s} ELSE {expr} END)"
    for lit, rep in _ENTITY_STEPS:
        rl = rep.replace("'", "''")
        s = f"replace({s}, '{lit}', '{rl}')"
    return s


def _decode_numref_sql(e: str) -> str:
    body = f"substr({e}, 3, length({e}) - 3)"
    n = (
        f"(CASE WHEN lower(substr({body}, 1, 1)) = 'x'"
        f" THEN try_cast('0x' || substr({body}, 2) AS BIGINT)"
        f" ELSE try_cast({body} AS BIGINT) END)"
    )
    valid = (
        f"({n} IS NOT NULL AND {n} >= 1 AND {n} <= {_MAX_CODEPOINT}"
        f" AND NOT ({n} BETWEEN {_SURR_LO} AND {_SURR_HI})"
        f" AND {n} != 38)"
    )
    return (
        f"CASE WHEN {valid} THEN chr(CAST({n} AS INTEGER)) ELSE {e} END"
    )


def strip_html_post_sql(expr: str) -> str:
    """DuckDB twin, stage 2: numeric character references, the final
    ampersand pass, whitespace collapse.  ``expr`` should be a cheap
    column reference (it is used several times)."""
    pat = _NUMREF_PAT
    seg = f"regexp_split_to_array({expr}, '{pat}')"
    ents = f"regexp_extract_all({expr}, '{pat}', 0)"
    dec = _decode_numref_sql(f"({ents})[i]")
    # coalesce: DuckDB array_to_string([], '') is NULL, not ''
    joined = (
        f"(({seg})[1] || coalesce(array_to_string(list_transform("
        f"range(1, len({ents}) + 1),"
        f" i -> ({dec}) || ({seg})[i + 1]), ''), ''))"
    )
    s = f"(CASE WHEN contains({expr}, '&#') THEN {joined} ELSE {expr} END)"
    s = f"regexp_replace({s}, '{_AMP_FINAL_PAT}', '&', 'g')"
    return f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"


def strip_html_sql(expr: str) -> str:
    """DuckDB twin of :func:`strip_html` — the same chain, same
    order, RE2-safe patterns with the 'g' flag.  For oracle SQL over
    wide expressions prefer staging :func:`strip_html_pre_sql` in a
    subquery and applying :func:`strip_html_post_sql` to the column."""
    return strip_html_post_sql(strip_html_pre_sql(expr))


def strip_markup(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text",
) -> DataFrame:
    """Replace (or add) ``out_col`` with the stripped rendering of
    ``text_col``.  Pure projection — composes ahead of quality/dedup
    in an import pipeline at zero extra passes."""
    return df.withColumn(out_col, strip_html(text_col))
