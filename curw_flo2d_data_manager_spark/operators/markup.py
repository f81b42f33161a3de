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
2. drop ``<!-- ... -->`` comments;
3. drop every remaining ``<...>`` tag (a malformed ``<`` with no
   closing ``>`` is left alone — it is text, not markup);
4. decode the common named/numeric entities (``&lt; &gt; &quot;
   &apos; &#34; &#39; &nbsp;`` and LAST ``&amp;`` — decoding the
   ampersand last keeps escaped text like ``&amp;lt;`` from turning
   into markup); rarer numeric entities pass through verbatim
   (documented limitation — full numeric decode needs a per-row
   codepoint computation no regex can express);
5. collapse whitespace runs to one space and trim.

Step 3 runs BEFORE step 4 on purpose: ``&lt;b&gt;`` is escaped TEXT
in the source document and must survive as ``<b>`` in the output,
not be stripped as a tag.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) applied in order with replace-all semantics.
_REGEX_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script\s*>", " "),
    (r"(?is)<style[^>]*>.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
]

# literal (not regex) replacements, in order; &amp; MUST come last.
_ENTITY_STEPS: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_html(col: Column | str) -> Column:
    """Rendered-text projection of an HTML string column."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _REGEX_STEPS:
        c = F.regexp_replace(c, pat, rep)
    for lit, rep in _ENTITY_STEPS:
        c = F.replace(c, F.lit(lit), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def strip_html_sql(expr: str) -> str:
    """DuckDB twin of :func:`strip_html` — the same chain, same
    order, RE2-safe patterns with the 'g' flag."""
    s = expr
    for pat, rep in _REGEX_STEPS:
        p = pat.replace("'", "''")
        s = f"regexp_replace({s}, '{p}', '{rep}', 'g')"
    for lit, rep in _ENTITY_STEPS:
        rl = rep.replace("'", "''")
        s = f"replace({s}, '{lit}', '{rl}')"
    return f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"


def strip_markup(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text",
) -> DataFrame:
    """Replace (or add) ``out_col`` with the stripped rendering of
    ``text_col``.  Pure projection — composes ahead of quality/dedup
    in an import pipeline at zero extra passes."""
    return df.withColumn(out_col, strip_html(text_col))
