"""normalize_for_dedup / canonicalize_url unit behavior: known inputs →
known canonical forms, idempotence, and codegen-only plans (no UDF,
no shuffle — both helpers must ride the scan)."""

from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.operators.textstats import (
    canonicalize_url,
    normalize_for_dedup,
)


def _one(spark, expr, value):
    return (
        spark.createDataFrame([(value,)], "s string")
        .select(expr(F.col("s")).alias("out"))
        .collect()[0]["out"]
    )


def test_normalize_collapses_case_punct_whitespace(spark):
    variants = [
        "The quick, brown fox!",
        "  the QUICK  brown--fox ",
        "the\tquick\nbrown fox?!",
    ]
    outs = {_one(spark, normalize_for_dedup, v) for v in variants}
    assert outs == {"the quick brown fox"}


def test_normalize_is_idempotent(spark):
    v = "A+B = c;  d_e"
    once = _one(spark, normalize_for_dedup, v)
    assert _one(spark, normalize_for_dedup, once) == once


def test_canonicalize_url_known_forms(spark):
    cases = {
        "https://www.Site.org/p/1/?utm_source=x&id=2": "site.org/p/1?id=2",
        "http://site.org/p/1?id=2&utm_campaign=y#frag": "site.org/p/1?id=2",
        "HTTPS://SITE.ORG/p/1/?id=2": "site.org/p/1?id=2",
        "http://site.org/p/1?fbclid=abc123": "site.org/p/1",
        "https://site.org/p/1/": "site.org/p/1",
        "https://site.org": "site.org",
        # param ORDER must not matter: sorted canonical params
        "http://site.org/x?b=2&a=1": "site.org/x?a=1&b=2",
        "http://site.org/x?a=1&b=2&gclid=z": "site.org/x?a=1&b=2",
    }
    for raw, want in cases.items():
        assert _one(spark, canonicalize_url, raw) == want, raw


def test_helpers_stay_in_codegen(spark):
    df = spark.createDataFrame([("x",)], "s string").select(
        normalize_for_dedup(F.col("s")).alias("n"),
        canonicalize_url(F.col("s")).alias("c"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dedup_normalizer_is_distinct_from_tokenizer_normalizer(spark):
    # regression: normalize_for_dedup must NOT shadow the tokenizer's
    # normalize_text — the tokenizer keeps unicode + hyphens (CJK text
    # survives words()), the dedup key normalizer strips them
    from curw_flo2d_data_manager_spark.operators.textstats import (
        normalize_text,
    )

    v = "Grüße—你好 re-try"
    tok = _one(spark, normalize_text, v)
    key = _one(spark, normalize_for_dedup, v)
    assert "你好" in tok and "grüße" in tok and "re-try" in tok
    assert key == "gr e re try"
