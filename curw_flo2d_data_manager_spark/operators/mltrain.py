"""Distributed training of a hashed linear quality classifier — the
TRAIN step for the fixed-weight scorer in
``textstats.hash_classifier_score`` (fastText-style hashed bag of
words; public method: full-batch gradient descent on a linear probe).

Exactness-first design: a float GD oracle is impossible cross-engine
(gradient sums accumulate in shuffle order, and libm ``exp`` differs in
the last ulps between engines), so the entire recurrence is EXACT
integer fixed-point — weights carried as w·S BIGINTs, the sigmoid
replaced by the piecewise-linear hard sigmoid clip(m/4 + 1/2, 0, 1)
whose scaled form ``clip(m_fp DIV 4 + S DIV 2, 0, S)`` needs only
multiply / integer-divide / clamp. Every sum is an associative integer
sum; Spark and a SQL engine produce bit-identical weights (Spark ``DIV``
and DuckDB ``//`` both truncate toward zero — verified).

Scale shape: features are md5-hash buckets (the same construction as
hash_classifier_score), so the corpus reduces to a (doc, bucket, count)
relation at tokenize time; per iteration the weight vector (n_buckets
rows) broadcasts into that relation, margins reduce per doc, gradients
reduce per bucket — two partial-aggregable shuffles of id/int tuples,
documents never move after tokenization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.operators.textstats import words


def hash_bucket(term: Column, n_buckets: int) -> Column:
    """md5-prefix bucket, identical to hash_classifier_score's and the
    SQL oracle's ``CAST(('0x' || substring(md5(term), 1, 8)) AS
    BIGINT) % n``."""
    return (
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def train_linear_classifier(
    docs: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
    iters: int = 3,
    scale: int = 10**8,
    lr_den: int = 4,
) -> DataFrame:
    """Full-batch GD on a hard-sigmoid linear probe, exact fixed-point.

    Per iteration, with S = ``scale`` and integer token counts x:

        m_fp(d)  = Σ_b w_fp(b)·x(d,b)                  (exact)
        p_fp(d)  = clip(m_fp DIV 4 + S DIV 2,  0, S)   (hard sigmoid)
        err_fp(d) = p_fp(d) − y(d)·S
        g(b)     = Σ_d err_fp(d)·x(d,b)                (exact)
        w_fp(b) −= g(b) DIV (lr_den · n_docs)

    ``label`` must evaluate to 0/1. Documents with zero tokens are
    excluded from the training set (they have no features). Weights
    start at 0 — the hard sigmoid then outputs exactly 1/2 and the
    first step is the class-balance direction, deterministically.

    Returns (bucket, w_fp) for buckets 0..n_buckets−1, w_fp = w·S.
    """
    if iters < 1:
        raise ValueError(f"iters {iters} < 1")
    toks = docs.select(
        F.col(id_col).alias("_doc"),
        label.cast("long").alias("_y"),
        F.explode(words(text_col)).alias("term"),
    )
    x = (
        toks.groupBy("_doc", "_y", hash_bucket(F.col("term"), n_buckets)
                     .alias("bucket"))
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint(eager=True)
    )
    n = x.select("_doc").distinct().agg(F.count(F.lit(1)).alias("_n"))
    spark = docs.sparkSession
    w = spark.range(n_buckets).select(
        F.col("id").alias("bucket"), F.lit(0).cast("long").alias("w_fp")
    )
    half = scale // 2
    for _ in range(int(iters)):
        margins = (
            x.join(F.broadcast(w), "bucket")
            .groupBy("_doc", "_y")
            .agg(F.sum(F.col("x") * F.col("w_fp")).alias("m_fp"))
        )
        errs = margins.select(
            "_doc",
            (
                F.least(
                    F.greatest(
                        F.expr(f"m_fp DIV 4 + {half}"), F.lit(0).cast("long")
                    ),
                    F.lit(scale).cast("long"),
                )
                - F.col("_y") * F.lit(scale)
            ).alias("err_fp"),
        )
        grads = (
            x.join(errs, "_doc")
            .groupBy("bucket")
            .agg(F.sum(F.col("err_fp") * F.col("x")).alias("_g"))
        )
        w = (
            w.join(grads, "bucket", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "bucket",
                F.expr(
                    f"w_fp - coalesce(_g, 0L) DIV ({lr_den} * _n)"
                ).alias("w_fp"),
            )
        )
    return w


def auc_exact(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "y",
) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney with tie handling) from a scored
    relation: AUC = Σ_s pos(s)·(neg_below(s) + ½·neg(s)) / (P·N),
    carried with the numerator DOUBLED (``auc_num2``) so it is an
    exact integer — cross-engine-safe — with one float divide at the
    end.

    Scale shape: the corpus reduces FIRST to per-distinct-score
    (pos, neg) counts (partial-aggregable; cardinality bounded by the
    score's precision — 6-decimal scores cap it at ~2·10⁶ rows at ANY
    corpus size), and the global-order window runs over that bounded
    relation, never a corpus-wide SinglePartition sort.

    Returns one row: (n_pos, n_neg, auc_num2, auc)."""
    from pyspark.sql import Window

    y = F.col(label_col).cast("long")
    g = scored.groupBy(score_col).agg(
        F.sum(y).alias("pos"),
        F.sum(F.lit(1) - y).alias("neg"),
    )
    w = Window.orderBy(score_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    terms = g.withColumn(
        "_cumneg", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    num2 = F.sum(F.col("pos") * (2 * F.col("_cumneg") + F.col("neg")))
    return terms.agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        num2.alias("auc_num2"),
        # a single-class relation has no ranking to measure — NULL auc
        # instead of an IEEE inf/nan leaking into downstream compares
        F.when(
            (F.sum("pos") > 0) & (F.sum("neg") > 0),
            F.round(num2 / (F.lit(2.0) * F.sum("pos") * F.sum("neg")), 6),
        ).alias("auc"),
    )
