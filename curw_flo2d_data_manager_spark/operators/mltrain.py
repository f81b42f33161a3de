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


def linreg_normal_exact(
    df: DataFrame,
    group_cols: list[str],
    x_int: Column,
    y_fp: Column,
) -> DataFrame:
    """Exact closed-form simple linear regression (normal equations)
    per group — the fixed-point counterpart of the float
    ``regr_slope`` path (queries.w_trend_slope): all five sufficient
    statistics n, Σx, Σy, Σx², Σxy are BIGINT sums over integer
    inputs (``x_int`` integer-valued, ``y_fp`` pre-scaled fixed
    point), so they are exact and associative on any engine and
    partitioning; the slope/intercept assembly then uses ONE fixed
    sequence of correctly-rounded casts and divides, bit-identical
    cross-engine (the exactmath contract).

    The cross products n·Σxy and Σx·Σy exceed BIGINT long before the
    sums do, so they are computed in DECIMAL(38,0) (Spark) /
    HUGEINT-exact (SQL oracle) — exact integers up to ~10³⁸.

    Overflow headroom on the SUMS: |Σxy| ≤ n·max|x|·max|y_fp| must
    stay < 2⁶³ ≈ 9.2e18 — at max|x| = 50, max|y_fp| = 10⁷ that is
    n < 1.8e10 rows PER GROUP; rescale y_fp down for more.

    Returns group cols + n + slope_fp (y_fp units per x unit),
    intercept_fp, corr — slope/intercept NULL for degenerate
    (zero-variance-x) groups. Rows with a NULL x or y are excluded
    BEFORE the count, so ``n`` never counts rows the sums skipped.
    """
    x = x_int.cast("long")
    y = y_fp.cast("long")
    df = df.filter(x_int.isNotNull() & y_fp.isNotNull())
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = d("n") * d("sxx") - d("sx") * d("sx")
    deny = d("n") * d("syy") - d("sy") * d("sy")
    slope = num.cast("double") / den.cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    corr = num.cast("double") / (
        F.sqrt(den.cast("double")) * F.sqrt(deny.cast("double"))
    )
    nz = den.cast("double") > 0
    return agg.select(
        *group_cols,
        F.col("n"),
        F.when(nz, slope).alias("slope_fp"),
        F.when(nz, intercept).alias("intercept_fp"),
        F.when(nz & (deny.cast("double") > 0), corr).alias("corr"),
    )


def ks_statistic_exact(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "y",
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    score distributions of the positive (label 1) and negative
    (label 0) classes: D = max over thresholds of |F̂₁(t) - F̂₀(t)|,
    carried as the INTEGER numerator |cum₁·n₀ - cum₀·n₁| so the max
    and its arg are exact on any engine (same doubled-numerator trick
    as ``auc_exact``), with one float divide at the end.

    Scale shape mirrors auc_exact: per-distinct-score (pos, neg)
    counts first (partial-aggregable, cardinality bounded by score
    precision), then cumulative windows over that bounded relation.
    The argmax threshold ties break to the SMALLEST score via
    ``max(struct(d_num, -score))``.

    Overflow: cum·n ≤ n₁·n₀ < 2⁶³ requires n₁·n₀ < 9.2e18 — both
    classes under ~3e9 rows.

    Returns one row: (n_pos, n_neg, ks_num, ks_stat, ks_at_score).
    NULL scores and NULL labels are excluded — a NULL score would
    rank FIRST in Spark's ASC window (the round-10 candidate-ordering
    lesson) while the oracle's NULLS-LAST windows place it last.
    """
    from pyspark.sql import Window

    y = F.col(label_col).cast("long")
    scored = scored.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    g = scored.groupBy(score_col).agg(
        F.sum(y).alias("pos"),
        F.sum(F.lit(1) - y).alias("neg"),
    )
    w = Window.orderBy(score_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy()
    cum = g.select(
        F.col(score_col),
        F.sum("pos").over(w).alias("cpos"),
        F.sum("neg").over(w).alias("cneg"),
        F.sum("pos").over(tot).alias("n_pos"),
        F.sum("neg").over(tot).alias("n_neg"),
    )
    d_num = F.abs(
        F.col("cpos") * F.col("n_neg") - F.col("cneg") * F.col("n_pos")
    )
    terms = cum.select(
        "n_pos",
        "n_neg",
        F.struct(
            d_num.alias("d"), (-F.col(score_col)).alias("neg_s")
        ).alias("cand"),
    )
    return (
        terms.groupBy("n_pos", "n_neg")
        .agg(F.max("cand").alias("m"))
        .select(
            "n_pos",
            "n_neg",
            F.col("m.d").alias("ks_num"),
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                F.round(
                    F.col("m.d").cast("double")
                    / (
                        F.col("n_pos").cast("double")
                        * F.col("n_neg").cast("double")
                    ),
                    6,
                ),
            ).alias("ks_stat"),
            (-F.col("m.neg_s")).alias("ks_at_score"),
        )
    )


def ndcg_at_k(
    ranked: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
    gain_scale: int = 1_000_000,
) -> DataFrame:
    """Exact-arithmetic NDCG@k over a ranked retrieval run with
    BINARY relevance: the per-position discount 1/log₂(rank+1) is
    frozen into a fixed-point BIGINT gain

        g(r) = round(gain_scale · LN2 / ln(r+1))

    with ``ln`` the deterministic basic-ops log
    (functions/exactmath.ln_ratio_det) — the gain table is therefore
    bit-identical cross-engine, DCG = Σ rel·g(rank) and the binary
    ideal IDCG = Σ_{i=1..min(n_rel,k)} g(i) are exact integer sums,
    and NDCG needs one correctly-rounded divide.

    Input: one row per (query, rank 1..k) with ``rel_col`` ∈ {0, 1}.
    Returns (query, n_rel, dcg_fp, idcg_fp, ndcg); queries with zero
    relevant rows in the run get NULL ndcg (no ideal to normalize by).
    """
    from curw_flo2d_data_manager_spark.functions.exactmath import (
        LN2_DET,
        ln_ratio_det,
    )

    def gain(rank: Column) -> Column:
        lnr = ln_ratio_det(rank + F.lit(1), F.lit(1))
        return F.round(
            F.lit(float(gain_scale)) * F.lit(float(LN2_DET)) / lnr
        ).cast("long")

    rel = F.col(rel_col).cast("long")
    per_q = (
        ranked.filter(F.col(rank_col) <= k)
        .groupBy(query_col)
        .agg(
            F.sum(rel).alias("n_rel"),
            F.sum(rel * gain(F.col(rank_col))).alias("dcg_fp"),
        )
    )
    # Spark's sequence(1, 0) DESCENDS ([1, 0]) and gain(0) divides by
    # ln(1) = 0 — clamp the top to 1 and NULL the n_rel = 0 case out.
    ideal = per_q.withColumn(
        "idcg_fp",
        F.when(
            F.col("n_rel") > 0,
            F.aggregate(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(
                            F.least(F.col("n_rel"), F.lit(k)), F.lit(1)
                        ),
                    ),
                    lambda i: gain(i),
                ),
                F.lit(0).cast("long"),
                lambda acc, g: acc + g,
            ),
        ),
    )
    return ideal.select(
        query_col,
        "n_rel",
        "dcg_fp",
        "idcg_fp",
        F.when(
            F.col("n_rel") > 0,
            F.round(
                F.col("dcg_fp").cast("double")
                / F.col("idcg_fp").cast("double"),
                6,
            ),
        ).alias("ndcg"),
    )


def mrr_at_k(
    ranked: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Exact-arithmetic reciprocal rank @k over a ranked retrieval run
    with binary relevance: per query the rank of the FIRST relevant
    result, and its reciprocal frozen to fixed point
    ``rr_fp = scale DIV first_rel_rank`` — a single integer divide, so
    the value (and any downstream mean) is bit-identical cross-engine
    (the float 1/rank family differs in the last ulp between engines
    once summed; reference n/a — retrieval-eval extension beside
    :func:`ndcg_at_k`).

    Input: one row per (query, rank 1..k). Returns
    (query, first_rel_rank, rr_fp); queries with no relevant result in
    the top-k get NULLs (they still appear — the caller decides
    whether MRR averages over them as zero).

    Scale shape: one partial-aggregable min per query — no window, no
    per-query materialization.
    """
    rel = F.col(rel_col).cast("long")
    first = (
        ranked.filter(F.col(rank_col) <= k)
        .groupBy(query_col)
        .agg(
            F.min(
                F.when(rel == 1, F.col(rank_col).cast("long"))
            ).alias("first_rel_rank")
        )
    )
    return first.select(
        query_col,
        "first_rel_rank",
        F.expr(f"CAST({scale} AS BIGINT) DIV first_rel_rank").alias(
            "rr_fp"
        ),
    )


def average_precision_at_k(
    ranked: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Exact-arithmetic average precision @k (the per-query summand of
    MAP) with binary relevance:

        AP = (Σ_{relevant positions r} P@r) / n_rel,
        P@r = cum_rel(r) / r

    Every precision is frozen to fixed point BEFORE summation —
    ``(scale·cum_rel) DIV r`` — so the per-query sum is an exact
    integer and the final ``DIV n_rel`` one more exact integer op:
    bit-identical cross-engine regardless of summation order.

    Input: one row per (query, rank 1..k). Returns (query, n_rel,
    ap_fp); ap_fp NULL when the query has no relevant result in the
    run. The running cum_rel window is bounded by k rows per query.
    """
    from pyspark.sql import Window

    rel = F.col(rel_col).cast("long")
    w = (
        Window.partitionBy(query_col)
        .orderBy(F.asc(rank_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = ranked.filter(F.col(rank_col) <= k).withColumn(
        "_cum", F.sum(rel).over(w)
    )
    per_q = cum.groupBy(query_col).agg(
        F.sum(rel).alias("n_rel"),
        F.sum(
            F.when(
                rel == 1,
                F.expr(
                    f"(CAST({scale} AS BIGINT) * _cum) DIV "
                    f"CAST({rank_col} AS BIGINT)"
                ),
            )
        ).alias("_ap_sum"),
    )
    return per_q.select(
        query_col,
        "n_rel",
        F.when(
            F.col("n_rel") > 0, F.expr("_ap_sum DIV n_rel")
        ).alias("ap_fp"),
    )
