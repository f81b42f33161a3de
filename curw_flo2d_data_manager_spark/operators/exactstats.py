"""Exact distributed statistics: mode, weighted median, higher
moments — aggregates usually shipped as approximations, computed here
with the engine's fixed-point exactness contract (integer partial
sums are associative, so any partitioning and either engine produces
identical results; see operators/pagerank.py for the pattern's
rationale).

Scale shape shared by all three: the heavy input collapses in a
partial-aggregable groupBy keyed (group, value) or (group,) BEFORE
anything order-sensitive runs — the window/argmax stages see one row
per distinct value per group, not one per input row. No operator here
sorts the raw relation.

The reference computes only first-order aggregates (sums, max — e.g.
``input/raincell/gen_raincell.py`` accumulates per-cell sums); these
exist for the Spark engine's corpus-statistics extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_mode(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Per-group mode with a deterministic min-value tie-break.

    Two partial-aggregable shuffles: (group, value) count, then an
    argmax per group expressed as ``max(struct(cnt, neg_value))`` —
    NO rank window, so a group's candidate rows combine map-side
    instead of sorting in one task (the hot-group-safe argmax, same
    shape as LPA's label vote in operators/components.py).

    Returns group columns + ``mode_value`` + ``mode_count``.
    """
    cnt = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        cnt.groupBy(*group_cols)
        .agg(
            F.max(
                F.struct(
                    F.col("cnt"), (-F.col(value_col)).alias("neg_v")
                )
            ).alias("m")
        )
        .select(
            *group_cols,
            (-F.col("m.neg_v")).alias("mode_value"),
            F.col("m.cnt").alias("mode_count"),
        )
    )


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_fp: Column,
) -> DataFrame:
    """Exact lower weighted median per group: the smallest value v
    such that 2·Σ(weight | value ≤ v) ≥ Σ weight, with ``weight_fp``
    an INTEGER (fixed-point) weight column so the cumulative and total
    sums are exact on any engine and partitioning.

    The "lower median" pick rule is deliberately interpolation-free —
    percentile_cont-style interpolation is an ``a + (b-a)·f`` float
    whose last ulp differs from ``(a+b)/2`` and between engines; a
    rank-threshold rule is pure integer comparison.

    Scale: one (group, value) pre-aggregation collapses the raw
    relation, then a cumulative window over the DISTINCT values per
    group (bounded by value cardinality, not row count).
    """
    agg = df.groupBy(*group_cols, value_col).agg(
        F.sum(weight_fp).alias("w_fp")
    )
    wspec = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy(*group_cols)
    cum = agg.select(
        *group_cols,
        F.col(value_col),
        F.sum("w_fp").over(wspec).alias("cum_w"),
        F.sum("w_fp").over(tot).alias("tot_w"),
    )
    picked = cum.filter(F.lit(2) * F.col("cum_w") >= F.col("tot_w"))
    return (
        picked.groupBy(*group_cols)
        .agg(
            F.min(value_col).alias("weighted_median"),
            F.max("tot_w").alias("total_weight_fp"),
        )
    )


def moments_fixed(
    df: DataFrame,
    group_cols: list[str],
    value_int: Column,
) -> DataFrame:
    """Exact skewness and kurtosis from integer raw power sums.

    ``value_int`` must be an integer-valued column (pre-scale floats
    to fixed point). The four raw sums Σx, Σx², Σx³, Σx⁴ are BIGINT
    aggregates — exact and associative — and the population central
    moments are assembled from them with ONE fixed sequence of
    IEEE-correctly-rounded basic ops (+ - * / sqrt), so the final
    doubles are bit-identical between Spark and a SQL oracle that
    spells the same expression tree (the exactmath contract):

        m2 = S2/n - mean²           (mean = S1/n)
        m3 = S3/n - 3·mean·S2/n + 2·mean³
        m4 = S4/n - 4·mean·S3/n + 6·mean²·S2/n - 3·mean⁴
        skew = m3 / (sqrt(m2))³ ;  kurt = m4 / m2² - 3

    Overflow headroom: |Σx⁴| ≤ n·max|x|⁴ — at max|x| = 10⁴ that is
    ~10¹⁶·n… keep ``value_int`` small (quantities, scaled centered
    values) or pre-aggregate per group; 2⁶³ supports n·max|x|⁴ < 9e18.

    Returns group cols + n + mean/m2/skewness/kurtosis (excess),
    NULL skew/kurt for degenerate (m2 = 0) groups.
    """
    x = value_int.cast("long")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n - mean * mean
    m3 = (
        F.col("s3").cast("double") / n
        - F.lit(3.0) * mean * (F.col("s2").cast("double") / n)
        + F.lit(2.0) * mean * mean * mean
    )
    m4 = (
        F.col("s4").cast("double") / n
        - F.lit(4.0) * mean * (F.col("s3").cast("double") / n)
        + F.lit(6.0) * mean * mean * (F.col("s2").cast("double") / n)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    sd = F.sqrt(m2)
    return agg.select(
        *group_cols,
        F.col("n"),
        mean.alias("mean"),
        m2.alias("m2"),
        F.when(m2 > 0, m3 / (sd * sd * sd)).alias("skewness"),
        F.when(m2 > 0, m4 / (m2 * m2) - F.lit(3.0)).alias("kurtosis"),
    )
