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

    NULL values are excluded (standard mode semantics — otherwise a
    NULL-heavy column reports NULL as its mode and the negated
    tie-break struct misorders against real values).

    Returns group columns + ``mode_value`` + ``mode_count``.
    """
    cnt = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
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
    group (bounded by value cardinality, not row count). NULL values
    and NULL weights are excluded (a NULL value would sort FIRST in
    the Spark ASC window and absorb weight mass the oracle's
    NULLS-LAST windows never see).
    """
    agg = (
        df.filter(F.col(value_col).isNotNull() & weight_fp.isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.sum(weight_fp).alias("w_fp"))
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
    NULL skew/kurt for degenerate (m2 = 0) groups. NULL values are
    excluded BEFORE the count — otherwise ``n`` counts rows the power
    sums skipped and every moment silently shifts.
    """
    x = value_int.cast("long")
    df = df.filter(value_int.isNotNull())
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


def welch_ttest(
    df: DataFrame,
    value_fp: Column,
    label: Column,
) -> DataFrame:
    """Welch's two-sample t statistic (unequal variances) between the
    label-1 and label-0 populations of ``value_fp`` (an integer
    fixed-point column, so Σx and Σx² are exact BIGINTs).

    ONE conditional-aggregate pass — no join, no window: six sums
    (n, Σx, Σx² per class) reduce map-side; the t statistic and the
    Welch–Satterthwaite degrees of freedom are then assembled with a
    fixed sequence of IEEE basic ops over the exact integers, so the
    unrounded doubles hash-match a SQL oracle spelling the same tree.

    Sample variance uses the textbook (Σx² − (Σx)²/n)/(n−1) form with
    (Σx)²/n computed in DOUBLES — (Σx)² overflows int64 long before
    the sums do, and cross-engine identity only needs the same
    correctly-rounded ops, not integer exactness.

    Returns one row: (n1, n0, mean1, mean0, t_stat, welch_df); t/df
    NULL when either class has < 2 rows or both variances are 0.
    Rows with a NULL value or NULL label are excluded — a NULL label
    would otherwise fall through the CASE into class 0.
    """
    y = label.cast("int")
    x = value_fp.cast("long")
    df = df.filter(value_fp.isNotNull() & label.isNotNull())
    agg = df.agg(
        F.sum(F.when(y == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(y == 1, x).otherwise(0)).alias("s1"),
        F.sum(F.when(y == 1, x * x).otherwise(0)).alias("q1"),
        F.sum(F.when(y == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(y == 0, x).otherwise(0)).alias("s0"),
        F.sum(F.when(y == 0, x * x).otherwise(0)).alias("q0"),
    )
    n1 = F.col("n1").cast("double")
    n0 = F.col("n0").cast("double")
    m1 = F.col("s1").cast("double") / n1
    m0 = F.col("s0").cast("double") / n0
    v1 = (
        F.col("q1").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / n1
    ) / (n1 - F.lit(1.0))
    v0 = (
        F.col("q0").cast("double")
        - F.col("s0").cast("double") * F.col("s0").cast("double") / n0
    ) / (n0 - F.lit(1.0))
    se2 = v1 / n1 + v0 / n0
    t = (m1 - m0) / F.sqrt(se2)
    dfree = (se2 * se2) / (
        (v1 / n1) * (v1 / n1) / (n1 - F.lit(1.0))
        + (v0 / n0) * (v0 / n0) / (n0 - F.lit(1.0))
    )
    ok = (F.col("n1") >= 2) & (F.col("n0") >= 2)
    return agg.select(
        "n1",
        "n0",
        m1.alias("mean1"),
        m0.alias("mean0"),
        F.when(ok & (se2 > 0), t).alias("t_stat"),
        F.when(ok & (se2 > 0), dfree).alias("welch_df"),
    )


def chi_square_fixed(
    df: DataFrame,
    row_col: Column,
    col_col: Column,
    term_scale: int = 1_000_000,
) -> DataFrame:
    """Pearson chi-square independence statistic over a contingency
    table, cross-engine exact: the per-cell term (O−E)²/E is a
    deterministic double (E = row_tot·col_tot/N from exact integer
    counts, one fixed op sequence), frozen to round(term·scale)
    BIGINT — so the SUM over cells is an exact integer, immune to the
    engine's cell visit order (a raw double Σ would drift in the last
    ulps with summation order).

    Scale shape: one (row, col) count aggregation, two broadcast-sized
    marginal aggregations joined back on their key, one global sum.

    Returns one row: (n, n_rows, n_cols, dof, chi2_fp, chi2). Rows
    with a NULL key on either axis are excluded — a NULL group would
    count into ``n`` but never match its marginal join back (NULL
    never equi-joins NULL), silently dropping its term.
    """
    cell = (
        df.filter(row_col.isNotNull() & col_col.isNotNull())
        .select(row_col.alias("_r"), col_col.alias("_c"))
        .groupBy("_r", "_c")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rowm = cell.groupBy("_r").agg(F.sum("o").alias("rt"))
    colm = cell.groupBy("_c").agg(F.sum("o").alias("ct"))
    tot = cell.agg(F.sum("o").alias("n"))
    e = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("n").cast("double")
    )
    diff = F.col("o").cast("double") - e
    term_fp = F.round(
        diff * diff / e * F.lit(float(term_scale))
    ).cast("long")
    # marginals carry no broadcast hint: axis cardinality can be huge
    # (per-user contingency axes), and AQE broadcasts automatically
    # when the measured side is small; only the 1-row total is hinted
    terms = (
        cell.join(rowm, "_r")
        .join(colm, "_c")
        .join(F.broadcast(tot))
        .select(
            F.col("n"),
            F.col("_r"),
            F.col("_c"),
            term_fp.alias("term_fp"),
        )
    )
    return (
        terms.groupBy("n")
        .agg(
            F.count_distinct("_r").alias("n_rows"),
            F.count_distinct("_c").alias("n_cols"),
            F.sum("term_fp").alias("chi2_fp"),
        )
        .select(
            "n",
            "n_rows",
            "n_cols",
            (
                (F.col("n_rows") - 1) * (F.col("n_cols") - 1)
            ).alias("dof"),
            "chi2_fp",
            (
                F.col("chi2_fp").cast("double")
                / F.lit(float(term_scale))
            ).alias("chi2"),
        )
    )


def mutual_info_fixed(
    df: DataFrame,
    x_col: Column,
    y_col: Column,
    ln_scale: int = 1_000_000,
) -> DataFrame:
    """Mutual information I(X;Y) = Σ_cells (c_xy/N)·ln(c_xy·N /
    (c_x·c_y)) in nats, cross-engine exact: every log is the
    deterministic basic-ops ln (functions/exactmath.ln_ratio_det),
    applied to the rational's larger/smaller side with an explicit
    sign (the series needs num ≥ den), then frozen per cell to
    c_xy·round(ln·scale) — a BIGINT whose global sum is exact in any
    visit order. One float divide by N·scale at the end.

    Overflow: c_xy·N must stay < 2⁶³ — fine to ~3e9 rows; the per-cell
    term is ≤ c_xy·scale·ln(N) ≪ 2⁶³ at any realistic cardinality.

    Returns one row: (n, n_cells, mi_fp, mi_nats). NULL keys on
    either axis are excluded (the chi_square_fixed rationale).
    """
    from curw_flo2d_data_manager_spark.functions.exactmath import (
        ln_ratio_det,
    )

    cell = (
        df.filter(x_col.isNotNull() & y_col.isNotNull())
        .select(x_col.alias("_x"), y_col.alias("_y"))
        .groupBy("_x", "_y")
        .agg(F.count(F.lit(1)).alias("cxy"))
    )
    xm = cell.groupBy("_x").agg(F.sum("cxy").alias("cx"))
    ym = cell.groupBy("_y").agg(F.sum("cxy").alias("cy"))
    tot = cell.agg(F.sum("cxy").alias("n"))
    num = F.col("cxy") * F.col("n")
    den = F.col("cx") * F.col("cy")
    ln_fp = F.when(
        num >= den,
        F.round(ln_ratio_det(num, den) * F.lit(float(ln_scale))),
    ).otherwise(
        -F.round(ln_ratio_det(den, num) * F.lit(float(ln_scale)))
    ).cast("long")
    # same no-hint rationale as chi_square_fixed's marginals
    terms = (
        cell.join(xm, "_x")
        .join(ym, "_y")
        .join(F.broadcast(tot))
        .select(F.col("n"), (F.col("cxy") * ln_fp).alias("term_fp"))
    )
    return terms.groupBy("n").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("term_fp").alias("mi_fp"),
    ).select(
        "n",
        "n_cells",
        "mi_fp",
        (
            F.col("mi_fp").cast("double")
            / (F.col("n").cast("double") * F.lit(float(ln_scale)))
        ).alias("mi_nats"),
    )


def gini_fixed(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    cents: int = 100,
) -> DataFrame:
    """Per-key Gini coefficient over a nonnegative 2-decimal money
    column, EXACT:

        G = Σᵢ (2i − n − 1)·xᵢ / (n·Σx)   (x ascending, i = 1..n)

    The value is frozen to integer ``round(x·cents)`` up front (2dp
    doubles round to the same BIGINT on both engines), so the sorted
    weighted sum and the denominator are exact integer aggregates —
    Σ(2i−n−1)x is computed as Σ2ix − (n+1)·Σx from two partial-
    aggregable sums, and the formula is TIE-INVARIANT (equal x swap
    freely under any row_number tiebreak), so the single float op is
    the final divide, rounded to 6 decimals. Rows with NULL or
    negative values are dropped (Gini is defined on nonnegative
    quantities); keys with n == 0 or Σx == 0 return NULL gini.

    Scale shape: tie-invariance lets the rank sum collapse to
    DISTINCT-VALUE blocks — a value v appearing m times after p
    smaller rows contributes ranks p+1..p+m, so
    Σ_{block} 2i·v = v·(2pm + m² + m) — and the per-key window runs
    over the distinct-value relation (partial-aggregated (key, cents)
    counts), not rows: a 52M-row key with 50 distinct prices is a
    50-row window (measured 45 s → sub-second at the 100M-row skewed
    smoke, round 12; previously the row-level window sorted the whole
    key in one partition). Row counts ride a map-side-combined
    groupBy; the window state is one running count.
    Overflow headroom: Σ2ix ≤ 2·n²·max_cents — exact through
    n ≈ 10⁶ rows/key at 10⁶-cent values (unchanged).

    Returns (key_cols..., n, total_cents, gini).
    """
    clean = df.filter(
        F.col(value_col).isNotNull() & (F.col(value_col) >= 0)
    ).select(
        *key_cols,
        F.round(F.col(value_col) * F.lit(cents)).cast("long").alias("_c"),
    )
    blocks = clean.groupBy(*key_cols, "_c").agg(
        F.count(F.lit(1)).alias("_m")
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.asc("_c"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = blocks.withColumn(
        "_p", F.sum("_m").over(w) - F.col("_m")
    )
    # Σ2ix over the block: v · (2·p·m + m² + m) — all BIGINT
    s2ix = F.col("_c") * (
        2 * F.col("_p") * F.col("_m")
        + F.col("_m") * F.col("_m")
        + F.col("_m")
    )
    agg = ranked.groupBy(*key_cols).agg(
        F.sum("_m").alias("n"),
        F.sum(F.col("_c") * F.col("_m")).alias("total_cents"),
        F.sum(s2ix).alias("_s2ix"),
    )
    num = F.col("_s2ix") - (F.col("n") + 1) * F.col("total_cents")
    return agg.select(
        *key_cols,
        "n",
        "total_cents",
        F.when(
            (F.col("n") > 0) & (F.col("total_cents") > 0),
            F.round(
                num.cast("double")
                / (F.col("n").cast("double") * F.col("total_cents").cast("double")),
                6,
            ),
        ).alias("gini"),
    )
