"""Exact-arithmetic rank statistics (Spearman rho, Mann-Whitney U).

Both operators freeze the tie-averaged ranks into INTEGERS by carrying
them doubled — the average rank of a tie group (first + (size−1)/2)
can end in .5, but 2·avg = 2·rank_min + size − 1 is always integral —
so every downstream moment/sum is an exact BIGINT and the result is
bit-identical across engines and partitionings (the same fixed-point
oracle recipe as the PageRank/ApSS family; reference n/a — statistics
extensions over the extracted series).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _rank2(key_cols: list[str], value_col: str):
    """2× tie-averaged rank of ``value_col`` within ``key_cols``:
    2·rank_min + tie_size − 1 (exactly 2·average rank, integral)."""
    w_rank = Window.partitionBy(*key_cols).orderBy(F.asc(value_col))
    w_tie = Window.partitionBy(*key_cols, value_col)
    return (
        2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1
    ).cast("long")


def spearman_rho(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    min_n: int = 3,
) -> DataFrame:
    """Per-key Spearman rank correlation with proper tie averaging:
    Pearson correlation OF THE (doubled) tie-averaged ranks,

        rho = (n·Σxy − Σx·Σy) / sqrt((n·Σxx − Σx²)(n·Σyy − Σy²))

    where x, y are the 2×ranks — every moment an exact BIGINT sum, one
    correctly-rounded sqrt/divide at the end, rounded to 6 decimals
    (the doubling cancels in the correlation). NULL x or y rows are
    dropped; keys with fewer than ``min_n`` rows or zero rank variance
    (all-tied side) return NULL rho.

    Scale shape: two rank windows + one moments aggregate, all on the
    SAME key exchange; no join, no driver state. Overflow headroom:
    2×ranks ≤ 2n so n·Σxy ≤ 4n⁴ — exact through n ≈ 10⁴·⁵ rows per
    key (BIGINT), far beyond any per-series cardinality here.

    Returns (key_cols..., n, rho).
    """
    clean = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    ranked = clean.select(
        *key_cols,
        _rank2(key_cols, x_col).alias("_rx"),
        _rank2(key_cols, y_col).alias("_ry"),
    )
    m = ranked.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_rx").alias("_sx"),
        F.sum("_ry").alias("_sy"),
        F.sum(F.col("_rx") * F.col("_ry")).alias("_sxy"),
        F.sum(F.col("_rx") * F.col("_rx")).alias("_sxx"),
        F.sum(F.col("_ry") * F.col("_ry")).alias("_syy"),
    )
    num = F.col("n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    vx = F.col("n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = F.col("n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    return m.select(
        *key_cols,
        "n",
        F.when(
            (F.col("n") >= min_n) & (vx > 0) & (vy > 0),
            F.round(
                num.cast("double")
                / (
                    F.sqrt(vx.cast("double"))
                    * F.sqrt(vy.cast("double"))
                ),
                6,
            ),
        ).alias("rho"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Mann-Whitney U between two groups with tie-averaged ranks,
    carried doubled so everything stays integral:

        U1·2 = 2·ΣR₁ − n₁(n₁+1)    (ΣR₁ in ordinary rank units)
        U2·2 = 2·n₁·n₂ − U1·2

    Rows outside the two groups (or NULL values) are excluded BEFORE
    ranking. Returns (key_cols..., n_a, n_b, u_a_2x, u_b_2x) — the U
    statistics in 2× fixed point (exact BIGINTs; halve for the
    textbook value, which can end in .5 under ties).

    Scale shape: one rank window + one aggregate on the same key
    exchange (global = a single synthetic key — the combined two-group
    sample must be rankable, so per-key use is the scale path, same as
    every window family here).
    """
    if group_a == group_b:
        raise ValueError(
            f"group_a and group_b must differ (both {group_a!r})"
        )
    keys = list(key_cols or [])
    clean = df.filter(
        F.col(group_col).isin(group_a, group_b)
        & F.col(value_col).isNotNull()
    ).select(
        *keys, F.col(group_col).alias("_g"), F.col(value_col).alias("_v")
    )
    ranked = clean.withColumn("_r2", _rank2(keys, "_v"))
    agg = ranked.groupBy(*keys).agg(
        F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(
            F.when(F.col("_g") == group_a, F.col("_r2")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("_sr2a"),
    )
    u_a = F.col("_sr2a") - F.col("n_a") * (F.col("n_a") + 1)
    return agg.select(
        *keys,
        "n_a",
        "n_b",
        u_a.alias("u_a_2x"),
        (2 * F.col("n_a") * F.col("n_b") - u_a).alias("u_b_2x"),
    )
