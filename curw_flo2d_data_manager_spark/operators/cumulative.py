"""Cumulative sum / cumulative fraction — SURVEY §2 rows A3/A4/W1.

Reference: running total + ``cumulative[i]/total_rain`` with a 0-guard
(input/rain/gen_rain.py:173-187).

Scale note: a cumulative sum over one series is inherently ordered; we
window per-series (``partitionBy(group_cols)``) so each series sorts
independently — thousands of series parallelize across executors. A
single global unpartitioned window is only used when there is exactly
one series (the reference's case: one rain gauge file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cumulative_fraction(
    df: DataFrame,
    time_col: str = "time",
    value_col: str = "value",
    group_cols: list[str] | None = None,
    out_cum: str = "cum_value",
    out_frac: str = "cum_fraction",
) -> DataFrame:
    """Add running-sum and running-sum/total columns.

    ``total == 0`` yields fraction 0.0 (reference 0-guard,
    gen_rain.py:183-186).

    SCALE WARNING: with ``group_cols=None`` both windows run over ONE
    partition (a SinglePartition exchange — the whole relation sorts
    in a single task). That is correct and cheap ONLY for the
    single-bounded-series renders this form exists for (RAIN.DAT is
    one gauge's series, reference gen_rain.py). On any multi-series
    relation ALWAYS pass ``group_cols`` — the per-key window keeps
    every stage as parallel as the key cardinality.
    """
    groups = group_cols or []
    w_run = (
        Window.partitionBy(*groups)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*groups).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = F.sum(value_col).over(w_run)
    total = F.sum(value_col).over(w_all)
    # NULL total (all-null series) takes the 0-guard too — mirrors the
    # reference, where a NaN-poisoned total fails ``total > 0`` and
    # every fraction renders 0 (gen_rain.py:183-186).
    return df.withColumn(out_cum, cum).withColumn(
        out_frac,
        F.when(F.coalesce(total, F.lit(0.0)) == 0, F.lit(0.0)).otherwise(
            F.col(out_cum) / total
        ),
    )
