"""Fill-down (last non-null over an ordering) — SURVEY §2 row W3.

THE key idiom for the FLO-2D output-file parsers: the reference's
line-by-line state machine (``isWaterLevelLines`` flags,
output/extract_water_level.py:459-523) becomes "tag header rows, then
propagate the last non-null header id down the file order".

Scale note: an unpartitioned ``Window.orderBy`` is a single global
sort. FLO-2D outputs are single files ≪ memory so that is fine; for
huge line-oriented inputs pass ``partition_cols`` (e.g. file name) so
each file fills down independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fill_down(
    df: DataFrame,
    cols: list[str],
    order_col: str = "line_no",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Replace NULLs in ``cols`` with the last preceding non-null value
    in ``order_col`` order (per partition group if given)."""
    w = (
        Window.partitionBy(*(partition_cols or []))
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
