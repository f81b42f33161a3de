"""As-of (most-recent-match) join — a timeseries primitive Spark lacks.

``asof_join(left, right)`` attaches to every left row the latest right
row with the same keys whose time is ≤ the left row's time (backward
direction; optional tolerance bound).

Scale design — NO range join, NO per-key collect:

1. union the two sides with a side marker (right rows sort before left
   rows at equal times, so an exact-time match is taken);
2. one window per key over the union, fill-down (``last`` ignorenulls)
   of the right-side payload;
3. keep the left rows.

Cost: one shuffle on the key (the window partition). This is the same
shape Spark uses for any per-key ordered operation, so it scales to
arbitrarily many keys; a naive ``left.time >= right.time`` range join
would be O(|left|·|right|) per key and is exactly what this avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "time",
    by: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: left rows + the most recent right row at or
    before each left time, matched within ``by`` keys.

    Right payload columns are renamed ``<col><suffix>``; unmatched (or
    out-of-tolerance) left rows keep NULL payload. Exactly the
    semantics of DuckDB/pandas ``ASOF JOIN`` (backward, inclusive).
    """
    keys = by or []
    payload = [c for c in right.columns if c != on and c not in keys]

    l_marked = left.withColumn("_side", F.lit(1))
    for c in payload:
        l_marked = l_marked.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))
    l_marked = l_marked.withColumn(f"{on}{suffix}", F.lit(None).cast("timestamp"))

    left_only = [c for c in left.columns if c not in keys and c != on]
    r_marked = right.select(
        *keys,
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
        F.col(on).alias(f"{on}{suffix}"),
    )
    for c in left_only:
        r_marked = r_marked.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_marked.unionByName(r_marked)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        "_side",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload + [on]
        ],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if tolerance_seconds is not None:
        within = (
            F.col(on).cast("double") - F.col(f"{on}{suffix}").cast("double")
        ) <= float(tolerance_seconds)
        for c in payload + [on]:
            out = out.withColumn(
                f"{c}{suffix}", F.when(within, F.col(f"{c}{suffix}"))
            )
    return out
