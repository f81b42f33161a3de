"""Multi-resolution time rollup (hypertable continuous-aggregate
shape): materialize a series at several bucket widths in one plan.

Each coarser level aggregates the NEXT-FINER level, not the raw rows —
at 100 TB the raw table is scanned once for the finest resolution and
every further level reduces data that is already orders of magnitude
smaller (the TimescaleDB/materialized-rollup pattern, expressed as a
chain of Spark aggregations). Levels must be integer multiples of the
previous level for the cascade to be lossless for sums/counts/min/max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.functions.timeutil import right_closed_bucket


def rollup_cascade(
    df: DataFrame,
    minutes_levels: list[int],
    time_col: str = "time",
    value_col: str = "value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Right-closed sum rollups at each level; returns the union with a
    ``level_minutes`` column. ``minutes_levels`` must be ascending and
    each a multiple of the previous (5 → 60 → 1440 …)."""
    for a, b in zip(minutes_levels, minutes_levels[1:]):
        if b % a != 0:
            raise ValueError(f"level {b} is not a multiple of {a}")
    keys = list(group_cols or [])

    out = None
    current = df
    for level in minutes_levels:
        bucketed = current.groupBy(
            *keys, right_closed_bucket(time_col, level).alias(time_col)
        ).agg(F.sum(value_col).alias(value_col))
        tagged = bucketed.withColumn("level_minutes", F.lit(level))
        out = tagged if out is None else out.unionByName(tagged)
        current = bucketed  # cascade: next level reads this one
    return out
