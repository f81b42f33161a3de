"""Right-closed resample (pandas parity) — SURVEY §2 row A2.

Reference: ``df.resample('15min', label='right', closed='right').sum()``
(input/rain/gen_rain.py:162-163). Spark's ``window()`` is left-closed,
so we bucket with an explicit ceil-to-grid expression instead
(:func:`right_closed_bucket`) — one groupBy shuffle, map-side partial
aggregation for free, and the bucket expression stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.functions.timeutil import right_closed_bucket


def resample_sum(
    df: DataFrame,
    minutes: int,
    time_col: str = "time",
    value_col: str = "value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Sum ``value_col`` into right-labeled right-closed buckets.

    ``group_cols`` (e.g. series id) become extra grouping keys so one
    shuffle resamples every series at once — the multi-series form of
    the reference's per-series pandas call.
    """
    keys = list(group_cols or []) + [
        right_closed_bucket(time_col, minutes).alias(time_col)
    ]
    return df.groupBy(*keys).agg(F.sum(value_col).alias(value_col))
