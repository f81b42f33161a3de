"""Seasonal climatology + anomaly for sensor series (public method:
the hydrological baseline the reference's rain/water-level jobs imply
but never compute — e.g. the mean 09:00 water level per station, and
each observation's departure from it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def seasonal_baseline(
    df: DataFrame,
    key_cols: list[str],
    period: Column,
    value_col: str = "value",
    min_obs: int = 1,
) -> DataFrame:
    """Per-(key, period) climatology and per-row anomaly.

    ``period`` is any Column expression bucketing time into a repeating
    season — ``F.hour("ts")`` for diurnal cycles, ``F.month("ts")``
    for annual. The climatology is the mean of ``value_col`` over all
    rows of the (key, period) cell; each row's ``anomaly`` is its
    value minus that mean. Cells with fewer than ``min_obs``
    observations yield NULL climatology/anomaly (too thin to trust).

    Scale shape: the climatology is ONE hash aggregation with map-side
    partial aggregation — only (key, period) cells ride the shuffle,
    never fact rows — and the resulting table (|keys|·|periods| rows)
    broadcasts back onto the unshuffled fact scan. The fact table
    itself is never exchanged; at 100 TB this is a metadata-sized
    broadcast against a streaming scan.

    Returns the input plus (``_period``, ``clim_mean``, ``clim_n``,
    ``anomaly``).
    """
    base = df.withColumn("_period", period)
    clim = base.groupBy(*key_cols, "_period").agg(
        F.avg(F.col(value_col).cast("double")).alias("clim_mean"),
        F.count(F.col(value_col)).alias("clim_n"),
    )
    clim = clim.withColumn(
        "clim_mean",
        F.when(F.col("clim_n") >= int(min_obs), F.col("clim_mean")),
    )
    out = base.join(F.broadcast(clim), [*key_cols, "_period"], "left")
    return out.withColumn(
        "anomaly", F.col(value_col).cast("double") - F.col("clim_mean")
    )
