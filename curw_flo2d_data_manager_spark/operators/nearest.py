"""Nearest-neighbor (rank-1 theta) join — SURVEY §2 rows S4/J6/W4.

Reference: stored proc ``getNearestWeatherStation(lat, lon)`` returns
the closest rain gauge to a config point (input/rain/gen_rain.py:119-135).

General form: for each left row, the k nearest right rows by a distance
expression. The right side (stations) is dimension-sized → broadcast
cross join + per-left-row rank. At scale with a LARGE right side this
becomes the ANN problem — see operators/similarity.py for the
bucketed variants."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def euclidean_deg2(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Squared equirectangular distance in degrees — monotone in true
    distance at city scale, cheap, and rank-equivalent for rank-1
    lookup (matches the reference's planar nearest-station SQL)."""
    return (lat1 - lat2) ** 2 + (lon1 - lon2) ** 2


def nearest_neighbor_join(
    left: DataFrame,
    right: DataFrame,
    dist: Column,
    left_keys: list[str],
    k: int = 1,
) -> DataFrame:
    """For each distinct ``left_keys`` row, the k nearest right rows.

    ``dist`` is any Column over the crossed columns. Right side is
    broadcast (it must be dimension-sized); ties break deterministically
    by the right side's natural column order appended to the sort.
    """
    crossed = left.crossJoin(F.broadcast(right)).withColumn("_dist", dist)
    w = Window.partitionBy(*left_keys).orderBy("_dist", *right.columns)
    return (
        crossed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
