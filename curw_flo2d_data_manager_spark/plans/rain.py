"""RAIN.DAT generation — SURVEY §2 rows J1/A2/F6/A3/A4/W1/K4, §7 step 3.

Reference pipeline (input/rain/gen_rain.py:138-193):

1. 5-min calendar spine left-joined to the gauge series (J1, :142-151)
2. ``dropna`` — spine gaps vanish again (the join exists to coerce the
   series onto the grid, :153)
3. 15-min models only: resample-sum, right-labeled right-closed (A2,
   :162-163)
4. negatives → NaN AFTER the resample (F6, :165 — so negative raw
   values do poison 15-min sums; pinned)
5. running cumulative sum + total (A3/A4, :173-179), per-row fraction
   with 0-guard (W1, :181-187)
6. render: ``"R              " + hours.ljust(14) + frac + " "`` where
   hours is ``%.3f`` elapsed from the *start parameter* (not the first
   sample), plus 2 header rows (:182-191)

Pinned deviation: the reference accumulates ``total_rain`` in Python
floats, so one NaN (negative rain) poisons every fraction
(SURVEY §7 hard part 3). The engine treats nulled values as 0 in both
the running and total sums (Spark sum-over-window semantics) — the
sane behavior; callers needing bug-parity filter negatives upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.functions.plan_literals import (
    literal_rows_df,
)
from curw_flo2d_data_manager_spark.operators.cumulative import cumulative_fraction
from curw_flo2d_data_manager_spark.operators.nearest import (
    euclidean_deg2,
    nearest_neighbor_join,
)
from curw_flo2d_data_manager_spark.operators.resample import resample_sum
from curw_flo2d_data_manager_spark.operators.spine import spine_align
from curw_flo2d_data_manager_spark.plans.models import get_model_spec


def nearest_gauge_grid_ids(
    spark: SparkSession, stations: DataFrame, lat: float, lon: float
) -> DataFrame:
    """S4: config point → nearest rain gauge → sim grid id, as one
    broadcast plan (no driver round-trip).

    Reference (input/rain/gen_rain.py:119-135): stored proc
    ``getNearestWeatherStation(lat, lon)`` + fetchone, then
    ``grid_id = 'rainfall_{id}_{name}_MDPA'``. ``stations`` is
    DataFrame(station_id, name, latitude, longitude) — dimension-sized,
    broadcast inside the rank-1 join. Returns one-row
    DataFrame(grid_id string).
    """
    point = literal_rows_df(spark, [(float(lat), float(lon))], "lat double, lon double")
    nearest = nearest_neighbor_join(
        point,
        stations.select("station_id", "name", "latitude", "longitude"),
        euclidean_deg2(
            F.col("lat"), F.col("lon"), F.col("latitude"), F.col("longitude")
        ),
        left_keys=["lat", "lon"],
        k=1,
    )
    return nearest.select(
        F.format_string("rainfall_%d_%s_MDPA", "station_id", "name").alias("grid_id")
    )


def rain_lines(
    spark: SparkSession,
    gauge_ts: DataFrame,
    model: str,
    start: str,
    end: str,
) -> DataFrame:
    """Render RAIN.DAT rows from a rain-gauge series.

    ``gauge_ts`` is DataFrame(time timestamp, value double). Returns
    ``(block_rank int, intra_rank long, line string)``.
    """
    spec = get_model_spec(model)

    aligned = spine_align(spark, gauge_ts, start, end, 5).na.drop(subset=["value"])
    if spec.rain_resample_min:
        aligned = resample_sum(aligned, spec.rain_resample_min)
    cleaned = aligned.withColumn(
        "value", F.when(F.col("value") < 0, None).otherwise(F.col("value"))
    )
    cum = cumulative_fraction(cleaned, time_col="time")

    hours = (
        F.unix_timestamp("time") - F.unix_timestamp(F.lit(start).cast("timestamp"))
    ) / 3600.0
    r_rows = cum.select(
        F.lit(1).alias("block_rank"),
        F.unix_timestamp("time").alias("intra_rank"),
        F.concat(
            F.lit("R              "),
            F.rpad(F.format_string("%.3f", hours), 14, " "),
            # leading null-valued rows have NULL running sum → render 0
            F.format_string("%.3f", F.coalesce("cum_fraction", F.lit(0.0))),
            F.lit(" "),
        ).alias("line"),
    )

    # header: total-rain line (computed) under the constant first line
    # (reference: rain_dat.insert(0, ...) pair at gen_rain.py:190-191)
    total_line = cleaned.agg(
        F.coalesce(F.sum("value"), F.lit(0.0)).alias("t")
    ).select(
        F.lit(0).alias("block_rank"),
        F.lit(1).cast("long").alias("intra_rank"),
        F.format_string(" %.3f         5             0             0 ", F.col("t")).alias(
            "line"
        ),
    )
    first_line = literal_rows_df(
        spark, [(0, 0, " 0             0 ")], "block_rank int, intra_rank long, line string"
    )
    return first_line.unionByName(total_line).unionByName(r_rows)
