"""Right-closed resample parity vs a pandas oracle (SURVEY §7 hard part 1)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.functions.timeutil import (
    calendar_spine,
    elapsed_hours,
    hours_to_timestamp,
    right_closed_bucket,
)
from curw_flo2d_data_manager_spark.operators.resample import resample_sum


def test_right_closed_bucket_matches_pandas(spark):
    times = pd.date_range("2024-01-01 00:05:00", periods=50, freq="5min")
    vals = [float(i) for i in range(50)]
    pdf = pd.DataFrame({"time": times, "value": vals})

    oracle = pdf.set_index("time").resample("15min", label="right", closed="right").sum()

    sdf = spark.createDataFrame(pdf)
    got = (
        resample_sum(sdf, 15)
        .orderBy("time")
        .toPandas()
        .set_index("time")
    )
    assert list(got.index) == list(oracle.index)
    assert list(got["value"]) == list(oracle["value"])


def test_right_closed_bucket_on_grid_point(spark):
    # a row exactly on a grid edge stays in that edge's own bucket
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 15), 1.0), (dt.datetime(2024, 1, 1, 0, 15, 1), 2.0)],
        "time timestamp, value double",
    )
    rows = {r["time"]: r["value"] for r in resample_sum(df, 15).collect()}
    assert rows[dt.datetime(2024, 1, 1, 0, 15)] == 1.0
    assert rows[dt.datetime(2024, 1, 1, 0, 30)] == 2.0


def test_calendar_spine(spark):
    spine = calendar_spine(spark, "2024-01-01 00:00:00", "2024-01-01 01:00:00", 5)
    rows = spine.collect()
    assert len(rows) == 13
    assert rows[0]["time"] == dt.datetime(2024, 1, 1, 0, 0)
    assert rows[-1]["time"] == dt.datetime(2024, 1, 1, 1, 0)


def test_elapsed_hours_roundtrip(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 6, 30),)], "time timestamp"
    ).withColumn("base", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    out = df.select(
        elapsed_hours("time", F.col("base")).alias("h"),
    ).collect()[0]
    assert out["h"] == pytest.approx(6.5)

    back = df.select(
        hours_to_timestamp(F.lit(6.5), F.col("base")).alias("t")
    ).collect()[0]
    assert back["t"] == dt.datetime(2024, 1, 1, 6, 30)
