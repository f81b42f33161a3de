"""Dimension registration — the reference's ``init/init.py`` as one
declarative plan (SURVEY §2 rows S8/S10/J3/K9, X1 lat-lon formatting).

Reference behavior (init/init.py:55-101):

* register the model ``source`` row with the station-map JSON blob as
  its parameters (``add_source``, :80);
* for every entry of ``CHANNEL_CELL_MAP`` / ``FLOOD_PLAIN_CELL_MAP``,
  register a station named ``{cell}_{name}`` whose lat/lon come from
  the grid CSV *by 1-based position* — ``grids[int(key)-1][2]`` is
  latitude, ``[1]`` longitude (:90-91), formatted ``%.6f``.

Engine form: cell maps explode to a DataFrame, the grid CSV joins by
its explicit ``Grid_ID`` key (broadcast — the grid is dimension-sized),
and the result merges idempotently into the station dimension via the
K9 upsert. The per-entry loop with one INSERT each becomes one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.functions.plan_literals import (
    literal_rows_df,
)
from curw_flo2d_data_manager_spark.sinks.upsert import merge_upsert

GRID_SCHEMA = "Grid_ID int, X double, Y double"


def read_grid_csv(spark: SparkSession, path: str) -> DataFrame:
    """S10: grid CSV scan with an explicit schema (header
    ``Grid_ID,X,Y``; X = longitude, Y = latitude —
    res/grids/flo2d_150_v2m.csv via init.py:90-91)."""
    return spark.read.csv(path, header=True, schema=GRID_SCHEMA)


def stations_from_cell_maps(
    spark: SparkSession,
    grid: DataFrame,
    channel_map: dict[str, str],
    flood_map: dict[str, str] | None,
    model_tag: str,
) -> DataFrame:
    """Build the station dimension rows for one model's cell maps.

    Returns DataFrame(cell int, name, latitude, longitude string
    (%.6f), station_type, description) — one row per map entry, the
    reference's ``add_station`` loop as a broadcast join.
    """
    def _map_df(m: dict[str, str], kind: str) -> DataFrame:
        return literal_rows_df(
            spark, [(int(k), v, kind) for k, v in m.items()], "cell int, name string, kind string"
        )

    maps = _map_df(channel_map, "channel_cell_map")
    if flood_map:
        maps = maps.unionByName(_map_df(flood_map, "flood_plain_cell_map"))

    return (
        maps.join(F.broadcast(grid), maps.cell == grid.Grid_ID)
        .select(
            "cell",
            F.concat_ws("_", F.col("cell").cast("string"), F.col("name")).alias("name"),
            F.format_string("%.6f", F.col("Y")).alias("latitude"),
            F.format_string("%.6f", F.col("X")).alias("longitude"),
            F.lit(model_tag).alias("station_type"),
            F.concat(F.lit(f"{model_tag}_"), F.col("kind"), F.lit("_element")).alias(
                "description"
            ),
        )
    )


def register_dims(
    existing_sources: DataFrame,
    existing_stations: DataFrame,
    source_row: DataFrame,
    stations: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """K9: idempotent dimension merge — re-running init changes
    nothing (reference add_source/add_station are get-or-create)."""
    return (
        merge_upsert(existing_sources, source_row, keys=["model", "version"]),
        merge_upsert(existing_stations, stations, keys=["name"]),
    )
