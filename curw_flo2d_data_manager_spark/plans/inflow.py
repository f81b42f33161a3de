"""INFLOW.DAT generation — SURVEY §2 row K1, §7 step 2.

Reference behavior (input/inflow/gen_150_inflow.py:100-112 and the
150_v2 / 250 clones, which differ only in constants — SURVEY §7 hard
part 3):

* 3 header lines: ``0 <cell>``, ``C 0 <cell>``, ``H 0 0``;
* one ``H`` row per discharge sample from the SECOND sample onward
  (index 0 is consumed as the elapsed-hours origin and replaced by the
  literal ``H 0 0`` row), time = hours since the first sample
  (``%.1f`` rjust 16), value ``%.1f`` rjust 16;
* flo2d_250 only (gen_250_inflow.py:133-134): trailing ``R`` reservoir
  rows — cell 2265 takes the first observed water level in
  [start, start+10h] (default 0.5 — :113-114), cell 3559 a fixed 6.6;
  the stage is rendered with Python ``str()``, not ``%f`` (pinned).

The per-sample driver loop becomes one window + projection plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.functions.plan_literals import literal_rows_df
from curw_flo2d_data_manager_spark.functions.timeutil import elapsed_hours
from curw_flo2d_data_manager_spark.plans.models import get_model_spec


def inflow_lines(
    discharge_ts: DataFrame,
    model: str,
    obs_wl: float | None = None,
) -> DataFrame:
    """Render INFLOW.DAT rows from a discharge series.

    ``discharge_ts`` is a DataFrame(time timestamp, value double) —
    typically ``TimeseriesStore.get_timeseries`` output. Returns
    ``(block_rank int, intra_rank long, line string)``; write with
    ``sinks.ordered_text.write_ordered_text`` sorted on both ranks.
    """
    spec = get_model_spec(model)
    header_cell, c_cell = spec.require_inflow()  # flo2d_10 = rain-only
    spark = discharge_ts.sparkSession

    header = literal_rows_df(
        spark,
        [
            (0, 0, "0" + str(header_cell).rjust(16)),
            (0, 1, "C" + "0".rjust(16) + str(c_cell).rjust(16)),
            (0, 2, "H" + "0".rjust(16) + "0".rjust(16)),
        ],
        "block_rank int, intra_rank long, line string",
    )

    # SinglePartition windows — deliberate: an INFLOW.DAT render is ONE
    # hydrograph node's bounded series (reference gen_inflow); this
    # single-series form must not be reused on a multi-series relation
    # (pass a key and partitionBy it instead — see
    # operators/cumulative.cumulative_fraction's scale warning).
    w = Window.partitionBy(F.lit(1))
    data = (
        discharge_ts.withColumn("_t0", F.min("time").over(w))
        .withColumn("_rn", F.row_number().over(Window.orderBy("time")))
        .filter(F.col("_rn") > 1)  # first sample only seeds the origin
        .select(
            F.lit(1).alias("block_rank"),
            F.col("_rn").cast("long").alias("intra_rank"),
            F.format_string(
                "H%16.1f%16.1f", elapsed_hours("time", F.col("_t0")), F.col("value")
            ).alias("line"),
        )
    )
    out = header.unionByName(data)

    if spec.reservoir_rows:
        wl = 0.5 if obs_wl is None else obs_wl  # gen_250_inflow.py:113-114
        rows = []
        for i, (cell, stage) in enumerate(spec.reservoir_rows):
            val = wl if stage is None else stage
            rows.append(
                (2, i, "R" + str(cell).rjust(16) + str(val).rjust(16))
            )
        tail = literal_rows_df(spark, rows, "block_rank int, intra_rank long, line string")
        out = out.unionByName(tail)
    return out
