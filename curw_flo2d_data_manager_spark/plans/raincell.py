"""RAINCELL.DAT generation — SURVEY §2 rows S2/X9/K3, §7 step 4.

This is the reference's scalability pressure point: gen_raincell.py
loops one stored-procedure round-trip PER TIMESTEP
(input/raincell/gen_raincell.py:129-142 — 1,152 calls for a default
4-day @5-min run), each returning ≤39,526 ``(cell_id, value)`` rows.

Engine plan — ONE declarative query over the whole window:

* filter the rain relation to ``(start, end]`` (timestamps are the
  reference's ``timestamp += step`` loop points, i.e. right-open on
  start, closed on end — :130-132);
* add the per-step water-supply correction (+1/288 @5 min, +1/96
  @15 min — :117-122);
* render ``<cell_id> <value %.3f>`` lines keyed (time, cell_id);
* one blank separator row per timestep (:140) keyed after the block's
  last cell;
* header ``<timestep> <len> <start> <end>`` (:126-127).

One shuffle (the final global sort in the ordered sink) replaces
``length`` network round-trips; at 100 TB the sort is range-partitioned
so every executor renders a contiguous (time, cell) span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.plans.models import MODELS


def raincell_lines(
    spark: SparkSession,
    rain: DataFrame,
    model: str,
    start: str,
    end: str,
) -> DataFrame:
    """Render RAINCELL.DAT rows from a gridded-rain relation.

    ``rain`` is DataFrame(time timestamp, cell_id int/long, value
    double) holding one value per (timestep, cell). Returns
    ``(block_rank int, intra_rank long, line string)`` where
    ``intra_rank`` interleaves the (time, cell) order with per-block
    blank separators; sort on (block_rank, intra_rank).
    """
    spec = MODELS[model]
    step = spec.timestep_min
    s = F.lit(start).cast("timestamp")
    e = F.lit(end).cast("timestamp")

    n_steps = spark.range(1).select(
        (
            (F.unix_timestamp(e) - F.unix_timestamp(s)) / 60 / step
        ).cast("int").alias("n")
    )
    header = n_steps.select(
        F.lit(0).alias("block_rank"),
        F.lit(0).cast("long").alias("intra_rank"),
        F.format_string(
            f"%d %d {start} {end}", F.lit(step), F.col("n")
        ).alias("line"),
    )

    window_rows = rain.filter((F.col("time") > s) & (F.col("time") <= e))
    # rank key: each timestep block owns a contiguous range; cell rows
    # sort by cell_id, the separator (+max cell + 1 surrogate) closes it
    step_idx = (
        (F.unix_timestamp("time") - F.unix_timestamp(s)) / 60 / step
    ).cast("long")
    cell_lines = window_rows.select(
        F.lit(1).alias("block_rank"),
        (step_idx * F.lit(1 << 32) + F.col("cell_id")).alias("intra_rank"),
        F.format_string(
            "%d %.3f", F.col("cell_id").cast("long"), F.col("value") + F.lit(spec.water_supply)
        ).alias("line"),
    )
    # one blank separator per timestep in the window — INCLUDING steps
    # with no cell rows (the reference appends the blank inside the
    # per-step loop unconditionally, gen_raincell.py:140); generated
    # from the step sequence, not the data → no distinct-shuffle
    separators = n_steps.select(
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("_s")
    ).select(
        F.lit(1).alias("block_rank"),
        (F.col("_s").cast("long") * F.lit(1 << 32) + F.lit((1 << 32) - 1)).alias(
            "intra_rank"
        ),
        F.lit("").alias("line"),
    )
    return header.unionByName(cell_lines).unionByName(separators)
