"""CHAN.DAT generation — SURVEY §2 rows S7/J4/F7/K5/P3, §7 step 5.

Reference behavior (input/chan/gen_chan.py:129-188):

* verbatim head asset, computed body, verbatim tail asset;
* the body template pairs lines ``<up_cell> <default>`` /
  ``<dwn_cell> <default>``; each pair keys an initial-conditions row
  via ``grid_id = '{model}_{up}_{dwn}'`` (J4, :149-152) giving
  optional obs series ids for the up/down ends;
* each end's water level = first observed value in
  ``[start, start+2h]`` (S3, :153-160);
* the 4-branch coalesce (F7, :163-178), pinned exactly:
  - downstream id missing: if up WL missing → both ends take their
    own defaults; else BOTH ends take the upstream WL;
  - downstream id present: each end independently
    ``coalesce(wl, default)``;
* render ``cell.ljust(6) + str(wl).rjust(6)`` — Python ``str()``
  formatting of the raw value, not ``%f`` (pinned; :165-178).

The per-pair loop with 2 DB lookups each becomes: body-pairs DF ⋈
broadcast(initial_conditions) ⋈ first-value aggregate of the obs
relation — one plan, no round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _first_values(obs: DataFrame, start: str, horizon_hours: int = 2) -> DataFrame:
    """First observed value per series id in [start, start+horizon]
    (reference getWL window, gen_chan.py:153)."""
    s = F.lit(start).cast("timestamp")
    e = s + F.expr(f"INTERVAL {int(horizon_hours)} HOURS")
    return (
        obs.filter(F.col("time").between(s, e))
        .groupBy("id")
        .agg(F.min_by("value", "time").alias("wl"))
    )


def chan_lines(
    body_pairs: DataFrame,
    initial_conditions: DataFrame,
    obs: DataFrame,
    model: str,
    start: str,
) -> DataFrame:
    """Render the computed CHAN.DAT body.

    * ``body_pairs``: DataFrame(pair_idx long, up_cell string,
      up_default string, dwn_cell string, dwn_default string) — the
      parsed body template (driver-side asset, P3).
    * ``initial_conditions``: DataFrame(grid_id string, up_obs_id
      string?, dwn_obs_id string?) — S7 dimension
      (res/flo2d_150_v2/initial_conditions.csv shape).
    * ``obs``: DataFrame(id string, time timestamp, value double).

    Returns ``(block_rank int, intra_rank long, line string)`` — two
    lines per pair; head/tail assets go to the sink's header/footer.
    """
    fv = _first_values(obs, start)
    grid_id = F.concat_ws("_", F.lit(model), F.col("up_cell"), F.col("dwn_cell"))

    joined = (
        body_pairs.withColumn("grid_id", grid_id)
        .join(F.broadcast(initial_conditions), "grid_id", "left")
        .join(
            F.broadcast(fv.select(F.col("id").alias("up_obs_id"), F.col("wl").alias("up_wl"))),
            "up_obs_id",
            "left",
        )
        .join(
            F.broadcast(
                fv.select(F.col("id").alias("dwn_obs_id"), F.col("wl").alias("dwn_wl"))
            ),
            "dwn_obs_id",
            "left",
        )
    )

    # the reference's 4-branch coalesce (gen_chan.py:163-178)
    dwn_id_missing = F.col("dwn_obs_id").isNull()
    up_out = F.when(
        F.col("up_wl").isNotNull(), F.col("up_wl").cast("string")
    ).otherwise(F.col("up_default"))
    dwn_out = (
        F.when(
            dwn_id_missing,
            F.when(F.col("up_wl").isNotNull(), F.col("up_wl").cast("string")).otherwise(
                F.col("dwn_default")
            ),
        )
        .when(F.col("dwn_wl").isNotNull(), F.col("dwn_wl").cast("string"))
        .otherwise(F.col("dwn_default"))
    )

    up_line = F.concat(F.rpad(F.col("up_cell"), 6, " "), F.lpad(up_out, 6, " "))
    dwn_line = F.concat(F.rpad(F.col("dwn_cell"), 6, " "), F.lpad(dwn_out, 6, " "))
    return (
        joined.select(
            F.lit(1).alias("block_rank"),
            F.col("pair_idx"),
            F.array(up_line, dwn_line).alias("_two"),
        )
        .select("block_rank", "pair_idx", F.posexplode("_two").alias("pos", "line"))
        .select(
            "block_rank",
            (F.col("pair_idx") * 2 + F.col("pos")).cast("long").alias("intra_rank"),
            "line",
        )
    )
