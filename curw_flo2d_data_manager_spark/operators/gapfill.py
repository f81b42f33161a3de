"""Calendar × key-set gap fill — SURVEY §2 row J8.

Reference: every FLOOD_PLAIN cell must appear in every TIMDEP block;
absent cells get sentinel −999 (output/extract_water_level.py:542,560-566).

Engine form: (distinct times) × (key set) left-joined back to the
observations, with a configurable fill. The key set is dimension-sized
→ broadcast; the times side comes from the data itself or a spine.
Sentinels exist only at format boundaries (SURVEY §7 hard part 6) —
default fill here is NULL; −999 is applied by the sink."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gap_fill_cross(
    obs: DataFrame,
    keys: DataFrame,
    time_col: str = "time",
    key_cols: list[str] | None = None,
    value_col: str = "value",
    fill=None,
) -> DataFrame:
    """Densify ``obs`` so every (time, key) combination exists.

    ``keys`` holds the full key universe (one row per key combo).
    """
    kcols = key_cols or [c for c in keys.columns]
    times = obs.select(time_col).distinct()
    full = times.crossJoin(F.broadcast(keys))
    out = full.join(obs, [time_col] + kcols, "left")
    if fill is not None:
        out = out.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(fill)))
    return out
