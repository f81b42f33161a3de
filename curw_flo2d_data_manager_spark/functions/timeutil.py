"""Time expressions: spines, right-closed buckets, elapsed hours.

These re-express the reference's driver-side datetime loops as native
Spark column expressions so they run JVM-side and distribute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def calendar_spine(
    spark: SparkSession,
    start,
    end,
    step_minutes: int,
    col_name: str = "time",
) -> DataFrame:
    """Dense timestamp spine ``[start, end]`` at ``step_minutes``.

    Replaces pandas ``pd.date_range(start, end, freq='5min')``
    (reference: input/rain/gen_rain.py:142). Implemented with
    ``sequence`` + ``explode`` — a single narrow task, no driver loop.
    For very long spans the sequence is generated per-day then exploded
    so no single array exceeds ~17k entries.
    """
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(f"INTERVAL {int(step_minutes)} MINUTES"),
            )
        ).alias(col_name)
    )


def right_closed_bucket(time_col: Column | str, minutes: int) -> Column:
    """Right-labeled, right-closed resample bucket.

    pandas ``df.resample('15min', label='right', closed='right')``
    (reference: input/rain/gen_rain.py:162-163) assigns a row at time
    ``t`` to the bucket whose *right* edge is the smallest grid point
    ``>= t``, with rows exactly on a grid point staying in that point's
    own bucket: ``bucket(t) = ceil(epoch(t) / w) * w``.

    Spark's built-in ``window()`` is left-closed — this 1-tick-shift
    expression closes the parity gap (SURVEY §7 hard part 1).
    """
    c = F.col(time_col) if isinstance(time_col, str) else time_col
    w = int(minutes) * 60
    # cast-to-double keeps fractional seconds (unix_timestamp truncates,
    # which would misplace sub-second samples sitting past a grid edge)
    return F.timestamp_seconds(F.ceil(c.cast("double") / w).cast("long") * w)


def elapsed_hours(time_col: Column | str, base: Column) -> Column:
    """Hours elapsed since ``base`` as double.

    Reference: ``(ts[i][0] - ts[0][0]).total_seconds()/3600``
    (input/inflow/gen_150_inflow.py:108, input/outflow/gen_outflow.py:110).
    ``base`` is typically ``min('time') over ()`` or a literal start.
    """
    c = F.col(time_col) if isinstance(time_col, str) else time_col
    return (F.unix_timestamp(c) - F.unix_timestamp(base)) / F.lit(3600.0)


def hours_to_timestamp(hours_col: Column | str, base: Column) -> Column:
    """Inverse of :func:`elapsed_hours`: absolute time from model hours.

    Reference: ``base + timedelta(hours=t)``
    (output/extract_water_level.py:501-503).
    """
    c = F.col(hours_col) if isinstance(hours_col, str) else hours_col
    return F.timestamp_seconds(F.unix_timestamp(base) + (c * 3600.0).cast("long"))


def shift_tz(time_col: Column | str, offset_minutes: int) -> Column:
    """Shift a naive timestamp by a fixed UTC-offset, e.g. +330 for
    Sri Lanka (reference: extract_water_level.py:80-106 utcOffset shift,
    gen_rain.py:34-35 +5:30)."""
    c = F.col(time_col) if isinstance(time_col, str) else time_col
    return c + F.expr(f"INTERVAL {int(offset_minutes)} MINUTES")


def parse_utc_offset(offset: str, default: bool = True) -> int | None:
    """UTC-offset string → signed minutes, with the reference's
    pattern-or-default semantics (extract_water_level.py:80-106
    ``getUTCOffset``): the string must START with ``[+-]HH:MM``
    (``re.match`` — a trailing suffix is ignored, exactly like the
    reference's ``match.group()``); an invalid string returns 0 with a
    warning when ``default`` is true, else ``None``.
    """
    import re

    m = re.match(r"[+-]\d\d:\d\d", offset or "")
    if not m:
        if default:
            print(f"UTC_OFFSET : {offset}  not in correct format. Using +00:00")
            return 0
        return None
    s = m.group()
    sign = 1 if s[0] == "+" else -1
    hh, mm = s[1:].split(":")
    return sign * (int(hh) * 60 + int(mm))
