"""Gap-based sessionization: assign a per-key session sequence number
that increments whenever the time since the previous row exceeds a
gap threshold.

This is the batch twin of Structured Streaming's ``session_window``
(which only exists for streaming-style grouped aggregation): a
lag-compare flags session starts, a running sum turns the flags into a
session id. One shuffle (the per-key window sort); at 100 TB the
partition key is the session key, so state never concentrates on one
executor unless one key dominates — pair with ``operators/skew.py``
salting for hot keys.

The reference has no session concept (batch cron scripts —
SURVEY §2.11); this is a first-class engine extension for
event-stream analytics over the ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    gap_seconds: float = 1800.0,
    tiebreak_cols: list[str] | None = None,
    out_col: str = "session_seq",
) -> DataFrame:
    """Add ``out_col``: 1-based session number per key, a new session
    starting when the gap to the previous row is > ``gap_seconds``.

    The gap uses fractional-second timestamp arithmetic (timestamp →
    double keeps microseconds, matching DuckDB's ``epoch()``), so
    sub-second gaps compare identically in both engines. Pass
    ``tiebreak_cols`` (e.g. a unique event id) to make ordering — and
    thus lag — deterministic under equal timestamps.
    """
    keys = list(key_cols or [])
    order = [ts_col, *(tiebreak_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("double") - prev.cast("double")
    is_new = (prev.isNull() | (gap > F.lit(gap_seconds))).cast("long")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(is_new).over(running))
