"""Time-weighted linear interpolation of missing sensor values — the
natural upgrade over the reference's sentinel handling (F6:
negative→NULL in plans/rain.py, reference
``input/gen_rain.py`` sentinel cleaning) and the engine's fill-down
(W3): a gauge gap is filled proportionally between its bracketing
real observations instead of held flat or left NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def linear_interpolate(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str = "value",
    out_col: str = "value_interp",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key linear interpolation of NULL values over time.

    For every NULL row, the previous and next non-NULL observations in
    ``time_col`` order bracket the gap; the filled value is
    ``prev + (next − prev) · (t − t_prev)/(t_next − t_prev)`` with the
    timestamps taken as (fractional) epoch seconds. Leading/trailing
    NULL runs have only one bracket and stay NULL. Non-NULL rows pass
    through unchanged.

    Scale shape: one shuffle on the key columns, then two sorted
    window passes over that same exchange — an ascending running
    ``last`` for the backward bracket and a DESCENDING running
    ``last`` for the forward bracket. Both frames are
    ``rowsBetween(unboundedPreceding, 0)``, which Spark evaluates
    incrementally (O(1) state per row). The forward bracket must NOT
    be expressed as ``rowsBetween(0, unboundedFollowing)``: Spark's
    UnboundedFollowing frame re-scans from the current row to the
    partition end for every row — O(n²) per key (measured 38 s vs
    0.75 s on 100k rows / 5 keys). The second sort of the same
    exchange is the price of staying linear; no per-key array is ever
    materialized, so series of any length stream through.

    Returns the input plus (``out_col``, ``was_gap``); ``was_gap`` is
    true for every originally-NULL row, filled or not.

    ``tiebreak_cols`` (e.g. an event id) make the bracket choice
    deterministic when two rows of one key share a timestamp.
    """
    t = F.col(time_col).cast("double")
    v = F.col(value_col).cast("double")
    order = [t] + [F.col(c) for c in (tiebreak_cols or [])]
    rev_order = [t.desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    wp = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Forward bracket = running last over the REVERSED order; an
    # incremental frame, unlike rowsBetween(0, unboundedFollowing)
    # which is O(n^2) per key (see docstring).
    wf = (
        Window.partitionBy(*key_cols)
        .orderBy(*rev_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_v = F.last(v, ignorenulls=True).over(wp)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wp)
    next_v = F.last(v, ignorenulls=True).over(wf)
    next_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wf)
    # On a non-NULL row prev == next == the row itself, so the
    # interpolation branch is never reached; try_divide keeps a
    # duplicate-timestamp bracket NULL-safe under ANSI mode.
    frac = F.try_divide(t - prev_t, next_t - prev_t)
    filled = F.when(v.isNotNull(), v).otherwise(
        prev_v + (next_v - prev_v) * frac
    )
    return df.withColumn(out_col, filled).withColumn("was_gap", v.isNull())
