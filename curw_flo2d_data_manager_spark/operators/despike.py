"""Hampel-filter despiking for sensor timeseries (public method:
rolling-median outlier identification — the robust-statistics
generalization of the reference's fixed sentinel cleaning, F6:
negative→NULL in plans/rain.py).

A rain gauge that reports 999.9 for one 5-minute step, or a water-level
sensor that drops to 0 between sane readings, survives fixed sentinel
rules but not a Hampel test: the point's deviation from the rolling
MEDIAN is compared against the window's median absolute deviation
(MAD), both robust to the spike itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _array_median(sorted_arr: Column) -> Column:
    """Linear-interpolated median of a SORTED double array — the same
    definition as SQL ``quantile_cont(x, 0.5)``: middle element for
    odd counts, mean of the two middles for even. NULL for empty."""
    n = F.size(sorted_arr)
    lo = F.element_at(sorted_arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(sorted_arr, (n / 2 + 1).cast("int"))
    return F.when(n == 0, F.lit(None).cast("double")).otherwise((lo + hi) / 2.0)


def hampel_despike(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str = "value",
    half_window: int = 2,
    n_mad: float = 5.0,
) -> DataFrame:
    """Hampel filter over per-key ordered series: for every row, the
    rolling median and MAD of the ``2·half_window+1`` row frame
    (including the row itself — the classic Hampel identifier), a
    spike flag when ``|value − median| > n_mad·MAD``, and a cleaned
    value with spikes replaced by the rolling median.

    ``order_cols`` must order rows uniquely within a key (e.g.
    ``[time, event_id]``) so the frame is deterministic. NULL values
    never flag (NULL comparisons stay NULL) and pass through
    unchanged. ``MAD = 0`` (a constant neighborhood) flags ANY
    nonzero deviation — the standard degenerate-window behavior.

    Scale shape: one shuffle on the key columns; each row carries a
    ``2·half_window+1``-element frame array through two sorted-array
    median expressions — all Column code, no Python, state bounded by
    the window width, never the series length. Rows per key can be
    billions; frame width is the only memory knob.

    Returns the input columns plus (rolling_median, rolling_mad,
    is_spike, value_clean).
    """
    if half_window < 1:
        raise ValueError(f"half_window {half_window} < 1")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-half_window, half_window)
    )
    v = F.col(value_col).cast("double")
    frame = F.array_sort(F.collect_list(v).over(w))
    med = _array_median(frame)
    out = df.withColumn("_frame", frame).withColumn("rolling_median", med)
    devs = F.array_sort(
        F.transform(F.col("_frame"), lambda x: F.abs(x - F.col("rolling_median")))
    )
    out = out.withColumn("rolling_mad", _array_median(devs)).drop("_frame")
    is_spike = F.abs(v - F.col("rolling_median")) > (
        F.lit(float(n_mad)) * F.col("rolling_mad")
    )
    return out.withColumn("is_spike", is_spike).withColumn(
        "value_clean",
        F.when(is_spike, F.col("rolling_median")).otherwise(v),
    )


def winsorize(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Per-key percentile winsorization: clamp ``value_col`` into its
    key's [``lower``, ``upper``] continuous-percentile band — the
    standard outlier-robust normalization when spikes should be CAPPED
    rather than replaced (contrast :func:`hampel_despike`).

    Percentiles are exact with linear interpolation (SQL
    ``quantile_cont`` semantics). NULL values are ignored by the
    percentile and pass through unclamped (NULL out, NULL flag).

    Scale shape: ONE aggregation over the fact table — Spark's exact
    ``percentile`` is a typed-aggregate whose partial state is the
    per-partition value buffer, merged per key — and the tiny per-key
    band table broadcasts back onto the unshuffled fact scan. For
    corpora where exact per-key buffers are too hot (billions of rows
    per key), swap in ``percentile_approx`` at the call site; the join
    shape is unchanged.

    Returns the input plus (``p_lo``, ``p_hi``, ``value_wins``,
    ``is_clipped``).
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    v = F.col(value_col).cast("double")
    bands = df.groupBy(*key_cols).agg(
        F.percentile(v, F.lit(float(lower))).alias("p_lo"),
        F.percentile(v, F.lit(float(upper))).alias("p_hi"),
    )
    out = df.join(F.broadcast(bands), key_cols, "left")
    clipped = (v < F.col("p_lo")) | (v > F.col("p_hi"))
    # greatest/least IGNORE nulls (return the extreme non-null), so a
    # NULL value must be passed through explicitly, not clamped to p_lo.
    wins = F.when(
        v.isNull(), F.lit(None).cast("double")
    ).otherwise(F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi")))
    return out.withColumn("value_wins", wins).withColumn("is_clipped", clipped)
