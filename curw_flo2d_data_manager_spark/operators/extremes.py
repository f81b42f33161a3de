"""Extreme-value extraction and drift detection for sensor series.

Two operators a flood-forecast data manager runs over long gauge
series (the reference's domain — its rainfall/water-level extraction
scripts feed exactly this kind of analysis downstream; see
``/root/reference/input/gen_rain.py`` for threshold-style handling of
rainfall sentinels, SURVEY §2.7):

- ``peaks_over_threshold``: classic POT / partial-duration-series
  extraction (Coles 2001, ch. 4) — keep the exceedances of a
  threshold, decluster them so one storm counts once, and return the
  single largest reading per cluster. Declustering uses the standard
  runs method: exceedances closer than ``min_gap_seconds`` belong to
  the same cluster.

- ``cusum_drift``: two-sided CUSUM drift statistic (Page 1954).
  The textbook recurrence ``s+_i = max(0, s+_{i-1} + (x_i - target
  - slack))`` looks serial, but it has an exact prefix-scan form:

      s+_i = P_i - min(0, min_{j <= i} P_j),
      P_i = Σ_{k<=i} (x_k - target - slack)

  (the ``min(0, ...)`` carries the implicit empty-prefix state
  ``P_0 = 0``; symmetrically ``s-_i = max(0, max_{j<=i} N_j) - N_i``
  for the lower side), so the whole operator is TWO cascaded
  running-frame windows over one sort — no recursion, no UDF, no
  serial state.

100-TB shape: both operators are one shuffle on the series key with
running (incremental) frames only — no UnboundedFollowing re-scan
frames, no growing state. The per-key sort is the only cost; salting
(``operators/skew.py``) applies if one series dominates a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def peaks_over_threshold(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    threshold: float = 0.0,
    min_gap_seconds: float = 3600.0,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Return one row per declustered exceedance cluster: the cluster
    sequence number, the peak value, the peak's timestamp and
    tiebreak ids, the cluster size, and the excess over threshold.

    Runs-method declustering: within a key, exceedances whose
    timestamps are within ``min_gap_seconds`` of the previous
    exceedance share a cluster. The peak row is the max value in the
    cluster; ties broken by earliest (ts, tiebreaks).
    """
    keys = list(key_cols or [])
    ties = list(tiebreak_cols or [])
    exceed = df.filter(F.col(value_col) > F.lit(threshold))
    w = Window.partitionBy(*keys).orderBy(ts_col, *ties)
    prev_ts = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("double") - prev_ts.cast("double")
    is_new = (prev_ts.isNull() | (gap > F.lit(min_gap_seconds))).cast("long")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clustered = exceed.withColumn("cluster_seq", F.sum(is_new).over(running))
    # Peak per cluster: max_by on a struct so value ties resolve to the
    # earliest (ts, tiebreaks) — a deterministic, order-insensitive
    # aggregate (partial-agg friendly, no second window needed).
    peak_key = F.struct(
        F.col(value_col).alias("v"),
        # negate the order columns so max(...) picks the EARLIEST row
        # among equal values
        (-F.col(ts_col).cast("double")).alias("neg_ts"),
        *[(-F.col(c).cast("double")).alias(f"neg_{c}") for c in ties],
    )
    payload = F.struct(
        F.col(ts_col).alias("peak_ts"),
        *[F.col(c).alias(f"peak_{c}") for c in ties],
        F.col(value_col).alias("peak_value"),
    )
    agg = (
        clustered.groupBy(*keys, "cluster_seq")
        .agg(
            F.max_by(payload, peak_key).alias("peak"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .select(
            *keys,
            "cluster_seq",
            "peak.*",
            "cluster_size",
        )
        .withColumn(
            "excess", F.col("peak_value") - F.lit(threshold)
        )
    )
    return agg


def cusum_drift(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    target: float = 0.0,
    slack: float = 0.5,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Add ``cusum_pos`` / ``cusum_neg`` columns via the prefix-scan
    identity (module docstring) — exact CUSUM values, two running
    windows over one per-key sort.

    ``cusum_pos`` grows when the series runs persistently above
    ``target + slack``; ``cusum_neg`` when persistently below
    ``target - slack``. Alarm thresholds are left to the caller (they
    are a filter on the output, not part of the statistic).
    """
    keys = list(key_cols or [])
    ties = list(tiebreak_cols or [])
    w = Window.partitionBy(*keys).orderBy(ts_col, *ties)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pos_step = F.col(value_col) - F.lit(target) - F.lit(slack)
    neg_step = F.col(value_col) - F.lit(target) + F.lit(slack)
    p = F.sum(pos_step).over(running)
    n = F.sum(neg_step).over(running)
    # s+ = P - min(0, running_min(P));  s- = max(0, running_max(N)) - N
    # (the 0 bound is the implicit empty-prefix P_0 = 0 / N_0 = 0)
    out = (
        df.withColumn("_p", p)
        .withColumn("_n", n)
        .withColumn(
            "cusum_pos",
            F.col("_p") - F.least(F.lit(0.0), F.min("_p").over(running)),
        )
        .withColumn(
            "cusum_neg",
            F.greatest(F.lit(0.0), F.max("_n").over(running)) - F.col("_n"),
        )
        .drop("_p", "_n")
    )
    return out
