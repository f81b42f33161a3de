"""Skew mitigation: key salting for hot-key aggregations and joins.

AQE's skew-join handling (enabled in ``session.py``) splits oversized
shuffle partitions at runtime, but two shapes still need explicit
salting at 100 TB:

* **hot-key aggregation** — one grid cell / series id carrying a large
  share of rows makes a single reducer the straggler. Two-phase
  aggregate: salt → partial agg on (key, salt) → final agg on key.
  Works for any commutative-associative aggregation.
* **hot-key join against a small-ish side** — replicate the build side
  per salt so the probe side's hot key spreads over ``n_salts``
  reducers.

The salt is deterministic (hash of all columns mod n) rather than
random so retried tasks produce identical partitions (speculative
execution / task retry safety).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt column in [0, n_salts): hash of the full row
    (stable across retries, unlike rand())."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    agg_cols: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``agg_cols`` maps column → 'sum' | 'count' | 'min' | 'max'. Phase 1
    reduces on (keys, salt) — hot keys fan out over ``n_salts``
    reducers; phase 2 combines the tiny per-salt partials. The result
    equals a direct groupBy (all listed aggs re-combine losslessly).
    """
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for how in agg_cols.values():
        if how not in combine:
            raise ValueError(f"unsupported aggregation {how!r}")

    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[first[how](c).alias(c) for c, how in agg_cols.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[combine[how](c).alias(c) for c, how in agg_cols.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big (skewed) side, replicate the
    small side once per salt value, join on (keys, salt).

    The small side is replicated ``n_salts``× — use only when it is
    orders of magnitude below the big side (the usual hot-dimension
    case); otherwise let AQE's skew handling split partitions.
    """
    big_s = with_salt(big, n_salts)
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return big_s.join(small_r, on + ["_salt"], how).drop("_salt")
