"""Bucketed range join — point-in-interval matching without a
cartesian range predicate.

Spark executes a raw ``p.time BETWEEN i.start AND i.end`` join as
BroadcastNestedLoop (O(|points|·|intervals|)) unless one side is tiny.
The scalable form buckets time:

1. each interval explodes to the buckets it covers
   (``floor(start/w) .. floor(end/w)``);
2. each point maps to its single bucket;
3. equi-join on (keys, bucket) — a plain shuffled hash join — then the
   exact ``BETWEEN`` refines.

Work scales with Σ interval-lengths / bucket width; pick ``bucket``
near the median interval length so each interval covers O(1) buckets.
A point pairs with each interval at most once (one bucket per point),
so no dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str = "time",
    start_col: str = "start",
    end_col: str = "end",
    by: list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval containing it (inclusive ends),
    matching within optional ``by`` keys. Returns points ⋈ intervals
    columns."""
    keys = by or []
    b = int(bucket_seconds)

    # An inverted interval (end < start) matches nothing under the
    # exact BETWEEN predicate, but F.sequence(start, stop) with
    # start > stop silently generates a DESCENDING bucket range —
    # spurious candidates that only waste join work. Emit an empty
    # array instead so explode drops the malformed row outright,
    # matching plain-predicate semantics exactly.
    lo = F.floor(F.col(start_col).cast("double") / b).cast("long")
    hi = F.floor(F.col(end_col).cast("double") / b).cast("long")
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
                F.array().cast("array<long>")
            )
        ),
    )
    pts = points.withColumn(
        "_bucket", F.floor(F.col(point_time).cast("double") / b).cast("long")
    )
    joined = pts.join(ivals, keys + ["_bucket"], how).filter(
        F.col(point_time).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    by: list[str] | None = None,
    bucket_seconds: int = 3600,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Interval × interval overlap join (inclusive ends): every (L, R)
    pair with ``L.start <= R.end AND R.start <= L.end``, matched
    within optional ``by`` keys — the generalization of
    :func:`point_in_interval_join` to two interval relations (outage
    windows × forecast runs, rain events × sensor maintenance, ...).

    Same bucketing argument: both sides explode to the time buckets
    they cover, a plain equi-join on (keys, bucket) produces
    candidates, the exact predicate refines. A pair overlapping many
    buckets would surface once per shared bucket, so the join keeps
    ONLY the first overlapping bucket
    (``bucket == floor(max(starts)/width)``) — exact dedup with no
    ``distinct`` shuffle. Work scales with Σ interval-length / width;
    pick ``bucket_seconds`` near the median interval length.

    Non-``by`` columns of each side are suffixed; the output adds
    (``overlap_start``, ``overlap_end``, ``overlap_seconds``) in the
    numeric units of ``start_col``/``end_col``.
    """
    keys = by or []
    b = int(bucket_seconds)
    sa, sb = suffixes

    def prep(df: DataFrame, suf: str) -> DataFrame:
        renamed = df.select(
            *[F.col(k) for k in keys],
            *[
                F.col(c).alias(c + suf)
                for c in df.columns
                if c not in keys
            ],
        )
        # Clamp the bucket range with least/greatest: an inverted
        # interval (end < start) CAN still match pairs under the plain
        # predicate ``L.start <= R.end AND R.start <= L.end`` (its
        # partner must span [end, start]), but an unclamped
        # F.sequence would emit a DESCENDING range whose coverage
        # doesn't contain ``first_bucket`` — silently dropping such
        # pairs. Spanning min..max keeps candidate generation a
        # superset of the exact predicate for any input.
        lo = F.floor(F.col(start_col + suf).cast("double") / b).cast("long")
        hi = F.floor(F.col(end_col + suf).cast("double") / b).cast("long")
        return renamed.withColumn(
            "_bucket",
            F.explode(F.sequence(F.least(lo, hi), F.greatest(lo, hi))),
        )

    la, rb = prep(left, sa), prep(right, sb)
    s1, e1 = F.col(start_col + sa).cast("double"), F.col(end_col + sa).cast("double")
    s2, e2 = F.col(start_col + sb).cast("double"), F.col(end_col + sb).cast("double")
    first_bucket = F.floor(F.greatest(s1, s2) / b).cast("long")
    return (
        la.join(rb, keys + ["_bucket"])
        .filter((s1 <= e2) & (s2 <= e1) & (F.col("_bucket") == first_bucket))
        .drop("_bucket")
        .withColumn("overlap_start", F.greatest(s1, s2))
        .withColumn("overlap_end", F.least(e1, e2))
        .withColumn("overlap_seconds", F.least(e1, e2) - F.greatest(s1, s2))
    )
