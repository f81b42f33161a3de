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

    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / b).cast("long"),
                F.floor(F.col(end_col).cast("double") / b).cast("long"),
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
