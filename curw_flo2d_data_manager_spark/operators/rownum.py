"""Global row numbering without the single-partition window.

``row_number().over(Window.orderBy(...))`` — no partitionBy — is the
classic 100 TB scale-killer: Spark moves EVERY row into one partition
(the plan shows ``Exchange SinglePartition``) and one task sorts the
world. The scalable pattern is three bounded steps: range-exchange on
the order key, count rows per partition (a |partitions|-row action),
and add each partition's cumulative offset to its local row numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from curw_flo2d_data_manager_spark.functions.plan_literals import (
    literal_rows_df,
)


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "row_num",
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous 1-based global row numbers in ``order_cols`` order,
    computed distributed: ``repartitionByRange`` on the order key, a
    per-partition count (ONE bounded collect — |partitions| rows, the
    same driver-action class as z-order's min/max frame), then
    ``local row_number + broadcast offset``. No SinglePartition
    exchange anywhere; every stage is as parallel as the exchange.

    ``order_cols`` must be a TOTAL order (include a unique tiebreak
    column): numbering of tied rows at a range boundary is otherwise
    partitioner-dependent. With a total order the result equals
    ``ROW_NUMBER() OVER (ORDER BY ...)`` exactly, independent of how
    the range sampler places boundaries.

    The local window partitions by ``spark_partition_id()`` — already
    co-located, so it adds an in-partition sort but NO exchange.
    """
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    tagged = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin partitioning: the count and
        # the numbering below must see identical placement
    )
    counts = {
        r["_pid"]: r["n"]
        for r in tagged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = literal_rows_df(
        df.sparkSession,
        [(pid, off) for pid, off in offsets.items()],
        "_pid int, _offset long",
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        tagged.join(F.broadcast(off_df), "_pid")
        .withColumn(
            out_col, F.row_number().over(w).cast("long") + F.col("_offset")
        )
        .drop("_pid", "_offset")
    )
