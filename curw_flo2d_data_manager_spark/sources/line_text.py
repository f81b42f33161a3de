"""Line-ordered text source.

``spark.read.text`` gives no row-order guarantee; the FLO-2D output
parsers need stable line numbers to propagate section headers
(SURVEY §4.2 custom piece 3). ``zipWithIndex`` assigns a global,
file-order-stable index with a single lightweight count job — not a
full shuffle — so downstream window ops can order by ``line_no``.

For multi-file reads we index per file via
``input_file_name`` + a per-file window instead, keeping files
independent (each FLO-2D run's output parses in isolation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

LINE_SCHEMA = StructType(
    [
        StructField("line_no", LongType(), False),
        StructField("value", StringType(), True),
    ]
)


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Read a text file as (line_no, value) with file-order line_no.

    Single-file form (the FLO-2D case). zipWithIndex preserves the
    order of ``textFile`` partitions, which for a single splittable
    text file is byte order — i.e. true line order.
    """
    rdd = (
        spark.sparkContext.textFile(path)
        .zipWithIndex()
        .map(lambda kv: (kv[1], kv[0]))
    )
    return spark.createDataFrame(rdd, LINE_SCHEMA)


MULTI_LINE_SCHEMA = StructType(
    [
        StructField("file", StringType(), False),
        StructField("line_no", LongType(), False),
        StructField("value", StringType(), True),
    ]
)


def read_lines_multi(spark: SparkSession, glob_path: str) -> DataFrame:
    """Read many text files as (file, line_no, value), line order
    stable per file.

    Scale shape for batch extraction of N simulation runs: each FLO-2D
    output file is dimension-sized (tens of MB), so ``wholeTextFiles``
    holds one file per task and the downstream section windows
    partition by ``file`` — N files parse fully in parallel with no
    global sort.
    """
    rdd = spark.sparkContext.wholeTextFiles(glob_path).flatMap(
        lambda kv: (
            (kv[0], i, line) for i, line in enumerate(kv[1].splitlines())
        )
    )
    return spark.createDataFrame(rdd, MULTI_LINE_SCHEMA)
