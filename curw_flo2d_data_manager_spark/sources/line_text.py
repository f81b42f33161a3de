"""Line-ordered text source — pure JVM, no Python in the scan.

``spark.read.text`` gives no *documented* row-order guarantee; the
FLO-2D output parsers need stable line numbers to propagate section
headers (SURVEY §4.2 custom piece 3). The engine derives a
file-position-ordered ``line_no`` from ``monotonically_increasing_id``:

* the id is ``partition_id << 33 | row_index_in_partition``;
* the text source creates a file's splits in byte-offset order and
  bins them after a *stable* sort by length descending — a file's
  full-size chunks keep their offset order (stable ties) and its one
  short tail chunk sorts after them, so every file's rows land in
  id order that equals byte order;
* downstream consumers (hychan/timdep parsers) use ``line_no`` ONLY
  for ordering and as a section key, never for adjacency arithmetic,
  so the id's gaps are harmless.

This replaces the round-1 Python path (``textFile → zipWithIndex →
map``) that serialized every line through Python, and the
``wholeTextFiles`` multi-file form that held a whole file per task:
the whole parse plan now stays inside WholeStageCodegen
(tests/test_sources_parsers.py pins both order and the absence of
Python stages). ``tests`` also pin order under forced 1 KiB splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Read one text file as (line_no, value), line_no in file order
    (monotonic, not dense)."""
    return spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_no"), "value"
    )


def read_lines_multi(spark: SparkSession, glob_path: str) -> DataFrame:
    """Read many text files as (file, line_no, value), line order
    stable per file.

    Scale shape for batch extraction of N simulation runs: files split
    and bin-pack into normal scan partitions (no whole-file-in-memory
    tasks), and the downstream section windows partition by ``file``,
    so N files parse fully in parallel with no global sort.
    """
    return spark.read.text(glob_path).select(
        F.input_file_name().alias("file"),
        F.monotonically_increasing_id().alias("line_no"),
        "value",
    )
