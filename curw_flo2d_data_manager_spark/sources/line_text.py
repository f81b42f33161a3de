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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Read one text file as (line_no, value), line_no in file order
    (monotonic, not dense)."""
    return spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_no"), "value"
    )


def filldown_headers(
    tagged: DataFrame,
    cols: list[str],
    order_col: str = "line_no",
    file_col: str = "file",
    cache: bool = False,
) -> DataFrame:
    """Fill ``cols`` down file line order as a PARALLEL PREFIX.

    A plain ``Window.partitionBy(file)`` fill-down pulls an entire file
    into ONE task — fine for dimension-sized FLO-2D outputs, a
    serialization wall for a multi-GB one (round-2 watch item). The
    standard prefix decomposition keeps the scan's parallelism:

    1. local fill-down inside each scan partition (exchange keyed by
       (partition id, file) — same volume as the old per-file window,
       but as many tasks as the scan has splits);
    2. carry: each partition inherits the last header values from
       earlier partitions of the same file, computed on the
       dimension-sized header set and broadcast back;
    3. ``coalesce(local, carry)``.

    ``cols`` must be populated together on the same (header) rows.
    The two auxiliary scans over the raw text are the declarative twin
    of the reference's own pass-1 (extract_water_level.py:425-446).

    The plan traverses ``tagged`` three times (local fill, header
    extraction, pid spine). ``cache=True`` persists it
    (MEMORY_AND_DISK) so the text scan + tokenization runs once —
    MEASURED at a 1 GiB HYCHAN on local[32]+page cache this is a
    pessimization (tools/bench_hychan_scale.py, BASELINE.md: 21.0 s
    uncached vs 37.1 s cached — persist serialization costs more than
    two extra codegen scans of locally-cached text), so the default is
    False; flip it when the source is remote object storage, where the
    three traversals are three paid network reads. Partition layout is
    consistent across uncached traversals because split planning over
    a static file is deterministic (the forced-1 KiB-splits test pins
    byte-identical output across partition counts).
    """
    from functools import reduce

    from pyspark import StorageLevel

    tagged = tagged.withColumn("_pid", F.spark_partition_id())
    if cache:
        tagged = tagged.persist(StorageLevel.MEMORY_AND_DISK)
    w_loc = (
        Window.partitionBy("_pid", file_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tagged
    for c in cols:
        local = local.withColumn(c, F.last(c, ignorenulls=True).over(w_loc))

    headers = tagged.filter(
        reduce(lambda a, b: a | b, [F.col(c).isNotNull() for c in cols])
    )
    # Last NON-null per column (matching last(..., ignorenulls=True)):
    # a bare max_by(c, order_col) would take the value at the last
    # header row even when that value is null (e.g. a malformed header
    # whose try_element_at missed), silently nulling every later
    # partition's fill (round-3 advice). Conditioning the order key on
    # c.isNotNull() makes max_by skip null candidates per column.
    pid_last = headers.groupBy(file_col, "_pid").agg(
        *[
            F.max_by(c, F.when(F.col(c).isNotNull(), F.col(order_col))).alias(
                f"_h_{c}"
            )
            for c in cols
        ]
    )
    pids = tagged.select(file_col, "_pid").distinct()
    w_carry = (
        Window.partitionBy(file_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = pids.join(pid_last, [file_col, "_pid"], "left")
    for c in cols:
        carry = carry.withColumn(
            f"_c_{c}", F.last(f"_h_{c}", ignorenulls=True).over(w_carry)
        )
    carry = carry.select(file_col, "_pid", *[f"_c_{c}" for c in cols])

    out = local.join(F.broadcast(carry), [file_col, "_pid"], "left")
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"_c_{c}")))
    return out.drop("_pid", *[f"_c_{c}" for c in cols])


def assert_line_order(spark: SparkSession, path: str) -> None:
    """Loud upgrade-gate check for the ordering contract above.

    Re-scans ``path`` with the hidden ``_metadata`` column and verifies
    that per (file, split block) the ``monotonically_increasing_id``
    ranges are disjoint and increase with the block's byte offset —
    exactly the property ``read_lines`` relies on. Raises ValueError
    if a Spark upgrade or an alternative file source breaks it (the
    failure mode would otherwise be silently reordered lines). The
    check aggregates to one row per split, so it is cheap at any file
    size; run it in upgrade gates alongside
    tests/test_sources_parsers.py::test_read_lines_order_under_forced_splits.
    """
    per_block = (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("file"),
            F.col("_metadata.file_block_start").alias("block_start"),
            F.monotonically_increasing_id().alias("line_no"),
        )
        .groupBy("file", "block_start")
        .agg(F.min("line_no").alias("lo"), F.max("line_no").alias("hi"))
        .orderBy("file", "block_start")
        .collect()
    )
    prev: dict[str, int] = {}
    for r in per_block:
        last = prev.get(r.file)
        if last is not None and r.lo <= last:
            raise ValueError(
                f"line-order contract violated in {r.file}: block at byte "
                f"{r.block_start} has ids overlapping an earlier block — "
                "monotonically_increasing_id order no longer matches byte "
                "order on this Spark version/source"
            )
        prev[r.file] = r.hi


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
