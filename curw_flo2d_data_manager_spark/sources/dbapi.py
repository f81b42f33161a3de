"""Partitioned DB-API scan — the read twin of
``sinks.upsert.jdbc_upsert_partition``.

The reference's store is MySQL (db_adapter pools over curw_sim /
curw_fcst; e.g. output/extract_water_level.py:163-221 reads station
dims and series rows per element). The engine is Parquet-canonical
(SURVEY §4.3), but a migration / hybrid deployment still needs a
parallel scan out of the database:

* On a real cluster with a JDBC driver jar, prefer Spark's built-in
  source — ``spark.read.format("jdbc")`` with ``partitionColumn`` /
  ``lowerBound`` / ``upperBound`` / ``numPartitions`` gives the same
  range-split parallel scan plus Catalyst filter pushdown.
* This module provides the engine-portable equivalent through any
  DB-API 2.0 driver (pymysql, psycopg, sqlite3), for environments
  without the jar: the driver plans ``num_partitions`` half-open key
  ranges, and each Spark task opens its own connection and fetches
  only its range — the scan parallelizes exactly like the JDBC
  source, rows stream through Arrow batches, and nothing is collected
  on the driver.

Scale notes: range boundaries are computed from caller-supplied
bounds (one cheap ``MIN``/``MAX`` query if unknown), so the fan-out is
N independent indexed range scans on the database — the same shape
the reference's per-element loop produced serially, executed in
parallel. Skewed key spaces: pass explicit ``boundaries``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession


def _open_sqlite(path: str):
    import sqlite3

    # generous busy timeout: concurrent executor partitions serialize
    # on sqlite's single-writer lock instead of failing fast
    return sqlite3.connect(path, timeout=60)


def sqlite_connection_factory(path: str) -> Callable[[], object]:
    """Picklable factory for a file-backed sqlite database — the
    in-sandbox stand-in for a pymysql/psycopg factory (those are
    one-liners of the same shape in a real deployment)."""
    import functools

    return functools.partial(_open_sqlite, path)


def _range_predicates(
    partition_col: str, lower: int, upper: int, num_partitions: int
) -> list[str]:
    """Half-open range predicates covering [lower, upper] completely:
    first/last ranges are unbounded below/above so rows outside the
    sampled bounds are never lost (mirrors the JDBC source contract).
    """
    n = max(1, num_partitions)
    span = max(1, (upper - lower) // n + (1 if (upper - lower) % n else 0))
    preds = []
    for i in range(n):
        lo, hi = lower + i * span, lower + (i + 1) * span
        first, last = i == 0, i == n - 1
        if first and last:
            preds.append("1=1")
        elif first:
            preds.append(f"{partition_col} < {hi}")
        elif last:
            preds.append(f"{partition_col} >= {lo}")
        else:
            preds.append(f"{partition_col} >= {lo} AND {partition_col} < {hi}")
    return preds


def dbapi_partitioned_read(
    spark: SparkSession,
    connection_factory: Callable[[], object],
    table: str,
    schema: str,
    partition_col: str,
    lower: int,
    upper: int,
    num_partitions: int = 8,
    where: str | None = None,
    columns: list[str] | None = None,
    fetch_size: int = 10_000,
) -> DataFrame:
    """Parallel range-partitioned scan of ``table`` through DB-API.

    ``connection_factory`` must be importable on executors (a
    top-level function returning a pymysql/psycopg/sqlite3
    connection). ``schema`` is the Spark DDL string of the selected
    columns, in SELECT order. ``where`` is pushed into every
    partition's query (predicate pushdown to the database).

    TRUSTED INPUT ONLY: ``table`` / ``columns`` / ``where`` /
    ``partition_col`` are interpolated verbatim into SQL (exactly like
    Spark's own JDBC ``dbtable``/``predicates`` options) — they are
    operator configuration, never end-user input.
    """
    import pandas as pd

    cols = ", ".join(columns) if columns else "*"
    extra = f" AND ({where})" if where else ""
    preds = _range_predicates(partition_col, lower, upper, num_partitions)
    # One range per task, GUARANTEED: the range source with
    # numPartitions=n places exactly one sequential index in each
    # partition, no shuffle. (Hash-repartitioning the predicate string
    # could collide two ranges into one task and leave others empty,
    # serializing part of the scan — r2 advice.) The tiny predicate
    # list rides to executors inside the closure.
    plan = spark.range(0, len(preds), 1, numPartitions=len(preds))

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = None
        for pdf in batches:
            for pred in (preds[int(i)] for i in pdf["id"]):
                conn = connection_factory()
                try:
                    cur = conn.cursor()  # type: ignore[attr-defined]
                    cur.execute(
                        f"SELECT {cols} FROM {table} WHERE {pred}{extra}"
                    )
                    if names is None:
                        names = [d[0] for d in cur.description]
                    while True:
                        rows = cur.fetchmany(fetch_size)
                        if not rows:
                            break
                        yield pd.DataFrame.from_records(rows, columns=names)
                finally:
                    conn.close()  # type: ignore[attr-defined]

    return plan.mapInPandas(_fetch, schema)
