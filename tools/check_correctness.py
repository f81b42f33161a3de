"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry through Spark and, where an oracle
exists, the matching SQL through DuckDB over the same parquet tables;
compares row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [name_filter...]
       [--skip name1,name2]  (exclude queries whose ORACLE cannot run
       at the target scale — e.g. w_ewma's recursive-CTE replay is
       O(n^2) in series length and only feasible <= sf0.01; the Spark
       side carries its own scale bench)
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod
from curw_flo2d_data_manager_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if v is None:
        return "NULL"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(norm_cell(row[i]) for i in order))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    argv = sys.argv[2:]
    skip = set()
    if "--skip" in argv:
        i = argv.index("--skip")
        if i + 1 >= len(argv):
            sys.exit(
                "usage: check_correctness.py [sf_dir] [--skip a,b,c] "
                "[name ...]  (--skip needs a comma-separated value)"
            )
        skip = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    name_filter = argv

    spark = get_spark(app_name="check_correctness", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name in skip:
            print(f"SKIP  {name}: excluded via --skip")
            continue
        if name_filter and not any(f in name for f in name_filter):
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = sdf.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            # The driver's hasher canonicalizes HUGEINT differently from
            # BIGINT (round-1 q12/w_sessionize failures): reject any
            # oracle exposing an int128 output column up front.
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            huge = [r[0] for r in desc if "HUGEINT" in str(r[1]).upper()]
            if huge:
                print(f"FAIL  {name}: oracle exposes HUGEINT columns {huge} — CAST(... AS BIGINT)")
                failures.append(name)
                continue
            res = con.execute(oracles[name])
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL  {name}: schema mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            failures.append(name)
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            failures.append(name)
            continue
        cs = canon([tuple(r) for r in s_rows], s_cols)
        co = canon(o_rows, o_cols)
        if cs != co:
            ndiff = sum(1 for a, b in zip(cs, co) if a != b)
            print(f"FAIL  {name}: value mismatch ({ndiff}/{len(cs)} rows differ)")
            for a, b in list(zip(cs, co))[:200]:
                if a != b:
                    print(f"      spark : {a}")
                    print(f"      oracle: {b}")
                    break
            failures.append(name)
            continue
        print(f"OK    {name}: {len(s_rows)} rows")

    print()
    if failures:
        print(f"{len(failures)} FAILED: {failures}")
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
