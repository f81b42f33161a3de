"""Cross-engine bit-equality of functions/exactmath.ln_ratio_det.

The fixed-point weight contract (sparse cosine idf, round-10 advice)
holds only if the pre-round double is BIT-identical between Spark and
the DuckDB oracle. IEEE-754 guarantees correct rounding for + - * /
(not for libm ln), so the basic-ops log must agree to the last bit —
this test sweeps (num, den) pairs including huge ratios and asserts
struct-packed equality, plus absolute accuracy vs math.log.
"""

import math
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.functions.exactmath import (
    ln_ratio_det,
    ln_ratio_det_sql,
)

PAIRS = sorted(
    set(
        [(n, d) for d in range(1, 20) for n in range(d, 2000, 13)]
        + [(1, 1), (2, 1), (3, 2), (2**40 + 17, 3), (10**12, 999983)]
    )
)


def test_ln_ratio_det_bit_identical_spark_vs_duckdb(spark):
    df = spark.createDataFrame(PAIRS, "num long, den long")
    got = {
        (r.num, r.den): r.lnr
        for r in df.withColumn(
            "lnr", ln_ratio_det(F.col("num"), F.col("den"))
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE p(num BIGINT, den BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", PAIRS)
    oracle = {
        (n, d): v
        for n, d, v in con.sql(
            f"SELECT num, den, {ln_ratio_det_sql('num', 'den')} FROM p"
        ).fetchall()
    }
    assert len(got) == len(PAIRS)
    mismatches = [
        k
        for k in got
        if struct.pack("<d", got[k]) != struct.pack("<d", oracle[k])
    ]
    assert mismatches == []


def test_ln_ratio_det_accuracy_vs_libm():
    con = duckdb.connect()
    con.execute("CREATE TABLE p(num BIGINT, den BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", PAIRS)
    rows = con.sql(
        f"SELECT num, den, {ln_ratio_det_sql('num', 'den')} FROM p"
    ).fetchall()
    worst = max(abs(v - math.log(n / d)) for n, d, v in rows)
    # atanh-series truncation bound: 2*(1/3)^13/13 < 1e-7, plus range
    # reduction round-off
    assert worst < 2e-7


def test_ln_ratio_det_exact_at_one():
    con = duckdb.connect()
    (v,) = con.sql(f"SELECT {ln_ratio_det_sql('7', '7')}").fetchone()
    assert v == 0.0
