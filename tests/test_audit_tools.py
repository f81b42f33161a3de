"""The plan-audit tool's detectors must actually fire: a deliberately
oversized non-equi join (nothing broadcastable) is red-flagged, while
the engine's intentional tiny-side broadcast joins are not."""

import sys

sys.path.insert(0, "tools")

from pyspark.sql import functions as F

from audit_plans import bnlj_risks


def test_bnlj_detector_flags_big_nonequi_join(spark):
    big_a = spark.range(1000).select("id", F.lit("x" * 100).alias("pad"))
    big_b = spark.range(1000).select(
        F.col("id").alias("id2"), F.lit("y" * 100).alias("pad2")
    )
    joined = big_a.join(big_b, F.col("id") + F.col("id2") > 10)
    # threshold far below both sides' ~100 KB estimates
    risks = bnlj_risks(joined, threshold=1024)
    assert len(risks) == 1 and "non-equi join" in risks[0]
    # same join passes when the smaller side is under the threshold
    assert bnlj_risks(joined, threshold=10 * 1024 * 1024) == []


def test_bnlj_detector_ignores_equi_and_range_joins(spark):
    a = spark.range(100).select("id", (F.col("id") * 2).alias("v"))
    b = spark.range(100).select(F.col("id").alias("id2"), (F.col("id") * 3).alias("w"))
    assert bnlj_risks(a.join(b, F.col("id") == F.col("id2")), threshold=0) == []
    banded = a.join(
        b, (F.col("v") >= F.col("id2")) & (F.col("v") <= F.col("id2") + 5)
    )
    assert bnlj_risks(banded, threshold=0) == []
