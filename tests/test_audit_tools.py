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


def test_quadratic_frame_detector_flags_moving_lower_bound(spark):
    """The O(n²) window-frame detector (round-8): a frame whose upper
    bound is unboundedFollowing with a MOVING lower bound flags; the
    whole-partition frame and running frames do not."""
    from pyspark.sql import Window

    from audit_plans import quadratic_frames

    df = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("t"),
        (F.col("id") * 2).alias("v"),
    )

    def plan(frame):
        w = Window.partitionBy("k").orderBy("t").rowsBetween(*frame)
        d = df.select(F.last("v").over(w).alias("x"))
        return d._jdf.queryExecution().executedPlan().toString()

    bad = plan((Window.currentRow, Window.unboundedFollowing))
    assert len(quadratic_frames(bad)) == 1, bad
    assert quadratic_frames(
        plan((Window.unboundedPreceding, Window.unboundedFollowing))
    ) == []
    assert quadratic_frames(
        plan((Window.unboundedPreceding, Window.currentRow))
    ) == []
