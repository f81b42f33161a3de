"""Grid-bucketed spatial radius join.

The reference's nearest-station lookup (`grids.py`
get_flo2d_cells_to_wrf_grid_mappings — SURVEY §2.4 J6/W4) is a
small-dimension broadcast problem. This operator is the BIG×BIG
generalization: find all (left, right) pairs within a Euclidean
radius when neither side fits in a broadcast.

Algorithm (the standard fixed-grid spatial hash):
- cell size = radius, so any pair within ``radius`` is at most one
  cell apart on each axis;
- left points keep their single home cell; right points are exploded
  to their 3×3 cell neighborhood (a 9× fan-out of the SMALLER
  per-row payload, chosen by the caller via column pruning);
- equi-join on the cell key, then the exact distance predicate
  refines.

Each qualifying pair matches on EXACTLY ONE cell (the left point's
home cell), so no distinct/dedup pass is needed — the join output is
already unique per pair.

100-TB shape: one shuffle on (cx, cy) for each side, partition count
scales with the spatial extent, no cartesian anywhere (plan-gated in
tests). Skewed cells (a dense city block) are an AQE skew-join case;
for pathological density, shrink the cell size below the radius and
explode to the correspondingly larger neighborhood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def radius_grid_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    x_col: str = "x",
    y_col: str = "y",
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs with Euclidean distance <= ``radius``.

    Both inputs must carry ``x_col`` / ``y_col``; right-side columns
    are renamed with ``suffix`` on collision. Output adds ``dist``.
    The boundary is inclusive and evaluated as
    ``dx*dx + dy*dy <= radius*radius`` (no sqrt in the predicate, so
    the comparison is exact-IEEE reproducible across engines).
    """
    r = float(radius)
    lx, ly = F.col(x_col), F.col(y_col)
    lcell = left.withColumn("_cx", F.floor(lx / r)).withColumn(
        "_cy", F.floor(ly / r)
    )
    renames = {
        c: c + suffix for c in right.columns if c in set(left.columns)
    }
    rr = right
    for old, new in renames.items():
        rr = rr.withColumnRenamed(old, new)
    rx = F.col(renames.get(x_col, x_col))
    ry = F.col(renames.get(y_col, y_col))
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1), "
        "dx -> transform(sequence(-1, 1), dy -> struct(dx, dy)))))"
    )
    rcell = (
        rr.select("*", offsets.alias("_o"))
        .withColumn("_cx", F.floor(rx / r) + F.col("_o.dx"))
        .withColumn("_cy", F.floor(ry / r) + F.col("_o.dy"))
        .drop("_o")
    )
    dx = lx - rx
    dy = ly - ry
    joined = (
        lcell.join(rcell, ["_cx", "_cy"])
        .filter(dx * dx + dy * dy <= F.lit(r * r))
        .withColumn("dist", F.sqrt(dx * dx + dy * dy))
        .drop("_cx", "_cy")
    )
    return joined


def point_in_rect_join(
    points: DataFrame,
    rects: DataFrame,
    px: str = "px",
    py: str = "py",
    x_lo: str = "x_lo",
    x_hi: str = "x_hi",
    y_lo: str = "y_lo",
    y_hi: str = "y_hi",
    bucket_width: float = 100.0,
) -> DataFrame:
    """Containment join: every (point, rectangle) pair with the point
    inside the closed rectangle — the windowed-region counterpart of
    :func:`radius_grid_join` (geofences, tile assignment, bounding-box
    pre-filters).

    Same fixed-grid trick, asymmetric roles: each point lives in ONE
    x-bucket (floor(px / bucket_width)); each rectangle EXPLODES to
    the x-buckets its [x_lo, x_hi] span touches (span/bucket_width + 1
    rows — size the bucket near the typical rectangle width so the
    fan-out stays O(1)). Equi-join on the bucket, exact BETWEEN
    refine on both axes. A pair matches in exactly one bucket (the
    point's home bucket), so the output needs no dedup.

    100-TB shape: one shuffle per side keyed on the x-bucket, no
    cartesian; a second-axis bucket key is the extension for
    pathologically tall rectangles. All arithmetic is
    floor/divide/compare — engine-deterministic, SQL-replicable.
    """
    pb = points.withColumn(
        "_bx", F.floor(F.col(px) / F.lit(float(bucket_width))).cast("long")
    )
    # degenerate rectangles (x_lo > x_hi) would make sequence() DESCEND
    # through every bucket in between — they can never contain a point,
    # so drop them before the explode
    rects = rects.filter(F.col(x_lo) <= F.col(x_hi))
    rb = rects.withColumn(
        "_bx",
        F.explode(
            F.sequence(
                F.floor(F.col(x_lo) / F.lit(float(bucket_width))).cast(
                    "long"
                ),
                F.floor(F.col(x_hi) / F.lit(float(bucket_width))).cast(
                    "long"
                ),
            )
        ),
    )
    return pb.join(rb, "_bx").filter(
        F.col(px).between(F.col(x_lo), F.col(x_hi))
        & F.col(py).between(F.col(y_lo), F.col(y_hi))
    ).drop("_bx")
