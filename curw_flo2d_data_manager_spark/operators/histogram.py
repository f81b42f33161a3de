"""Equi-width histograms as a two-pass aggregate.

Pass 1 computes the global [min, max] of the value column (a scalar
aggregate — partial-agg map-side, one tiny row to the driver plan via
a broadcast cross join, never collected in Python). Pass 2 assigns
``bin = clamp(floor((v - min) / width), 0, bins-1)`` and counts per
(group, bin). Both passes are partial-aggregate friendly: at 100 TB
the only shuffle is the final (group, bin) combine, whose cardinality
is |groups| × bins, independent of row count.

The reference computes its summary statistics per-series in Python
loops (SURVEY §2.8); this is the distributed generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_width_histogram(
    df: DataFrame,
    value_col: str = "value",
    group_cols: list[str] | None = None,
    bins: int = 10,
) -> DataFrame:
    """One row per (group, non-empty bin): ``bin`` (0-based), the
    bin's inclusive lower edge ``bin_lo``, and the row count ``n``.
    Bin edges come from the GLOBAL min/max so bins are comparable
    across groups; the top edge is inclusive (value == max lands in
    the last bin). NULL values are excluded.
    """
    groups = list(group_cols or [])
    bounds = df.agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    binned = (
        df.filter(F.col(value_col).isNotNull())
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "bin",
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor((F.col(value_col) - F.col("_lo")) / width),
                )
            )
            .cast("bigint"),
        )
        .withColumn("bin_lo", F.col("_lo") + F.col("bin") * width)
    )
    return (
        binned.groupBy(*groups, "bin", "bin_lo")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str = "value",
    bins: int = 10,
) -> DataFrame:
    """Equi-DEPTH histogram: bin edges at the exact i/bins quantiles,
    so every bin holds ~the same row count — the selectivity-stats
    layout optimizers and drift monitors want (an equi-width histogram
    of a long-tailed column puts 99% of rows in bin 0; equi-depth
    resolves the head at full granularity).

    Pass 1 is ONE ``percentile`` aggregate producing the bins−1 edge
    array (exact interpolated quantiles — the buffer is a value→count
    map, so cost scales with distinct values; at extreme continuous
    cardinality swap in ``approx_percentile`` the same way). Pass 2
    broadcasts the edge array and assigns
    ``bin = Σ 1[v > edge_i]`` as a codegen fold — O(bins) per row, no
    shuffle until the final bins-cardinality count.

    Returns one row per non-empty bin: (bin, n, lo, hi) with lo/hi the
    observed value range inside the bin. NULLs are excluded.
    """
    v = F.col(value_col).cast("double")
    fracs = F.array(
        *[F.lit(i / bins) for i in range(1, bins)]
    )
    edges = df.filter(v.isNotNull()).agg(
        F.percentile(v, fracs).alias("_edges")
    )
    binned = (
        df.filter(v.isNotNull())
        .crossJoin(F.broadcast(edges))
        .select(
            v.alias("_v"),
            F.aggregate(
                F.col("_edges"),
                F.lit(0),
                lambda acc, e: acc
                + F.when(v > e, F.lit(1)).otherwise(F.lit(0)),
            ).alias("bin"),
        )
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_v").alias("lo"),
        F.max("_v").alias("hi"),
    )
