"""Table profiling: per-column data-quality statistics in one pass.

The pipeline-health primitive every large ingest needs — null rates,
distinct cardinalities, value ranges — computed as ONE aggregate job
over the fact (no per-column rescans), returned long-form (one row
per column) so downstream drift checks diff profiles as plain
relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str],
    exact_distinct: bool = True,
    round_to: int = 4,
) -> DataFrame:
    """Profile numeric/castable columns: one output row per column
    with (col_name, n_rows, n_null, n_distinct, min_v, max_v, avg_v).

    All statistics for every column compute in a SINGLE aggregate over
    one scan; the wide 1-row result then unpivots to long form with
    ``stack`` — a constant-size driver-side-free reshape, so a 100 TB
    profile costs exactly one pass + one |cols|-row transpose.

    ``exact_distinct=True`` uses COUNT(DISTINCT): Spark plans multiple
    distinct aggregates with an Expand (each input row replicated
    |cols|× before the partial aggregate) — exact, and the partial agg
    still collapses per-value before the shuffle, but the map-side
    cost is |cols|× the scan. At extreme scale set it False for
    ``approx_count_distinct`` (HLL, one pass, no Expand) — the 100-TB
    default when profiles feed drift alerts rather than contracts.
    """
    nd = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        # try_cast: non-numeric columns profile null/distinct and get
        # NULL range/mean (ANSI mode would throw on a plain cast)
        v = F.col(c).try_cast("double")
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_null_{c}"),
            nd(F.col(c)).alias(f"_nd_{c}"),
            F.round(F.min(v), round_to).alias(f"_min_{c}"),
            F.round(F.max(v), round_to).alias(f"_max_{c}"),
            F.round(F.avg(v), round_to).alias(f"_avg_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}'")
        stack_args += [f"_null_{c}", f"_nd_{c}", f"_min_{c}", f"_max_{c}", f"_avg_{c}"]
    stacked = wide.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(col_name, n_null, n_distinct, min_v, max_v, avg_v)"
        ),
    )
    return stacked.select(
        "col_name", "n_rows", "n_null", "n_distinct", "min_v", "max_v", "avg_v"
    )
