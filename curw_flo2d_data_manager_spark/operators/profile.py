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
    # Positional intermediate aliases + escaped name literals (round-8
    # advice): interpolating raw column names into the stack() SQL
    # broke on names with spaces/hyphens/quotes. The agg aliases are
    # now index-based (always parseable bare identifiers) and the
    # col_name literal escapes embedded single quotes.
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        # try_cast: non-numeric columns profile null/distinct and get
        # NULL range/mean (ANSI mode would throw on a plain cast)
        v = F.col(c).try_cast("double")
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_null_{i}"),
            nd(F.col(c)).alias(f"_nd_{i}"),
            F.round(F.min(v), round_to).alias(f"_min_{i}"),
            F.round(F.max(v), round_to).alias(f"_max_{i}"),
            F.round(F.avg(v), round_to).alias(f"_avg_{i}"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        lit = c.replace("\\", "\\\\").replace("'", "\\'")
        stack_args.append(f"'{lit}'")
        stack_args += [f"_null_{i}", f"_nd_{i}", f"_min_{i}", f"_max_{i}", f"_avg_{i}"]
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
