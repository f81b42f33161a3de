"""OUTFLOW.DAT generation — SURVEY §2 rows J7/F4/K2/U1, §7 step 5.

Reference behavior (input/outflow/gen_outflow.py:119-263 — three
near-identical functions differing only in cell constants):

* ``K <cell>`` rows (4 per model);
* per boundary node, in fixed file order: ``N <cell> 1`` then that
  node's tide series as ``S <hours %.3f> <stage %.3f>`` rows
  (:110-112), hours elapsed from the node series' FIRST sample
  (including gap rows — the -99999 filter at :108-109 happens after
  the origin is taken);
* rows whose value is the −99999 gap sentinel are dropped (F4);
* verbatim tail asset appended (P3 — tail_*.txt).

The reference pulls each node's series sequentially (J7 fan-out);
the engine joins the node map to the tide relation once — all nodes
scan in one pass, partitioned by node at render.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from curw_flo2d_data_manager_spark.functions.plan_literals import literal_rows_df
from curw_flo2d_data_manager_spark.functions.timeutil import elapsed_hours
from curw_flo2d_data_manager_spark.plans.models import (
    TIDE_GAP_SENTINEL,
    get_model_spec,
)


def outflow_lines(
    tide_ts: DataFrame,
    model: str,
) -> DataFrame:
    """Render OUTFLOW.DAT rows (without the tail asset — pass that as
    ``footer_lines`` to the ordered-text sink).

    ``tide_ts`` is DataFrame(node int, time timestamp, value double):
    the tide series for every boundary node, as produced by joining the
    model's tide-id config map to the store (reference J7 fan-out,
    gen_outflow.py:133-151 + config_*.json ``tide_ids`` maps).

    Returns ``(block_rank int, intra_rank long, line string)``:
    block 0 = K rows; blocks 1.. = one per boundary node in the spec's
    file order (``N`` row then ``S`` rows).
    """
    spec = get_model_spec(model)
    k_cells, n_cells = spec.require_outflow()  # flo2d_10 = rain-only
    spark = tide_ts.sparkSession

    k_rows = literal_rows_df(
        spark,
        [(0, i, "K" + str(c).rjust(16)) for i, c in enumerate(k_cells)],
        "block_rank int, intra_rank long, line string",
    )
    n_rows = literal_rows_df(
        spark,
        [
            (i + 1, 0, "N" + str(c).rjust(16) + "1".rjust(16))
            for i, c in enumerate(n_cells)
        ],
        "block_rank int, intra_rank long, line string",
    )
    node_rank = {c: i + 1 for i, c in enumerate(n_cells)}
    rank_map = F.create_map(
        *[F.lit(x) for pair in node_rank.items() for x in pair]
    )

    w = Window.partitionBy("node")
    s_rows = (
        tide_ts.withColumn("_t0", F.min("time").over(w))  # origin before gap filter
        .filter(F.col("value").cast("int") != int(TIDE_GAP_SENTINEL))
        .select(
            rank_map[F.col("node")].alias("block_rank"),
            (F.unix_timestamp("time") + 1).alias("intra_rank"),  # after the N row
            F.format_string(
                "S%16.3f%16.3f", elapsed_hours("time", F.col("_t0")), F.col("value")
            ).alias("line"),
        )
    )
    return k_rows.unionByName(n_rows).unionByName(s_rows)
