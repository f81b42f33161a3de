"""Operator library — reusable DataFrame → DataFrame transforms.

Parity operators (SURVEY §2) plus the beyond-parity training-data
operators (dedup / similarity / text analysis / multimodal). Every
operator takes and returns DataFrames, composes with arbitrary Spark
code, and is designed for multi-executor scale first.
"""

from curw_flo2d_data_manager_spark.operators.resample import resample_sum
from curw_flo2d_data_manager_spark.operators.spine import spine_align
from curw_flo2d_data_manager_spark.operators.cumulative import cumulative_fraction
from curw_flo2d_data_manager_spark.operators.filldown import fill_down
from curw_flo2d_data_manager_spark.operators.nearest import nearest_neighbor_join
from curw_flo2d_data_manager_spark.operators.gapfill import gap_fill_cross
from curw_flo2d_data_manager_spark.operators.components import (
    cluster_assign,
    connected_components,
)

__all__ = [
    "resample_sum",
    "spine_align",
    "cumulative_fraction",
    "fill_down",
    "nearest_neighbor_join",
    "gap_fill_cross",
    "cluster_assign",
    "connected_components",
]
