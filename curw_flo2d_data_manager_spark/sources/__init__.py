"""Sources: line-ordered text, FLO-2D output parsers, grids/configs."""

from curw_flo2d_data_manager_spark.sources.line_text import read_lines
from curw_flo2d_data_manager_spark.sources.hychan import parse_hychan
from curw_flo2d_data_manager_spark.sources.timdep import parse_timdep

__all__ = ["read_lines", "parse_hychan", "parse_timdep"]
