"""Sources: line-ordered text, FLO-2D output parsers, DB-API scan."""

from curw_flo2d_data_manager_spark.sources.dbapi import dbapi_partitioned_read
from curw_flo2d_data_manager_spark.sources.hychan import parse_hychan, parse_hychan_multi
from curw_flo2d_data_manager_spark.sources.line_text import read_lines, read_lines_multi
from curw_flo2d_data_manager_spark.sources.timdep import parse_timdep, parse_timdep_multi

__all__ = [
    "dbapi_partitioned_read",
    "parse_hychan",
    "parse_hychan_multi",
    "parse_timdep",
    "parse_timdep_multi",
    "read_lines",
    "read_lines_multi",
]
