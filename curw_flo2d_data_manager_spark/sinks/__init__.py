"""Sinks: ordered fixed-width text files, parquet/JDBC upsert."""

from curw_flo2d_data_manager_spark.sinks.ordered_text import write_ordered_text
from curw_flo2d_data_manager_spark.sinks.upsert import merge_upsert, jdbc_upsert_partition

__all__ = ["write_ordered_text", "merge_upsert", "jdbc_upsert_partition"]
