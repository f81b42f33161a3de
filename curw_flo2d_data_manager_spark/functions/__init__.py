"""Scalar / column function library (all native Column expressions).

Parity scope needs ZERO Python UDFs (SURVEY §2.12): every reference
scalar — fixed-width rendering, elapsed hours, hash series ids,
right-closed bucketing — is a Catalyst-visible expression, so
whole-stage codegen covers the entire hot path.
"""

from curw_flo2d_data_manager_spark.functions.timeutil import (
    calendar_spine,
    elapsed_hours,
    hours_to_timestamp,
    right_closed_bucket,
    shift_tz,
)
from curw_flo2d_data_manager_spark.functions.render import (
    fw_float,
    fw_str,
)
from curw_flo2d_data_manager_spark.functions.ids import series_hash_id

__all__ = [
    "calendar_spine",
    "elapsed_hours",
    "hours_to_timestamp",
    "right_closed_bucket",
    "shift_tz",
    "fw_float",
    "fw_str",
    "series_hash_id",
]
