"""End-to-end FLO-2D pipeline plans (SURVEY §3, §7 steps 2-6).

Each of the reference's CLI scripts becomes one declarative plan that
produces a render DataFrame ``(block_rank, intra_rank, line)`` — the
row shape of the ordered-text sink — or, on the extraction side, a
typed forecast DataFrame for the upsert sink. The per-timestep /
per-series driver loops of the reference collapse into single Spark
plans (one shuffle where the reference made N network round-trips).
"""

from curw_flo2d_data_manager_spark.plans.models import MODELS
from curw_flo2d_data_manager_spark.plans.inflow import inflow_lines
from curw_flo2d_data_manager_spark.plans.outflow import outflow_lines
from curw_flo2d_data_manager_spark.plans.rain import rain_lines
from curw_flo2d_data_manager_spark.plans.raincell import raincell_lines
from curw_flo2d_data_manager_spark.plans.chan import chan_lines
from curw_flo2d_data_manager_spark.plans.extract import extract_hychan_forecast

__all__ = [
    "MODELS",
    "inflow_lines",
    "outflow_lines",
    "rain_lines",
    "raincell_lines",
    "chan_lines",
    "extract_hychan_forecast",
]
