"""TimeseriesStore — the engine's replacement for the reference's
MySQL + stored-procedure data access layer.

The reference fetches series through ``db_adapter``:

* ``TS.get_timeseries(id, start, end)`` (input/inflow/gen_150_inflow.py:97-98)
* id resolution ``(method, model, grid_id) → id``
  (gen_150_inflow.py:202-203, input/rain/gen_rain.py:132)
* stored procs ``get_ts_end`` / ``getWL`` / ``prepare_flo2d_raincell`` /
  ``getNearestWeatherStation`` (SURVEY §2 rows S2/S3/S4/S6)

Here the store is two Parquet-backed relations —

* ``run(id, method, model, grid_id)``   — series metadata (dimension)
* ``data(id, time, value)``             — fact, partitioned by date,
                                          sorted (id, time) in-file

— and every stored procedure becomes a pure DataFrame query, so
predicate pushdown / partition pruning / broadcast come from Catalyst.
At 100 TB the fact table is laid out ``PARTITIONED BY (date)`` with
(id, time) sort order so S1 range scans touch only matching row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TimeseriesStore:
    """Query API over a (run, data) pair of DataFrames.

    ``run`` is dimension-sized (thousands of rows) and always
    broadcast; ``data`` scales arbitrarily.
    """

    def __init__(self, run: DataFrame, data: DataFrame):
        self.run = run
        self.data = data

    # -- S5: series-id metadata lookup ---------------------------------
    def resolve_id(self, method: str, model: str, grid_id: str) -> DataFrame:
        """(method, model, grid_id) → id rows (reference:
        get_curw_sim_discharge_id, gen_150_inflow.py:202-203)."""
        return self.run.filter(
            (F.col("method") == method)
            & (F.col("model") == model)
            & (F.col("grid_id") == grid_id)
        ).select("id")

    # -- S1: series-range scan ------------------------------------------
    def get_timeseries(self, id_: str, start, end) -> DataFrame:
        """One series' rows in [start, end], time-ordered (reference:
        TS.get_timeseries, gen_150_inflow.py:97-98). The id and time
        predicates push down to the parquet scan."""
        return (
            self.data.filter(F.col("id") == id_)
            .filter(F.col("time").between(F.lit(start), F.lit(end)))
            .select("time", "value")
            .orderBy("time")
        )

    def get_timeseries_by_meta(self, method: str, model: str, grid_id: str, start, end) -> DataFrame:
        """S5 + S1 fused: resolve then scan, as one plan (broadcast
        semi-join instead of a driver round-trip)."""
        ids = self.resolve_id(method, model, grid_id)
        return (
            self.data.join(F.broadcast(ids), "id", "left_semi")
            .filter(F.col("time").between(F.lit(start), F.lit(end)))
            .select("time", "value")
            .orderBy("time")
        )

    # -- S6: max-end-time lookup ------------------------------------------
    def ts_end(self, method: str, model: str) -> DataFrame:
        """Latest available timestamp for (model, method) (reference:
        stored proc get_ts_end, gen_raincell.py:100-102)."""
        ids = self.run.filter(
            (F.col("method") == method) & (F.col("model") == model)
        ).select("id")
        return (
            self.data.join(F.broadcast(ids), "id", "left_semi")
            .agg(F.max("time").alias("ts_end"))
        )

    # -- S3: first-value point lookup --------------------------------------
    def first_value(self, id_: str, start, end) -> DataFrame:
        """First observed value in the window (reference: stored proc
        getWL + fetchone, gen_250_inflow.py:107-111). ``min_by`` gives a
        single partial-aggregable expression — no sort, no limit."""
        return (
            self.data.filter(F.col("id") == id_)
            .filter(F.col("time").between(F.lit(start), F.lit(end)))
            .agg(F.min_by("value", "time").alias("value"), F.min("time").alias("time"))
        )
