"""Content-addressed series ids.

The reference generates a series id as a SHA-256 over the metadata
tuple (sim_tag, model, version, variable, unit, unit_type, source,
variable_id, unit_id, lat, lon, station) — evidenced by 64-hex ids in
input/inflow/config_150.json:2 and TS.generate_timeseries_id at
output/extract_water_level.py:211. We reproduce the idea (content
addressing) with an explicit, documented serialization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def series_hash_id(*cols: Column | str, sep: str = ":") -> Column:
    """sha2-256 hex id over the ordered metadata columns.

    NULL-safe: nulls serialize as the empty string (concat_ws skips
    nulls), so id generation is deterministic for sparse metadata.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(F.concat_ws(sep, *[c.cast("string") for c in cs]), 256)
