"""Structured Streaming surface (beyond-parity — SURVEY §2.11).

The reference is pure batch (cron-triggered scripts); the engine adds
a streaming ingest path so series arriving as files become continuously
maintained aggregates and upserted forecast relations.
"""

from curw_flo2d_data_manager_spark.streaming.ingest import (
    foreach_batch_upsert,
    hychan_extract_stream,
    timdep_extract_stream,
    read_series_stream,
    streaming_attribution_join,
    streaming_cumulative_sum,
    streaming_dedup,
    streaming_cusum,
    streaming_hot_terms,
    streaming_windowed_distinct,
    streaming_pot,
    streaming_session_sum,
    streaming_resample_sum,
)

__all__ = [
    "foreach_batch_upsert",
    "hychan_extract_stream",
    "timdep_extract_stream",
    "read_series_stream",
    "streaming_attribution_join",
    "streaming_cumulative_sum",
    "streaming_dedup",
    "streaming_cusum",
    "streaming_hot_terms",
    "streaming_windowed_distinct",
    "streaming_pot",
    "streaming_session_sum",
    "streaming_resample_sum",
]
