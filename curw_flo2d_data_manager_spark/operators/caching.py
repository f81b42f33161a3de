"""Caller-owned cache lifecycle for operator intermediates.

Several operators (MinHash signatures, winnowing fingerprints, passage
explodes, per-(doc, term) counts) persist an intermediate that the
RETURNED lazy plan still references — it cannot be unpersisted inside
the operator without recomputing the expensive projection on every
downstream branch. Lifecycle is therefore caller-owned: call
:func:`release_caches` once the results are materialized (written /
collected) to free executor storage in long-lived sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED_CACHES: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    _TRACKED_CACHES.append(df.persist())
    return df


def release_caches() -> int:
    """Unpersist every tracked operator intermediate and return how
    many were released. Safe to call any time AFTER the returned
    DataFrames have been materialized; calling earlier only costs
    recomputation, never correctness."""
    n = len(_TRACKED_CACHES)
    while _TRACKED_CACHES:
        _TRACKED_CACHES.pop().unpersist()
    return n
