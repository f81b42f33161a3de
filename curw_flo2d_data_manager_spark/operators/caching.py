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

from contextlib import contextmanager

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


def cache_mark() -> int:
    """Current ledger position — pass to :func:`release_caches_since`
    to free only the caches persisted after this point."""
    return len(_TRACKED_CACHES)


def release_caches_since(mark: int) -> int:
    """Unpersist only the tracked caches appended after ``mark``
    (from :func:`cache_mark`), leaving earlier caller-owned caches
    untouched. Returns how many were released."""
    scoped = _TRACKED_CACHES[mark:]
    del _TRACKED_CACHES[mark:]
    for df in scoped:
        df.unpersist()
    return len(scoped)


@contextmanager
def cache_scope():
    """Release ONLY the caches persisted inside this block.

    Long-lived sessions (streaming micro-batches, multi-command
    drivers) must not drain the global ledger — that would unpersist
    intermediates tracked by unrelated in-flight work and silently
    force their recomputation. Entering the scope marks the ledger;
    exiting unpersists exactly the entries appended after the mark,
    leaving earlier (caller-owned) caches untouched. Scopes nest.
    """
    mark = cache_mark()
    try:
        yield
    finally:
        release_caches_since(mark)
