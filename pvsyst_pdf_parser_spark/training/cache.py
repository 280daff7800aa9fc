"""Scoped persist tracking for training operators.

Dedup / similarity-search builders persist intermediate frames (shingle
posting tables, LSH bucket projections) because those frames fan out to
several plan references — without materialization Catalyst re-executes
the scan+explode once per reference (measured 8× on the ngram plan).
But the builders return LAZY DataFrames, so they cannot unpersist before
the caller's action — and a long-lived session calling them repeatedly
on different inputs would otherwise accumulate MEMORY_AND_DISK entries
forever.

The contract: builders persist through :func:`persist_tracked`; callers
(a bench harness, a long-lived service, a notebook loop) call
:func:`release_persisted` once they have consumed the returned frame.
One-shot spark-submit jobs can skip it — the cache dies with the
session.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """persist() + register the handle for a later bulk release."""
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every frame persisted via :func:`persist_tracked` since
    the last release; returns how many were released.  Safe to call at
    any time — frames still referenced by un-consumed lazy results are
    simply recomputed if used again."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 - session already stopped
            pass
    return n
