"""Registry for frames the library persists internally.

Operators like :func:`~tidierdb_jl_spark.llm.dedup.minhash_dedup_pairs`
persist narrow intermediate frames that are read by >= 2 subtrees of the
plan they return (signature frames, posting lists).  Because the returned
plan is lazy, the operator cannot unpersist before the caller's action —
so each persist is registered here, and a long-lived session (the
per-batch streaming-ingest loop) calls :func:`release_caches` between
batches to return the storage tier to baseline instead of waiting for
LRU eviction.

One-shot callers don't need to do anything: blocks are evicted LRU and
the session teardown drops them.
"""

from __future__ import annotations

_TRACKED: list = []


def track(df, storage_level=None):
    """``df.persist()`` + register for later :func:`release_caches`."""
    df = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED.append(df)
    return df


def release_caches(blocking: bool = False) -> int:
    """Unpersist every frame the library has persisted since the last
    release.  Call between ingest batches (or after materializing a
    dedup/similarity result you're done with).  Returns the number of
    frames released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
