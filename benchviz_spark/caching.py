"""Session-scoped DataFrame memo registry.

Several operator families keep one expensive relation per
(applicationId, sf_dir) — the near-dup pair relation, the duplicate
clusters, the curated corpus, the BPE word-frequency table, the daily
HLL sketch state — so that a session's second consumer pays only its
marginal work (VERDICT r7 #2 / r8 #2). Those memos were previously
bare module-level dicts with two failure modes (ADVICE r9):

1. No invalidation: regenerating the parquet snapshot under a cached
   ``sf_dir`` (the scale-probe tiers are rebuilt in place) silently
   served stale persisted rows.
2. No eviction: entries for stopped SparkContexts accumulated in a
   long-lived Python process, pinning dead JVM references.

Every memo dict now registers here. ``memo_put`` prunes entries from
other applications on insert (a cache only ever holds relations of the
LIVE application), and ``clear_caches()`` is the explicit hook the
snapshot-regeneration path and the bench harness call to force the
next consumer to rebuild from disk.
"""

from __future__ import annotations

from typing import Any

_REGISTRY: list[dict[tuple[str, str], Any]] = []


def register_cache(cache: dict) -> dict:
    """Enroll a module-level memo dict; returns it for inline use."""
    _REGISTRY.append(cache)
    return cache


def memo_put(cache: dict, key: tuple[str, str], value: Any) -> Any:
    """Insert ``value`` under ``key`` = (applicationId, sf_dir), first
    dropping (and unpersisting) every entry belonging to a DIFFERENT
    application: stale entries reference stopped SparkContexts and can
    never be read again, so the cache is single-application by
    construction."""
    app_id = key[0]
    for k in [k for k in cache if k[0] != app_id]:
        _drop(cache, k)
    cache[key] = value
    return value


def scratch_persist(cache: dict, key: tuple[str, str], df: Any, level=None) -> Any:
    """Persist ``df`` and enroll it for ``clear_caches`` cleanup —
    WITHOUT memo semantics (callers never look the entry up; the key
    only names the block for the unpersist sweep). Query-internal
    materialization points use this so that a multiply-consumed
    batch-sized relation executes once per query run, while the bench
    harness's per-row ``clear_caches()`` still returns the session to a
    fully cold state (no result ever survives into the next timed row).
    Re-registering under a live key unpersists the previous holder
    first, so repeated calls in one session cannot leak pinned blocks."""
    from pyspark import StorageLevel

    if key in cache:
        _drop(cache, key)
    return memo_put(
        cache, key, df.persist(level or StorageLevel.MEMORY_AND_DISK)
    )


def clear_caches() -> int:
    """Unpersist and drop every memoized relation in every registered
    cache. Called by snapshot-regeneration (the backing parquet is
    about to change) and by the bench harness before cold-start rows;
    returns the number of entries dropped (handy for tests)."""
    n = 0
    for cache in _REGISTRY:
        for k in list(cache):
            _drop(cache, k)
            n += 1
    return n


def _drop(cache: dict, key: tuple[str, str]) -> None:
    df = cache.pop(key)
    try:
        df.unpersist()
    except Exception:
        # A stopped SparkContext (or a lazily-checkpointed relation
        # that never materialized) can refuse the unpersist; dropping
        # the Python reference is the part that must not fail.
        pass
