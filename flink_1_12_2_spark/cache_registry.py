"""Session-scoped registry of query-level persisted intermediates.

The near-dup/text pipelines persist small intermediates (posting lists,
candidate-pair frames, final pre-sort outputs — guide §5) that are
consumed by the CALLER's terminal action, so the builder cannot
unpersist them itself. Without cleanup a long-lived session executing
many queries accumulates cache entries until LRU eviction (r13 verdict
item 4 / ADVICE). ``tracked_persist`` tags each such frame here;
``release_query_caches`` unpersists everything tracked — call it after
the consuming action (bench.py's ``spark.catalog.clearCache()`` between
attempts is the blunt equivalent and stays authoritative there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an (already-persisted) frame for later bulk release and
    return it unchanged — chainable as ``.persist().transform(track)``."""
    _TRACKED.append(df)
    return df


def tracked_persist(
    df: DataFrame, level: StorageLevel | None = None
) -> DataFrame:
    """``df.persist()`` + registration for later bulk release."""
    df = df.persist(level) if level is not None else df.persist()
    return track(df)


def release_query_caches() -> int:
    """Unpersist every tracked frame (blocking=False); returns the count.

    Safe to call at any point — frames already unpersisted (e.g. via
    ``clearCache``) unpersist as a no-op.
    """
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session torn down — nothing to release
    _TRACKED.clear()
    return n
