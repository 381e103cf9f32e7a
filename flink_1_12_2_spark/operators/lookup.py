"""Lookup join — Flink's per-record sync/async lookup into an external table.

Flink parity: StreamExecLookupJoin.scala:38 → LookupJoinRunner.java:34 /
AsyncLookupJoinRunner.java (async batching via AsyncWaitOperator.java:78).

Spark-first design, two tiers:
1. ``lookup_join_dataframe`` — when the dimension is readable as a DataFrame
   (jdbc/parquet/...), the lookup is just a broadcast stream-static join:
   Catalyst-native, no Python. This is the right plan in ~all cases.
2. ``lookup_join_mapinpandas`` — when the dimension is ONLY reachable through
   a client API, run per-partition batched lookups inside ``mapInPandas``:
   one client per partition (connection pooling), one batched request per
   Arrow batch (Flink's async-batching equivalent; Python coroutines could
   overlap batches, same contract).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def lookup_join_dataframe(
    facts: DataFrame, dim: DataFrame, fact_key: str, dim_key: str, how: str = "left"
) -> DataFrame:
    """Tier 1: dimension readable as a DataFrame → broadcast join."""
    return facts.join(F.broadcast(dim), facts[fact_key] == dim[dim_key], how)


def lookup_join_mapinpandas(
    facts: DataFrame,
    fact_key: str,
    client_factory: Callable[[], Callable[[list], dict]],
    output_schema: str,
    out_cols: list[str],
) -> DataFrame:
    """Tier 2: external-API lookup, batched per Arrow batch.

    ``client_factory()`` is invoked once per partition (connection pool
    parity) and returns ``lookup(keys: list) -> {key: row_dict}``.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lookup = client_factory()  # one client per partition
        for pdf in batches:
            keys = pdf[fact_key].tolist()
            resolved = lookup(keys)  # one batched request per Arrow batch
            for c in out_cols:
                pdf[c] = [
                    (resolved.get(k) or {}).get(c) for k in keys
                ]
            yield pdf

    return facts.mapInPandas(fn, output_schema)


# ---------------------------------------------------------------------------
# jdbc lookup (JdbcRowDataLookupFunction.java:59 + JdbcLookupOptions —
# lookup.cache.max-rows / lookup.cache.ttl / lookup.max-retries, validated
# like JdbcDynamicTableFactory.validateConfigOptions: the two cache options
# come together or not at all, retries must be non-negative).
#
# Spark-first translation of the per-record TableFunction: the dimension is
# re-read as a SNAPSHOT DataFrame and joined (tier 1) — Catalyst broadcasts
# it when it fits, and AQE falls back to a shuffled join when it doesn't,
# which is exactly the role lookup.cache.max-rows plays below.
#
#   no cache       → the snapshot is re-resolved on EVERY lookup call:
#                    each join sees the store's current rows, the same
#                    freshness contract as Flink's uncached per-record
#                    SELECT.
#   cache (ttl,N)  → the snapshot is reused until lookup.cache.ttl
#                    elapses — Flink's Guava expireAfterWrite collapsed
#                    from per-key grain to table grain (documented
#                    deviation: a cached key and an uncached key go stale
#                    together here; max staleness is IDENTICAL). The
#                    max-rows bound caps what this engine may BROADCAST:
#                    a snapshot wider than lookup.cache.max-rows joins
#                    shuffled instead (Flink evicts LRU keys; a snapshot
#                    engine's analogous memory guard is "don't pin an
#                    over-budget table on every executor").
#   max-retries    → re-issue the snapshot read, like re-establishing the
#                    statement in the reference's retry loop.

_JDBC_LOOKUP_CACHE: dict[tuple, tuple] = {}


def parse_jdbc_lookup_options(options: dict | None) -> tuple:
    """(cache_max_rows, cache_ttl_sec, max_retries) with factory-parity
    validation; cache fields are None when caching is off."""
    o = options or {}
    has_rows = "lookup.cache.max-rows" in o
    has_ttl = "lookup.cache.ttl" in o
    if has_rows != has_ttl:
        raise ValueError(
            "either all or none of 'lookup.cache.max-rows' and "
            "'lookup.cache.ttl' must be specified"
        )
    retries = int(o.get("lookup.max-retries", "3"))
    if retries < 0:
        raise ValueError(
            f"'lookup.max-retries' must be >= 0, got {retries}"
        )
    if not has_rows:
        return None, None, retries
    rows = int(o["lookup.cache.max-rows"])
    ttl = _parse_duration_sec(o["lookup.cache.ttl"])
    return rows, ttl, retries


def _parse_duration_sec(v: str) -> float:
    """Flink duration literal ('10s', '500ms', '2min', '1h', bare ms)."""
    import re

    m = re.match(r"(?i)^\s*(\d+(?:\.\d+)?)\s*(ms|sec|min|s|m|h)?\s*$", v)
    if not m:
        raise ValueError(f"cannot parse duration {v!r}")
    unit = (m.group(2) or "ms").lower()
    mult = {
        "ms": 0.001, "s": 1.0, "sec": 1.0,
        "min": 60.0, "m": 60.0, "h": 3600.0,
    }[unit]
    return float(m.group(1)) * mult


def jdbc_lookup_snapshot(
    spark,
    url: str,
    table: str,
    driver: str | None = None,
    options: dict | None = None,
    _now: Callable[[], float] | None = None,
) -> tuple[DataFrame, bool]:
    """The dimension snapshot the lookup joins against, honoring the
    lookup.cache.* contract. Returns (frame, may_broadcast)."""
    import time as _time

    from flink_1_12_2_spark.sources.jdbc import DERBY_DRIVER, jdbc_read

    driver = driver or DERBY_DRIVER
    rows, ttl, retries = parse_jdbc_lookup_options(options)
    now = _now or _time.monotonic

    def _read() -> DataFrame:
        err = None
        for _ in range(max(1, retries + 1)):
            try:
                return jdbc_read(spark, url, table, driver=driver)
            except Exception as e:  # noqa: BLE001 — rethrown after retries
                err = e
        raise err

    if rows is None:
        # Uncached path (lookup.cache.* absent → JdbcLookupOptions says
        # per-call freshness, no size bound known): never FORCE a
        # broadcast — a hint overrides spark.sql.autoBroadcastJoinThreshold
        # and an unbounded dimension would OOM the driver. Let
        # Catalyst/AQE pick the strategy from the dimension's statistics.
        return _read(), False
    key = (url, table)
    hit = _JDBC_LOOKUP_CACHE.get(key)
    if hit is not None and now() - hit[1] < ttl:
        df, _ts, n = hit
    else:
        # pin the snapshot so every micro-batch / reuse within the TTL
        # joins the SAME version (localCheckpoint: no re-query races);
        # count once at build — cache hits must not pay a Spark job
        # just to re-derive the broadcast decision
        df = _read().localCheckpoint(eager=True)
        n = df.count()
        _JDBC_LOOKUP_CACHE[key] = (df, now(), n)
        # bounded cache: a long-lived session looking up many distinct
        # tables must not pin checkpoint blocks forever — evict oldest
        # (Guava maximumSize-style), 32 dimensions is far beyond any
        # real lookup fan-in
        while len(_JDBC_LOOKUP_CACHE) > 32:
            oldest = min(_JDBC_LOOKUP_CACHE, key=lambda k: _JDBC_LOOKUP_CACHE[k][1])
            _JDBC_LOOKUP_CACHE.pop(oldest)
    return df, n <= rows


def lookup_join_jdbc(
    facts: DataFrame,
    url: str,
    table: str,
    fact_key: str,
    dim_key: str,
    driver: str | None = None,
    options: dict | None = None,
    how: str = "left",
) -> DataFrame:
    """Processing-time lookup join against a jdbc dimension — the plan
    behind ``JOIN dim FOR SYSTEM_TIME AS OF f.proctime`` when the
    versioned side is a jdbc connector table."""
    dim, may_broadcast = jdbc_lookup_snapshot(
        facts.sparkSession, url, table, driver=driver, options=options
    )
    right = F.broadcast(dim) if may_broadcast else dim
    return facts.join(right, facts[fact_key] == dim[dim_key], how)
