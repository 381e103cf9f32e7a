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
