"""Window evictors + delta trigger — the DataStream window features with no
Structured Streaming equivalent (SURVEY §2.5 'Evictors / delta triggers' row).

Flink parity:
  - CountEvictor.java (keep last N buffer elements before emit)
  - TimeEvictor.java (keep elements within ``keep_seconds`` of the buffer max)
  - DeltaEvictor.java (evict elements whose delta vs the LAST buffered element
    is >= threshold)
  - DeltaTrigger.java:onElement (fire when delta(last_fired, current) >
    threshold; the fired element becomes the new anchor)

Batch-deterministic formulation: Flink evicts by arrival order; a replayable
order column models arrival. Evictors are pure window-function plans (one
shuffle on the partition key, no state); DeltaTrigger is an anchor-reset scan
— genuinely sequential per key, so it runs as an Arrow-batched
``applyInPandas`` over the key partition (state = one float per key, bounded;
the shuffle is the same one the keyed window would need anyway).

Scale: all four partition by the window/key columns — identical shuffle
profile to the windowed aggregation they feed. DeltaTrigger's python stage
processes each key group as one pandas frame; at 100 TB the key cardinality
(users) dominates rows-per-key, so groups stay small and Arrow batches many
groups per task.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def count_evictor(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    keep: int,
) -> DataFrame:
    """Keep only the last ``keep`` elements per window buffer
    (CountEvictor.of(keep), evictBefore)."""
    w = Window.partitionBy(*partition_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep)
        .drop("__rn")
    )


def time_evictor(
    df: DataFrame,
    partition_cols: Sequence[str],
    ts_col: str,
    keep_seconds: int,
) -> DataFrame:
    """Keep elements within ``keep_seconds`` of the newest element in the
    buffer (TimeEvictor.of(Time.seconds(keep_seconds)))."""
    w = Window.partitionBy(*partition_cols)
    max_ts = F.max(F.col(ts_col)).over(w)
    keep_from = F.timestamp_add("SECOND", F.lit(-keep_seconds), max_ts)
    return (
        df.withColumn("__keep_from", keep_from)
        .filter(F.col(ts_col) >= F.col("__keep_from"))
        .drop("__keep_from")
    )


def delta_evictor(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    threshold: float,
) -> DataFrame:
    """Evict elements whose |value - last_element.value| >= threshold
    (DeltaEvictor.of(threshold, deltaFunction) with an absolute-difference
    delta function)."""
    w = Window.partitionBy(*partition_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    last_val = F.first(F.col(value_col)).over(w)
    return (
        df.withColumn("__last", last_val)
        .filter(F.abs(F.col(value_col) - F.col("__last")) < threshold)
        .drop("__last")
    )


def delta_trigger_fires(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    threshold: float,
) -> DataFrame:
    """Rows at which DeltaTrigger.onElement returns FIRE.

    Anchor-reset scan per key: the first element sets the anchor (CONTINUE);
    each later element fires iff |value - anchor| > threshold, and a firing
    element becomes the new anchor (DeltaTrigger.java lastElementState).
    Returns the firing rows with original columns.
    """
    import pandas as pd

    key_cols = list(key_cols)
    order_cols = list(order_cols)
    schema = df.schema

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        vals = pdf[value_col].to_numpy()
        fired = []
        anchor = None
        for i, v in enumerate(vals):
            if anchor is None:
                anchor = v
                continue
            if abs(v - anchor) > threshold:
                fired.append(i)
                anchor = v
        return pdf.iloc[fired]

    # pinned-parallelism grouping: byte-based AQE coalescing would starve
    # the per-row-cost pandas stage (session.keyed_python_groups)
    from flink_1_12_2_spark.session import keyed_python_groups

    return keyed_python_groups(df, *key_cols).applyInPandas(fn, schema=schema)
