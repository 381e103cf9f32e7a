"""Custom stateful streaming operators via ``applyInPandasWithState`` — the
Flink operators Structured Streaming lacks as primitives.

Flink parity:
- streaming Top-N       → AbstractTopNFunction.java:48 / AppendOnlyTopNFunction
  (keyed heap state, emit per change; here: keyed heap, emit per micro-batch)
- keep-last dedup       → ProcTimeDeduplicateKeepLastRowFunction.java:29
- keyed process fn      → KeyedProcessOperator.java:35 + ValueState/Timers →
  GroupState (timeouts ≈ timers, TTL via GroupStateTimeout)

Design: state is a compact pandas-serializable structure per key (never the
full input); each micro-batch folds new rows into state and emits the current
result — Flink's "emit on change" collapses to "emit per micro-batch", which
is the documented latency model difference (SURVEY §2.4 MiniBatch note).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TOPN_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("rn", LongType()),
        StructField("seq", LongType()),  # per-key update sequence (batch #)
    ]
)
TOPN_STATE = StructType(
    [
        StructField("event_ids", StringType()),  # csv heap snapshot
        StructField("values", StringType()),
        StructField("seq", LongType()),
    ]
)


def _topn_fn(n: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (ids_csv, vals_csv, seq) = state.get
            ids = [int(x) for x in ids_csv.split(",")] if ids_csv else []
            vals = [float(x) for x in vals_csv.split(",")] if vals_csv else []
        else:
            ids, vals, seq = [], [], 0
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["event_id"])
            vals.extend(float(x) for x in pdf["value"])
        # keep only the top-n in state (bounded state, Flink TopNBuffer parity)
        order = sorted(
            range(len(ids)), key=lambda i: (-vals[i], ids[i])
        )[:n]
        ids = [ids[i] for i in order]
        vals = [vals[i] for i in order]
        seq = int(seq) + 1
        state.update(
            (
                ",".join(str(x) for x in ids),
                ",".join(repr(x) for x in vals),
                seq,
            )
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(ids),
                "event_id": ids,
                "value": vals,
                "rn": list(range(1, len(ids) + 1)),
                "seq": [seq] * len(ids),
            }
        )

    return fn


TOPN_CHANGELOG_OUTPUT = StructType(
    [
        StructField("_row_kind", StringType()),
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("seq", LongType()),
    ]
)


def _topn_changelog_fn(n: int):
    """Top-N emitting a CHANGELOG: +I for entries entering the top-n, -D for
    entries leaving it (Flink RetractableTopNFunction.java:53 semantics,
    collapsed to per-micro-batch diffs)."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (ids_csv, vals_csv, seq) = state.get
            ids = [int(x) for x in ids_csv.split(",")] if ids_csv else []
            vals = [float(x) for x in vals_csv.split(",")] if vals_csv else []
        else:
            ids, vals, seq = [], [], 0
        prev = dict(zip(ids, vals))
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["event_id"])
            vals.extend(float(x) for x in pdf["value"])
        order = sorted(range(len(ids)), key=lambda i: (-vals[i], ids[i]))[:n]
        ids = [ids[i] for i in order]
        vals = [vals[i] for i in order]
        cur = dict(zip(ids, vals))
        seq = int(seq) + 1
        state.update(
            (
                ",".join(str(x) for x in ids),
                ",".join(repr(x) for x in vals),
                seq,
            )
        )
        changes = [
            ("-D", key[0], eid, prev[eid], seq) for eid in prev if eid not in cur
        ] + [("+I", key[0], eid, cur[eid], seq) for eid in cur if eid not in prev]
        yield pd.DataFrame(
            changes, columns=["_row_kind", "user_id", "event_id", "value", "seq"]
        )

    return fn


def streaming_topn_changelog(events: DataFrame, n: int = 3) -> DataFrame:
    """Streaming Top-N as a retraction stream (+I/-D per micro-batch)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _topn_changelog_fn(n),
        outputStructType=TOPN_CHANGELOG_OUTPUT,
        stateStructType=TOPN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_topn(events: DataFrame, n: int = 3) -> DataFrame:
    """Per-key streaming Top-N by value (desc, event_id tie-break).

    State = the current top-n per key only (bounded); each micro-batch emits
    the refreshed ranking for keys that changed.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _topn_fn(n),
        outputStructType=TOPN_OUTPUT,
        stateStructType=TOPN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


KEEPLAST_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)
KEEPLAST_STATE = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _keep_last_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    best = state.get if state.exists else None
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            # ts_us column is attached by stream_events (timezone-independent)
            cand = (int(row.event_id), int(row.ts_us), row.event_type, float(row.value))
            # keep-LAST by event time; tie → larger event_id (matches the
            # batch row_number(ORDER BY ts DESC, event_id DESC) oracle)
            if best is None or (cand[1], cand[0]) > (best[1], best[0]):
                best = cand
    state.update(best)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_id": [best[0]],
            "ts_us": [best[1]],
            "event_type": [best[2]],
            "value": [best[3]],
        }
    )


OVERAGG_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("running_sum", DoubleType()),
        StructField("running_cnt", LongType()),
    ]
)
OVERAGG_STATE = StructType(
    [StructField("acc_sum", DoubleType()), StructField("acc_cnt", LongType())]
)


def _over_agg_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    acc_sum, acc_cnt = state.get if state.exists else (0.0, 0)
    rows = []
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            rows.append((int(r.ts_us), int(r.event_id), float(r.value)))
    rows.sort()  # event-time order within the batch (ts_us, event_id)
    out = []
    for _, eid, val in rows:
        acc_sum += val
        acc_cnt += 1
        out.append((key[0], eid, val, acc_sum, acc_cnt))
    state.update((acc_sum, acc_cnt))
    yield pd.DataFrame(
        out, columns=["user_id", "event_id", "value", "running_sum", "running_cnt"]
    )


def streaming_over_agg(events: DataFrame) -> DataFrame:
    """Streaming over-aggregate: per-key running SUM/COUNT ordered by event
    time, one output row per input row.

    Flink parity: RowTimeRowsBoundedPrecedingFunction.java:56 /
    AbstractRowTimeUnboundedPrecedingOver.java:286 — SS has no window
    functions on streams (SURVEY §2.6), so the accumulator lives in
    GroupState. Rows are event-time-sorted within each micro-batch; with a
    watermark-driven trigger, cross-batch order follows arrival batches
    (Flink buffers until the watermark — same guarantee per batch here).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _over_agg_fn,
        outputStructType=OVERAGG_OUTPUT,
        stateStructType=OVERAGG_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_keep_last(events: DataFrame) -> DataFrame:
    """Keep-last-row-per-key dedup by event time (Flink
    RowTime Deduplicate keep-last; SS only has keep-first natively)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _keep_last_fn,
        outputStructType=KEEPLAST_OUTPUT,
        stateStructType=KEEPLAST_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
