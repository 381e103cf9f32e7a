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


def _topn_fn(n: int, ttl_us: int | None = None):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl_us is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                columns=["user_id", "event_id", "value", "rn", "seq"]
            )
            return
        if state.exists:
            (ids_csv, vals_csv, seq) = state.get
            ids = [int(x) for x in ids_csv.split(",")] if ids_csv else []
            vals = [float(x) for x in vals_csv.split(",")] if vals_csv else []
        else:
            ids, vals, seq = [], [], 0
        last_ts: int | None = None
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["event_id"])
            vals.extend(float(x) for x in pdf["value"])
            if ttl_us is not None and "ts_us" in pdf.columns and len(pdf):
                m = int(pdf["ts_us"].max())
                last_ts = m if last_ts is None else max(last_ts, m)
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
        if ttl_us is not None and last_ts is not None:
            # refresh the TTL clock on every write (OnCreateAndWrite), keyed
            # to the newest EVENT time seen — processing order independent
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(wm_ms + 1, (last_ts + ttl_us) // 1000)
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


def local_topn_combiner(events: DataFrame, n: int) -> DataFrame:
    """Stateless per-partition pre-aggregation for streaming Top-N: within
    each input partition of each micro-batch, keep only the local top-n
    rows per key before the keyed state shuffle.

    Flink parity: the MiniBatch local/global split of the rank operator
    (two-phase agg idea applied to Top-N) — a HOT KEY with k rows per batch
    per partition ships only min(k, n) rows through the exchange, so the
    skewed key's state task receives ≤ n·|partitions| rows instead of the
    full firehose. Provably output-identical: a row outside its partition's
    local top-n is outside the global top-n a fortiori (top-n is a
    monotone selection under merge). Arrow-batched ``mapInPandas`` — no
    shuffle, no state."""
    cols = events.columns

    def fn(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if len(pdf) == 0:
                yield pdf
                continue
            ranked = pdf.sort_values(
                ["user_id", "value", "event_id"],
                ascending=[True, False, True],
            )
            yield ranked.groupby("user_id", sort=False).head(n)[cols]

    return events.mapInPandas(fn, events.schema)


def streaming_topn(
    events: DataFrame,
    n: int = 3,
    state_ttl_seconds: int | None = None,
    pre_aggregate: bool = False,
) -> DataFrame:
    """Per-key streaming Top-N by value (desc, event_id tie-break).

    State = the current top-n per key only (bounded); each micro-batch emits
    the refreshed ranking for keys that changed. ``state_ttl_seconds``
    applies the same watermark-driven idle-key eviction as
    ``streaming_dedup_keep_last`` (table.exec.state.ttl parity) — at 100 TB
    key cardinalities the rank state of keys that stopped producing must
    age out. ``pre_aggregate=True`` inserts the stateless
    :func:`local_topn_combiner` before the keyed shuffle — the skew guard
    for hot keys (output-identical; see its docstring)."""
    ttl_us = state_ttl_seconds * 1_000_000 if state_ttl_seconds else None
    if pre_aggregate:
        events = local_topn_combiner(events, n)
    return events.groupBy("user_id").applyInPandasWithState(
        _topn_fn(n, ttl_us),
        outputStructType=TOPN_OUTPUT,
        stateStructType=TOPN_STATE,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if state_ttl_seconds
            else GroupStateTimeout.NoTimeout
        ),
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


def _make_keep_last_fn(ttl_us: int | None):
    """Keep-last state fn, optionally with event-time state TTL
    (StateTtlConfig / table.exec.state.ttl parity): a key whose state has
    not been refreshed within ``ttl_us`` of the watermark is evicted — a
    later row for that key starts FRESH, exactly Flink's
    OnCreateAndWrite/NeverReturnExpired TTL behavior for the Deduplicate
    operator. Eviction runs through Spark's event-time timeout, so idle
    keys are cleaned even when no new data arrives for them."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl_us is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                columns=["user_id", "event_id", "ts_us", "event_type", "value"]
            )
            return
        best = state.get if state.exists else None
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                # ts_us column is attached by stream_events (tz-independent)
                cand = (
                    int(row.event_id),
                    int(row.ts_us),
                    row.event_type,
                    float(row.value),
                )
                # keep-LAST by event time; tie → larger event_id (matches the
                # batch row_number(ORDER BY ts DESC, event_id DESC) oracle)
                if best is None or (cand[1], cand[0]) > (best[1], best[0]):
                    best = cand
        state.update(best)
        if ttl_us is not None:
            # same watermark clamp as _topn_fn: EventTimeTimeout requires a
            # timestamp strictly beyond the current watermark, and best may
            # sit arbitrarily close to it for tiny TTLs
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(wm_ms + 1, (best[1] + ttl_us) // 1000))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_id": [best[0]],
                "ts_us": [best[1]],
                "event_type": [best[2]],
                "value": [best[3]],
            }
        )

    return fn


_keep_last_fn = _make_keep_last_fn(None)


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


def _make_over_agg_fn(ttl_us: int | None = None):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl_us is not None and state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                columns=[
                    "user_id", "event_id", "value", "running_sum", "running_cnt"
                ]
            )
            return
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
        if ttl_us is not None and rows:
            # OnCreateAndWrite refresh keyed to the newest event time seen,
            # clamped strictly beyond the watermark (EventTimeTimeout rule)
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(wm_ms + 1, (rows[-1][0] + ttl_us) // 1000)
            )
        yield pd.DataFrame(
            out,
            columns=["user_id", "event_id", "value", "running_sum", "running_cnt"],
        )

    return fn


_over_agg_fn = _make_over_agg_fn(None)


def streaming_over_agg(
    events: DataFrame, state_ttl_seconds: int | None = None
) -> DataFrame:
    """Streaming over-aggregate: per-key running SUM/COUNT ordered by event
    time, one output row per input row.

    Flink parity: RowTimeRowsBoundedPrecedingFunction.java:56 /
    AbstractRowTimeUnboundedPrecedingOver.java:286 — SS has no window
    functions on streams (SURVEY §2.6), so the accumulator lives in
    GroupState. Rows are event-time-sorted within each micro-batch; with a
    watermark-driven trigger, cross-batch order follows arrival batches
    (Flink buffers until the watermark — same guarantee per batch here).

    ``state_ttl_seconds``: ``table.exec.state.ttl`` parity — Flink's
    unbounded-preceding over-agg registers exactly this per-key state
    cleanup timer (AbstractRowTimeUnboundedPrecedingOver.java registers a
    cleanup timer per key). An evicted key's accumulator restarts from zero
    when it reappears — Flink's expired-state semantics; emissions for keys
    active within the TTL are unchanged. Requires a watermark when set."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_over_agg_fn(
            state_ttl_seconds * 1_000_000 if state_ttl_seconds else None
        ),
        outputStructType=OVERAGG_OUTPUT,
        stateStructType=OVERAGG_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if state_ttl_seconds
            else GroupStateTimeout.NoTimeout
        ),
    )


def streaming_dedup_keep_last(
    events: DataFrame, state_ttl_seconds: int | None = None
) -> DataFrame:
    """Keep-last-row-per-key dedup by event time (Flink
    RowTime Deduplicate keep-last; SS only has keep-first natively).

    ``state_ttl_seconds`` bounds per-key state lifetime (Flink's
    ``table.exec.state.ttl`` — the knob that keeps unbounded-stream dedup
    state finite at 100 TB key cardinalities): a key whose state is idle
    past the TTL is evicted via event-time timeout once the watermark
    passes. Emitted rows are provably unchanged — any row that survives
    Spark's late-row filter is newer than the watermark and therefore newer
    than the expired state it would have compared against — so the TTL is
    purely a state-size bound, like Flink's NeverReturnExpired visibility.
    Requires a watermark on ``events`` when set."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_keep_last_fn(
            state_ttl_seconds * 1_000_000 if state_ttl_seconds else None
        ),
        outputStructType=KEEPLAST_OUTPUT,
        stateStructType=KEEPLAST_STATE,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if state_ttl_seconds
            else GroupStateTimeout.NoTimeout
        ),
    )


SORT_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("emit_idx", LongType()),
    ]
)
SORT_STATE = StructType(
    [
        StructField("event_ids", StringType()),  # csv buffer of pending rows
        StructField("ts_uss", StringType()),
        StructField("emitted", LongType()),
    ]
)


def _event_time_sort_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        ids_csv, ts_csv, emitted = state.get
        ids = [int(x) for x in ids_csv.split(",")] if ids_csv else []
        tss = [int(x) for x in ts_csv.split(",")] if ts_csv else []
    else:
        ids, tss, emitted = [], [], 0
    for pdf in pdfs:
        real = pdf[pdf["event_id"] >= 0]  # drop flush sentinels
        ids.extend(int(x) for x in real["event_id"])
        tss.extend(int(x) for x in real["ts_us"])
    wm_us = state.getCurrentWatermarkMs() * 1000
    pend = sorted(zip(tss, ids))
    ready = [(t, i) for (t, i) in pend if t <= wm_us]
    hold = [(t, i) for (t, i) in pend if t > wm_us]
    out = [
        (key[0], i, t, emitted + k + 1) for k, (t, i) in enumerate(ready)
    ]
    emitted += len(ready)
    state.update(
        (
            ",".join(str(i) for (_, i) in hold),
            ",".join(str(t) for (t, _) in hold),
            emitted,
        )
    )
    yield pd.DataFrame(out, columns=["user_id", "event_id", "ts_us", "emit_idx"])


def streaming_event_time_sort(events: DataFrame) -> DataFrame:
    """Per-key event-time-ordered emit: buffer rows in state, release them
    in (ts, event_id) order only once the watermark has passed their event
    time — Flink's RowTimeSortOperator.java:43 (StreamExecTemporalSort).

    ``emit_idx`` is the per-key emission sequence; hash-matching it against a
    batch ``row_number() OVER (ORDER BY ts, event_id)`` oracle proves the
    cross-batch ordering, not just the row set. State holds only rows inside
    the watermark delay (bounded by lateness × per-key rate at scale); the
    source must append flush sentinels so the final watermark releases the
    tail (Flink's end-of-input MAX_WATERMARK).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _event_time_sort_fn,
        outputStructType=SORT_OUTPUT,
        stateStructType=SORT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


JOIN_CHANGELOG_OUTPUT = StructType(
    [
        StructField("_row_kind", StringType()),
        StructField("user_id", LongType()),
        StructField("l_event_id", LongType()),
        StructField("r_event_id", LongType()),  # null = outer padding
        StructField("seq", LongType()),
    ]
)
JOIN_CHANGELOG_STATE = StructType(
    [
        StructField("left_ids", StringType()),  # csv, all left rows seen
        StructField("padded", StringType()),  # csv subset currently null-padded
        StructField("right_ids", StringType()),  # csv, all right rows seen
        StructField("seq", LongType()),
    ]
)


def _make_outer_join_changelog_fn(ttl_us: int | None = None):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        return _outer_join_changelog_fn(key, pdfs, state, ttl_us)

    return fn


def _outer_join_changelog_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    ttl_us: int | None = None,
) -> Iterator[pd.DataFrame]:
    def _csv(s: str) -> list[int]:
        return [int(x) for x in s.split(",")] if s else []

    if ttl_us is not None and state.hasTimedOut:
        state.remove()
        df = pd.DataFrame(
            columns=["_row_kind", "user_id", "l_event_id", "r_event_id", "seq"]
        )
        df["r_event_id"] = df["r_event_id"].astype("Int64")
        yield df
        return
    if state.exists:
        l_csv, pad_csv, r_csv, seq = state.get
        lefts, padded, rights = _csv(l_csv), set(_csv(pad_csv)), _csv(r_csv)
    else:
        lefts, padded, rights, seq = [], set(), [], 0
    new_l: list[int] = []
    new_r: list[int] = []
    last_ts: int | None = None
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            (new_l if row.side == "L" else new_r).append(int(row.event_id))
        if ttl_us is not None and "ts_us" in pdf.columns and len(pdf):
            m = int(pdf["ts_us"].max())
            last_ts = m if last_ts is None else max(last_ts, m)
    seq = int(seq) + 1
    uid = key[0]
    changes: list[tuple] = []
    # right arrivals first: retract null-padded outer rows, then emit the
    # new matches against ALL known left rows (old + new handled below)
    if new_r:
        for l in sorted(padded):
            changes.append(("-D", uid, l, None, seq))
        padded.clear()
        for l in lefts:
            for r in new_r:
                changes.append(("+I", uid, l, r, seq))
    all_r = rights + new_r
    for l in new_l:
        if all_r:
            for r in all_r:
                changes.append(("+I", uid, l, r, seq))
        else:
            changes.append(("+I", uid, l, None, seq))
            padded.add(l)
    lefts += new_l
    rights = all_r
    state.update(
        (
            ",".join(str(x) for x in lefts),
            ",".join(str(x) for x in sorted(padded)),
            ",".join(str(x) for x in rights),
            seq,
        )
    )
    if ttl_us is not None and last_ts is not None:
        # idle-state retention: refresh on write, keyed to the newest event
        # time, clamped past the watermark (same rule as _topn_fn)
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(wm_ms + 1, (last_ts + ttl_us) // 1000))
    df = pd.DataFrame(
        changes, columns=["_row_kind", "user_id", "l_event_id", "r_event_id", "seq"]
    )
    df["r_event_id"] = df["r_event_id"].astype("Int64")
    yield df


def streaming_outer_join_changelog(
    tagged: DataFrame, state_ttl_seconds: int | None = None
) -> DataFrame:
    """Unbounded streaming LEFT OUTER equi-join emitting a retraction stream.

    Flink parity: StreamingJoinOperator.java:36 with the retraction protocol
    documented at :133-178 + OuterJoinRecordStateViews.java:335 — a left row
    with no match emits ``+I (l, NULL)``; when the first right match later
    arrives, the operator retracts the padding (``-D (l, NULL)``) and emits
    the real pairs. Input is the two sides unioned with a ``side`` tag
    ('L'/'R') and keyed by the join key, which is exactly Flink's two-input
    keyed operator wiring (both inputs hash-partitioned on the key).

    Scale: state per key = both sides' rows seen so far — the same unbounded
    state Flink keeps. ``state_ttl_seconds`` is the ``table.exec.state.ttl``
    idle-state retention Flink applies to exactly this operator
    (StreamingJoinOperator's minRetentionTime state cleanup): a key idle
    past the TTL is evicted once the watermark passes; rows arriving after
    eviction join only against post-eviction state (Flink's expired-state
    semantics — retractions for pre-eviction pairs are no longer possible).
    Requires a watermark and a ``ts_us`` column on ``tagged`` when set.
    """
    return tagged.groupBy("user_id").applyInPandasWithState(
        _make_outer_join_changelog_fn(
            state_ttl_seconds * 1_000_000 if state_ttl_seconds else None
        ),
        outputStructType=JOIN_CHANGELOG_OUTPUT,
        stateStructType=JOIN_CHANGELOG_STATE,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if state_ttl_seconds
            else GroupStateTimeout.NoTimeout
        ),
    )


ITERATE_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("n_iter", LongType()),
        StructField("final_cents", LongType()),
    ]
)

ITERATE_STATE = StructType(
    [
        StructField("ids_csv", StringType()),
        StructField("vals_csv", StringType()),
        StructField("iters_csv", StringType()),
    ]
)


def _iterate_fn(step_cents: int):
    """Streaming ITERATION head+feedback (DataStream.iterate,
    DataStream.java:624; the countdown body mirrors flink-examples
    IterateExample.java): keyed state is the FEEDBACK CHANNEL. Each
    micro-batch, every in-flight element receives exactly ONE body
    application (value_cents -= step); elements whose exit condition
    fires (value ≤ 0) leave through the output edge with their iteration
    count, the rest loop back into state for the next batch — Flink's
    asynchronous feedback edge, expressed on micro-batch time. A sentinel
    row (event_id = -1, delivered by stream_events_multibatch's
    flush_sentinels = the bounded-input MAX_WATERMARK) drains remaining
    elements to their fixpoint — Flink's end-of-job flush, where feedback
    residence time no longer matters.

    Exact integer arithmetic throughout, so the oracle computes the same
    n_iter = ceil(v/step) and final = v - n_iter·step bit-for-bit."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids_csv, vals_csv, iters_csv = state.get
            ids = [int(x) for x in ids_csv.split(",")] if ids_csv else []
            vals = [int(x) for x in vals_csv.split(",")] if vals_csv else []
            iters = [int(x) for x in iters_csv.split(",")] if iters_csv else []
        else:
            ids, vals, iters = [], [], []
        drain = False
        for pdf in pdfs:
            for eid, val in zip(pdf["event_id"], pdf["value"]):
                if int(eid) == -1:
                    drain = True  # MAX_WATERMARK sentinel
                    continue
                fv = float(val)
                if fv != fv:  # null → NaN in the Arrow batch
                    continue
                v = int(round(fv * 100))
                if v > 0:
                    ids.append(int(eid))
                    vals.append(v)
                    iters.append(0)
        done: list[tuple] = []
        keep_i: list[int] = []
        for i in range(len(ids)):
            # ONE body application per batch traversal of the loop
            vals[i] -= step_cents
            iters[i] += 1
            if vals[i] <= 0:
                done.append((key[0], ids[i], iters[i], vals[i]))
            elif drain:
                # end-of-input: iterate the leftover to its fixpoint
                n_more = (vals[i] + step_cents - 1) // step_cents
                done.append(
                    (key[0], ids[i], iters[i] + n_more,
                     vals[i] - n_more * step_cents)
                )
            else:
                keep_i.append(i)
        state.update(
            (
                ",".join(str(ids[i]) for i in keep_i),
                ",".join(str(vals[i]) for i in keep_i),
                ",".join(str(iters[i]) for i in keep_i),
            )
        )
        yield pd.DataFrame(
            done, columns=["user_id", "event_id", "n_iter", "final_cents"]
        )

    return fn


def streaming_iterate_countdown(events: DataFrame, step_cents: int = 2500) -> DataFrame:
    """DataStream.iterate emulation: per-key feedback loop over micro-batches
    (see :func:`_iterate_fn`). Keyed state is bounded by the number of
    in-flight elements per key (each element lives ceil(v/step) batches)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _iterate_fn(step_cents),
        outputStructType=ITERATE_OUTPUT,
        stateStructType=ITERATE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
