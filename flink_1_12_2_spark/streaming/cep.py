"""CEP / MATCH_RECOGNIZE subset — keyed NFA over event-time-ordered streams.

Flink parity: flink-libraries/flink-cep Pattern API
(Pattern.java — ``begin/followedBy/within``, entry CEP.java:38) and the SQL
MATCH_RECOGNIZE operator (StreamExecMatch.scala:68). Spark has no CEP
primitive (SURVEY §2.10) → implemented as a keyed NFA inside
``applyInPandasWithState``.

Scope (round 1): linear patterns of named steps with per-step predicates,
``followedBy`` (relaxed contiguity: unrelated events may sit between steps),
``within`` (max span from first to last step), and AFTER MATCH SKIP PAST LAST
ROW (greedy, non-overlapping — Flink's default for MATCH_RECOGNIZE).

Ordering: rows are sorted by (ts, event_id) inside each micro-batch; the NFA
state (partial matches) carries across batches. Late rows older than an
already-consumed position are ignored — the documented difference vs Flink's
watermark-buffered CEP (which reorders up to the watermark).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

Predicate = Callable[[dict], bool]


@dataclass
class Pattern:
    """Linear CEP pattern: ordered steps, each a named predicate."""

    steps: list[tuple[str, Predicate]] = field(default_factory=list)
    within_us: int | None = None

    @staticmethod
    def begin(name: str, pred: Predicate) -> "Pattern":
        return Pattern(steps=[(name, pred)])

    def followed_by(self, name: str, pred: Predicate) -> "Pattern":
        self.steps.append((name, pred))
        return self

    def within(self, duration_us: int) -> "Pattern":
        self.within_us = duration_us
        return self


CEP_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_event_id", LongType()),
        StructField("last_event_id", LongType()),
        StructField("first_ts_us", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)
CEP_STATE = StructType([StructField("partial_json", StringType())])


def _match_events(
    rows: list[dict], pattern: Pattern, partial: list[dict]
) -> tuple[list[tuple], list[dict]]:
    """Run the NFA over ordered rows. Returns (matches, new_partial_state).

    Greedy skip-past-last-row: one in-flight partial match at a time; on
    completion, scanning resumes after the match's last row.
    """
    matches: list[tuple] = []
    steps = pattern.steps
    cur: list[dict] = list(partial)  # matched prefix rows
    for row in rows:
        step_idx = len(cur)
        if step_idx > 0 and pattern.within_us is not None:
            if row["ts_us"] - cur[0]["ts_us"] > pattern.within_us:
                # span exceeded → drop the stale prefix, retry row as step 0
                cur = []
                step_idx = 0
        name, pred = steps[step_idx]
        if pred(row):
            cur.append(row)
            if len(cur) == len(steps):
                matches.append(
                    (
                        cur[0]["event_id"],
                        cur[-1]["event_id"],
                        cur[0]["ts_us"],
                        cur[-1]["ts_us"],
                    )
                )
                cur = []  # skip past last row
        elif step_idx == 0:
            continue
        # relaxed contiguity: non-matching rows between steps are skipped
    return matches, cur


def cep_match_batch(
    events: DataFrame,
    pattern: Pattern,
    key_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """Batch CEP (MATCH_RECOGNIZE over a bounded table): same NFA, executed
    per key via ``applyInPandas`` on event-time-sorted rows. Output schema
    matches the streaming operator."""
    import pandas as pd  # noqa: F811 (worker-side import)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in pdf.itertuples(index=False):
            d = r._asdict()
            if "ts_us" not in d or d["ts_us"] is None:
                d["ts_us"] = int(pd.Timestamp(d[time_col]).value // 1000)
            d["ts_us"] = int(d["ts_us"])
            rows.append(d)
        rows.sort(key=lambda d: (d["ts_us"], d["event_id"]))
        matches, _ = _match_events(rows, pattern, [])
        key_val = rows[0][key_col] if rows else None
        return pd.DataFrame(
            {
                "user_id": [key_val] * len(matches),
                "first_event_id": [m[0] for m in matches],
                "last_event_id": [m[1] for m in matches],
                "first_ts_us": [m[2] for m in matches],
                "last_ts_us": [m[3] for m in matches],
            }
        )

    return events.groupBy(key_col).applyInPandas(fn, CEP_OUTPUT)


def cep_pattern_matches(
    events: DataFrame,
    pattern: Pattern,
    key_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """Keyed CEP matching; emits one row per completed match."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        partial = (
            json.loads(state.get[0]) if state.exists and state.get[0] else []
        )
        rows: list[dict] = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                d = r._asdict()
                if "ts_us" not in d:  # attached by stream_events normally
                    d["ts_us"] = int(pd.Timestamp(d[time_col]).value // 1000)
                d["ts_us"] = int(d["ts_us"])
                rows.append(d)
        rows.sort(key=lambda d: (d["ts_us"], d["event_id"]))
        matches, new_partial = _match_events(rows, pattern, partial)
        state.update(
            (json.dumps([{k: p[k] for k in ("event_id", "ts_us", "event_type")} for p in new_partial]),)
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(matches),
                "first_event_id": [m[0] for m in matches],
                "last_event_id": [m[1] for m in matches],
                "first_ts_us": [m[2] for m in matches],
                "last_ts_us": [m[3] for m in matches],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=CEP_OUTPUT,
        stateStructType=CEP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
