"""CEP / MATCH_RECOGNIZE subset — keyed NFA over event-time-ordered streams.

Flink parity: flink-libraries/flink-cep Pattern API
(Pattern.java — ``begin/followedBy/within``, entry CEP.java:38) and the SQL
MATCH_RECOGNIZE operator (StreamExecMatch.scala:68). Spark has no CEP
primitive (SURVEY §2.10) → implemented as a keyed NFA inside
``applyInPandasWithState``.

Scope: linear patterns of named steps with per-step predicates,
``followedBy`` (relaxed contiguity: unrelated events may sit between steps),
``within`` (max span from first to last step), AFTER MATCH SKIP PAST LAST
ROW (non-overlapping — Flink's default for MATCH_RECOGNIZE), and the
quantifier surface of the reference Pattern API (Pattern.java —
``notNext``:273, ``oneOrMore``:350, ``greedy``:365, ``times``:379, plus
``optional``, ``consecutive``, ``notFollowedBy``):

- ``times(n)`` / ``one_or_more()`` / ``optional()`` — looping / skippable
  steps with (min, max) occurrence bounds;
- ``greedy()`` — on predicate overlap between a loop and its successor,
  prefer extending the loop (default is Flink's reluctant behavior: prefer
  advancing once ``min`` occurrences are matched);
- ``consecutive()`` — strict contiguity inside a loop (a non-matching row
  closes the loop instead of being skipped);
- ``not_next`` / ``not_followed_by`` — negative steps: strict (the
  immediately-next row) / relaxed (any row before the next positive step
  matches) pattern kill.

Determinization note: Flink's NFA explores branches simultaneously; this
operator runs **one** partial match per key (single-run determinization,
no backtracking). With mutually exclusive step predicates — the typical
event_type-dispatch patterns — the output is identical to Flink's. The last
step must be a definite consuming step (no trailing loop/optional/negative),
so match completion is decidable at the row that closes it.

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
class Step:
    """One pattern step: predicate + occurrence quantifier.

    ``min_times``/``max_times`` bound occurrences (``max_times=None`` →
    unbounded, ``min_times=0`` → optional); ``negative`` steps consume no
    rows and kill the partial match when their predicate fires
    (``strict_negative`` → only the immediately-next row is tested)."""

    name: str
    pred: Predicate
    min_times: int = 1
    max_times: int | None = 1
    greedy: bool = False
    consecutive: bool = False
    negative: bool = False
    strict_negative: bool = False

    @property
    def is_loop(self) -> bool:
        return self.max_times is None or self.max_times > 1


@dataclass
class Pattern:
    """Linear CEP pattern: ordered steps, each a named predicate with an
    optional quantifier. Quantifier methods apply to the last step added,
    mirroring the fluent reference API (Pattern.java:350-379)."""

    steps: list[Step] = field(default_factory=list)
    within_us: int | None = None
    skip: str = "past_last"  # AfterMatchSkipStrategy: past_last | to_next

    @staticmethod
    def begin(name: str, pred: Predicate) -> "Pattern":
        return Pattern(steps=[Step(name, pred)])

    def skip_to_next_row(self) -> "Pattern":
        """AFTER MATCH SKIP TO NEXT ROW (AfterMatchSkipStrategy.skipToNext):
        after a completed match, scanning resumes at the row AFTER the
        match's first row — overlapping matches with distinct starts are
        all reported (vs the skip-past-last-row default's disjoint
        matches)."""
        self.skip = "to_next"
        return self

    def skip_to_first(self, var: str) -> "Pattern":
        """AFTER MATCH SKIP TO FIRST <var>: resume at the first row the
        match mapped to pattern variable ``var``. Like Flink, resuming at
        the match's own first row would loop forever and raises."""
        self.skip = ("to_first", var)
        return self

    def skip_to_last(self, var: str) -> "Pattern":
        """AFTER MATCH SKIP TO LAST <var>: resume at the last row the
        match mapped to ``var`` (AfterMatchSkipStrategy.skipToLast)."""
        self.skip = ("to_last", var)
        return self

    def followed_by(self, name: str, pred: Predicate) -> "Pattern":
        self.steps.append(Step(name, pred))
        return self

    def not_next(self, name: str, pred: Predicate) -> "Pattern":
        """The immediately-next row must not match (Pattern.java:273)."""
        self.steps.append(
            Step(name, pred, negative=True, strict_negative=True)
        )
        return self

    def not_followed_by(self, name: str, pred: Predicate) -> "Pattern":
        """No matching row may occur before the next step matches."""
        self.steps.append(Step(name, pred, negative=True))
        return self

    def times(self, n: int, n_max: int | None = None) -> "Pattern":
        """Exactly n (or n..n_max) occurrences (Pattern.java:379)."""
        self.steps[-1].min_times = n
        self.steps[-1].max_times = n if n_max is None else n_max
        return self

    def one_or_more(self) -> "Pattern":
        """≥1 occurrences, reluctant unless .greedy() (Pattern.java:350)."""
        self.steps[-1].min_times = 1
        self.steps[-1].max_times = None
        return self

    def optional(self) -> "Pattern":
        self.steps[-1].min_times = 0
        return self

    def greedy(self) -> "Pattern":
        """Prefer extending the loop on predicate overlap (Pattern.java:365)."""
        self.steps[-1].greedy = True
        return self

    def consecutive(self) -> "Pattern":
        """Strict contiguity inside the loop: a non-matching row closes it."""
        self.steps[-1].consecutive = True
        return self

    def within(self, duration_us: int) -> "Pattern":
        self.within_us = duration_us
        return self

    def validate(self) -> "Pattern":
        last = self.steps[-1]
        if last.negative or last.min_times != 1 or last.max_times != 1:
            raise ValueError(
                "pattern must end with a definite consuming step "
                "(no trailing loop/optional/negative) so completion is "
                "decidable per row"
            )
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


def _empty_state() -> dict:
    return {
        "rows": [], "step_idx": 0, "loop_count": 0, "seen": [], "steps_of": []
    }


def _match_events(
    rows: list[dict], pattern: Pattern, state: dict | None
) -> tuple[list[tuple], dict]:
    """Run the determinized NFA over ordered rows.

    Returns (matches, new_state). State: ``rows`` = consumed prefix,
    ``step_idx`` = cursor step, ``loop_count`` = occurrences consumed at the
    cursor when it is a loop. Skip past last row: one in-flight partial per
    key; on completion scanning resumes after the match's last row. A killed
    partial (negative step fired / within expired / broken consecutive loop)
    resets, and the killing row gets one fresh retry as a new step-0 row.
    """
    from collections import deque

    steps = pattern.steps
    matches: list[tuple] = []
    cur = state if state and "rows" in state else _empty_state()
    cur.setdefault("seen", [])
    cur.setdefault("steps_of", [])
    replay: list[dict] = []

    def reset() -> None:
        cur["rows"], cur["step_idx"], cur["loop_count"] = [], 0, 0
        cur["seen"] = []
        cur["steps_of"] = []

    def consume(j: int, row: dict) -> None:
        step = steps[j]
        if not cur["seen"] or cur["seen"][-1] is not row:
            cur["seen"].append(row)
        cur["rows"].append(row)
        cur["steps_of"].append(step.name)
        if step.is_loop:
            cur["loop_count"] = (
                cur["loop_count"] + 1 if j == cur["step_idx"] else 1
            )
            cur["step_idx"] = j
            if step.max_times is not None and cur["loop_count"] >= step.max_times:
                cur["step_idx"], cur["loop_count"] = j + 1, 0
        else:
            cur["step_idx"], cur["loop_count"] = j + 1, 0
        if cur["step_idx"] >= len(steps):
            m = cur["rows"]
            matches.append(
                (m[0]["event_id"], m[-1]["event_id"], m[0]["ts_us"], m[-1]["ts_us"])
            )
            if pattern.skip == "to_next":
                # SKIP TO NEXT ROW: rescan everything after the match's
                # first row, INCLUDING rows the match skipped over
                # (relaxed contiguity) — hence "seen", not "rows".
                replay.extend(cur["seen"][1:])
            elif isinstance(pattern.skip, tuple):
                mode, var = pattern.skip
                hits = [
                    i for i, n in enumerate(cur["steps_of"]) if n == var
                ]
                if hits:
                    tgt = m[hits[0] if mode == "to_first" else hits[-1]]
                    # event_id match, not identity — restored-from-state
                    # rows are distinct dict objects
                    pos = next(
                        i
                        for i, r in enumerate(cur["seen"])
                        if r["event_id"] == tgt["event_id"]
                    )
                    if pos == 0:
                        raise ValueError(
                            f"AFTER MATCH SKIP TO {var} would resume at the "
                            "match's own start row (infinite loop) — Flink's "
                            "AfterMatchSkipStrategy raises the same way"
                        )
                    replay.extend(cur["seen"][pos:])
            reset()

    queue = deque(rows)
    while queue:
        row = queue.popleft()
        for _attempt in range(2):  # second pass only after a kill/reset
            if (
                cur["rows"]
                and pattern.within_us is not None
                and row["ts_us"] - cur["rows"][0]["ts_us"] > pattern.within_us
            ):
                reset()  # stale prefix; row retried fresh below
            killed = False
            # strict negatives AT the cursor: tested exactly once, on the
            # row immediately following the previous consume
            while cur["step_idx"] < len(steps):
                s = steps[cur["step_idx"]]
                if s.negative and s.strict_negative:
                    if s.pred(row):
                        killed = True
                        break
                    cur["step_idx"] += 1  # satisfied permanently
                else:
                    break
            consumed = False
            loop_extend: int | None = None
            if not killed:
                # frontier walk from the cursor: collect armed negative
                # predicates (kill checks) and consumable candidate steps;
                # stop at the first step that cannot be passed over.
                # In-walk strict negatives are treated as relaxed — exact
                # one-row semantics apply only when the cursor reaches them.
                kill_preds: list[Predicate] = []
                candidates: list[int] = []
                j = cur["step_idx"]
                while j < len(steps):
                    s = steps[j]
                    if s.negative:
                        kill_preds.append(s.pred)
                        j += 1
                        continue
                    if j == cur["step_idx"] and s.is_loop:
                        if s.max_times is None or cur["loop_count"] < s.max_times:
                            loop_extend = j
                        if cur["loop_count"] >= s.min_times:
                            j += 1  # enough occurrences → later steps reachable
                            continue
                        break
                    candidates.append(j)
                    if s.min_times == 0:  # optional, not yet entered
                        j += 1
                        continue
                    break
                if any(p(row) for p in kill_preds):
                    killed = True
                else:
                    # reluctant (default): advance candidates first, loop
                    # extension last; greedy: extension first (Pattern.java:365)
                    order = list(candidates)
                    if loop_extend is not None:
                        if steps[loop_extend].greedy:
                            order.insert(0, loop_extend)
                        else:
                            order.append(loop_extend)
                    for k in order:
                        if steps[k].pred(row):
                            consume(k, row)
                            consumed = True
                            break
                    if not consumed and loop_extend is not None:
                        s0 = steps[cur["step_idx"]]
                        if s0.consecutive and cur["loop_count"] > 0:
                            # strict contiguity: a non-matching row closes
                            # the loop (or kills the partial under min)
                            if cur["loop_count"] >= s0.min_times:
                                cur["step_idx"] += 1
                                cur["loop_count"] = 0
                            else:
                                killed = True
            if killed:
                had_prefix = bool(cur["rows"]) or cur["step_idx"] > 0
                reset()
                if had_prefix:
                    continue  # retry the killing row as a fresh step-0 row
            break
        # relaxed contiguity: rows matching nothing are skipped silently —
        # but an active partial records them ("seen") for SKIP TO NEXT ROW
        if cur["rows"] and cur["seen"][-1] is not row:
            cur["seen"].append(row)
        if replay:
            queue.extendleft(reversed(replay))
            replay.clear()
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

    pattern.validate()

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in pdf.itertuples(index=False):
            d = r._asdict()
            if "ts_us" not in d or d["ts_us"] is None:
                d["ts_us"] = int(pd.Timestamp(d[time_col]).value // 1000)
            d["ts_us"] = int(d["ts_us"])
            rows.append(d)
        rows.sort(key=lambda d: (d["ts_us"], d["event_id"]))
        matches, _ = _match_events(rows, pattern, None)
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
    pattern.validate()

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        raw = json.loads(state.get[0]) if state.exists and state.get[0] else None
        if isinstance(raw, list):  # pre-quantifier state format
            raw = {"rows": raw, "step_idx": len(raw), "loop_count": 0}
        partial = raw
        rows: list[dict] = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                d = r._asdict()
                if "ts_us" not in d:  # attached by stream_events normally
                    d["ts_us"] = int(pd.Timestamp(d[time_col]).value // 1000)
                d["ts_us"] = int(d["ts_us"])
                rows.append(d)
        rows.sort(key=lambda d: (d["ts_us"], d["event_id"]))
        matches, new_state = _match_events(rows, pattern, partial)
        state.update(
            (
                json.dumps(
                    {
                        "rows": [
                            {
                                k: p.get(k)
                                for k in ("event_id", "ts_us", "event_type")
                            }
                            for p in new_state["rows"]
                        ],
                        "step_idx": new_state["step_idx"],
                        "loop_count": new_state["loop_count"],
                        # SKIP TO NEXT ROW needs the skipped-over rows of an
                        # in-flight partial across micro-batch boundaries
                        "seen": [
                            {
                                k: p.get(k)
                                for k in ("event_id", "ts_us", "event_type")
                            }
                            for p in new_state.get("seen", [])
                        ],
                        "steps_of": list(new_state.get("steps_of", [])),
                    }
                ),
            )
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
