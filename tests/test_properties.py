"""Property-based tests (hypothesis) for the custom operators — randomized
inputs against brute-force Python references (the engine's analogue of the
reference's harness tests)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

# one shared tiny settings profile: spark jobs per example are expensive
SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_key = st.integers(min_value=0, max_value=3)
_time = st.integers(min_value=0, max_value=50)


@SET
@given(
    left=st.lists(st.tuples(_key, _time), min_size=1, max_size=12),
    right=st.lists(st.tuples(_key, _time, st.integers(0, 99)), min_size=0, max_size=12),
)
def test_asof_join_matches_bruteforce(spark, left, right):
    from flink_1_12_2_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(i, k, base + dt.timedelta(minutes=t)) for i, (k, t) in enumerate(left)],
        "lid int, k int, t timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=t), v) for (k, t, v) in right],
        "rk int, rt timestamp, price int",
    )
    got = {
        r.lid: r.rt for r in asof_join(ldf, rdf, "k", "rk", "t", "rt").collect()
    }
    for i, (k, t) in enumerate(left):
        lt = base + dt.timedelta(minutes=t)
        cands = [
            base + dt.timedelta(minutes=rt_)
            for (rk_, rt_, _) in right
            if rk_ == k and rt_ <= t
        ]
        expected = max(cands) if cands else None
        assert got[i] == expected, (i, k, t)


@SET
@given(
    changes=st.lists(
        st.tuples(
            st.sampled_from(["+I", "+U", "-U", "-D"]),
            _key,
            st.integers(0, 99),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_changelog_normalize_is_last_write_wins(spark, changes):
    from flink_1_12_2_spark.operators.changelog import changelog_normalize

    df = spark.createDataFrame(
        [(kind, k, seq, float(v)) for seq, (kind, k, v) in enumerate(changes)],
        "_row_kind string, k int, seq int, v double",
    )
    got = {r.k: r.v for r in changelog_normalize(df, ["k"], ["seq"]).collect()}
    # reference: the last non(-U) change per key wins; a trailing -D deletes
    expected = {}
    last: dict[int, tuple[int, str, float]] = {}
    for seq, (kind, k, v) in enumerate(changes):
        if kind == "-U":
            continue
        last[k] = (seq, kind, float(v))
    for k, (_, kind, v) in last.items():
        if kind != "-D":
            expected[k] = v
    assert got == expected


@SET
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=10,
    )
)
def test_lsh_candidates_subset_and_identical_docs_found(spark, docs):
    from flink_1_12_2_spark.llm.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id int, text string"
    )
    sigs = minhash_signatures(df, "doc_id", "text")
    cand = {(r.id_1, r.id_2) for r in lsh_candidate_pairs(sigs, "doc_id").collect()}
    n = len(docs)
    # candidates are valid ordered pairs
    assert all(0 <= a < b < n for a, b in cand)
    # identical docs with >= 3 tokens MUST be candidates (equal signatures)
    for i in range(n):
        for j in range(i + 1, n):
            if docs[i] == docs[j] and len(docs[i].split()) >= 3:
                assert (i, j) in cand


@SET
@given(
    rows=st.lists(
        st.tuples(_key, st.integers(0, 1000), st.floats(0, 100, allow_nan=False)),
        min_size=1,
        max_size=25,
    )
)
def test_streaming_topn_state_fold_matches_sort(spark, rows):
    # pure-function check of the top-n fold used by the streaming operator
    import pandas as pd

    from flink_1_12_2_spark.streaming.stateful import _topn_fn

    class FakeState:
        exists = False

        def update(self, v):
            self.exists = True
            self._v = v

        @property
        def get(self):
            return self._v

    by_key: dict[int, list[tuple[int, float]]] = {}
    for k, eid, v in rows:
        by_key.setdefault(k, []).append((eid, v))
    for k, evs in by_key.items():
        pdf = pd.DataFrame(
            {"event_id": [e for e, _ in evs], "value": [v for _, v in evs]}
        )
        out = next(_topn_fn(3)((k,), iter([pdf]), FakeState()))
        expected = sorted(evs, key=lambda t: (-t[1], t[0]))[:3]
        got = list(zip(out["event_id"], out["value"]))
        assert [(int(e), float(v)) for e, v in got] == [
            (int(e), float(v)) for e, v in expected
        ]
