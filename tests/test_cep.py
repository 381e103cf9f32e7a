"""Hand-verified NFA semantics tests for the CEP operator (batch harness on
the match function itself + end-to-end through applyInPandasWithState)."""

from __future__ import annotations

from flink_1_12_2_spark.streaming.cep import Pattern, _match_events


def _rows(seq):
    """seq: list of (event_id, ts_us, event_type)"""
    return [
        {"event_id": e, "ts_us": t, "event_type": y} for (e, t, y) in seq
    ]


def _pat(within=None):
    p = Pattern.begin("a", lambda r: r["event_type"] == "A").followed_by(
        "b", lambda r: r["event_type"] == "B"
    )
    if within:
        p = p.within(within)
    return p


def test_simple_match():
    m, partial = _match_events(_rows([(1, 10, "A"), (2, 20, "B")]), _pat(), [])
    assert m == [(1, 2, 10, 20)]
    assert partial == []


def test_relaxed_contiguity():
    # noise between steps is skipped (followedBy, not next)
    m, _ = _match_events(
        _rows([(1, 10, "A"), (2, 15, "X"), (3, 20, "B")]), _pat(), []
    )
    assert m == [(1, 3, 10, 20)]


def test_skip_past_last_row():
    # greedy non-overlap: A1 B1 A2 B2 → two matches, not A1-B2
    m, _ = _match_events(
        _rows([(1, 10, "A"), (2, 20, "B"), (3, 30, "A"), (4, 40, "B")]), _pat(), []
    )
    assert m == [(1, 2, 10, 20), (3, 4, 30, 40)]


def test_within_expiry():
    # B arrives too late → prefix dropped; later full pair matches
    m, _ = _match_events(
        _rows([(1, 10, "A"), (2, 1000, "B"), (3, 1100, "A"), (4, 1150, "B")]),
        _pat(within=100),
        [],
    )
    assert m == [(3, 4, 1100, 1150)]


def test_within_expiry_retry_as_start():
    # expired prefix: the expiring row itself can restart the pattern
    m, partial = _match_events(
        _rows([(1, 10, "A"), (2, 1000, "A"), (3, 1050, "B")]),
        _pat(within=100),
        [],
    )
    assert m == [(2, 3, 1000, 1050)]
    assert partial == []


def test_partial_state_carries_across_batches():
    m1, partial = _match_events(_rows([(1, 10, "A")]), _pat(), [])
    assert m1 == [] and len(partial) == 1
    m2, partial2 = _match_events(_rows([(2, 20, "B")]), _pat(), partial)
    assert m2 == [(1, 2, 10, 20)] and partial2 == []


def test_first_a_wins_no_restart_midpattern():
    # while waiting for B, later A's are ignored (no A-reanchor in this NFA)
    m, _ = _match_events(
        _rows([(1, 10, "A"), (2, 20, "A"), (3, 30, "B")]), _pat(), []
    )
    assert m == [(1, 3, 10, 30)]


def test_end_to_end_streaming(spark, sf_dir):
    from flink_1_12_2_spark.streaming.cep import cep_pattern_matches
    from flink_1_12_2_spark.streaming.core import run_to_memory, stream_events

    ev = stream_events(spark, sf_dir)
    pat = (
        Pattern.begin("c", lambda r: r["event_type"] == "click")
        .followed_by("p", lambda r: r["event_type"] == "purchase")
        .within(6 * 3600 * 1_000_000)
    )
    out = run_to_memory(cep_pattern_matches(ev, pat), output_mode="append")
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.last_ts_us - r.first_ts_us <= 6 * 3600 * 1_000_000
        assert r.first_ts_us <= r.last_ts_us


def test_match_recognize_sql_equals_streaming_cep(spark, sf_dir):
    """The SQL front door (batch NFA) and the streaming CEP operator must
    produce identical matches on the same data."""
    from flink_1_12_2_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()
    batch = QUERIES["match_recognize_sql"].fn(spark, sf_dir).collect()
    stream = QUERIES["stream_cep_click_purchase"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, batch)) == sorted(map(tuple, stream))
    assert len(batch) > 0


def test_match_recognize_parser_rejects_unknown():
    import pytest as _pytest

    from flink_1_12_2_spark.sql.match_recognize import parse_match_recognize

    with _pytest.raises(ValueError):
        parse_match_recognize("SELECT * FROM t")


def test_engine_session_sql_match_recognize(spark, sf_dir):
    from flink_1_12_2_spark.registry import load
    from flink_1_12_2_spark.session import EngineSession

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    eng = EngineSession(spark)
    out = eng.sql(
        """SELECT * FROM events MATCH_RECOGNIZE (
             PARTITION BY user_id ORDER BY ts PATTERN (A B)
             WITHIN INTERVAL '6' HOUR
             DEFINE A AS event_type = 'click', B AS event_type = 'purchase')"""
    ).collect()
    assert len(out) > 0


def test_cep_multibatch_equals_batch_nfa(spark, sf_dir):
    """Partial-match state must survive micro-batch boundaries: the 4-batch
    streaming run equals the single-pass batch NFA."""
    from flink_1_12_2_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()
    multi = QUERIES["stream_cep_multibatch"].fn(spark, sf_dir).collect()
    batch = QUERIES["match_recognize_sql"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, multi)) == sorted(map(tuple, batch))
