"""Changelog-mode inference planner (FlinkChangelogModeInferenceProgram
parity — the 4 canonical source×sink pipelines plus the error paths)."""

import pytest

from flink_1_12_2_spark.operators.changelog_plan import plan_changelog


def test_append_source_agg_upsert_sink():
    # insert-only → accumulate-only agg → updating result → upsert sink
    # drops -U (DropUpdateBeforeFunction)
    assert plan_changelog("append", [("agg",), ("sink", "upsert")]) == [
        "source[append]",
        "group_agg",
        "drop_update_before",
        "sink[upsert]",
    ]


def test_upsert_source_agg_gets_normalized():
    # upsert source lacks -U → ChangelogNormalize before the agg
    # (StreamExecChangelogNormalize), then accumulate-only agg
    assert plan_changelog("upsert", [("agg",), ("sink", "retract")]) == [
        "source[upsert]",
        "changelog_normalize",
        "group_agg",
        "sink[retract]",
    ]


def test_retract_source_agg_uses_retract_path():
    # full changelog feeds the GroupAggFunction retract path directly —
    # no normalize step (the r4 signed re-aggregation)
    assert plan_changelog("retract", [("agg",), ("sink", "upsert")]) == [
        "source[retract]",
        "group_agg_retract",
        "drop_update_before",
        "sink[upsert]",
    ]


def test_retract_join_uses_ivm_product_rule():
    assert plan_changelog("retract", [("join", "retract"), ("sink", "retract")]) == [
        "source[retract]",
        "changelog_join",
        "sink[retract]",
    ]


def test_append_join_stays_plain_and_append_sink_ok():
    assert plan_changelog("append", [("join", "append"), ("sink", "append")]) == [
        "source[append]",
        "join",
        "sink[append]",
    ]


def test_join_upsert_right_normalized():
    assert plan_changelog("append", [("join", "upsert"), ("sink", "append")]) == [
        "source[append]",
        "changelog_normalize[right]",
        "join",
        "sink[append]",
    ]


def test_agg_chain_second_agg_consumes_retractions():
    # agg output is a retract stream → a second agg must use the retract
    # path (the changelog_reagg query shape)
    assert plan_changelog("append", [("agg",), ("agg",), ("sink", "retract")]) == [
        "source[append]",
        "group_agg",
        "group_agg_retract",
        "sink[retract]",
    ]


def test_append_sink_rejects_updates():
    # Flink planner error: "Table sink doesn't support consuming updates"
    with pytest.raises(ValueError, match="update changes"):
        plan_changelog("append", [("agg",), ("sink", "append")])


def test_invalid_modes_raise():
    with pytest.raises(ValueError):
        plan_changelog("bogus", [])
    with pytest.raises(ValueError):
        plan_changelog("append", [("sink", "bogus")])
    with pytest.raises(ValueError):
        plan_changelog("append", [("frobnicate",)])


def test_topn_over_append_uses_append_fast():
    # StreamExecRank AppendFastStrategy; output is updating -> upsert sink
    # drops -U
    assert plan_changelog("append", [("topn",), ("sink", "upsert")]) == [
        "source[append]",
        "topn",
        "drop_update_before",
        "sink[upsert]",
    ]


def test_topn_over_retract_uses_retractable():
    # RetractStrategy -> RetractableTopNFunction (agg output retracts)
    assert plan_changelog(
        "retract", [("agg",), ("topn",), ("sink", "retract")]
    ) == [
        "source[retract]",
        "group_agg_retract",
        "topn_retract",
        "sink[retract]",
    ]


def test_topn_over_upsert_gets_normalized_then_append_fast():
    # the upsert-materialize decision: normalize inserts the missing -U,
    # the normalized snapshot stream feeds the append-fast rank
    assert plan_changelog("upsert", [("topn",), ("sink", "retract")]) == [
        "source[upsert]",
        "changelog_normalize",
        "topn",
        "sink[retract]",
    ]


def test_dedup_keep_first_stays_append():
    # keep-first emits each key once, forever -> append sink legal
    assert plan_changelog(
        "append", [("dedup", "first"), ("sink", "append")]
    ) == ["source[append]", "dedup_keep_first", "sink[append]"]


def test_dedup_keep_last_updates():
    assert plan_changelog(
        "append", [("dedup", "last"), ("sink", "upsert")]
    ) == [
        "source[append]",
        "dedup_keep_last",
        "drop_update_before",
        "sink[upsert]",
    ]


def test_dedup_over_upsert_normalized_but_retract_rejected():
    # upsert input is materialized first (rule 1)...
    assert plan_changelog(
        "upsert", [("dedup", "last"), ("sink", "retract")]
    ) == [
        "source[upsert]",
        "changelog_normalize",
        "dedup_keep_last",
        "sink[retract]",
    ]
    # ...but a true retract stream is rejected like StreamExecDeduplicate
    with pytest.raises(ValueError, match="Deduplicate doesn't support"):
        plan_changelog("retract", [("dedup", "last"), ("sink", "retract")])


def test_window_agg_append_only_and_rejects_updates():
    assert plan_changelog(
        "append", [("window_agg",), ("sink", "append")]
    ) == ["source[append]", "window_agg", "sink[append]"]
    assert plan_changelog(
        "upsert", [("window_agg",), ("sink", "append")]
    ) == [
        "source[upsert]",
        "changelog_normalize",
        "window_agg",
        "sink[append]",
    ]
    with pytest.raises(ValueError, match="GroupWindowAggregate"):
        plan_changelog("retract", [("window_agg",), ("sink", "retract")])


def test_dedup_invalid_keep_mode():
    with pytest.raises(ValueError, match="keep mode"):
        plan_changelog("append", [("dedup", "middle"), ("sink", "append")])
