"""EXPLAIN CHANGELOG_MODE / ESTIMATED_COST (ExplainDetail.java:30,36) —
the detail sections must mirror the changelog_plan inference rules on the
canonical source×sink pipelines."""

from __future__ import annotations

import json
import os

import pytest

from flink_1_12_2_spark.session import EngineSession, get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _mk_topic(tmp_path, name: str, lines: list[str]) -> str:
    topic = str(tmp_path / name)
    os.makedirs(os.path.join(topic, "batch-0"))
    with open(os.path.join(topic, "batch-0", "part-0.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return topic


def _section(plan: str, header: str) -> str:
    assert header in plan, plan
    return plan.split(header)[1]


def test_append_agg_modes(spark):
    """Rule 2: agg over insert-only input is accumulate-only, but its
    OUTPUT retracts — scan [I], GroupAggregate [I,UB,UA,D]."""
    eng = EngineSession(spark)
    spark.range(10).selectExpr("id % 3 AS k", "id AS v").createOrReplaceTempView(
        "exp_t"
    )
    plan = eng.sql(
        "EXPLAIN CHANGELOG_MODE SELECT k, SUM(v) AS s FROM exp_t GROUP BY k"
    ).collect()[0][0]
    sec = _section(plan, "== Changelog Mode ==")
    assert "GroupAggregate(changelogMode=[I,UB,UA,D])" in sec
    assert "TableSourceScan(table=[exp_t], changelogMode=[I])" in sec
    assert "ChangelogNormalize" not in sec


def test_upsert_source_normalized_before_agg(spark, tmp_path):
    """Rule 1 (StreamExecChangelogNormalize): an upsert-kafka source
    provides [I,UA,D]; an update-consuming agg gets ChangelogNormalize
    inserted, and the agg takes the retract path."""
    eng = EngineSession(spark)
    topic = _mk_topic(
        tmp_path, "uk",
        [json.dumps({"k": 1}) + "\t" + json.dumps({"k": 1, "v": "a"})],
    )
    eng.sql(
        f"""CREATE TABLE exp_uk (k BIGINT, v STRING,
              PRIMARY KEY (k) NOT ENFORCED)
            WITH ('connector'='upsert-kafka', 'topic'='{topic}',
                  'key.format'='json', 'value.format'='json')"""
    )
    plan = eng.sql(
        "EXPLAIN CHANGELOG_MODE SELECT k, COUNT(*) AS c FROM exp_uk GROUP BY k"
    ).collect()[0][0]
    sec = _section(plan, "== Changelog Mode ==")
    assert "TableSourceScan(table=[exp_uk], changelogMode=[I,UA,D])" in sec
    assert "ChangelogNormalize(changelogMode=[I,UB,UA,D])" in sec
    assert "GroupAggregate(retract, changelogMode=[I,UB,UA,D])" in sec


def test_cdc_source_join_is_changelog_join(spark, tmp_path):
    """Rule 4: a join with a retracting (CDC) input is the IVM changelog
    join; the append side stays [I]."""
    eng = EngineSession(spark)
    topic = _mk_topic(
        tmp_path, "dbz",
        [json.dumps({"before": None, "after": {"id": 1, "v": "a"},
                     "op": "c", "ts_ms": 1})],
    )
    eng.sql(
        f"""CREATE TABLE exp_dbz (id BIGINT, v STRING)
            WITH ('connector'='kafka', 'topic'='{topic}',
                  'format'='debezium-json')"""
    )
    spark.range(5).selectExpr("id", "id * 2 AS w").createOrReplaceTempView(
        "exp_dim"
    )
    plan = eng.sql(
        "EXPLAIN CHANGELOG_MODE SELECT d.id, d.v, m.w "
        "FROM exp_dbz d JOIN exp_dim m ON d.id = m.id"
    ).collect()[0][0]
    sec = _section(plan, "== Changelog Mode ==")
    assert "TableSourceScan(table=[exp_dbz], changelogMode=[I,UB,UA,D])" in sec
    assert "TableSourceScan(table=[exp_dim], changelogMode=[I])" in sec
    assert "Join(changelog, changelogMode=[I,UB,UA,D])" in sec
    assert "SubqueryAlias" not in sec  # alias wrappers are transparent


def test_insert_upsert_sink_gets_drop_update_before(spark, tmp_path):
    """Rule 5: a PK sink consumes upsert — the retracting agg output goes
    through DropUpdateBefore; EXPLAIN must not execute the INSERT."""
    eng = EngineSession(spark)
    path = str(tmp_path / "snk")
    eng.sql(
        f"""CREATE TABLE exp_snk (k BIGINT, c BIGINT,
              PRIMARY KEY (k) NOT ENFORCED)
            WITH ('connector'='filesystem', 'path'='{path}',
                  'format'='parquet')"""
    )
    spark.range(10).selectExpr("id % 3 AS k", "id AS v").createOrReplaceTempView(
        "exp_src"
    )
    plan = eng.sql(
        "EXPLAIN CHANGELOG_MODE INSERT INTO exp_snk "
        "SELECT k, COUNT(*) AS c FROM exp_src GROUP BY k"
    ).collect()[0][0]
    sec = _section(plan, "== Changelog Mode ==")
    assert "Sink(table=[exp_snk], changelogMode=[I,UA,D])" in sec
    assert "DropUpdateBefore(changelogMode=[I,UA,D])" in sec
    # the write did NOT run
    assert not os.path.exists(path)


def test_insert_append_sink_over_updates_rejected(spark, tmp_path):
    """Rule 6: an append sink under an updating stream is the planner
    error, surfaced at EXPLAIN time like Flink."""
    eng = EngineSession(spark)
    path = str(tmp_path / "ap")
    eng.sql(
        f"""CREATE TABLE exp_ap (k BIGINT, c BIGINT)
            WITH ('connector'='filesystem', 'path'='{path}',
                  'format'='parquet')"""
    )
    spark.range(10).selectExpr("id % 3 AS k").createOrReplaceTempView(
        "exp_src2"
    )
    with pytest.raises(ValueError, match="consuming update changes"):
        eng.sql(
            "EXPLAIN CHANGELOG_MODE INSERT INTO exp_ap "
            "SELECT k, COUNT(*) AS c FROM exp_src2 GROUP BY k"
        )


def test_estimated_cost_section(spark):
    """ESTIMATED_COST annotates every optimized-plan operator with
    Catalyst's Statistics — the Spark stand-in for Flink's cost tuples."""
    eng = EngineSession(spark)
    spark.range(100).selectExpr("id AS k").createOrReplaceTempView("exp_c")
    plan = eng.sql(
        "EXPLAIN ESTIMATED_COST SELECT k FROM exp_c WHERE k > 5"
    ).collect()[0][0]
    sec = _section(plan, "== Estimated Cost ==")
    assert "sizeInBytes" in sec and "cost = {rows:" in sec
    # the vanilla sections are still present before the detail
    assert "== Optimized Logical Plan ==" in plan


def test_table_api_explain_details(spark):
    """Table.explain(ExplainDetail...) carries the same sections."""
    from flink_1_12_2_spark.table_api import Table

    t = Table(spark.range(10).selectExpr("id % 2 AS k", "id AS v")
              .groupBy("k").count())
    out = t.explain("CHANGELOG_MODE", "ESTIMATED_COST")
    assert "== Changelog Mode ==" in out
    assert "GroupAggregate(changelogMode=[I,UB,UA,D])" in out
    assert "== Estimated Cost ==" in out
