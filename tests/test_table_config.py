"""SET/RESET (sql-client SetOperation) + dynamic table options
(OPTIONS hint, new in Flink 1.12 — FlinkHints.java, gated on
TableConfigOptions.TABLE_DYNAMIC_TABLE_OPTIONS_ENABLED, default false)."""

from __future__ import annotations

import pytest


def test_set_reset_and_listing(spark):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    eng.sql("SET 'table.exec.state.ttl' = '3600000'")
    eng.sql("SET pipeline.name = nightly_curation")
    listed = {r["key"]: r["value"] for r in eng.sql("SET").collect()}
    assert listed["table.exec.state.ttl"] == "3600000"
    assert listed["pipeline.name"] == "nightly_curation"
    eng.sql("RESET 'table.exec.state.ttl'")
    listed = {r["key"]: r["value"] for r in eng.sql("SET").collect()}
    assert "table.exec.state.ttl" not in listed


def test_set_default_parallelism_wires_shuffle_partitions(spark):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        eng.sql("SET 'table.exec.resource.default-parallelism' = '7'")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_options_hint_gated_like_the_planner(spark, tmp_path):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    d = tmp_path / "csv_h"
    d.mkdir()
    (d / "a.csv").write_text("k;v\n1;a\n2;b\n")
    eng.sql(
        f"""CREATE TABLE hcsv (k BIGINT, v STRING) WITH (
            'connector'='filesystem', 'path'='{d}', 'format'='csv',
            'csv.field-delimiter'=';')"""
    )
    # disabled by default — the planner's exact error
    with pytest.raises(ValueError, match="dynamic-table-options.enabled"):
        eng.sql(
            "SELECT * FROM hcsv /*+ OPTIONS('csv.field-delimiter'=';') */"
        )
    eng.sql("SET 'table.dynamic-table-options.enabled' = 'true'")
    out = eng.sql(
        "SELECT * FROM hcsv /*+ OPTIONS('csv.field-delimiter'=';') */ "
        "ORDER BY k"
    ).collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, "a"), (2, "b")]


def test_options_hint_overrides_scan_options(spark, tmp_path):
    """The hint MERGES over the DDL options: re-read a ';' table with a
    wrong hinted delimiter and the rows stop splitting — proof the
    hinted value (not the DDL one) drove the scan."""
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    d = tmp_path / "csv_h2"
    d.mkdir()
    (d / "a.csv").write_text("k;v\n1;a\n")
    eng.sql(
        f"""CREATE TABLE hcsv2 (k STRING, v STRING) WITH (
            'connector'='filesystem', 'path'='{d}', 'format'='csv',
            'csv.field-delimiter'=';')"""
    )
    eng.sql("SET 'table.dynamic-table-options.enabled' = 'true'")
    ddl_rows = eng.sql("SELECT * FROM hcsv2").collect()
    assert (ddl_rows[0]["k"], ddl_rows[0]["v"]) == ("1", "a")
    # wrong hinted delimiter → the line no longer splits into the 2-col
    # schema; the hinted ignore-parse-errors DROPS the malformed row
    # (Flink's skip-on-error) where the DDL read above returned it split
    # — both hinted options demonstrably drove the scan. (collect, not
    # count: Spark CSV only detects malformed rows on parsed columns.)
    hinted = eng.sql(
        "SELECT * FROM hcsv2 /*+ OPTIONS('csv.field-delimiter'='|', "
        "'csv.ignore-parse-errors'='true') */"
    ).collect()
    assert hinted == []


def test_options_hint_on_unknown_table_rejected(spark):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    eng.sql("SET 'table.dynamic-table-options.enabled' = 'true'")
    with pytest.raises(ValueError, match="not a registered"):
        eng.sql("SELECT * FROM nope /*+ OPTIONS('a'='b') */")


def test_options_hint_kafka_startup_mode(spark, tmp_path):
    """The reference's canonical hint use: override a kafka table's
    scan.startup.mode per query — the hinted scan starts from the topic
    end (latest-offset), the DDL scan from the beginning."""
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish

    eng = EngineSession(spark)
    topic = str(tmp_path / "t_hint")
    publish(
        spark.createDataFrame(
            [('{"k": 1, "v": "early"}',)], "value string"
        ),
        topic,
    )
    eng.sql(
        f"""CREATE TABLE kh (k BIGINT, v STRING) WITH (
            'connector'='kafka', 'topic'='{topic}', 'format'='json')"""
    )
    eng.sql("SET 'table.dynamic-table-options.enabled' = 'true'")
    # hint pins its own startup snapshot at hint time → excludes 'early'
    hinted = eng.sql(
        "SELECT * FROM kh /*+ OPTIONS('scan.startup.mode'="
        "'latest-offset') */"
    )
    assert hinted.count() == 0
    assert eng.sql("SELECT * FROM kh").count() == 1  # DDL scan unaffected


def test_explain_resolves_options_hints(spark, tmp_path):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    d = tmp_path / "csv_e"
    d.mkdir()
    (d / "a.csv").write_text("k;v\n1;a\n")
    eng.sql(
        f"""CREATE TABLE ecsv (k BIGINT, v STRING) WITH (
            'connector'='filesystem', 'path'='{d}', 'format'='csv',
            'csv.field-delimiter'=';')"""
    )
    eng.sql("SET 'table.dynamic-table-options.enabled' = 'true'")
    plan = eng.sql(
        "EXPLAIN SELECT * FROM ecsv /*+ OPTIONS('csv.field-delimiter'=';') */"
    ).collect()[0]["plan"]
    assert "Physical Plan" in plan


def test_options_hint_overrides_pinned_startup_snapshot(spark, tmp_path):
    """A table whose DDL pinned 'latest-offset' (materialized exclusion
    snapshot) must still honor a hinted 'earliest-offset' — the hint
    resolves the startup position FRESH."""
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish

    eng = EngineSession(spark)
    topic = str(tmp_path / "t_pin")
    publish(
        spark.createDataFrame([('{"k": 1}',)], "value string"), topic
    )
    eng.sql(
        f"""CREATE TABLE kpin (k BIGINT) WITH (
            'connector'='kafka', 'topic'='{topic}', 'format'='json',
            'scan.startup.mode'='latest-offset')"""
    )
    assert eng.sql("SELECT * FROM kpin").count() == 0  # pinned: excluded
    eng.sql("SET 'table.dynamic-table-options.enabled' = 'true'")
    hinted = eng.sql(
        "SELECT * FROM kpin /*+ OPTIONS('scan.startup.mode'="
        "'earliest-offset') */"
    )
    assert hinted.count() == 1  # hint re-resolved from the beginning


def test_options_hint_keeps_computed_columns_any_connector(spark, tmp_path):
    """Computed columns ride TableMeta, so a hinted scan of a FILESYSTEM
    table keeps them too (not just kafka), in declared order."""
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    d = tmp_path / "csv_cc"
    d.mkdir()
    (d / "a.csv").write_text("x\n3\n")
    eng.sql(
        f"""CREATE TABLE ccsv (x BIGINT, c AS x * 2) WITH (
            'connector'='filesystem', 'path'='{d}', 'format'='csv')"""
    )
    eng.sql("SET 'table.dynamic-table-options.enabled' = 'true'")
    rows = eng.sql(
        "SELECT * FROM ccsv /*+ OPTIONS('csv.ignore-parse-errors'="
        "'true') */"
    ).collect()
    assert [(r["x"], r["c"]) for r in rows] == [(3, 6)]


def test_rename_moves_kafka_computed_state(spark, tmp_path):
    """ALTER TABLE RENAME carries computed-column state to the new name
    (same stale-state class as the DROP TABLE cleanup)."""
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish

    eng = EngineSession(spark)
    topic = str(tmp_path / "t_ren")
    publish(spark.createDataFrame([('{"x": 5}',)], "value string"), topic)
    eng.sql(
        f"""CREATE TABLE tren (x BIGINT, c AS x * 2) WITH (
            'connector'='kafka', 'topic'='{topic}', 'format'='json')"""
    )
    eng.sql("ALTER TABLE tren RENAME TO tren2")
    # publish more so the fingerprint changes and the view re-registers
    publish(spark.createDataFrame([('{"x": 6}',)], "value string"), topic)
    rows = {r["x"]: r["c"] for r in eng.sql("SELECT * FROM tren2").collect()}
    assert rows == {5: 10, 6: 12}


def test_stream_table_honors_csv_format_options(spark, tmp_path):
    """The streaming twin maps the same format options as the batch
    scan (a ';'-delimited table must not mis-parse when streamed)."""
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.streaming.core import run_to_memory

    eng = EngineSession(spark)
    d = tmp_path / "csv_st"
    d.mkdir()
    (d / "a.csv").write_text("k;v\n1;a\n2;b\n")
    eng.sql(
        f"""CREATE TABLE stcsv (k BIGINT, v STRING) WITH (
            'connector'='filesystem', 'path'='{d}', 'format'='csv',
            'csv.field-delimiter'=';')"""
    )
    got = {
        r["k"]: r["v"]
        for r in run_to_memory(eng.stream_table("stcsv")).collect()
    }
    assert got == {1: "a", 2: "b"}


def test_options_hint_preserves_cdc_changelog_columns(spark, tmp_path):
    """A hinted scan of a CDC table keeps the engine's changelog columns
    (_row_kind) — the declared-order reorder applies only when the scan
    exposes exactly the declared columns."""
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish

    eng = EngineSession(spark)
    topic = str(tmp_path / "t_cdc_hint")
    publish(
        spark.createDataFrame(
            [(
                '{"before": null, "after": {"id": 1, "v": "a"}, '
                '"op": "c", "ts_ms": 1}',
            )],
            "value string",
        ),
        topic,
    )
    eng.sql(
        f"""CREATE TABLE cdh (id BIGINT, v STRING) WITH (
            'connector'='kafka', 'topic'='{topic}',
            'format'='debezium-json')"""
    )
    eng.sql("SET 'table.dynamic-table-options.enabled' = 'true'")
    hinted = eng.sql(
        "SELECT * FROM cdh /*+ OPTIONS('scan.startup.mode'="
        "'earliest-offset') */"
    )
    assert "_row_kind" in hinted.columns
    assert hinted.collect()[0]["_row_kind"] == "+I"
