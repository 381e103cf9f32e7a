"""SQL Client shim (tools/sql_shell.py) — CREATE TABLE → INSERT → SELECT
driven end-to-end through the statement loop, plus splitter/tableau units.
Reference parity: flink-table/flink-sql-client SqlClient.java /
cli/CliClient.java (;-terminated statements, errors keep the session
alive, QUIT exits)."""

from __future__ import annotations

import io

from tools.sql_shell import render, run_statement, split_statements


def test_split_statements_respects_quotes():
    stmts = split_statements(
        "SELECT ';' AS semi; SHOW TABLES;\n  -- trailing\n QUIT"
    )
    assert stmts == ["SELECT ';' AS semi", "SHOW TABLES", "-- trailing\n QUIT"]


def test_shell_create_insert_select_roundtrip(spark, tmp_path):
    from flink_1_12_2_spark.session import EngineSession

    engine = EngineSession(spark)
    out = io.StringIO()
    sink = (tmp_path / "t_sink").as_posix()
    assert run_statement(
        engine,
        f"""CREATE TABLE shell_sink (name STRING, qty INT)
            WITH ('connector' = 'filesystem', 'path' = '{sink}',
                  'format' = 'parquet')""",
        out,
    )
    assert run_statement(
        engine,
        "INSERT INTO shell_sink VALUES ('widget', 3), ('gadget', 5)",
        out,
    )
    assert run_statement(
        engine,
        "SELECT name, qty FROM shell_sink ORDER BY qty",
        out,
    )
    text = out.getvalue()
    assert "[ERROR]" not in text
    assert "widget" in text and "gadget" in text
    # tableau renders header + separator rows
    assert "| name" in text and "+--" in text


def test_shell_error_keeps_session_alive_and_quit_exits(spark):
    from flink_1_12_2_spark.session import EngineSession

    engine = EngineSession(spark)
    out = io.StringIO()
    assert run_statement(engine, "SELECT FROM nowhere !!", out)  # bad SQL
    assert "[ERROR]" in out.getvalue()
    assert run_statement(engine, "SELECT 1 AS one", out)  # still usable
    assert "one" in out.getvalue()
    assert not run_statement(engine, "QUIT", out)


def test_render_caps_rows(spark):
    df = spark.range(150).selectExpr("id AS n")
    text = render(df, max_rows=100)
    assert "100 row(s) (showing first 100)" in text
