"""Hive / JVM function classes through the CREATE FUNCTION front door.

Flink 1.12's ``CREATE FUNCTION f AS '<class>'`` names a JVM classpath
class by default (flink-sql-parser/.../SqlCreateFunction.java:98); with
the Hive connector on the classpath, Hive ``UDF``/``GenericUDF`` classes
are wrapped via HiveFunctionDefinitionFactory (flink-connector-hive).
The engine mirrors this: ``LANGUAGE JAVA``/``SCALA`` delegates to
Spark's ``CREATE TEMPORARY FUNCTION``, which wraps Spark-native
UDF0..22/Aggregator classes on any session and Hive UDF classes on a
hive-enabled session (``session.get_spark(hive=True)``).

The hive-enabled path needs a FRESH JVM (catalogImplementation is a
static conf), so it runs in a subprocess; the vanilla-session error path
runs in-process against the shared test session.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest


def test_hive_udf_class_on_vanilla_session_raises_clear_error(spark):
    """On a non-hive session, a Hive GenericUDF class must fail with a
    message that names the fix (get_spark(hive=True)), not a raw
    NO_HANDLER_FOR_UDAF analysis error."""
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sql.ddl import execute_statement

    engine = EngineSession(spark)
    with pytest.raises(ValueError, match="hive-enabled"):
        execute_statement(
            engine,
            "CREATE FUNCTION bad_hive_upper AS "
            "'org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper' "
            "LANGUAGE JAVA",
        )
    assert "bad_hive_upper" not in engine._functions


def test_unknown_language_still_rejected(spark):
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sql.ddl import execute_statement

    engine = EngineSession(spark)
    with pytest.raises(ValueError, match="LANGUAGE"):
        execute_statement(
            engine, "CREATE FUNCTION f AS 'x.Y' LANGUAGE RUST"
        )


_SUBPROC = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "__REPO__")
    try:
        from flink_1_12_2_spark.session import EngineSession, get_spark
        from flink_1_12_2_spark.sql.ddl import execute_statement
        spark = get_spark(master="local[2]", shuffle_partitions=2, hive=True)
        if spark.conf.get("spark.sql.catalogImplementation", "?") != "hive":
            print("HIVE_UNAVAILABLE"); sys.exit(0)
        spark.sparkContext.setLogLevel("ERROR")
        engine = EngineSession(spark)
        execute_statement(
            engine,
            "CREATE FUNCTION hive_upper AS "
            "'org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper' "
            "LANGUAGE JAVA",
        )
        execute_statement(
            engine,
            "CREATE TEMPORARY FUNCTION hive_bin AS "
            "'org.apache.hadoop.hive.ql.udf.UDFBin' LANGUAGE JAVA",
        )
        up = spark.sql("SELECT hive_upper('abc') AS u").first()["u"]
        bn = spark.sql("SELECT hive_bin(12) AS b").first()["b"]
        assert up == "ABC", up
        assert bn == "1100", bn
        # SHOW FUNCTIONS lists them; DROP removes engine + Spark side
        names = {r["function_name"] for r in
                 execute_statement(engine, "SHOW USER FUNCTIONS").collect()}
        assert {"hive_upper", "hive_bin"} <= names, names
        execute_statement(engine, "DROP FUNCTION hive_bin")
        assert not spark.catalog.functionExists("hive_bin")
        print("HIVE_UDF_OK")
    except Exception as e:  # noqa: BLE001
        print("SUBPROC_FAIL:", type(e).__name__, str(e)[:500])
        sys.exit(1)
    """
)


def test_hive_udf_end_to_end_on_hive_session(tmp_path):
    """Fresh-JVM subprocess: a hive-enabled engine session registers Hive
    GenericUDF and UDF classes through the DDL front door and calls them
    from SQL (Flink HiveModule / HiveFunctionDefinitionFactory parity)."""
    from pathlib import Path

    repo = str(Path(__file__).resolve().parent.parent)
    out = subprocess.run(
        [sys.executable, "-c", _SUBPROC.replace("__REPO__", repo)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),  # keep metastore_db / derby.log out of the repo
    )
    if "HIVE_UNAVAILABLE" in out.stdout:
        pytest.skip("spark-hive jars not on the classpath")
    assert "HIVE_UDF_OK" in out.stdout, (
        f"stdout: {out.stdout[-1500:]}\nstderr: {out.stderr[-1500:]}"
    )
