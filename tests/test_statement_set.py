"""StatementSet (multi-sink) unit tests — buffering, INSERT modes, shared-view
reuse, sink-only CREATE TABLE registration, error paths."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest

from flink_1_12_2_spark.registry import load
from flink_1_12_2_spark.session import EngineSession


def _tmp(prefix: str) -> str:
    return os.path.join(tempfile.gettempdir(), prefix + uuid.uuid4().hex[:10])


@pytest.fixture()
def eng(spark, sf_dir):
    e = EngineSession(spark)
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_sset")
    return e


def _create_sink(eng, name: str) -> str:
    path = _tmp(f"{name}_")
    eng.sql(
        f"CREATE TABLE {name} (n_regionkey INT, cnt BIGINT) WITH "
        f"('connector'='filesystem', 'path'='{path}', 'format'='parquet')"
    )
    return path


def test_sink_only_create_table_registers_without_path(eng):
    path = _create_sink(eng, "sset_sink_a")
    meta = eng.meta("sset_sink_a")
    assert meta is not None and meta.path == path
    assert not os.path.exists(path)  # nothing written yet


def test_multi_sink_execute_and_row_counts(eng, spark):
    pa = _create_sink(eng, "sset_sink_b")
    pb = _create_sink(eng, "sset_sink_c")
    eng.sql(
        "CREATE VIEW nation_by_region_sset AS SELECT n_regionkey,"
        " COUNT(*) AS cnt FROM nation_sset GROUP BY n_regionkey"
    )
    ss = eng.create_statement_set()
    ss.add_insert_sql(
        "INSERT INTO sset_sink_b SELECT n_regionkey, cnt"
        " FROM nation_by_region_sset WHERE n_regionkey < 2"
    )
    ss.add_insert_sql(
        "INSERT INTO sset_sink_c SELECT n_regionkey, cnt"
        " FROM nation_by_region_sset WHERE n_regionkey >= 2"
    )
    # the shared view is referenced twice → persisted during execute
    counts = {b.sink: b.referenced_views for b in ss._buffer}
    assert counts["sset_sink_b"] == {"nation_by_region_sset"}
    res = {r.sink_table: r.rows_written for r in ss.execute().collect()}
    assert res["sset_sink_b"] == 2 and res["sset_sink_c"] == 3
    total = (
        spark.read.parquet(pa).count() + spark.read.parquet(pb).count()
    )
    assert total == 5
    assert ss._buffer == []  # buffer drained after execute


def test_single_insert_through_sql_and_overwrite(eng, spark):
    path = _create_sink(eng, "sset_sink_d")
    eng.sql(
        "INSERT INTO sset_sink_d SELECT n_regionkey, COUNT(*) AS cnt"
        " FROM nation_sset GROUP BY n_regionkey"
    )
    assert spark.read.parquet(path).count() == 5
    # append mode: INSERT INTO doubles the rows
    eng.sql(
        "INSERT INTO sset_sink_d SELECT n_regionkey, COUNT(*) AS cnt"
        " FROM nation_sset GROUP BY n_regionkey"
    )
    assert spark.read.parquet(path).count() == 10
    # INSERT OVERWRITE replaces
    eng.sql(
        "INSERT OVERWRITE sset_sink_d SELECT n_regionkey, COUNT(*) AS cnt"
        " FROM nation_sset GROUP BY n_regionkey"
    )
    assert spark.read.parquet(path).count() == 5


def test_insert_into_unknown_sink_raises(eng):
    ss = eng.create_statement_set()
    ss.add_insert_sql("INSERT INTO nowhere_sset SELECT 1 AS x")
    with pytest.raises(ValueError, match="not a registered path-backed"):
        ss.execute()


def test_non_insert_statement_rejected(eng):
    with pytest.raises(ValueError, match="not an INSERT"):
        eng.create_statement_set().add_insert_sql("SELECT 1")


def test_insert_values(spark, tmp_path):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    path = str(tmp_path / "vals_sink")
    eng.sql(
        f"""CREATE TABLE vals_sink (k BIGINT, v STRING)
            WITH ('connector'='filesystem', 'path'='{path}',
                  'format'='parquet')"""
    )
    eng.sql("INSERT INTO vals_sink VALUES (1, 'a'), (2, 'b')")
    back = spark.read.parquet(path).orderBy("k").collect()
    assert [(r[0], r[1]) for r in back] == [(1, "a"), (2, "b")]


def test_csv_sink_readback_keeps_declared_types(eng, spark):
    # r9 advice: the re-exposed view used inferSchema, so a STRING column
    # holding '007' came back as INT 7 (leading zeros lost). The reader
    # must re-apply the written DataFrame's schema instead.
    path = _tmp("sset_csv_types_")
    eng.sql(
        "CREATE TABLE sset_csv_types (code STRING, n INT) WITH "
        f"('connector'='filesystem', 'path'='{path}', 'format'='csv')"
    )
    eng.sql("INSERT INTO sset_csv_types VALUES ('007', 7), ('042', 42)")
    back = spark.table("sset_csv_types")
    assert dict(back.dtypes)["code"] == "string"
    assert {r["code"] for r in back.collect()} == {"007", "042"}
