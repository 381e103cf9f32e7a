"""JDBC connector tests against embedded Derby (live round-trips, no
external database): write modes, partitioned scans, filter pushdown."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F

from flink_1_12_2_spark.sources.jdbc import derby_url, jdbc_read, jdbc_write


def _url():
    return derby_url(tempfile.mkdtemp(prefix="derby_t_") + "/db")


def test_roundtrip_and_partitioned_scan(spark):
    df = spark.range(100).selectExpr("id", "id * 1.5 AS v")
    url = _url()
    jdbc_write(df, url, "t1")
    back = jdbc_read(
        spark, url, "t1", partition_column="id",
        num_partitions=4, lower_bound=0, upper_bound=100,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg(F.sum("v")).collect()[0][0] == sum(i * 1.5 for i in range(100))


def test_append_mode(spark):
    df = spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    url = _url()
    jdbc_write(df, url, "t2")
    jdbc_write(df, url, "t2", mode="append")
    assert jdbc_read(spark, url, "t2").count() == 20


def test_filter_pushdown_reaches_remote(spark):
    df = spark.range(50).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    url = _url()
    jdbc_write(df, url, "t3")
    flt = jdbc_read(spark, url, "t3").filter(F.col("id") >= 40)
    # JDBC V1 relation compiles pushed filters into the remote WHERE clause
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "id" in plan
    assert flt.count() == 10


def test_jdbc_connector_ddl_front_door(spark, tmp_path):
    """CREATE TABLE ... WITH ('connector'='jdbc', 'url'=..., 
    'table-name'=...) — JdbcDynamicTableFactory option surface over the
    embedded Derby engine: sink-first registration (remote table created
    by the first INSERT), scan after, partitioned scan options."""
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.jdbc import derby_url

    eng = EngineSession(spark)
    url = derby_url(str(tmp_path / "ddl_db"))
    eng.sql(
        f"""CREATE TABLE jt (k BIGINT, v STRING) WITH (
              'connector' = 'jdbc', 'url' = '{url}',
              'table-name' = 'T_DDL')"""
    )
    res = eng.sql("INSERT INTO jt VALUES (1, 'a'), (2, 'b')")
    assert res.first()["rows_written"] == 2
    got = {r["k"]: r["v"] for r in eng.sql("SELECT * FROM jt").collect()}
    assert got == {1: "a", 2: "b"}
    eng.sql("INSERT INTO jt VALUES (3, 'c')")
    assert eng.sql("SELECT COUNT(*) AS n FROM jt").first()["n"] == 3
    # partitioned scan options register and read the same rows
    eng.sql(
        f"""CREATE TABLE jtp (k BIGINT, v STRING) WITH (
              'connector' = 'jdbc', 'url' = '{url}',
              'table-name' = 'T_DDL',
              'scan.partition.column' = 'k',
              'scan.partition.num' = '2',
              'scan.partition.lower-bound' = '1',
              'scan.partition.upper-bound' = '4')"""
    )
    assert eng.sql("SELECT COUNT(*) AS n FROM jtp").first()["n"] == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bounded"):
        eng.stream_table("jt")
