"""DDL front door + Table API unit tests (WATERMARK clause, type mapping,
error paths, fluent set ops)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from flink_1_12_2_spark.sql.ddl import parse_create_table
from flink_1_12_2_spark.table_api import Table


def test_parse_create_table_with_watermark():
    name, schema, meta, part = parse_create_table(
        """CREATE TABLE ev (
             event_id BIGINT, ts TIMESTAMP(3), user_id BIGINT, value DOUBLE,
             WATERMARK FOR ts AS ts - INTERVAL '10' MINUTE
           ) PARTITIONED BY (user_id)
           WITH ('connector'='filesystem', 'path'='/x', 'format'='parquet')"""
    )
    assert name == "ev"
    assert meta.event_time_col == "ts"
    assert meta.watermark_delay == "10 minutes"
    assert meta.path == "/x" and meta.fmt == "parquet"
    assert part == ("user_id",)
    assert "ts timestamp_ntz" in schema  # Flink TIMESTAMP = no time zone


def test_parse_create_table_decimal_and_errors():
    _, schema, _, _ = parse_create_table(
        "CREATE TABLE t (a DECIMAL(12,2), b STRING) "
        "WITH ('connector'='filesystem','path'='/x')"
    )
    assert "a decimal(12,2)" in schema
    with pytest.raises(ValueError, match="connector"):
        parse_create_table(
            "CREATE TABLE t (a INT) WITH ('connector'='kafka','path'='/x')"
        )
    with pytest.raises(ValueError):
        parse_create_table("CREATE VIEW nope AS SELECT 1")


def test_ddl_watermark_reaches_stream(spark, sf_dir):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    # register events via DDL with a watermark, then open it as a stream
    eng.sql(
        f"""CREATE TABLE ev_ddl (
              event_id BIGINT, ts TIMESTAMP_LTZ, user_id BIGINT,
              event_type STRING, value DOUBLE, props STRING,
              WATERMARK FOR ts AS ts - INTERVAL '5' MINUTE
            ) WITH ('connector'='filesystem',
                    'path'='{sf_dir}/events.parquet', 'format'='parquet')"""
    )
    meta = eng.meta("ev_ddl")
    assert meta.event_time_col == "ts" and meta.watermark_delay == "5 minutes"


def test_table_api_set_ops_and_joins(spark, sf_dir):
    from flink_1_12_2_spark.registry import load

    c = Table(load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")))
    s = Table(load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")))
    u = c.union(s).to_data_frame().count()
    i = c.intersect(s).to_data_frame().count()
    assert u >= i
    joined = (
        Table(load(spark, sf_dir, "nation"))
        .join(
            Table(load(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_name", "r_name")
        .order_by("n_name")
        .fetch(5)
        .to_data_frame()
    )
    assert joined.count() == 5


def test_table_api_window(spark, sf_dir):
    from flink_1_12_2_spark.registry import load

    t = Table(load(spark, sf_dir, "events"))
    out = (
        t.window_tumble("ts", "1 hour", "event_type")
        .select(F.count(F.lit(1)).alias("cnt"))
        .to_data_frame()
    )
    assert {"window_start", "window_end", "event_type", "cnt"} <= set(out.columns)
    assert out.count() > 0
