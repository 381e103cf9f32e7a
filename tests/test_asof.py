"""Unit tests for the as-of join operator on tiny hand-checkable data
(mirrors the reference's TemporalJoinITCase fixture style)."""

from __future__ import annotations

import datetime as dt

from flink_1_12_2_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (1, _ts("2024-01-01 12:00:00"), "b"),
            (2, _ts("2024-01-01 11:00:00"), "c"),
            (3, _ts("2024-01-01 11:00:00"), "d"),  # key with no right rows
        ],
        "k int, t timestamp, payload string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 100.0),
            (1, _ts("2024-01-01 11:00:00"), 200.0),
            (2, _ts("2024-01-01 11:00:00"), 300.0),  # same instant
            (2, _ts("2024-01-01 12:00:00"), 400.0),
        ],
        "rk int, rt timestamp, price double",
    )
    out = asof_join(left, right, "k", "rk", "t", "rt")
    got = {(r.k, r.payload): (r.rt, r.price) for r in out.collect()}
    assert got[(1, "a")] == (_ts("2024-01-01 09:00:00"), 100.0)
    assert got[(1, "b")] == (_ts("2024-01-01 11:00:00"), 200.0)
    # <= semantics: same-instant right row matches
    assert got[(2, "c")] == (_ts("2024-01-01 11:00:00"), 300.0)
    assert got[(3, "d")] == (None, None)


def test_asof_strict(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 11:00:00"), "x")], "k int, t timestamp, payload string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 1.0),
            (1, _ts("2024-01-01 11:00:00"), 2.0),
        ],
        "rk int, rt timestamp, price double",
    )
    out = asof_join(left, right, "k", "rk", "t", "rt", strict=True).collect()
    assert out[0].price == 1.0  # strict: same-instant row excluded


def test_temporal_table_function_rates(spark):
    """The classic 1.12 Rates example: comma-join LATERAL TABLE(Rates(ts))
    lowered to the same temporal join as FOR SYSTEM_TIME."""
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    spark.createDataFrame(
        [
            ("EUR", 114, "2020-01-01 10:00:00"),
            ("EUR", 116, "2020-01-01 11:00:00"),
            ("USD", 100, "2020-01-01 10:00:00"),
        ],
        "r_currency string, r_rate bigint, r_ts string",
    ).selectExpr(
        "r_currency", "r_rate", "CAST(r_ts AS TIMESTAMP) AS r_ts"
    ).createOrReplaceTempView("rates_history")
    spark.createDataFrame(
        [
            (1, "EUR", 2, "2020-01-01 10:30:00"),
            (2, "EUR", 3, "2020-01-01 11:30:00"),
            (3, "USD", 5, "2020-01-01 10:30:00"),
        ],
        "o_id bigint, o_currency string, o_amount bigint, o_ts string",
    ).selectExpr(
        "o_id", "o_currency", "o_amount", "CAST(o_ts AS TIMESTAMP) AS o_ts"
    ).createOrReplaceTempView("orders_t")
    eng.create_temporal_table_function(
        "Rates", "rates_history", time_attr="r_ts", primary_key="r_currency"
    )
    out = eng.sql(
        """SELECT o.o_id, o.o_amount, r.r_rate
           FROM orders_t AS o, LATERAL TABLE (Rates(o.o_ts)) AS r
           WHERE o.o_currency = r.r_currency ORDER BY o.o_id"""
    ).collect()
    # order 1 sees the 10:00 EUR rate (114), order 2 the 11:00 one (116)
    assert [(r["o_id"], r["r_rate"]) for r in out] == [
        (1, 114), (2, 116), (3, 100),
    ]


def test_temporal_table_function_requires_pk_equality(spark):
    from flink_1_12_2_spark.session import EngineSession

    import pytest

    eng = EngineSession(spark)
    spark.createDataFrame(
        [("EUR", 1, "2020-01-01 10:00:00")],
        "r_currency string, r_rate bigint, r_ts string",
    ).selectExpr(
        "r_currency", "r_rate", "CAST(r_ts AS TIMESTAMP) AS r_ts"
    ).createOrReplaceTempView("rates_h2")
    spark.createDataFrame(
        [(1, "EUR", "2020-01-01 10:30:00")],
        "o_id bigint, o_currency string, o_ts string",
    ).selectExpr(
        "o_id", "o_currency", "CAST(o_ts AS TIMESTAMP) AS o_ts"
    ).createOrReplaceTempView("orders_t2")
    eng.create_temporal_table_function(
        "Rates2", "rates_h2", time_attr="r_ts", primary_key="r_currency"
    )
    with pytest.raises(ValueError, match="primary key"):
        eng.sql(
            """SELECT o.o_id FROM orders_t2 AS o,
               LATERAL TABLE (Rates2(o.o_ts)) AS r
               WHERE o.o_id = r.r_rate"""
        )


def test_table_api_temporal_table_function(spark):
    """Table.createTemporalTableFunction → register → LATERAL TABLE:
    the full Table-API route (Table.java:115)."""
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.table_api import Table

    eng = EngineSession(spark)
    rates = Table(
        spark.createDataFrame(
            [("EUR", 2, "2020-01-01 10:00:00")],
            "r_cur string, r_rate bigint, r_ts string",
        ).selectExpr("r_cur", "r_rate", "CAST(r_ts AS TIMESTAMP) AS r_ts")
    )
    ttf = rates.create_temporal_table_function("r_ts", "r_cur")
    eng.create_temporal_table_function("RatesApi", ttf)
    spark.createDataFrame(
        [(1, "EUR", "2020-01-01 10:30:00")],
        "o_id bigint, o_cur string, o_ts string",
    ).selectExpr(
        "o_id", "o_cur", "CAST(o_ts AS TIMESTAMP) AS o_ts"
    ).createOrReplaceTempView("orders_api")
    out = eng.sql(
        """SELECT o.o_id, r.r_rate FROM orders_api AS o,
           LATERAL TABLE (RatesApi(o.o_ts)) AS r
           WHERE o.o_cur = r.r_cur"""
    ).collect()
    assert [(r["o_id"], r["r_rate"]) for r in out] == [(1, 2)]


def test_table_api_execute_insert_and_explain(spark, tmp_path):
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.table_api import Table

    eng = EngineSession(spark)
    path = str(tmp_path / "sink_api")
    eng.sql(
        f"""CREATE TABLE api_sink (k BIGINT, v STRING) WITH (
            'connector'='filesystem', 'path'='{path}',
            'format'='parquet')"""
    )
    t = Table(spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"))
    res = t.execute_insert(eng, "api_sink")
    assert res.collect()[0][1] == 2
    assert spark.table("api_sink").count() == 2
    plan = t.explain()
    assert "Physical Plan" in plan or "LocalTableScan" in plan
