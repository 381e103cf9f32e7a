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


def test_jdbc_upsert_write_reduce_and_merge(spark):
    """TableBufferReducedStatementExecutor semantics: last change per key
    wins, +I/+U upsert, -U/-D delete — applied against existing state."""
    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.sources.jdbc import jdbc_upsert_write

    url = _url()
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    jdbc_write(base, url, "up1")
    batch = spark.createDataFrame(
        [
            ("+U", 1, "a1"),
            ("+U", 1, "a2"),   # same key twice — only a2 survives
            ("-D", 2, None),   # delete
            ("+I", 4, "d"),    # new key
            ("+I", 5, "tmp"),
            ("-D", 5, None),   # insert then delete in one batch → gone
        ],
        f"{ROW_KIND} string, k bigint, v string",
    ).coalesce(1)
    jdbc_upsert_write(batch, url, "up1", ["k"], row_kind_col=ROW_KIND)
    got = {
        r["k"]: r["v"] for r in jdbc_read(spark, url, "up1").collect()
    }
    assert got == {1: "a2", 3: "c", 4: "d"}


def test_jdbc_upsert_write_creates_missing_table(spark):
    from flink_1_12_2_spark.sources.jdbc import jdbc_upsert_write

    url = _url()
    df = spark.createDataFrame([(1, "x"), (1, "y")], "k bigint, v string")
    jdbc_upsert_write(df.coalesce(1), url, "up2", ["k"])
    got = jdbc_read(spark, url, "up2").collect()
    assert len(got) == 1 and got[0]["v"] == "y"


def test_jdbc_pk_table_sql_insert_upserts(spark, tmp_path):
    """INSERT INTO a jdbc table declared with a PRIMARY KEY goes through
    the key-aware executor: repeated inserts of the same key upsert."""
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.jdbc import derby_url

    eng = EngineSession(spark)
    url = derby_url(str(tmp_path / "upsert_db"))
    eng.sql(
        f"""CREATE TABLE jup (k BIGINT, v STRING,
                PRIMARY KEY (k) NOT ENFORCED) WITH (
            'connector'='jdbc', 'url'='{url}', 'table-name'='remote_up')"""
    )
    eng.sql("INSERT INTO jup VALUES (1, 'a'), (2, 'b')")
    eng.sql("INSERT INTO jup VALUES (1, 'a9'), (3, 'c')")
    got = {r["k"]: r["v"] for r in spark.table("jup").collect()}
    assert got == {1: "a9", 2: "b", 3: "c"}


def test_jdbc_changelog_into_appendonly_rejected(spark, tmp_path):
    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.jdbc import derby_url

    import pytest

    eng = EngineSession(spark)
    url = derby_url(str(tmp_path / "app_db"))
    eng.sql(
        f"""CREATE TABLE japp (k BIGINT, v STRING) WITH (
            'connector'='jdbc', 'url'='{url}', 'table-name'='remote_app')"""
    )
    ch = spark.createDataFrame(
        [("+I", 1, "a"), ("-D", 1, None)],
        f"{ROW_KIND} string, k bigint, v string",
    )
    ch.createOrReplaceTempView("ch_src")
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        eng.sql("INSERT INTO japp SELECT * FROM ch_src")


def test_jdbc_lookup_options_validation():
    from flink_1_12_2_spark.operators.lookup import (
        parse_jdbc_lookup_options,
        _parse_duration_sec,
    )

    import pytest

    assert parse_jdbc_lookup_options(None) == (None, None, 3)
    assert parse_jdbc_lookup_options(
        {"lookup.cache.max-rows": "100", "lookup.cache.ttl": "10s",
         "lookup.max-retries": "1"}
    ) == (100, 10.0, 1)
    with pytest.raises(ValueError, match="all or none"):
        parse_jdbc_lookup_options({"lookup.cache.max-rows": "100"})
    with pytest.raises(ValueError, match="max-retries"):
        parse_jdbc_lookup_options({"lookup.max-retries": "-1"})
    assert _parse_duration_sec("500ms") == 0.5
    assert _parse_duration_sec("2min") == 120.0
    assert _parse_duration_sec("1h") == 3600.0


def test_jdbc_lookup_join_uncached_sees_updates(spark):
    """No lookup.cache.* → every lookup re-reads the store (Flink's
    uncached per-record SELECT freshness)."""
    from flink_1_12_2_spark.operators.lookup import lookup_join_jdbc

    url = _url()
    jdbc_write(
        spark.createDataFrame([(1, "old")], "k bigint, name string"),
        url, "dim1",
    )
    facts = spark.createDataFrame([(10, 1)], "fid bigint, fk bigint")
    got1 = lookup_join_jdbc(facts, url, "dim1", "fk", "k").collect()
    assert got1[0]["name"] == "old"
    jdbc_write(
        spark.createDataFrame([(1, "new")], "k bigint, name string"),
        url, "dim1", mode="overwrite",
    )
    got2 = lookup_join_jdbc(facts, url, "dim1", "fk", "k").collect()
    assert got2[0]["name"] == "new"


def test_jdbc_lookup_join_cache_ttl(spark):
    """With the cache on, the snapshot holds until lookup.cache.ttl."""
    from flink_1_12_2_spark.operators import lookup as lk

    url = _url()
    jdbc_write(
        spark.createDataFrame([(1, "v1")], "k bigint, name string"),
        url, "dim2",
    )
    facts = spark.createDataFrame([(10, 1)], "fid bigint, fk bigint")
    opts = {"lookup.cache.max-rows": "1000", "lookup.cache.ttl": "10min"}
    assert (
        lk.lookup_join_jdbc(facts, url, "dim2", "fk", "k", options=opts)
        .collect()[0]["name"]
        == "v1"
    )
    jdbc_write(
        spark.createDataFrame([(1, "v2")], "k bigint, name string"),
        url, "dim2", mode="overwrite",
    )
    # inside the TTL: the stale snapshot is served
    assert (
        lk.lookup_join_jdbc(facts, url, "dim2", "fk", "k", options=opts)
        .collect()[0]["name"]
        == "v1"
    )
    # force expiry (simulate the TTL elapsing) → re-read
    key = (url, "dim2")
    df, ts, n = lk._JDBC_LOOKUP_CACHE[key]
    lk._JDBC_LOOKUP_CACHE[key] = (df, ts - 601, n)
    assert (
        lk.lookup_join_jdbc(facts, url, "dim2", "fk", "k", options=opts)
        .collect()[0]["name"]
        == "v2"
    )


def test_jdbc_lookup_max_rows_disables_broadcast(spark):
    from flink_1_12_2_spark.operators.lookup import jdbc_lookup_snapshot

    url = _url()
    jdbc_write(spark.range(50).selectExpr("id AS k"), url, "dim3")
    _, bc_ok = jdbc_lookup_snapshot(
        spark, url, "dim3",
        options={"lookup.cache.max-rows": "100",
                 "lookup.cache.ttl": "10min"},
    )
    assert bc_ok is True
    _, bc_big = jdbc_lookup_snapshot(
        spark, url, "dim3",
        options={"lookup.cache.max-rows": "10",
                 "lookup.cache.ttl": "0ms"},
    )
    assert bc_big is False


def test_jdbc_lookup_sql_front_door(spark, tmp_path):
    """JOIN dim FOR SYSTEM_TIME AS OF f.proctime against a jdbc table
    routes to the lookup join (current-snapshot semantics)."""
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.jdbc import derby_url

    eng = EngineSession(spark)
    url = derby_url(str(tmp_path / "lk_db"))
    jdbc_write(
        spark.createDataFrame(
            [(1, "EUR"), (2, "USD")], "cid bigint, currency string"
        ),
        url, "rates",
    )
    eng.sql(
        f"""CREATE TABLE rates (cid BIGINT, currency STRING) WITH (
            'connector'='jdbc', 'url'='{url}', 'table-name'='rates')"""
    )
    spark.createDataFrame(
        [(100, 1), (101, 2), (102, 1)],
        "order_id bigint, cid bigint",
    ).selectExpr("*", "current_timestamp() AS proctime") \
        .createOrReplaceTempView("orders_pt")
    out = eng.sql(
        """SELECT o.order_id, r.currency FROM orders_pt AS o
           JOIN rates FOR SYSTEM_TIME AS OF o.proctime AS r
           ON o.cid = r.cid ORDER BY o.order_id"""
    ).collect()
    assert [(r["order_id"], r["currency"]) for r in out] == [
        (100, "EUR"), (101, "USD"), (102, "EUR"),
    ]
