"""Hive-catalog shim: CREATE CATALOG ... WITH ('type'='hive') maps onto a
persistent Spark-session-catalog database (HiveCatalog.java parity — the
defining behavior is that tables OUTLIVE the TableEnvironment, unlike
GenericInMemoryCatalog temp views)."""

from __future__ import annotations

import pytest


@pytest.fixture
def hive_engine(spark, tmp_path):
    from flink_1_12_2_spark.session import EngineSession

    engine = EngineSession(spark)
    engine.sql(
        f"CREATE CATALOG hcat WITH ('type'='hive', "
        f"'warehouse'='{(tmp_path / 'wh').as_posix()}')"
    )
    engine.sql("USE CATALOG hcat")
    try:
        yield engine, tmp_path
    finally:
        engine.sql("USE CATALOG default_catalog")
        spark.sql("DROP TABLE IF EXISTS hcat.hv_orders")
        spark.sql("DROP DATABASE IF EXISTS hcat CASCADE")


def test_hive_catalog_create_insert_select(hive_engine):
    engine, tmp_path = hive_engine
    loc = (tmp_path / "hv_orders").as_posix()
    engine.sql(
        f"""CREATE TABLE hv_orders (item STRING, qty INT)
            WITH ('connector'='filesystem', 'path'='{loc}',
                  'format'='parquet')"""
    )
    engine.sql("INSERT INTO hv_orders VALUES ('bolt', 7), ('nut', 2)")
    rows = engine.sql("SELECT item, qty FROM hv_orders ORDER BY qty").collect()
    assert [(r["item"], r["qty"]) for r in rows] == [("nut", 2), ("bolt", 7)]
    # SHOW TABLES lists it from the session catalog, not the registry
    shown = {r[0] for r in engine.sql("SHOW TABLES").collect()}
    assert "hv_orders" in shown


def test_hive_catalog_tables_outlive_engine_session(hive_engine):
    engine, tmp_path = hive_engine
    loc = (tmp_path / "hv_orders").as_posix()
    engine.sql(
        f"""CREATE TABLE hv_orders (item STRING, qty INT)
            WITH ('connector'='filesystem', 'path'='{loc}',
                  'format'='parquet')"""
    )
    engine.sql("INSERT INTO hv_orders VALUES ('bolt', 7)")

    # a brand-new TableEnvironment: the in-memory registry is empty, but
    # the hive catalog's table is still there via the Spark catalog
    from flink_1_12_2_spark.session import EngineSession

    fresh = EngineSession(engine.spark)
    assert "hv_orders" not in fresh._tables
    got = fresh.sql("SELECT item, qty FROM hcat.hv_orders").collect()
    assert [(r["item"], r["qty"]) for r in got] == [("bolt", 7)]


def test_generic_in_memory_catalog_unchanged(spark):
    from flink_1_12_2_spark.session import EngineSession

    engine = EngineSession(spark)
    engine.sql("CREATE CATALOG mem1")
    engine.sql("USE CATALOG mem1")
    try:
        cur = engine.sql("SHOW CURRENT CATALOG").collect()[0][0]
        assert cur == "mem1"
        # unknown external type still refuses loudly
        with pytest.raises(ValueError, match="external services"):
            engine.sql("CREATE CATALOG bad WITH ('type'='iceberg')")
    finally:
        engine.sql("USE CATALOG default_catalog")
