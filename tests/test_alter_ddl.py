"""The remaining ALTER statements of the reference SQL parser
(flink-sql-parser/.../ddl/): Add/DropPartitions, Add/DropConstraint,
AddReplaceColumns, ChangeColumn, AlterDatabase, AlterViewProperties.

Partition lifecycle works on real directories; schema evolution works on
the READ path (the registered view re-shapes, files are never touched —
parquet resolves by name, so renames/retypes/additions are view-level)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def eng(spark, tmp_path):
    from flink_1_12_2_spark.session import EngineSession, TableMeta

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id bigint, name string, v double"
    ).withColumn("dt", F.lit("2021-01-01")).write.partitionBy("dt").parquet(
        path
    )
    spark.createDataFrame(
        [(3, "c", 30.0)], "id bigint, name string, v double"
    ).withColumn("dt", F.lit("2021-01-02")).write.mode("append").partitionBy(
        "dt"
    ).parquet(path)
    e = EngineSession(spark)
    e.register_table("t_alter", TableMeta(path=path))
    return e


def _sql(e, s):
    from flink_1_12_2_spark.sql.ddl import execute_statement

    return execute_statement(e, s)


def test_add_and_drop_partition(eng):
    _sql(eng, "ALTER TABLE t_alter ADD PARTITION (dt='2021-01-03')")
    parts = [
        r["partition"]
        for r in _sql(eng, "SHOW PARTITIONS t_alter").collect()
    ]
    assert parts == ["dt=2021-01-01", "dt=2021-01-02", "dt=2021-01-03"]
    with pytest.raises(ValueError, match="already exists"):
        _sql(eng, "ALTER TABLE t_alter ADD PARTITION (dt='2021-01-03')")
    _sql(
        eng,
        "ALTER TABLE t_alter ADD IF NOT EXISTS PARTITION (dt='2021-01-03')",
    )
    _sql(eng, "ALTER TABLE t_alter DROP PARTITION (dt='2021-01-02')")
    assert eng.spark.table("t_alter").count() == 2  # the 3rd row is gone
    with pytest.raises(ValueError, match="does not exist"):
        _sql(eng, "ALTER TABLE t_alter DROP PARTITION (dt='2021-01-09')")
    _sql(
        eng, "ALTER TABLE t_alter DROP IF EXISTS PARTITION (dt='2021-01-09')"
    )


def test_add_and_drop_constraint(eng):
    _sql(
        eng,
        "ALTER TABLE t_alter ADD CONSTRAINT pk PRIMARY KEY (id) NOT ENFORCED",
    )
    assert eng.meta("t_alter").primary_key == ("id",)
    _sql(eng, "ALTER TABLE t_alter DROP CONSTRAINT pk")
    assert eng.meta("t_alter").primary_key == ()


def test_add_columns_null_backfill(eng):
    _sql(eng, "ALTER TABLE t_alter ADD COLUMNS (score DECIMAL(10,2), tag STRING)")
    df = eng.spark.table("t_alter")
    assert dict(df.dtypes)["score"] == "decimal(10,2)"
    assert df.filter(F.col("tag").isNull()).count() == df.count()


def test_change_column_rename_and_retype(eng):
    _sql(eng, "ALTER TABLE t_alter CHANGE COLUMN v score BIGINT")
    df = eng.spark.table("t_alter")
    assert "v" not in df.columns and dict(df.dtypes)["score"] == "bigint"
    assert sorted(r["score"] for r in df.collect()) == [10, 20, 30]


def test_replace_columns_positional(eng):
    # positional hive semantics: (id,name,v,dt) -> renamed/retyped in place
    _sql(
        eng,
        "ALTER TABLE t_alter REPLACE COLUMNS "
        "(k BIGINT, label STRING, amount BIGINT, day STRING, extra INT)",
    )
    df = eng.spark.table("t_alter")
    assert df.columns == ["k", "label", "amount", "day", "extra"]
    row = df.orderBy("k").first()
    assert (row["k"], row["label"], row["amount"]) == (1, "a", 10)
    assert row["extra"] is None


def test_alter_database_and_view_properties(eng):
    _sql(eng, "ALTER DATABASE default SET ('owner'='me', 'tier'='gold')")
    assert eng._db_props["default"] == {"owner": "me", "tier": "gold"}
    eng.spark.range(1).createOrReplaceTempView("v_props")
    _sql(eng, "ALTER VIEW v_props SET ('comment'='hello')")
    assert eng._view_props["v_props"] == {"comment": "hello"}


def test_alter_database_and_view_require_existence(eng):
    """GenericInMemoryCatalog.alterDatabase throws DatabaseNotExist for
    unknown names (and the view path ViewNotExist) — typos must not
    silently create fresh property bags."""
    import pytest

    with pytest.raises(ValueError, match="does not exist"):
        _sql(eng, "ALTER DATABASE no_such_db SET ('owner'='me')")
    assert "no_such_db" not in eng._db_props
    with pytest.raises(ValueError, match="does not exist"):
        _sql(eng, "ALTER VIEW no_such_view SET ('comment'='x')")
    assert "no_such_view" not in eng._view_props


def test_create_table_like_merge_strategies(eng, spark, sf_dir):
    """SqlTableLike merging strategies: EXCLUDING OPTIONS/WATERMARKS/
    CONSTRAINTS drop the corresponding inherited feature; defaults
    inherit everything (the r3 behavior)."""
    import os

    from flink_1_12_2_spark.session import TableMeta

    base_path = os.path.join(sf_dir, "events.parquet")
    eng.register_table(
        "ev_like_base",
        TableMeta(
            path=base_path,
            event_time_col="ts",
            watermark_delay="10 minutes",
            primary_key=("event_id",),
            options={"mergeSchema": "false"},
        ),
    )
    eng.sql("CREATE TABLE ev_like_all LIKE ev_like_base")
    m = eng.meta("ev_like_all")
    assert m.primary_key == ("event_id",) and m.event_time_col == "ts"
    assert m.options == {"mergeSchema": "false"}
    eng.sql(
        "CREATE TABLE ev_like_bare LIKE ev_like_base "
        "(EXCLUDING OPTIONS, EXCLUDING WATERMARKS, EXCLUDING CONSTRAINTS)"
    )
    m = eng.meta("ev_like_bare")
    assert m.primary_key == () and m.event_time_col is None
    assert m.options == {}
    eng.sql("CREATE TABLE ev_like_none LIKE ev_like_base (EXCLUDING ALL)")
    m = eng.meta("ev_like_none")
    assert m.primary_key == () and m.watermark_delay is None
