"""Batch coverage round 2: JSON/map access, posexplode (Correlate w/
ordinality), explicit GROUPING SETS + GROUPING(), MULTISET/COLLECT aggregate,
FIRST/LAST_VALUE-by-order aggregate, the Flink-SQL front door, and the
udf/udtf/udaf surface.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_12_2_spark.functions.udf import explode_rows, udaf, udf, udtf
from flink_1_12_2_spark.registry import load, query
from flink_1_12_2_spark.sql.rewriter import rewrite


@query(
    "unnest_map_json",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT event_type,
           CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10 AS INT) AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ev GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("batch", "json", "functions"),
)
def unnest_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field access on a string column (Flink JSON value functions /
    STR_TO_MAP family parity via get_json_object)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type", F.floor(k / 10).cast("int").alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("event_type", "k_bucket")
    )


@query(
    "unnest_posexplode",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      FROM documents WHERE doc_id <= 20)
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, t[i] AS token
    FROM toks, unnest(generate_series(1, len(t))) AS u(i)
    ORDER BY doc_id, pos
    """,
    tags=("batch", "unnest", "correlate"),
)
def unnest_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST WITH ORDINALITY (posexplode) — Correlate parity."""
    from flink_1_12_2_spark.llm.text import tokens

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 20)
    return (
        d.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token"))
        .orderBy("doc_id", "pos")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(r_name, '-') AS region_name,
           COALESCE(n_name, '-') AS nation_name,
           CAST(GROUPING(r_name) AS INT) AS g_region,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           CAST(COUNT(*) AS BIGINT) AS suppliers
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), ())
    ORDER BY region_name, nation_name, g_region
    """,
    tags=("batch", "agg", "groupingsets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() flags, via Spark SQL
    (DecomposeGroupingSetsRule → Expand parity)."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).createOrReplaceTempView("snr_gs")
    return spark.sql(
        """
        SELECT COALESCE(r_name, '-') AS region_name,
               COALESCE(n_name, '-') AS nation_name,
               CAST(GROUPING(r_name) AS INT) AS g_region,
               CAST(GROUPING(n_name) AS INT) AS g_nation,
               COUNT(*) AS suppliers
        FROM snr_gs
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        ORDER BY region_name, nation_name, g_region
        """
    )


@query(
    "agg_multiset_collect",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2)
    SELECT l_returnflag,
           STRING_AGG(l_linestatus || ':' || cnt, ',' ORDER BY l_linestatus)
             AS status_multiset
    FROM c GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("batch", "agg", "multiset"),
)
def agg_multiset_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET / COLLECT aggregate (Flink CollectAggFunction: element→count
    map), serialized deterministically as sorted 'value:count' pairs."""
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        counts.groupBy("l_returnflag")
        .agg(
            F.concat_ws(
                ",",
                F.array_sort(
                    F.collect_list(F.concat_ws(":", "l_linestatus", "cnt"))
                ),
            ).alias("status_multiset")
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_last_value_by_time",
    oracle="""
    SELECT o_orderpriority,
           (MAX(struct_pack(d := o_orderdate, k := o_orderkey))).d AS last_date,
           CAST((MAX(struct_pack(d := o_orderdate, k := o_orderkey))).k AS BIGINT)
             AS last_orderkey,
           (MIN(struct_pack(d := o_orderdate, k := o_orderkey))).d AS first_date,
           CAST((MIN(struct_pack(d := o_orderdate, k := o_orderkey))).k AS BIGINT)
             AS first_orderkey
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("batch", "agg", "firstlast"),
)
def agg_last_value_by_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE aggregates with explicit time order (Flink
    FirstValue/LastValueAggFunction) — deterministic via struct extremum
    (ties broken by orderkey, identically in both engines)."""
    o = load(spark, sf_dir, "orders")
    s = F.struct(F.col("o_orderdate").alias("d"), F.col("o_orderkey").alias("k"))
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.max(s).getField("d").alias("last_date"),
            F.max(s).getField("k").alias("last_orderkey"),
            F.min(s).getField("d").alias("first_date"),
            F.min(s).getField("k").alias("first_orderkey"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "sql_front_door_tumble",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(value) AS DOUBLE) AS total_value
    FROM ev GROUP BY 1 ORDER BY 1
    """,
    tags=("batch", "sql", "window", "rewriter"),
)
def sql_front_door_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink-dialect SQL (TUMBLE group window) through the rewrite pass →
    spark.sql — the engine's SQL front door end-to-end."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_fd")
    q = rewrite(
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS ws, "
        "COUNT(*) AS cnt, SUM(`value`) AS total_value "
        "FROM events_fd GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
    )
    return spark.sql(q).orderBy("ws")


@query(
    "udf_surface",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(l_extendedprice * (1 - l_discount) * l_quantity)
                / SUM(l_quantity) AS DOUBLE) AS weighted_avg_price,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("batch", "udf", "udaf"),
)
def udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The udf/udaf surface: Arrow-vectorized scalar UDF feeding a pandas
    GROUPED_AGG UDAF (pyflink.table.udf parity; quantity-weighted avg of
    discounted price)."""

    @udf("double", func_type="pandas")
    def discounted(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    @udaf("double")
    def weighted_avg(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    @udaf("long")
    def n_rows(v: pd.Series) -> int:
        # Spark disallows mixing pandas GROUPED_AGG with builtin aggregates
        # in one agg() — so the count is a pandas UDAF too
        return int(len(v))

    li = load(spark, sf_dir, "lineitem")
    return (
        li.withColumn("disc_price", discounted("l_extendedprice", "l_discount"))
        .groupBy("l_returnflag")
        .agg(
            weighted_avg("disc_price", "l_quantity").alias("weighted_avg_price"),
            n_rows("l_quantity").alias("cnt"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "udtf_surface",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
      FROM documents WHERE doc_id <= 10)
    SELECT doc_id, t[i] AS word, CAST(length(t[i]) AS INT) AS wlen
    FROM toks, unnest(generate_series(1, len(t))) AS u(i)
    ORDER BY doc_id, i
    """,
    tags=("batch", "udf", "udtf", "correlate"),
)
def udtf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The udtf surface: one-to-many table function + lateral explode
    (TableFunction / Correlate parity)."""

    @udtf("word string, wlen int")
    def split_words(text: str):
        for w in (text or "").split():
            yield (w, len(w))

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 10)
    return (
        d.select("doc_id", explode_rows(split_words(F.col("text"))).alias("r"))
        .select("doc_id", "r.word", "r.wlen")
    )


@query(
    "join_skew_salted",
    oracle="""
    WITH dim AS (SELECT DISTINCT l_returnflag AS rf FROM lineitem)
    SELECT d.rf, CAST(COUNT(*) AS BIGINT) AS rows_joined,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS qty
    FROM lineitem l JOIN dim d ON l.l_returnflag = d.rf
    GROUP BY d.rf ORDER BY d.rf
    """,
    tags=("batch", "join", "skew"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join on an extremely skewed key (3 distinct values over the
    whole fact table): big side salted 8 ways, small side replicated 8x —
    row-identical to the plain join, verified by the unsalted oracle."""
    from flink_1_12_2_spark.operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    dim = li.select(F.col("l_returnflag").alias("rf")).distinct()
    j = salted_join(li, dim, "l_returnflag", "rf", num_salts=8)
    return (
        j.groupBy("rf")
        .agg(
            F.count(F.lit(1)).alias("rows_joined"),
            F.sum("l_quantity").alias("qty"),
        )
        .orderBy("rf")
    )


@query(
    "datastream_api_pipeline",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(value * 2.0) AS DOUBLE) AS doubled_total
    FROM ev WHERE value > 10.0
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("batch", "datastream", "api"),
)
def datastream_api_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataStream fluent surface end-to-end:
    env.from_table → filter → map → key_by → window(Tumble) → aggregate
    (DataStream.java map/keyBy/window/aggregate parity)."""
    from flink_1_12_2_spark.datastream import (
        StreamExecutionEnvironment,
        Tumble,
    )

    env = StreamExecutionEnvironment(spark)
    ds = (
        env.from_table(load(spark, sf_dir, "events"))
        .filter(F.col("value") > 10.0)
        .map(doubled=F.col("value") * 2.0)
        .key_by("event_type")
        .window(Tumble("1 hour"), time_col="ts")
        .aggregate(cnt=F.count(F.lit(1)), doubled_total=F.sum("doubled"))
    )
    return (
        ds.to_table()
        .select(
            F.col("win_start").cast("timestamp_ntz").alias("win_start"),
            "event_type",
            "cnt",
            "doubled_total",
        )
        .orderBy("win_start", "event_type")
    )


@query(
    "table_api_pipeline",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c_acctbal) AS DOUBLE) AS total_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
    FROM customer WHERE c_acctbal > 0.0
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("batch", "tableapi"),
)
def table_api_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table API fluent surface (TableImpl.select/filter/groupBy parity):
    Table(df).filter(...).group_by(...).select(aggregates)."""
    from flink_1_12_2_spark.table_api import Table

    t = Table(load(spark, sf_dir, "customer"))
    out = (
        t.filter(F.col("c_acctbal") > 0.0)
        .group_by("c_mktsegment")
        .select(
            F.count(F.lit(1)).alias("n"),
            F.sum("c_acctbal").alias("total_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .order_by("c_mktsegment")
    )
    return out.to_data_frame()


@query(
    "ddl_front_door",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("batch", "sql", "ddl"),
)
def ddl_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink CREATE TABLE DDL (WITH connector options + WATERMARK clause) →
    engine registry → query through the registered views
    (SqlCreateTable.java:55 / SqlWatermark.java parity)."""
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    eng.sql(
        f"""CREATE TABLE supplier_ddl (
              s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE
            ) WITH ('connector'='filesystem',
                    'path'='{sf_dir}/supplier.parquet', 'format'='parquet')"""
    )
    eng.sql(
        f"""CREATE TABLE nation_ddl (
              n_nationkey INT, n_name STRING, n_regionkey INT
            ) WITH ('connector'='filesystem',
                    'path'='{sf_dir}/nation.parquet', 'format'='parquet')"""
    )
    return eng.sql(
        """SELECT n_name, COUNT(*) AS suppliers
           FROM supplier_ddl s JOIN nation_ddl n
             ON s.s_nationkey = n.n_nationkey
           GROUP BY n_name ORDER BY n_name"""
    )


@query(
    "ddl_create_function",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                x -> x <> '')) AS BIGINT) AS n_words
    FROM documents ORDER BY doc_id
    """,
    tags=("batch", "sql", "ddl", "udf"),
)
def ddl_create_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE FUNCTION DDL front door (SqlCreateFunction.java parity): a
    dotted-path Python UDF registered via DDL, then invoked from SQL — the
    first statement a user porting Flink SQL scripts runs after CREATE
    TABLE. The UDF is an Arrow-vectorized pandas UDF
    (functions/examples.py), so the SQL-facing registration keeps the
    engine's no-row-at-a-time-Python rule."""
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    eng.register_testdata(sf_dir)
    eng.sql(
        "CREATE TEMPORARY FUNCTION word_count AS "
        "'flink_1_12_2_spark.functions.examples.word_count' LANGUAGE PYTHON"
    )
    return eng.sql(
        "SELECT doc_id, word_count(text) AS n_words FROM documents"
        " ORDER BY doc_id"
    )


@query(
    "datastream_rolling_aggs",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT user_id, event_id,
           CAST(SUM(value) OVER w AS DOUBLE)  AS sum_value,
           CAST(MIN(value) OVER w AS DOUBLE)  AS min_value,
           CAST(MAX(value) OVER w AS DOUBLE)  AS max_value
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    tags=("batch", "datastream", "api", "rolling"),
)
def datastream_rolling_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyedStream rolling aggregates (KeyedStream.sum/min/max emit a
    running value per record): cumulative over-window in event order."""
    from flink_1_12_2_spark.datastream import StreamExecutionEnvironment

    env = StreamExecutionEnvironment(spark)
    ds = (
        env.from_table(load(spark, sf_dir, "events"))
        .key_by("user_id")
        .sum("value")
    )
    ks = ds.key_by("user_id")
    ds = ks.min("value")
    ds = ds.key_by("user_id").max("value")
    return (
        ds.to_table()
        .select(
            "user_id",
            "event_id",
            F.col("sum_value").alias("sum_value"),
            F.col("min_value").alias("min_value"),
            F.col("max_value").alias("max_value"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "sql_front_door_window_tvf",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes'
             AS window_end,
           user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(value) AS DOUBLE) AS total_value
    FROM ev GROUP BY 1, 2, 3 ORDER BY window_start, user_id
    """,
    tags=("batch", "sql", "window", "tvf", "rewriter"),
)
def sql_front_door_window_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window TVF syntax (FlinkSqlOperatorTable DESCRIPTOR/TUMBLE
    polymorphic table function — the 1.12+ replacement for group windows):
    ``FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '10' MINUTE))``
    rewritten to a derived table with window() projection; window_start/
    window_end become plain grouping columns, exactly the TVF contract."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_tvf_fd")
    q = rewrite(
        "SELECT window_start, window_end, user_id, COUNT(*) AS cnt, "
        "SUM(`value`) AS total_value "
        "FROM TABLE(TUMBLE(TABLE events_tvf_fd, DESCRIPTOR(ts), "
        "INTERVAL '10' MINUTE)) "
        "GROUP BY window_start, window_end, user_id"
    )
    return spark.sql(q).orderBy("window_start", "user_id")
