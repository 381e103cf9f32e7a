"""Source/sink queries: format round-trips, partitioned writes with pruning,
datagen, and the streaming file sink (rolling + checkpoint commit)."""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_12_2_spark.registry import load, query
from flink_1_12_2_spark.sources.filesystem import datagen, read_table, write_table


def _tmp(prefix: str) -> str:
    return os.path.join(tempfile.gettempdir(), prefix + uuid.uuid4().hex[:10])


@query(
    "sink_roundtrip_csv",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(l_quantity) AS DOUBLE) AS qty,
           CAST(SUM(l_extendedprice) AS DOUBLE) AS price
    FROM lineitem WHERE l_orderkey <= 1000
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("batch", "sink", "csv"),
)
def sink_roundtrip_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink+source round-trip (filesystem connector, csv format): values
    must survive the text round-trip exactly."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    path = _tmp("csv_rt_")
    write_table(li, path, fmt="csv")
    back = read_table(spark, path, fmt="csv", schema=li.schema)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("l_quantity").alias("qty"),
            F.sum("l_extendedprice").alias("price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "sink_roundtrip_json",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(value) AS DOUBLE) AS total
    FROM ev GROUP BY event_type ORDER BY event_type
    """,
    tags=("batch", "sink", "json"),
)
def sink_roundtrip_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON sink+source round-trip (filesystem connector, json format)."""
    ev = load(spark, sf_dir, "events")
    path = _tmp("json_rt_")
    write_table(ev, path, fmt="json")
    back = read_table(spark, path, fmt="json", schema=ev.schema)
    return (
        back.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total"))
        .orderBy("event_type")
    )


@query(
    "sink_partitioned_parquet",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(o_totalprice) AS DOUBLE) AS total
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("batch", "sink", "partitioned"),
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITIONED BY write + partition-pruned read (SupportsPartitioning /
    PushPartitionIntoTableSourceScanRule parity): the filter on the partition
    column prunes directories, not rows."""
    o = load(spark, sf_dir, "orders")
    path = _tmp("part_pq_")
    write_table(o, path, fmt="parquet", partition_by=["o_orderpriority"])
    back = read_table(spark, path, fmt="parquet").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("o_totalprice").alias("total")
        )
        .orderBy("o_orderpriority")
    )


@query(
    "source_datagen",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(range * 37 % 1000) AS BIGINT) AS num_sum,
           CAST(COUNT(DISTINCT 'user_' || CAST(range % 100 AS VARCHAR)) AS BIGINT)
             AS distinct_names
    FROM range(10000)
    """,
    tags=("batch", "source", "datagen"),
)
def source_datagen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datagen dev source (DataGenTableSourceFactory.java:48 parity) —
    deterministic sequence generator."""
    g = datagen(spark, 10000, partitions=8)
    return g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("num").alias("num_sum"),
        F.countDistinct("name").alias("distinct_names"),
    )


@query(
    "stream_file_sink",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM ev GROUP BY event_type ORDER BY event_type
    """,
    tags=("streaming", "sink", "file"),
)
def stream_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming file sink with checkpoint commit (Flink StreamingFileSink
    rolling+commit parity): stream events → parquet files → read committed
    output back."""
    from flink_1_12_2_spark.streaming.core import stream_events

    ev = stream_events(spark, sf_dir).select("event_id", "event_type", "value")
    out_dir = _tmp("fsink_")
    ckpt = tempfile.mkdtemp(prefix="fsink_ckpt_")
    q = (
        ev.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out_dir)
    return (
        back.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("event_type")
    )


@query(
    "sink_roundtrip_orc",
    oracle="""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(p_retailprice) AS DOUBLE) AS total_price
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
    tags=("batch", "sink", "orc"),
)
def sink_roundtrip_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+source round-trip (filesystem connector, orc format).
    Avro is NOT registered here: this Spark distribution ships without the
    spark-avro module jar — gated, not silently skipped."""
    p = load(spark, sf_dir, "part")
    path = _tmp("orc_rt_")
    write_table(p, path, fmt="orc")
    back = read_table(spark, path, fmt="orc")
    return (
        back.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("p_retailprice").alias("total_price"),
        )
        .orderBy("p_brand")
    )


@query(
    "statement_set_multi_sink",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    d AS (SELECT user_id, CAST(ts AS DATE) AS day,
                 CAST(COUNT(*) AS BIGINT) AS cnt,
                 CAST(SUM(value) AS DOUBLE) AS total
          FROM ev GROUP BY 1, 2)
    SELECT 'hi' AS bucket, user_id, day, cnt, total FROM d WHERE cnt >= 3
    UNION ALL
    SELECT 'lo' AS bucket, user_id, day, cnt, total FROM d WHERE cnt < 3
    ORDER BY bucket, user_id, day
    """,
    tags=("batch", "sink", "statement-set", "multi-sink"),
)
def statement_set_multi_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StatementSet multi-sink execution (StatementSetImpl /
    StreamCommonSubGraphBasedOptimizer.doOptimize common-subgraph reuse):
    one shared CREATE VIEW aggregation feeds two INSERT INTO filesystem
    sinks; the shared view is persisted once (computed 1×, written 2×).
    Verified by reading both sinks back and hash-matching the union."""
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    load(spark, sf_dir, "events").createOrReplaceTempView("events_ss")
    eng.sql(
        """CREATE VIEW user_daily_ss AS
           SELECT user_id, CAST(ts AS DATE) AS day,
                  COUNT(*) AS cnt, SUM(value) AS total
           FROM events_ss GROUP BY user_id, CAST(ts AS DATE)"""
    )
    hi_path, lo_path = _tmp("ss_hi_"), _tmp("ss_lo_")
    eng.sql(
        f"""CREATE TABLE sink_hi_ss (user_id BIGINT, day DATE, cnt BIGINT,
            total DOUBLE) WITH ('connector'='filesystem',
            'path'='{hi_path}', 'format'='parquet')"""
    )
    eng.sql(
        f"""CREATE TABLE sink_lo_ss (user_id BIGINT, day DATE, cnt BIGINT,
            total DOUBLE) WITH ('connector'='filesystem',
            'path'='{lo_path}', 'format'='parquet')"""
    )
    ss = eng.create_statement_set()
    ss.add_insert_sql(
        "INSERT INTO sink_hi_ss SELECT user_id, day, cnt, total"
        " FROM user_daily_ss WHERE cnt >= 3"
    )
    ss.add_insert_sql(
        "INSERT INTO sink_lo_ss SELECT user_id, day, cnt, total"
        " FROM user_daily_ss WHERE cnt < 3"
    )
    ss.execute()
    hi = spark.read.parquet(hi_path).withColumn("bucket", F.lit("hi"))
    lo = spark.read.parquet(lo_path).withColumn("bucket", F.lit("lo"))
    return hi.unionByName(lo).select(
        "bucket", "user_id", "day", "cnt", "total"
    ).orderBy("bucket", "user_id", "day")


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_custkey AS custkey, c_acctbal AS acctbal,
           CAST(COUNT(*) AS BIGINT) AS order_cnt,
           CAST(SUM(o_totalprice) AS DOUBLE) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY o_custkey, c_acctbal
    ORDER BY custkey
    """,
    tags=("batch", "sink", "bucketing", "scale"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located bucketed join: orders and customer are written bucketed
    by the join key (8 buckets each), so the sort-merge join and the
    following same-key aggregate run with NO Exchange on either big side
    (the only shuffle left in the plan is the final ORDER BY). This is the
    design for repeated 100 TB fact-dim joins: pay the bucketing shuffle
    once at ingest. Plan asserted shuffle-free in tests/test_bucketed.py."""
    from flink_1_12_2_spark.sources.filesystem import write_bucketed

    suffix = uuid.uuid4().hex[:8]
    ot, ct = f"orders_b_{suffix}", f"customer_b_{suffix}"
    write_bucketed(
        load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        ot, 8, ["o_custkey"], sorted_by=["o_custkey"],
    )
    write_bucketed(
        load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("o_custkey"), "c_acctbal"
        ),
        ct, 8, ["o_custkey"], sorted_by=["o_custkey"],
    )
    orders_b, cust_b = spark.table(ot), spark.table(ct)
    return (
        orders_b.hint("merge")
        .join(cust_b, "o_custkey")
        .groupBy("o_custkey", "c_acctbal")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.sum("o_totalprice").alias("total"),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acctbal"),
            "order_cnt",
            "total",
        )
        .orderBy("custkey")
    )


@query(
    "jdbc_roundtrip_partitioned",
    oracle="""
    SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS suppliers,
           CAST(SUM(CAST(ROUND(s_acctbal * 100) AS DECIMAL(18,0))) AS DOUBLE)
             / 100.0 AS total_bal
    FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey
    """,
    tags=("batch", "jdbc", "source", "sink"),
)
def jdbc_roundtrip_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE jdbc sink+source round-trip against the embedded Derby engine
    (JdbcDynamicTableFactory parity, no external DB needed): write supplier
    to a Derby table, read it back as a PARTITIONED scan (4 range-disjoint
    remote queries on s_suppkey -- Flink's scan.partition.* surface),
    aggregate. Account balances summed as exact cents so the value hash is
    engine-order-independent."""
    from flink_1_12_2_spark.sources.jdbc import derby_url, jdbc_read, jdbc_write

    s = load(spark, sf_dir, "supplier")
    url = derby_url(_tmp("derby_rt_"))
    jdbc_write(s, url, "supplier_rt")
    hi = s.agg(F.max("s_suppkey")).collect()[0][0]
    back = jdbc_read(
        spark,
        url,
        "supplier_rt",
        partition_column="s_suppkey",
        num_partitions=4,
        lower_bound=0,
        upper_bound=int(hi) + 1,
    )
    cents = F.round(F.col("s_acctbal") * 100).cast("decimal(18,0)")
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("suppliers"),
            (F.sum(cents).cast("double") / 100.0).alias("total_bal"),
        )
        .orderBy("s_nationkey")
    )


@query(
    "sink_roundtrip_sequencefile",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier ORDER BY s_suppkey
    """,
    tags=("batch", "sink", "sequencefile"),
)
def sink_roundtrip_sequencefile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hadoop SequenceFile sink+source round-trip
    (flink-formats/flink-sequence-file parity). The one RDD-backed
    connector: Spark has no DataFrame SequenceFile source, so the pair
    serialization drops to the RDD API while projection stays relational."""
    from flink_1_12_2_spark.sources.filesystem import (
        read_sequencefile,
        write_sequencefile,
    )
    import shutil

    s = load(spark, sf_dir, "supplier")
    path = _tmp("seq_rt_")
    shutil.rmtree(path, ignore_errors=True)  # saveAsSequenceFile won't overwrite
    write_sequencefile(s, path, "s_suppkey", "s_name")
    back = read_sequencefile(spark, path, "s_suppkey", "s_name")
    return back.orderBy("s_suppkey")


@query(
    "sink_roundtrip_avro",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("batch", "sink", "format", "avro"),
)
def sink_roundtrip_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro sink+source round-trip (flink-formats/flink-avro
    AvroFileFormatFactory parity). Uses spark-avro when the jar is present;
    otherwise the pure-Python Avro 1.x object-container fallback
    (sources/avro_py.py — spec-compliant magic/metadata/sync blocks,
    executor-parallel one container per partition) — the format is
    first-class on every deployment."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = _tmp("avro_rt_")
    write_table(o, path, fmt="avro")
    back = read_table(spark, path, fmt="avro")
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "sink_roundtrip_csv_gzip",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(l_quantity) AS DOUBLE) AS qty,
           CAST(SUM(l_extendedprice) AS DOUBLE) AS price
    FROM lineitem WHERE l_orderkey <= 1000
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("batch", "sink", "csv", "compress"),
)
def sink_roundtrip_csv_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed text sink+source round-trip — flink-formats/
    flink-compress (CompressWriterFactory: bulk-format writer wrapping a
    Hadoop CompressionCodec) parity: the filesystem connector's
    ``options={'compression': 'gzip'}`` rides Spark's codec support, the
    reader decompresses transparently by extension, and values survive
    exactly. The test asserts the files on disk really are .gz — a
    silently-uncompressed sink would still round-trip."""
    import glob
    import os

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    path = _tmp("csv_gz_rt_")
    write_table(li, path, fmt="csv", options={"compression": "gzip"})
    if not glob.glob(os.path.join(path, "*.csv.gz")):
        raise AssertionError(f"no .csv.gz part files under {path}")
    back = read_table(spark, path, fmt="csv", schema=li.schema)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("l_quantity").alias("qty"),
            F.sum("l_extendedprice").alias("price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "es_upsert_sink_pipeline",
    oracle="""
    SELECT CAST(o_custkey AS VARCHAR) || '_' || CAST(o_orderkey AS VARCHAR)
             AS _id,
           o_custkey, o_orderkey,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 3 AS price_cents
    FROM orders WHERE o_orderkey % 7 <> 0
    ORDER BY o_orderkey
    """,
    tags=("batch", "sink", "elasticsearch", "changelog"),
)
def es_upsert_sink_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elasticsearch upsert sink emulation end-to-end
    (Elasticsearch7DynamicSink / RowElasticsearchSinkFunction.java:76
    parity): a 3-version-per-order changelog (+I then two +U, price
    tripling) plus a -D for every 7th order streams into the file-backed
    index in TWO bulk batches; the scan must show exactly the last
    surviving version of every non-deleted doc, keyed by the
    KeyExtractor-parity ``_id`` (custkey_orderkey, '_' delimiter). The
    final state is the oracle-reproducible fixpoint — upsert overwrote
    both earlier versions and the delete evicted its doc across the batch
    boundary."""
    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.sources.elasticsearch_emu import (
        es_scan,
        es_upsert_batch,
    )

    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5E0) AS BIGINT)").alias(
            "__cents"
        ),
    )
    versions = o.select(
        "*", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("__seq")
    ).select(
        F.when(F.col("__seq") == 0, F.lit("+I"))
        .otherwise(F.lit("+U"))
        .alias(ROW_KIND),
        "o_custkey",
        "o_orderkey",
        (F.col("__cents") * (F.col("__seq") + 1)).alias("price_cents"),
        "__seq",
    )
    deletes = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.lit("-D").alias(ROW_KIND),
        "o_custkey",
        "o_orderkey",
        F.lit(0).cast("long").alias("price_cents"),
        F.lit(3).alias("__seq"),
    )
    index_dir = _tmp("es_idx_")
    batch1 = versions.filter(F.col("__seq") <= 1)
    batch2 = versions.filter(F.col("__seq") == 2).unionByName(deletes)
    for b in (batch1, batch2):
        es_upsert_batch(
            b,
            index_dir,
            pk_cols=["o_custkey", "o_orderkey"],
            order_cols=["__seq"],
        )
    return (
        es_scan(spark, index_dir)
        .select("_id", "o_custkey", "o_orderkey", "price_cents")
        .orderBy("o_orderkey")
    )


@query(
    "hbase_scan_wide_row",
    oracle="""
    WITH cells AS (
      SELECT user_id AS rowkey, event_type AS q,
             CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS micro, event_id
      FROM events
    ),
    latest AS (
      SELECT rowkey, q, arg_max(micro, event_id) AS micro
      FROM cells GROUP BY rowkey, q
    ),
    last_ev AS (
      SELECT user_id AS rowkey, arg_max(event_type, event_id) AS last_event
      FROM events GROUP BY user_id
    )
    SELECT l.rowkey,
           MAX(CASE WHEN q = 'click' THEN micro END) AS m_click,
           MAX(CASE WHEN q = 'view' THEN micro END) AS m_view,
           MAX(CASE WHEN q = 'purchase' THEN micro END) AS m_purchase,
           MAX(CASE WHEN q = 'signup' THEN micro END) AS m_signup,
           MAX(CASE WHEN q = 'error' THEN micro END) AS m_error,
           MAX(e.last_event) AS p_last_event
    FROM latest l JOIN last_ev e USING (rowkey)
    GROUP BY l.rowkey ORDER BY l.rowkey
    """,
    tags=("batch", "source", "hbase"),
)
def hbase_scan_wide_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBase wide-column scan emulation (HBaseTableSchema.java:48 /
    HBaseRowDataInputFormat parity): events become an HFile-grain cell
    store — family 'm' holds one qualifier per event_type (micro-quantized
    value, many versions per cell), family 'p' a last_event qualifier;
    the version stamp is the unique event_id (a monotone write stamp, so
    latest-version-wins is deterministic). The scan resolves versions
    with one map-combinable max_by and pivots into rowkey + one struct
    per family; flattened here so the oracle compares field-by-field."""
    from flink_1_12_2_spark.sources.hbase_emu import _flatten, hbase_scan

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("rowkey"),
        "event_type",
        F.expr("CAST(FLOOR(value * 1000000 + 0.5E0) AS BIGINT)").alias(
            "__micro"
        ),
        F.col("event_id").alias("version_ts"),
    )
    cells = ev.select(
        "rowkey",
        F.lit("m").alias("family"),
        F.col("event_type").alias("qualifier"),
        F.col("__micro").cast("string").alias("value"),
        "version_ts",
    ).unionByName(
        ev.select(
            "rowkey",
            F.lit("p").alias("family"),
            F.lit("last_event").alias("qualifier"),
            F.col("event_type").alias("value"),
            "version_ts",
        )
    )
    families = {
        "m": {
            "click": "bigint",
            "view": "bigint",
            "purchase": "bigint",
            "signup": "bigint",
            "error": "bigint",
        },
        "p": {"last_event": "string"},
    }
    wide = hbase_scan(cells, families)
    return _flatten(wide, families).orderBy("rowkey")


@query(
    "ddl_partition_lifecycle",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders
    WHERE o_orderstatus <> 'F'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("batch", "ddl", "partition"),
)
def ddl_partition_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE ADD/DROP PARTITION end-to-end (SqlAddPartitions /
    SqlDropPartitions parity): orders lands partitioned by o_orderstatus,
    an empty partition is ADDed (listable, scan-invisible), then the 'F'
    partition is DROPped — the aggregate over the registered table must
    equal the oracle's WHERE-filtered view of the source. Exercises the
    front door's real directory lifecycle + view refresh, not metadata."""
    from flink_1_12_2_spark.session import EngineSession, TableMeta
    from flink_1_12_2_spark.sql.ddl import execute_statement

    eng = EngineSession(spark)
    path = _tmp("part_ddl_")
    load(spark, sf_dir, "orders").write.partitionBy("o_orderstatus").parquet(
        path
    )
    eng.register_table("orders_part", TableMeta(path=path))
    execute_statement(
        eng, "ALTER TABLE orders_part ADD PARTITION (o_orderstatus='Z')"
    )
    parts = [
        r["partition"]
        for r in execute_statement(
            eng, "SHOW PARTITIONS orders_part"
        ).collect()
    ]
    assert "o_orderstatus=Z" in parts, parts
    execute_statement(
        eng, "ALTER TABLE orders_part DROP PARTITION (o_orderstatus='F')"
    )
    return (
        spark.table("orders_part")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5E0) AS BIGINT)")
            ).alias("cents"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "state_read_bootstrap",
    oracle="""
    WITH st AS (
      SELECT o_orderkey, o_custkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 2 AS cents
      FROM orders WHERE o_orderkey % 5 <> 0
    ),
    boot AS (
      SELECT o_orderkey, o_custkey, cents + 100 AS cents
      FROM st WHERE o_custkey % 3 <> 0
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM boot GROUP BY o_custkey
    ORDER BY o_custkey LIMIT 500
    """,
    tags=("batch", "state", "savepoint"),
)
def state_read_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State Processor API round-trip (Savepoint.java / ExistingSavepoint
    .java:249 readKeyedState / WritableSavepoint.java:83,93 withOperator+
    write / OperatorTransformation.java:66 bootstrapWith): an upsert sink
    materializes keyed operator state (two changelog batches: +I then +U
    doubling the cents, -D evicting every 5th order); the state table is
    MOUNTED as an existing savepoint and read back as a DataFrame; a
    read-modify-write pass (drop custkeys divisible by 3, +100 cents —
    the library's state-migration example shape) bootstraps a NEW
    savepoint; the final frame is read from the new savepoint's keyed
    state, so every layer (mount, read, bootstrap write, metadata, load)
    is on the verified path."""
    from flink_1_12_2_spark import state_api
    from flink_1_12_2_spark.operators.changelog import (
        ROW_KIND,
        upsert_foreach_batch,
    )

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5E0) AS BIGINT)").alias(
            "cents"
        ),
    )
    versions = o.select(
        "*", F.explode(F.array(F.lit(0), F.lit(1))).alias("__seq")
    ).select(
        F.when(F.col("__seq") == 0, F.lit("+I"))
        .otherwise(F.lit("+U"))
        .alias(ROW_KIND),
        "o_orderkey",
        "o_custkey",
        (F.col("cents") * (F.col("__seq") + 1)).alias("cents"),
        "__seq",
    )
    deletes = o.filter(F.col("o_orderkey") % 5 == 0).select(
        F.lit("-D").alias(ROW_KIND),
        "o_orderkey",
        "o_custkey",
        F.lit(0).cast("long").alias("cents"),
        F.lit(2).alias("__seq"),
    )
    state_dir = _tmp("sp_state_") + "/orders-agg"
    apply = upsert_foreach_batch(
        state_dir, ["o_orderkey"], ["__seq"], num_buckets=16
    )
    apply(versions.filter(F.col("__seq") == 0), 0)
    apply(
        versions.filter(F.col("__seq") == 1).unionByName(deletes), 1
    )
    # query the "running job's" state: mount + readKeyedState
    sp = state_api.mount_upsert_store(
        spark, state_dir, "orders-agg", ["o_orderkey"], num_buckets=16
    )
    state = sp.read_keyed_state("orders-agg")
    # read-modify-write: migrate the state and bootstrap a new savepoint
    migrated = state.filter(F.col("o_custkey") % 3 != 0).withColumn(
        "cents", F.col("cents") + F.lit(100)
    )
    new_sp_path = _tmp("sp_boot_")
    state_api.create().with_operator(
        "orders-agg",
        migrated.select("o_orderkey", "o_custkey", "cents", "__seq"),
        primary_key=("o_orderkey",),
        num_buckets=16,
    ).write(new_sp_path)
    final = state_api.load(spark, new_sp_path).read_keyed_state(
        "orders-agg"
    )
    return (
        final.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cents").alias("total_cents"),
        )
        .orderBy("o_custkey")
        .limit(500)
    )


@query(
    "state_window_reader",
    oracle="""
    WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                FROM events),
    win AS (
      SELECT user_id,
             time_bucket(INTERVAL '1 hour', ts) AS w_start,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM ev GROUP BY 1, 2)
    SELECT user_id, w_start,
           w_start + INTERVAL '1 hour' AS w_end,
           w_start + INTERVAL '1 hour' - INTERVAL '1 millisecond'
             AS cleanup_timer,
           cnt, cents
    FROM win
    ORDER BY user_id, w_start
    """,
    tags=("batch", "state", "savepoint", "window"),
)
def state_window_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State Processor API window reader (ExistingSavepoint.window(...) →
    WindowReader.aggregate; WindowReaderFunction.java's Context surface):
    the per-(key, window) accumulator state a tumbling event-time window
    aggregate would hold is bootstrapped into a savepoint under the
    WINDOW state kind (keyed by (user_id, window start) — Flink keys
    window state by (key, namespace=window)), then read back through
    read_window_state, which adds the registered cleanup timer =
    window.maxTimestamp() = end − 1 ms (WindowOperator's event-time
    cleanup timer at allowedLateness 0). The oracle recomputes window
    contents, bounds, and timer straight from events — so the bootstrap
    write (bucketed layout), metadata round-trip, window-kind load, and
    timer derivation are all on the verified path."""
    from flink_1_12_2_spark import state_api

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.expr("CAST(FLOOR(value * 100 + 0.5E0) AS BIGINT)").alias("c"),
    )
    win_state = (
        ev.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("c").alias("cents"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "cnt",
            "cents",
        )
    )
    path = _tmp("sp_win_")
    state_api.create().with_operator(
        "win-agg",
        win_state,
        primary_key=("user_id", "w_start"),
        kind=state_api.WINDOW,
        num_buckets=16,
        window_cols=("w_start", "w_end"),
    ).write(path)
    return (
        state_api.load(spark, path)
        .read_window_state("win-agg")
        .select(
            "user_id",
            "w_start",
            "w_end",
            F.col("__timer").alias("cleanup_timer"),
            "cnt",
            "cents",
        )
        .orderBy("user_id", "w_start")
    )


@query(
    "jdbc_lookup_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
           CAST(c.c_acctbal * 100 AS BIGINT) AS acctbal_cents
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_custkey <= 500
    ORDER BY c.c_custkey
    """,
    tags=("batch", "jdbc", "join", "lookup"),
)
def jdbc_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE jdbc lookup join (JdbcRowDataLookupFunction.java:59 +
    JdbcLookupOptions cache contract): the nation dimension lives in an
    embedded Derby table; customer facts join it FOR-SYSTEM-TIME-style
    through the cached-snapshot lookup path (lookup.cache.max-rows /
    lookup.cache.ttl honored; snapshot broadcast because it fits the
    max-rows budget). Balances as exact cents for a stable value hash."""
    from flink_1_12_2_spark.operators.lookup import lookup_join_jdbc
    from flink_1_12_2_spark.sources.jdbc import derby_url, jdbc_write

    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    url = derby_url(_tmp("derby_lk_"))
    jdbc_write(n, url, "nation_dim")
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    )
    out = lookup_join_jdbc(
        c, url, "nation_dim", "c_nationkey", "n_nationkey",
        options={
            "lookup.cache.max-rows": "1000",
            "lookup.cache.ttl": "10min",
        },
        how="inner",
    )
    return out.select(
        "c_custkey",
        "c_name",
        F.col("n_name").alias("nation_name"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("acctbal_cents"),
    ).orderBy("c_custkey")


@query(
    "datagen_sequence_scan",
    oracle="""
    SELECT CAST(id AS BIGINT) AS id,
           CAST(id * 3 AS BIGINT) AS tripled,
           CAST(id AS VARCHAR) AS tag
    FROM range(100, 200) t(id) ORDER BY id
    """,
    tags=("batch", "source", "datagen"),
)
def datagen_sequence_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL-created datagen source with sequence fields
    (DataGenTableSourceFactory.java:48 + SequenceGeneratorVisitor.java:68):
    the bounded scan is range + codegen column math; verifiable because
    sequence generation is deterministic."""
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    eng.sql("DROP TABLE gen_oracle")
    eng.sql(
        """CREATE TABLE gen_oracle (id BIGINT, tag STRING) WITH (
            'connector'='datagen',
            'fields.id.kind'='sequence',
            'fields.id.start'='100', 'fields.id.end'='199',
            'fields.tag.kind'='sequence',
            'fields.tag.start'='100', 'fields.tag.end'='199')"""
    )
    return eng.sql(
        "SELECT id, id * 3 AS tripled, tag FROM gen_oracle ORDER BY id"
    )


@query(
    "insert_static_partition_pruned",
    oracle="""
    SELECT l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem WHERE l_returnflag = 'R'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    tags=("batch", "sink", "partition"),
)
def insert_static_partition_pruned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partitioned filesystem sink end-to-end (FileSystemTableSink +
    SqlPartitionSpec): INSERT each l_returnflag slice through a static
    PARTITION spec, then aggregate ONE partition back — the read prunes
    to that partition directory (PartitionFilters reach the scan)."""
    import pyspark.sql.functions as F

    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    path = _tmp("part_ins_")
    eng.sql("DROP TABLE li_part")
    eng.sql(
        f"""CREATE TABLE li_part (l_linestatus STRING, l_quantity DOUBLE,
                l_returnflag STRING)
        PARTITIONED BY (l_returnflag) WITH (
            'connector'='filesystem', 'path'='{path}', 'format'='parquet',
            'sink.partition-commit.policy.kind'='success-file')"""
    )
    li = load(spark, sf_dir, "lineitem")
    li.select("l_linestatus", "l_quantity", "l_returnflag") \
        .createOrReplaceTempView("li_src")
    for flag in ("R", "A", "N"):
        eng.sql(
            f"INSERT INTO li_part PARTITION (l_returnflag='{flag}') "
            f"SELECT l_linestatus, l_quantity FROM li_src "
            f"WHERE l_returnflag = '{flag}'"
        )
    back = spark.table("li_part").filter(F.col("l_returnflag") == "R")
    return (
        back.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "sink_roundtrip_compacted",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("batch", "sink", "compaction"),
)
def sink_roundtrip_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-compacting filesystem sink round-trip (FileSystemOptions
    AUTO_COMPACTION, new in 1.12): orders written at sink.parallelism 8
    through 'auto-compaction'='true' commits as ONE compacted file (the
    batch is far under the 128MB target) — asserted, then aggregated
    back against the oracle."""
    import pyspark.sql.functions as F

    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    path = _tmp("compact_rt_")
    eng.sql("DROP TABLE oc_sink")
    eng.sql(
        f"""CREATE TABLE oc_sink (o_orderstatus STRING,
                o_totalprice DOUBLE) WITH (
            'connector'='filesystem', 'path'='{path}', 'format'='parquet',
            'sink.parallelism'='8', 'auto-compaction'='true',
            'compaction.file-size'='128MB')"""
    )
    load(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    ).createOrReplaceTempView("oc_src")
    eng.sql("INSERT INTO oc_sink SELECT * FROM oc_src")
    n_files = len(
        [
            f
            for f in os.listdir(path)
            if f.startswith("part-") and not f.endswith(".crc")
        ]
    )
    assert n_files == 1, f"compaction produced {n_files} files"
    return (
        spark.table("oc_sink")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("total_cents"),
        )
        .orderBy("o_orderstatus")
    )
