"""CDC format queries: debezium-json / canal-json decoders driving the
changelog pipeline, verified against oracles that derive the same final
state (or the same changelog rows) straight from the base table."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_12_2_spark.operators.cdc_formats import (
    parse_canal_json,
    parse_debezium_json,
)
from flink_1_12_2_spark.operators.changelog import changelog_normalize
from flink_1_12_2_spark.registry import load, query

_PAYLOAD = "o_orderkey bigint, o_totalprice double"


def _orders_slim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")


def _payload(key: F.Column, price: F.Column) -> F.Column:
    return F.struct(key.alias("o_orderkey"), price.alias("o_totalprice"))


@query(
    "cdc_debezium_json",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 7 <> 0 ORDER BY o_orderkey
    """,
    tags=("batch", "cdc", "changelog", "format"),
)
def cdc_debezium_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """debezium-json → changelog → normalize, end to end: every order is
    inserted (op c), every 3rd updated (+10, op u), every 7th deleted
    (op d); the decoder's +I/-U/+U/-D rows collapse to current state, which
    the oracle derives directly from the base table. Envelope JSON is built
    with to_json so the decode path is exercised on real serialized text."""
    o = _orders_slim(spark, sf_dir)
    key, price = F.col("o_orderkey"), F.col("o_totalprice")
    null_p = F.lit(None).cast(f"struct<{_PAYLOAD}>")
    ins = o.select(
        F.lit(1).alias("seq"),
        F.to_json(
            F.struct(
                null_p.alias("before"),
                _payload(key, price).alias("after"),
                F.lit("c").alias("op"),
            )
        ).alias("j"),
    )
    upd = o.filter(key % 3 == 0).select(
        F.lit(2).alias("seq"),
        F.to_json(
            F.struct(
                _payload(key, price).alias("before"),
                _payload(key, price + 10).alias("after"),
                F.lit("u").alias("op"),
            )
        ).alias("j"),
    )
    cur = F.when(key % 3 == 0, price + 10).otherwise(price)
    dele = o.filter(key % 7 == 0).select(
        F.lit(3).alias("seq"),
        F.to_json(
            F.struct(
                _payload(key, cur).alias("before"),
                null_p.alias("after"),
                F.lit("d").alias("op"),
            )
        ).alias("j"),
    )
    src = ins.unionByName(upd).unionByName(dele)
    parsed = parse_debezium_json(src, "j", _PAYLOAD)
    return (
        changelog_normalize(parsed, ["o_orderkey"], ["seq"])
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "cdc_canal_json",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_totalprice FROM orders)
    SELECT * FROM (
      SELECT '+I' AS _row_kind, o_orderkey, o_totalprice, CAST(1 AS INT) AS seq
      FROM base
      UNION ALL
      SELECT '-U', o_orderkey, o_totalprice, 2 FROM base WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT '+U', o_orderkey, o_totalprice + 10, 2 FROM base
      WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT '-D', o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
                  ELSE o_totalprice END, 3
      FROM base WHERE o_orderkey % 7 = 0)
    ORDER BY o_orderkey, seq, _row_kind
    """,
    tags=("batch", "cdc", "changelog", "format"),
)
def cdc_canal_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canal-json decode verified at the CHANGELOG-ROW level (not just final
    state): the oracle enumerates the exact +I/-U/+U/-D rows. The UPDATE
    envelope's ``old`` array carries ONLY the changed column
    (o_totalprice) — the decoder must overlay it onto the post-image to
    reconstruct the -U pre-image (CanalJsonDeserializationSchema parity)."""
    o = _orders_slim(spark, sf_dir)
    key, price = F.col("o_orderkey"), F.col("o_totalprice")
    ins = o.select(
        F.lit(1).alias("seq"),
        F.to_json(
            F.struct(
                F.array(_payload(key, price)).alias("data"),
                F.lit(None).cast(f"array<struct<{_PAYLOAD}>>").alias("old"),
                F.lit("INSERT").alias("type"),
            )
        ).alias("j"),
    )
    # old carries only the changed column: o_orderkey is NULL in the
    # pre-image struct and must be recovered from data by the overlay
    old_elem = F.struct(
        F.lit(None).cast("bigint").alias("o_orderkey"),
        price.alias("o_totalprice"),
    )
    upd = o.filter(key % 3 == 0).select(
        F.lit(2).alias("seq"),
        F.to_json(
            F.struct(
                F.array(_payload(key, price + 10)).alias("data"),
                F.array(old_elem).alias("old"),
                F.lit("UPDATE").alias("type"),
            )
        ).alias("j"),
    )
    cur = F.when(key % 3 == 0, price + 10).otherwise(price)
    dele = o.filter(key % 7 == 0).select(
        F.lit(3).alias("seq"),
        F.to_json(
            F.struct(
                F.array(_payload(key, cur)).alias("data"),
                F.lit(None).cast(f"array<struct<{_PAYLOAD}>>").alias("old"),
                F.lit("DELETE").alias("type"),
            )
        ).alias("j"),
    )
    src = ins.unionByName(upd).unionByName(dele)
    parsed = parse_canal_json(src, "j", _PAYLOAD)
    return parsed.select(
        "_row_kind", "o_orderkey", "o_totalprice", "seq"
    ).orderBy("o_orderkey", "seq", "_row_kind")


@query(
    "kafka_debezium_pipeline",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 7 <> 0 ORDER BY o_orderkey
    """,
    tags=("streaming", "kafka", "cdc", "changelog"),
)
def kafka_debezium_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical Flink CDC consumption pipeline, end to end, brokerless:
    connector=kafka (file-backed topic emulation, sources/kafka_emu.py) +
    format=debezium-json (operators/cdc_formats.py) -> REAL Structured
    Streaming consumption (two producer batches, maxFilesPerTrigger=1) ->
    changelog normalize to current state. The envelope's ts_ms orders
    changes per key, exactly as a Flink kafka+debezium table would. A real
    broker swaps only the source format string; every downstream operator
    is unchanged."""
    import tempfile

    from flink_1_12_2_spark.sources.kafka_emu import publish, read_topic_stream
    from flink_1_12_2_spark.streaming.core import run_to_memory

    o = _orders_slim(spark, sf_dir)
    key, price = F.col("o_orderkey"), F.col("o_totalprice")
    null_p = F.lit(None).cast(f"struct<{_PAYLOAD}>")

    def env(before, after, op, ts_ms):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.lit(op).alias("op"),
                F.lit(ts_ms).cast("bigint").alias("ts_ms"),
            )
        ).alias("value")

    topic = tempfile.mkdtemp(prefix="topic_orders_cdc_")
    # producer batch 1: snapshot inserts; batch 2: updates + deletes
    publish(o.select(env(null_p, _payload(key, price), "c", 1)), topic)
    cur = F.when(key % 3 == 0, price + 10).otherwise(price)
    upd = o.filter(key % 3 == 0).select(
        env(_payload(key, price), _payload(key, price + 10), "u", 2)
    )
    dele = o.filter(key % 7 == 0).select(
        env(_payload(key, cur), null_p, "d", 3)
    )
    publish(upd.unionByName(dele), topic)

    stream = read_topic_stream(
        spark, topic, "debezium-json", _PAYLOAD, max_files_per_trigger=1
    )
    rows = run_to_memory(stream, output_mode="append")
    return (
        changelog_normalize(rows, ["o_orderkey"], ["ts_ms"])
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "changelog_reagg",
    oracle="""
    WITH final_state AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0)
    SELECT o_orderkey % 10 AS bucket,
           ROUND(SUM(o_totalprice), 2) AS total_price,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM final_state GROUP BY 1 ORDER BY bucket
    """,
    tags=("batch", "cdc", "changelog", "retract", "aggregate"),
)
def changelog_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog-through-aggregate: a RETRACTING stream feeds a downstream
    SUM/COUNT/AVG group-agg directly — no normalize step — and the signed
    aggregation (operators/changelog.py:group_agg_retract) consumes the
    -U/-D rows exactly as Flink's GroupAggFunction.java:43 retract path
    under FlinkChangelogModeInferenceProgram.scala:39. Source: the same
    debezium-json envelope battery as cdc_debezium_json (insert all, update
    every 3rd +10, delete every 7th), decoded to +I/-U/+U/-D; the oracle
    computes the same aggregate from the FINAL state — hash equality proves
    inserts, both update halves, and deletes all folded correctly."""
    from flink_1_12_2_spark.operators.changelog import group_agg_retract

    o = _orders_slim(spark, sf_dir)
    key, price = F.col("o_orderkey"), F.col("o_totalprice")
    null_p = F.lit(None).cast(f"struct<{_PAYLOAD}>")
    ins = o.select(
        F.to_json(
            F.struct(
                null_p.alias("before"),
                _payload(key, price).alias("after"),
                F.lit("c").alias("op"),
            )
        ).alias("j")
    )
    upd = o.filter(key % 3 == 0).select(
        F.to_json(
            F.struct(
                _payload(key, price).alias("before"),
                _payload(key, price + 10).alias("after"),
                F.lit("u").alias("op"),
            )
        ).alias("j")
    )
    cur = F.when(key % 3 == 0, price + 10).otherwise(price)
    dele = o.filter(key % 7 == 0).select(
        F.to_json(
            F.struct(
                _payload(key, cur).alias("before"),
                null_p.alias("after"),
                F.lit("d").alias("op"),
            )
        ).alias("j")
    )
    changelog = parse_debezium_json(
        ins.unionByName(upd).unionByName(dele), "j", _PAYLOAD
    )
    agg = group_agg_retract(
        changelog.withColumn("bucket", F.col("o_orderkey") % 10),
        ["bucket"],
        [
            ("sum", "o_totalprice", "total_price"),
            ("count", None, "n_orders"),
            ("avg", "o_totalprice", "avg_price"),
        ],
    )
    return agg.select(
        "bucket",
        F.round("total_price", 2).alias("total_price"),
        "n_orders",
        F.round("avg_price", 2).alias("avg_price"),
    ).orderBy("bucket")


@query(
    "changelog_reagg_minmax",
    oracle="""
    WITH final_state AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0)
    SELECT o_orderkey % 10 AS bucket,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM final_state GROUP BY 1 ORDER BY bucket
    """,
    tags=("batch", "cdc", "changelog", "retract", "aggregate", "minmax"),
)
def changelog_reagg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX over a RETRACTING changelog (Min/MaxWithRetractAggFunction
    parity — flink-table-planner-blink .../aggfunctions/): the same
    debezium battery as changelog_reagg (updates shift every 3rd key's
    price, deletes remove every 7th key — so many buckets LOSE their
    current extremum to a -U or -D and the next-best value must surface).
    group_agg_retract materializes the value→count multiset via a
    (bucket, value)-keyed signed aggregation — the distributed form of
    Flink's sorted MapState — then reads each bucket's extremum; hash
    equality against the final-state oracle proves retracted extrema
    fall back correctly."""
    from flink_1_12_2_spark.operators.changelog import group_agg_retract

    o = _orders_slim(spark, sf_dir)
    key, price = F.col("o_orderkey"), F.col("o_totalprice")
    null_p = F.lit(None).cast(f"struct<{_PAYLOAD}>")
    ins = o.select(
        F.to_json(
            F.struct(
                null_p.alias("before"),
                _payload(key, price).alias("after"),
                F.lit("c").alias("op"),
            )
        ).alias("j")
    )
    upd = o.filter(key % 3 == 0).select(
        F.to_json(
            F.struct(
                _payload(key, price).alias("before"),
                _payload(key, price + 10).alias("after"),
                F.lit("u").alias("op"),
            )
        ).alias("j")
    )
    cur = F.when(key % 3 == 0, price + 10).otherwise(price)
    dele = o.filter(key % 7 == 0).select(
        F.to_json(
            F.struct(
                _payload(key, cur).alias("before"),
                null_p.alias("after"),
                F.lit("d").alias("op"),
            )
        ).alias("j")
    )
    changelog = parse_debezium_json(
        ins.unionByName(upd).unionByName(dele), "j", _PAYLOAD
    )
    agg = group_agg_retract(
        changelog.withColumn("bucket", F.col("o_orderkey") % 10),
        ["bucket"],
        [
            ("min", "o_totalprice", "min_price"),
            ("max", "o_totalprice", "max_price"),
            ("count", None, "n_orders"),
        ],
    )
    return agg.select(
        "bucket",
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
        "n_orders",
    ).orderBy("bucket")


@query(
    "stream_changelog_reagg",
    oracle="""
    WITH final_state AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0)
    SELECT o_orderkey % 10 AS bucket,
           ROUND(SUM(o_totalprice), 2) AS total_price,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM final_state GROUP BY 1 ORDER BY bucket
    """,
    tags=("streaming", "cdc", "changelog", "retract", "aggregate", "kafka"),
)
def stream_changelog_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """changelog_reagg, END TO END through Structured Streaming: the
    debezium topic (file-backed kafka emulation, two producer batches) is
    consumed as a real stream and the -U/-D retractions flow INCREMENTALLY
    into the signed group aggregate (complete mode — Spark's stateful agg
    folds each micro-batch's signed deltas, which is precisely Flink's
    GroupAggFunction accumulate/retract loop). The final state matches the
    batch oracle even though the updates/deletes arrive in a LATER batch
    than the inserts they retract."""
    import tempfile

    from flink_1_12_2_spark.sources.kafka_emu import publish, read_topic_stream
    from flink_1_12_2_spark.streaming.core import run_to_memory

    o = _orders_slim(spark, sf_dir)
    key, price = F.col("o_orderkey"), F.col("o_totalprice")
    null_p = F.lit(None).cast(f"struct<{_PAYLOAD}>")

    def env(before, after, op, ts_ms):
        return F.to_json(
            F.struct(
                before.alias("before"),
                after.alias("after"),
                F.lit(op).alias("op"),
                F.lit(ts_ms).cast("bigint").alias("ts_ms"),
            )
        ).alias("value")

    topic = tempfile.mkdtemp(prefix="topic_reagg_cdc_")
    publish(o.select(env(null_p, _payload(key, price), "c", 1)), topic)
    cur = F.when(key % 3 == 0, price + 10).otherwise(price)
    upd = o.filter(key % 3 == 0).select(
        env(_payload(key, price), _payload(key, price + 10), "u", 2)
    )
    dele = o.filter(key % 7 == 0).select(
        env(_payload(key, cur), null_p, "d", 3)
    )
    publish(upd.unionByName(dele), topic)

    stream = read_topic_stream(
        spark, topic, "debezium-json", _PAYLOAD, max_files_per_trigger=1
    )
    sign = F.when(F.col("_row_kind").isin("+I", "+U"), F.lit(1)).otherwise(
        F.lit(-1)
    )
    agg = (
        stream.withColumn("bucket", F.col("o_orderkey") % 10)
        .groupBy("bucket")
        .agg(
            F.sum(sign * F.col("o_totalprice")).alias("total_price"),
            F.sum(sign).cast("bigint").alias("n_orders"),
        )
    )
    out = run_to_memory(agg, output_mode="complete")
    return out.filter(F.col("n_orders") > 0).select(
        "bucket",
        F.round("total_price", 2).alias("total_price"),
        "n_orders",
    ).orderBy("bucket")


@query(
    "changelog_join_reagg",
    oracle="""
    WITH o_final AS (
      SELECT o_custkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0),
    c_final AS (
      SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 5 <> 0)
    SELECT c.c_nationkey,
           ROUND(SUM(o.o_totalprice), 2) AS total_price,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM o_final o JOIN c_final c ON o.o_custkey = c.c_custkey
    GROUP BY 1 ORDER BY c_nationkey
    """,
    tags=("batch", "cdc", "changelog", "retract", "join", "ivm"),
)
def changelog_join_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog ⋈ changelog → changelog → aggregate — retractions
    propagated through a two-input JOIN by the IVM product rule
    (operators/changelog.py:changelog_join; Flink
    StreamingJoinOperator.java:36 emits exactly these signed pairs
    record-at-a-time). Orders carry inserts + price updates (-U/+U) +
    deletes; customers carry inserts + deletes; NEITHER side is normalized
    before the join, yet the signed pair stream re-aggregated per nation
    hash-matches the join of the two FINAL states."""
    from flink_1_12_2_spark.operators.changelog import (
        changelog_join,
        group_agg_retract,
    )

    o = _orders_slim(spark, sf_dir).join(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        "o_orderkey",
    )
    key, price = F.col("o_orderkey"), F.col("o_totalprice")
    cur = F.when(key % 3 == 0, price + 10).otherwise(price)
    o_ch = (
        o.select(F.lit("+I").alias("_row_kind"), "o_custkey", "o_totalprice")
        .unionByName(
            o.filter(key % 3 == 0).select(
                F.lit("-U").alias("_row_kind"), "o_custkey", "o_totalprice"
            )
        )
        .unionByName(
            o.filter(key % 3 == 0).select(
                F.lit("+U").alias("_row_kind"),
                "o_custkey",
                (price + 10).alias("o_totalprice"),
            )
        )
        .unionByName(
            o.filter(key % 7 == 0).select(
                F.lit("-D").alias("_row_kind"),
                "o_custkey",
                cur.alias("o_totalprice"),
            )
        )
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    c_ch = c.select(
        F.lit("+I").alias("_row_kind"), "c_custkey", "c_nationkey"
    ).unionByName(
        c.filter(F.col("c_custkey") % 5 == 0).select(
            F.lit("-D").alias("_row_kind"), "c_custkey", "c_nationkey"
        )
    )
    joined = changelog_join(
        o_ch, c_ch, condition=F.col("l.o_custkey") == F.col("r.c_custkey")
    )
    agg = group_agg_retract(
        joined,
        ["c_nationkey"],
        [("sum", "o_totalprice", "total_price"), ("count", None, "n_orders")],
    )
    return agg.select(
        "c_nationkey",
        F.round("total_price", 2).alias("total_price"),
        "n_orders",
    ).orderBy("c_nationkey")


@query(
    "avro_registry_roundtrip",
    oracle="""
    WITH enc AS (
      SELECT o_orderstatus,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             CASE WHEN o_orderkey % 2 = 0 THEN o_custkey END AS ck
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_msgs,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(COUNT(ck) AS BIGINT) AS n_evolved
    FROM enc GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("batch", "kafka", "avro", "schema-registry"),
)
def avro_registry_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confluent-registry Avro over the kafka emulation
    (flink-formats/flink-avro-confluent-registry:
    RegistryAvroSerializationSchema / RegistryAvroDeserializationSchema /
    ConfluentSchemaRegistryCoder wire format — 0x00 magic + BE32 schema
    id + container-less Avro body): odd orderkeys publish under schema
    v1 (status, cents), even orderkeys under the EVOLVED v2 (+ custkey),
    so the topic interleaves two writer ids; the consumer decodes every
    message against the latest reader schema with per-id writer
    resolution — v1 rows surface custkey = null (Avro name resolution),
    proving old data stays readable after evolution."""
    import os
    import tempfile
    import uuid

    from flink_1_12_2_spark.sources.kafka_emu import publish, read_topic_batch
    from flink_1_12_2_spark.sources.schema_registry import (
        avro_registry_decode,
        avro_registry_encode,
    )

    base = os.path.join(
        tempfile.gettempdir(), "avro_reg_" + uuid.uuid4().hex[:10]
    )
    reg = os.path.join(base, "registry.json")
    topic = os.path.join(base, "topic")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5E0) AS BIGINT)").alias(
            "cents"
        ),
    )
    v1 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderstatus", "cents"
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderstatus", "cents", F.col("o_custkey").alias("ck")
    )
    # v1 registers first so v2 is the subject's latest (the reader)
    f1 = avro_registry_encode(v1, reg, "orders-value")
    publish(f1.select(F.base64("value").alias("value")), topic)
    f2 = avro_registry_encode(v2, reg, "orders-value")
    publish(f2.select(F.base64("value").alias("value")), topic)
    framed = read_topic_batch(spark, topic, "raw", "")
    decoded = avro_registry_decode(framed, reg, "orders-value")
    return (
        decoded.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_msgs"),
            F.sum("cents").alias("total_cents"),
            F.count("ck").alias("n_evolved"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "kafka_ddl_avro_scan",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders WHERE o_orderkey % 3 = 0
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("batch", "kafka", "ddl", "avro", "schema-registry"),
)
def kafka_ddl_avro_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The kafka connector's SQL front door (r11): registry-framed Avro
    messages published to an emulated topic, then CREATE TABLE ... WITH
    ('connector'='kafka', 'format'='avro-confluent', ...) and a plain
    SQL aggregate over the table — KafkaDynamicTableFactory.java:95
    option surface end-to-end through EngineSession.sql."""
    import os
    import tempfile
    import uuid

    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish
    from flink_1_12_2_spark.sources.schema_registry import (
        avro_registry_encode,
    )

    base = os.path.join(
        tempfile.gettempdir(), "kddl_" + uuid.uuid4().hex[:10]
    )
    reg = os.path.join(base, "registry.json")
    topic = os.path.join(base, "orders_avro")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 3 == 0
    ).select(
        "o_orderstatus",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5E0) AS BIGINT)").alias(
            "cents"
        ),
    )
    framed = avro_registry_encode(o, reg, "orders_avro-value")
    publish(framed.select(F.base64("value").alias("value")), topic)
    eng = EngineSession(spark)
    view = "kddl_" + uuid.uuid4().hex[:8]
    eng.sql(
        f"""CREATE TABLE {view} (o_orderstatus STRING, cents BIGINT)
            WITH ('connector' = 'kafka', 'topic' = '{topic}',
                  'format' = 'avro-confluent',
                  'avro-confluent.schema-registry.url' = 'file://{reg}')"""
    )
    return eng.sql(
        f"""SELECT o_orderstatus, COUNT(*) AS n, SUM(cents) AS cents
            FROM {view} GROUP BY o_orderstatus ORDER BY o_orderstatus"""
    )


@query(
    "upsert_kafka_roundtrip",
    oracle="""
    WITH st AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_custkey % 2 = 0
                  THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 2
                  ELSE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
             END AS cents
      FROM orders WHERE o_orderkey % 7 <> 0)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM st GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("batch", "kafka", "upsert-kafka", "changelog"),
)
def upsert_kafka_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upsert-kafka end-to-end through the SQL front door
    (UpsertKafkaDynamicTableFactory.java:68): three producer batches —
    initial state, per-key updates (cents doubled for even custkeys),
    tombstones for every 7th order — then a plain SQL aggregate over the
    table, which must see exactly the normalized latest state (last
    value per key, tombstoned keys gone)."""
    import os
    import tempfile
    import uuid

    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish_upsert

    topic = os.path.join(
        tempfile.gettempdir(), "uk_rt_" + uuid.uuid4().hex[:10]
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5E0) AS BIGINT)").alias(
            "cents"
        ),
    )
    base = o.select("o_orderkey", "o_orderstatus", "cents")
    publish_upsert(base, topic, ["o_orderkey"])
    updates = o.filter(F.col("o_custkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", (F.col("cents") * 2).alias("cents")
    )
    publish_upsert(updates, topic, ["o_orderkey"])
    deletes = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.lit("-D").alias(ROW_KIND),
        "o_orderkey",
        "o_orderstatus",
        F.lit(None).cast("bigint").alias("cents"),
    )
    publish_upsert(deletes, topic, ["o_orderkey"], row_kind_col=ROW_KIND)
    eng = EngineSession(spark)
    view = "uk_" + uuid.uuid4().hex[:8]
    eng.sql(
        f"""CREATE TABLE {view} (o_orderkey BIGINT, o_orderstatus STRING,
                                 cents BIGINT,
                                 PRIMARY KEY (o_orderkey) NOT ENFORCED)
            WITH ('connector' = 'upsert-kafka', 'topic' = '{topic}')"""
    )
    return eng.sql(
        f"""SELECT o_orderstatus, COUNT(*) AS n, SUM(cents) AS cents
            FROM {view} GROUP BY o_orderstatus ORDER BY o_orderstatus"""
    )


@query(
    "upsert_kafka_avro_roundtrip",
    oracle="""
    WITH st AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_custkey % 3 = 0
                  THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 3
                  ELSE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
             END AS cents
      FROM orders WHERE o_orderkey % 5 <> 0)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM st GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("batch", "kafka", "upsert-kafka", "avro", "schema-registry"),
)
def upsert_kafka_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upsert-kafka composed with the avro-confluent value format
    (UpsertKafkaDynamicTableFactory.java:68 accepts the same pluggable
    format stack as kafka; RegistryAvroSerializationSchema frames the
    value, the key rides the kafka record key = the emulation's json
    'k'): three producer batches — initial state, per-key updates (cents
    tripled for custkey % 3 == 0), tombstones for every 5th order — then
    a SQL aggregate through the DDL front door, which must see the
    normalized latest state decoded against the subject's registry
    schema."""
    import os
    import tempfile
    import uuid

    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish_upsert

    base_dir = os.path.join(
        tempfile.gettempdir(), "uka_rt_" + uuid.uuid4().hex[:10]
    )
    topic = os.path.join(base_dir, "topic")
    reg = os.path.join(base_dir, "registry.json")
    opts = {"avro-confluent.schema-registry.url": f"file://{reg}"}
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5E0) AS BIGINT)").alias(
            "cents"
        ),
    )
    base = o.select("o_orderkey", "o_orderstatus", "cents")
    publish_upsert(
        base, topic, ["o_orderkey"],
        value_format="avro-confluent", options=opts,
    )
    updates = o.filter(F.col("o_custkey") % 3 == 0).select(
        "o_orderkey", "o_orderstatus", (F.col("cents") * 3).alias("cents")
    )
    publish_upsert(
        updates, topic, ["o_orderkey"],
        value_format="avro-confluent", options=opts,
    )
    deletes = o.filter(F.col("o_orderkey") % 5 == 0).select(
        F.lit("-D").alias(ROW_KIND),
        "o_orderkey",
        "o_orderstatus",
        F.lit(None).cast("bigint").alias("cents"),
    )
    publish_upsert(
        deletes, topic, ["o_orderkey"], row_kind_col=ROW_KIND,
        value_format="avro-confluent", options=opts,
    )
    eng = EngineSession(spark)
    view = "uka_" + uuid.uuid4().hex[:8]
    eng.sql(
        f"""CREATE TABLE {view} (o_orderkey BIGINT, o_orderstatus STRING,
                                 cents BIGINT,
                                 PRIMARY KEY (o_orderkey) NOT ENFORCED)
            WITH ('connector' = 'upsert-kafka', 'topic' = '{topic}',
                  'value.format' = 'avro-confluent',
                  'avro-confluent.schema-registry.url' = 'file://{reg}')"""
    )
    return eng.sql(
        f"""SELECT o_orderstatus, COUNT(*) AS n, SUM(cents) AS cents
            FROM {view} GROUP BY o_orderstatus ORDER BY o_orderstatus"""
    )
