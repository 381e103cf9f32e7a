"""Confluent-registry Avro framing tests (flink-avro-confluent-registry:
ConfluentSchemaRegistryCoder wire format + RegistryAvro(De)Serialization
Schema): framing bytes, idempotent content-addressed ids, and schema
evolution — new schema id registered, old rows still readable."""

from __future__ import annotations

import struct

import pyspark.sql.functions as F
import pytest

from flink_1_12_2_spark.sources.schema_registry import (
    MAGIC,
    FileSchemaRegistry,
    avro_registry_decode,
    avro_registry_encode,
    decode_record,
    encode_record,
)

_V1 = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "v", "type": ["null", "string"]},
    ],
}
_V2 = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "v", "type": ["null", "string"]},
        {"name": "extra", "type": ["null", "long"]},
    ],
}


def test_wire_format_and_registry_ids(tmp_path):
    reg = FileSchemaRegistry(str(tmp_path / "reg.json"))
    id1 = reg.register("t-value", _V1)
    assert reg.register("t-value", _V1) == id1  # content-addressed
    id2 = reg.register("t-value", _V2)
    assert id2 != id1
    assert reg.latest("t-value") == (id2, _V2)
    assert reg.by_id(id1) == _V1
    msg = encode_record((7, "x"), _V1, id1)
    # ConfluentSchemaRegistryCoder: 0x00 magic, BE32 id, then the body
    assert msg[0:1] == MAGIC
    assert struct.unpack(">I", msg[1:5])[0] == id1
    assert decode_record(msg, {id1: _V1}, _V1) == (7, "x")
    with pytest.raises(ValueError, match="magic"):
        decode_record(b"\x01junk", {id1: _V1}, _V1)
    with pytest.raises(ValueError, match="not registered"):
        decode_record(MAGIC + struct.pack(">I", 99) + b"", {id1: _V1}, _V1)


def test_schema_evolution_old_rows_readable(tmp_path):
    """The format-evolution contract: rows framed under the v1 writer id
    decode against the v2 reader with the new field null; v2 rows carry
    it. Writer-only fields (v2 read with v1 writer id) are consumed
    positionally, so mixed topics never desync."""
    reg = FileSchemaRegistry(str(tmp_path / "reg.json"))
    id1 = reg.register("t-value", _V1)
    id2 = reg.register("t-value", _V2)
    old = encode_record((1, "a"), _V1, id1)
    new = encode_record((2, "b", 42), _V2, id2)
    schemas = reg.schema_table()
    assert decode_record(old, schemas, _V2) == (1, "a", None)
    assert decode_record(new, schemas, _V2) == (2, "b", 42)


def test_dataframe_encode_decode_evolution(spark, tmp_path):
    reg_path = str(tmp_path / "reg.json")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    v2 = spark.createDataFrame([(3, "c", 30)], ["k", "v", "extra"])
    f1 = avro_registry_encode(v1, reg_path, "t-value")
    rows1 = f1.collect()  # registers v1 and materializes frames
    f2 = avro_registry_encode(v2, reg_path, "t-value")
    rows2 = f2.collect()
    framed = spark.createDataFrame(rows1 + rows2, f1.schema)
    got = avro_registry_decode(framed, reg_path, "t-value")
    assert got.columns == ["k", "v", "extra"]
    by_k = {r["k"]: (r["v"], r["extra"]) for r in got.collect()}
    assert by_k == {1: ("a", None), 2: ("b", None), 3: ("c", 30)}
    # null field values survive the frame round-trip
    vn = spark.createDataFrame([(9, None)], "k long, v string")
    fn = avro_registry_encode(vn, reg_path, "t-value")
    gotn = avro_registry_decode(fn, reg_path, "t-value")
    r = gotn.first()
    assert (r["k"], r["v"], r["extra"]) == (9, None, None)


def test_kafka_raw_format_streams(spark, tmp_path):
    """The raw format also serves the STREAMING consumer path (Flink's
    kafka source with 'format' = 'raw')."""
    from flink_1_12_2_spark.sources.kafka_emu import (
        publish,
        read_topic_stream,
    )

    topic = str(tmp_path / "topic_s")
    payload = spark.createDataFrame(
        [(b"one",), (b"two",)], "value binary"
    )
    publish(payload.select(F.base64("value").alias("value")), topic)
    sdf = read_topic_stream(spark, topic, "raw", "")
    q = (
        sdf.writeStream.format("memory")
        .queryName("raw_stream_t")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt_raw")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        bytes(r["value"]) for r in spark.sql(
            "SELECT * FROM raw_stream_t"
        ).collect()
    )
    assert got == [b"one", b"two"]


def test_kafka_raw_format_roundtrip(spark, tmp_path):
    """'format' = 'raw' passthrough: binary payloads ride the text
    transport base64-coded and come back byte-identical."""
    from flink_1_12_2_spark.sources.kafka_emu import publish, read_topic_batch

    topic = str(tmp_path / "topic")
    payload = spark.createDataFrame(
        [(b"\x00\x01\xffbin",), (b"",)], "value binary"
    )
    publish(payload.select(F.base64("value").alias("value")), topic)
    back = read_topic_batch(spark, topic, "raw", "")
    assert sorted(bytes(r["value"]) for r in back.collect()) == [
        b"",
        b"\x00\x01\xffbin",
    ]


# ---- property tests: pure-Python codec, no Spark jobs per example ----

from hypothesis import given, settings
from hypothesis import strategies as st

_vals = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.one_of(st.none(), st.text(max_size=40)),
    st.one_of(st.none(), st.binary(max_size=24)),
    st.booleans(),
    st.floats(allow_nan=False, width=64),
)

_PROP_SCHEMA = {
    "type": "record",
    "name": "p",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": ["null", "bytes"]},
        {"name": "d", "type": "boolean"},
        {"name": "e", "type": "double"},
    ],
}


@settings(max_examples=200, deadline=None)
@given(_vals)
def test_registry_frame_roundtrip_property(row):
    """Any flat record round-trips bit-exactly through the registry
    framing (zigzag varints, nullable unions, utf-8, IEEE doubles)."""
    msg = encode_record(row, _PROP_SCHEMA, 7)
    assert decode_record(msg, {7: _PROP_SCHEMA}, _PROP_SCHEMA) == row


@settings(max_examples=100, deadline=None)
@given(st.lists(_vals, min_size=1, max_size=8))
def test_registry_evolution_roundtrip_property(rows):
    """Every record written under the NARROW writer schema (first two
    fields) decodes against the WIDE reader with the tail fields null —
    independent of the values involved."""
    narrow = {
        "type": "record",
        "name": "p",
        "fields": _PROP_SCHEMA["fields"][:2],
    }
    schemas = {1: narrow, 2: _PROP_SCHEMA}
    for row in rows:
        msg = encode_record(row[:2], narrow, 1)
        assert decode_record(msg, schemas, _PROP_SCHEMA) == (
            row[0], row[1], None, None, None,
        )


def test_kafka_connector_ddl_front_door(spark, tmp_path):
    """CREATE TABLE ... WITH ('connector'='kafka', ...) — the
    KafkaDynamicTableFactory option surface over the emulation: a json
    topic scans as a bounded table through plain SQL, and the
    avro-confluent format resolves the registry from its options."""
    import json as _json

    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish

    eng = EngineSession(spark)
    topic = str(tmp_path / "orders_topic")
    rows = spark.createDataFrame(
        [(_json.dumps({"k": i, "v": f"r{i}"}),) for i in range(5)],
        "value string",
    )
    publish(rows, topic)
    eng.sql(
        f"""CREATE TABLE kt (k BIGINT, v STRING) WITH (
              'connector' = 'kafka',
              'topic' = '{topic}',
              'properties.bootstrap.servers' = 'localhost:9092',
              'format' = 'json')"""
    )
    got = eng.sql("SELECT k, v FROM kt ORDER BY k").collect()
    assert [(r["k"], r["v"]) for r in got] == [
        (i, f"r{i}") for i in range(5)
    ]
    # streaming twin reads the same table via the registry metadata
    sdf = eng.stream_table("kt")
    assert sdf.isStreaming and set(sdf.columns) == {"k", "v"}

    # avro-confluent: registry-framed messages through the DDL
    reg_path = str(tmp_path / "reg.json")
    framed = avro_registry_encode(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
        reg_path,
        "avro_topic-value",
    )
    topic2 = str(tmp_path / "avro_topic")
    publish(framed.select(F.base64("value").alias("value")), topic2)
    eng.sql(
        f"""CREATE TABLE kav (k BIGINT, v STRING) WITH (
              'connector' = 'kafka',
              'topic' = '{topic2}',
              'format' = 'avro-confluent',
              'avro-confluent.schema-registry.url' = 'file://{reg_path}')"""
    )
    got = {r["k"]: r["v"] for r in eng.sql("SELECT * FROM kav").collect()}
    assert got == {1: "a", 2: "b"}


def test_kafka_connector_ddl_rejects_unknown_format(spark, tmp_path):
    import pytest as _pytest

    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    with _pytest.raises(ValueError, match="not supported"):
        eng.sql(
            """CREATE TABLE bad (k BIGINT) WITH (
                 'connector' = 'kafka', 'topic' = '/tmp/x',
                 'format' = 'protobuf')"""
        )


def test_kafka_connector_insert_publishes_and_rereads(spark, tmp_path):
    """INSERT INTO a kafka table = a producer batch; follow-up SELECTs in
    the same session see the published rows (source AND sink, like every
    registered Flink table). Covers json and avro-confluent sinks."""
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    topic = str(tmp_path / "sink_topic")
    eng.sql(
        f"""CREATE TABLE ks (k BIGINT, v STRING) WITH (
              'connector' = 'kafka', 'topic' = '{topic}',
              'format' = 'json')"""
    )
    res = eng.sql("INSERT INTO ks VALUES (1, 'a'), (2, 'b')")
    assert res.first()["rows_written"] == 2
    eng.sql("INSERT INTO ks VALUES (3, 'c')")
    got = {r["k"]: r["v"] for r in eng.sql("SELECT * FROM ks").collect()}
    assert got == {1: "a", 2: "b", 3: "c"}

    reg = str(tmp_path / "reg.json")
    topic2 = str(tmp_path / "sink_avro")
    eng.sql(
        f"""CREATE TABLE kas (k BIGINT, v STRING) WITH (
              'connector' = 'kafka', 'topic' = '{topic2}',
              'format' = 'avro-confluent',
              'avro-confluent.schema-registry.url' = 'file:{reg}')"""
    )
    eng.sql("INSERT INTO kas VALUES (7, 'x')")
    got = [(r["k"], r["v"]) for r in eng.sql("SELECT * FROM kas").collect()]
    assert got == [(7, "x")]
    # the subject registered under the factory's <topic>-value default
    assert FileSchemaRegistry(reg).latest("sink_avro-value")


def test_upsert_kafka_connector_ddl(spark, tmp_path):
    """upsert-kafka front door (UpsertKafkaDynamicTableFactory.java:68):
    PRIMARY KEY required; INSERTs are per-key upserts; a changelog
    SELECT's -D rows publish tombstones; the table reads as the
    normalized latest state; stream_table exposes the changelog."""
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    topic = str(tmp_path / "uk_topic")
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        eng.sql(
            f"""CREATE TABLE uk0 (k BIGINT, v STRING) WITH (
                  'connector' = 'upsert-kafka', 'topic' = '{topic}')"""
        )
    eng.sql(
        f"""CREATE TABLE uk (k BIGINT, v STRING, n BIGINT,
                             PRIMARY KEY (k) NOT ENFORCED) WITH (
              'connector' = 'upsert-kafka', 'topic' = '{topic}',
              'value.format' = 'json')"""
    )
    eng.sql("INSERT INTO uk VALUES (1, 'a', 10), (2, 'b', 20)")
    eng.sql("INSERT INTO uk VALUES (1, 'a2', 11), (3, 'c', 30)")
    got = {
        r["k"]: (r["v"], r["n"])
        for r in eng.sql("SELECT * FROM uk").collect()
    }
    assert got == {1: ("a2", 11), 2: ("b", 20), 3: ("c", 30)}
    # tombstone via a changelog frame (the upsert sink maps -D to null)
    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.sources.kafka_emu import publish_upsert

    dele = spark.createDataFrame(
        [("-D", 2, None, None)], f"{ROW_KIND} string, k bigint, v string, n bigint"
    )
    publish_upsert(dele, topic, ["k"], row_kind_col=ROW_KIND)
    eng.register_table("uk", eng.meta("uk"))  # refresh the view
    got = {r["k"] for r in eng.sql("SELECT * FROM uk").collect()}
    assert got == {1, 3}
    # streaming changelog twin
    sdf = eng.stream_table("uk")
    assert sdf.isStreaming and ROW_KIND in sdf.columns


def test_upsert_kafka_avro_evolution_and_tombstones(spark, tmp_path):
    """upsert-kafka + avro-confluent values (UpsertKafkaDynamicTableFactory
    .java:68 — the pluggable format stack): batches written under schema
    v1 (k, v) coexist with batches under evolved v2 (k, v, n) on one
    topic; the reader resolves every writer id against the subject's
    LATEST schema (v1 rows decode n as null), and v1-era tombstones keep
    evicting keys regardless of the value schema that follows them."""
    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import (
        publish_upsert,
        read_upsert_topic_batch,
    )
    from flink_1_12_2_spark.sources.schema_registry import FileSchemaRegistry

    topic = str(tmp_path / "uka_topic")
    reg = str(tmp_path / "registry.json")
    opts = {"avro-confluent.schema-registry.url": f"file:{reg}"}
    subject = "uka_topic-value"

    # schema v1: (k, v)
    b1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    publish_upsert(b1, topic, ["k"], value_format="avro-confluent",
                   options=opts)
    v1_id, _ = FileSchemaRegistry(reg).latest(subject)
    # v1-era tombstone for k=2 (no value bytes at all)
    dele = spark.createDataFrame(
        [("-D", 2, None)], f"{ROW_KIND} string, k bigint, v string"
    )
    publish_upsert(dele, topic, ["k"], row_kind_col=ROW_KIND,
                   value_format="avro-confluent", options=opts)
    # schema v2 evolves the value: (k, v, n) — a NEW id on the subject
    b2 = spark.createDataFrame(
        [(3, "c2", 30), (4, "d", 40)], "k bigint, v string, n bigint"
    )
    publish_upsert(b2, topic, ["k"], value_format="avro-confluent",
                   options=opts)
    v2_id, v2_schema = FileSchemaRegistry(reg).latest(subject)
    assert v2_id != v1_id
    assert [f["name"] for f in v2_schema["fields"]] == ["k", "v", "n"]

    got = {
        r["k"]: (r["v"], r["n"])
        for r in read_upsert_topic_batch(
            spark, topic, "k bigint, v string, n bigint", ["k"],
            value_format="avro-confluent", options=opts,
        ).collect()
    }
    # k=1 is a v1-era row: decodes against the latest reader with n null;
    # k=2 stays tombstoned; k=3 took the v2 update; k=4 is v2-new
    assert got == {1: ("a", None), 3: ("c2", 30), 4: ("d", 40)}

    # the DDL front door composes the same way
    eng = EngineSession(spark)
    eng.sql(
        f"""CREATE TABLE uka_ev (k BIGINT, v STRING, n BIGINT,
                                 PRIMARY KEY (k) NOT ENFORCED) WITH (
              'connector' = 'upsert-kafka', 'topic' = '{topic}',
              'value.format' = 'avro-confluent',
              'avro-confluent.schema-registry.url' = 'file:{reg}')"""
    )
    rows = {r["k"] for r in eng.sql("SELECT * FROM uka_ev").collect()}
    assert rows == {1, 3, 4}
    # and the changelog view decodes avro bodies + v1 tombstone keys
    cl = eng.stream_table("uka_ev")
    assert cl.isStreaming and ROW_KIND in cl.columns


def test_upsert_intra_batch_update_pair_is_deterministic(spark, tmp_path):
    """A changelog batch holding the standard -U/+U pair for one key must
    resolve to the +U value: UPDATE_BEFORE is dropped at publish (the
    sink's changelog mode has no -U — planner DropUpdateBefore parity),
    so the tombstone-vs-update coin flip of the old same-seq envelopes
    cannot occur; remaining intra-batch order rides the per-row
    sub-sequence."""
    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.sources.kafka_emu import (
        publish_upsert,
        read_upsert_topic_batch,
        read_upsert_topic_changelog,
    )

    topic = str(tmp_path / "uk_pair")
    batch = spark.createDataFrame(
        [("+I", 1, "x"), ("-U", 1, "x"), ("+U", 1, "y"), ("+I", 2, "w")],
        f"{ROW_KIND} string, k bigint, v string",
    )
    publish_upsert(batch, topic, ["k"], row_kind_col=ROW_KIND)
    got = {
        r["k"]: r["v"]
        for r in read_upsert_topic_batch(
            spark, topic, "k bigint, v string", ["k"]
        ).collect()
    }
    assert got == {1: "y", 2: "w"}
    # the changelog view carries NO -U rows and a distinct sub-seq per row
    cl = read_upsert_topic_changelog(
        spark, topic, "k bigint, v string", ["k"]
    ).collect()
    assert all(r[ROW_KIND] == "+U" for r in cl) and len(cl) == 3
    assert len({(r["__seq"], r["__sub"]) for r in cl}) == 3


def test_upsert_tombstone_key_with_parameterized_types(spark, tmp_path):
    """Tombstone key decode must survive parameterized column types in
    the payload schema: a raw ','-split of 'amt decimal(10,2), k bigint'
    breaks mid-DECIMAL and corrupts the key struct (r11 advice); the key
    schema now comes from the real DDL parser."""
    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.sources.kafka_emu import (
        publish_upsert,
        read_upsert_topic_batch,
        read_upsert_topic_changelog,
    )

    schema = "amt decimal(10,2), k bigint, v string"
    topic = str(tmp_path / "uk_dec")
    from decimal import Decimal

    b1 = spark.createDataFrame(
        [(Decimal("1.50"), 1, "a"), (Decimal("2.25"), 2, "b")], schema
    )
    publish_upsert(b1, topic, ["k"])
    dele = spark.createDataFrame(
        [("-D", None, 2, None)], f"{ROW_KIND} string, {schema}"
    )
    publish_upsert(dele, topic, ["k"], row_kind_col=ROW_KIND)
    got = {
        r["k"] for r in read_upsert_topic_batch(
            spark, topic, schema, ["k"]
        ).collect()
    }
    assert got == {1}
    # the -D changelog row must decode its key field, not null it
    cl = read_upsert_topic_changelog(spark, topic, schema, ["k"])
    dels = [r for r in cl.collect() if r[ROW_KIND] == "-D"]
    assert len(dels) == 1 and dels[0]["k"] == 2


def test_kafka_scan_resolves_at_query_time(spark, tmp_path):
    """Flink's kafka scan resolves when the query runs, not when the
    table is created (r11 advice: the emulated view used to pin its file
    index at DDL time, hiding external publishes). Publishing to the
    topic OUTSIDE the front door must be visible to the next SELECT with
    no re-CREATE."""
    import pyspark.sql.functions as SF

    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish, publish_upsert

    eng = EngineSession(spark)
    topic = str(tmp_path / "kt")
    publish(
        spark.createDataFrame([(1, "a")], "k bigint, v string").select(
            SF.to_json(SF.struct("k", "v")).alias("value")
        ),
        topic,
    )
    eng.sql(
        f"""CREATE TABLE kqt (k BIGINT, v STRING) WITH (
              'connector' = 'kafka', 'topic' = '{topic}',
              'format' = 'json')"""
    )
    assert eng.sql("SELECT COUNT(*) AS n FROM kqt").collect()[0]["n"] == 1
    # external publish AFTER the DDL — no front-door INSERT, no re-CREATE
    publish(
        spark.createDataFrame([(2, "b"), (3, "c")], "k bigint, v string")
        .select(SF.to_json(SF.struct("k", "v")).alias("value")),
        topic,
    )
    assert eng.sql("SELECT COUNT(*) AS n FROM kqt").collect()[0]["n"] == 3
    # upsert-kafka twin: external tombstone evicts on the next SELECT
    utopic = str(tmp_path / "ukt")
    eng.sql(
        f"""CREATE TABLE ukqt (k BIGINT, v STRING,
                               PRIMARY KEY (k) NOT ENFORCED) WITH (
              'connector' = 'upsert-kafka', 'topic' = '{utopic}')"""
    )
    eng.sql("INSERT INTO ukqt VALUES (1, 'a'), (2, 'b')")
    publish_upsert(
        spark.createDataFrame(
            [("-D", 1, None)], "_row_kind string, k bigint, v string"
        ),
        utopic, ["k"], row_kind_col="_row_kind",
    )
    assert {r["k"] for r in eng.sql("SELECT * FROM ukqt").collect()} == {2}
    # eng.table() resolves the same way
    assert {r["k"] for r in eng.table("ukqt").collect()} == {2}


def test_kafka_scan_startup_modes(spark, tmp_path):
    """scan.startup.mode (KafkaOptions in the 1.12 kafka table factory):
    latest-offset pins an exclusion snapshot when the scan is first
    built — batches already on the topic are invisible, batches
    published after are consumed; the snapshot survives query-time
    re-resolution (the consumer's starting offsets don't move once
    resolved). timestamp starts from the first batch at/after the given
    epoch-millis. group-offsets is rejected descriptively, and
    upsert-kafka rejects the option outright."""
    import time

    import pyspark.sql.functions as SF
    import pytest as _pytest

    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish

    def _pub(topic, *kv):
        publish(
            spark.createDataFrame(list(kv), "k bigint, v string").select(
                SF.to_json(SF.struct("k", "v")).alias("value")
            ),
            topic,
        )

    eng = EngineSession(spark)
    topic = str(tmp_path / "kt_latest")
    _pub(topic, (1, "old"))
    eng.sql(
        f"""CREATE TABLE k_latest (k BIGINT, v STRING) WITH (
              'connector' = 'kafka', 'topic' = '{topic}',
              'format' = 'json', 'scan.startup.mode' = 'latest-offset')"""
    )
    assert eng.sql("SELECT COUNT(*) AS n FROM k_latest").collect()[0]["n"] == 0
    _pub(topic, (2, "new"), (3, "newer"))
    got = {r["k"] for r in eng.sql("SELECT * FROM k_latest").collect()}
    assert got == {2, 3}  # pre-DDL batch stays excluded, new ones flow

    # timestamp mode: only batches at/after the cut
    topic2 = str(tmp_path / "kt_ts")
    _pub(topic2, (10, "before"))
    time.sleep(0.05)
    cut_ms = int(time.time() * 1000)
    time.sleep(0.05)
    _pub(topic2, (11, "after"))
    eng.sql(
        f"""CREATE TABLE k_ts (k BIGINT, v STRING) WITH (
              'connector' = 'kafka', 'topic' = '{topic2}',
              'format' = 'json', 'scan.startup.mode' = 'timestamp',
              'scan.startup.timestamp-millis' = '{cut_ms}')"""
    )
    assert {r["k"] for r in eng.sql("SELECT * FROM k_ts").collect()} == {11}

    # modes with no emulation analogue fail loudly at scan build
    topic3 = str(tmp_path / "kt_go")
    _pub(topic3, (1, "x"))
    with _pytest.raises(Exception, match="group-offsets"):
        eng.sql(
            f"""CREATE TABLE k_go (k BIGINT, v STRING) WITH (
                  'connector' = 'kafka', 'topic' = '{topic3}',
                  'format' = 'json',
                  'scan.startup.mode' = 'group-offsets')"""
        )
    # upsert-kafka: no startup mode at all (state rebuilds from earliest)
    with _pytest.raises(ValueError, match="scan.startup.mode"):
        eng.sql(
            f"""CREATE TABLE uk_su (k BIGINT, v STRING,
                                    PRIMARY KEY (k) NOT ENFORCED) WITH (
                  'connector' = 'upsert-kafka', 'topic' = '{topic3}',
                  'scan.startup.mode' = 'latest-offset')"""
        )

    # the streaming twin honors the same snapshot: a full AvailableNow
    # run over the topic must never surface the pre-DDL batch
    from flink_1_12_2_spark.streaming.core import run_to_memory

    sdf = eng.stream_table("k_latest")
    assert sdf.isStreaming
    got = {r["k"] for r in run_to_memory(sdf).collect()}
    assert got == {2, 3}


def test_upsert_kafka_value_fields_except_key(spark, tmp_path):
    """value.fields-include = EXCEPT_KEY (UpsertKafkaDynamicTableFactory
    VALUE_FIELDS_INCLUDE): the value serializes only non-key columns;
    readers reconstruct key columns from the record key on EVERY row.
    Verified for both value formats, the normalized scan, the changelog
    view, and the DDL front door."""
    import json as _json

    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import (
        publish_upsert,
        read_upsert_topic_batch,
        read_upsert_topic_changelog,
    )

    schema = "k bigint, v string, n bigint"
    for fmt in ("json", "avro-confluent"):
        topic = str(tmp_path / f"uk_ek_{fmt}")
        opts = {
            "value.fields-include": "EXCEPT_KEY",
            "avro-confluent.schema-registry.url":
                f"file:{tmp_path}/reg_{fmt}.json",
        }
        b1 = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], schema
        )
        publish_upsert(b1, topic, ["k"], value_format=fmt, options=opts)
        dele = spark.createDataFrame(
            [("-D", 2, None, None)], f"{ROW_KIND} string, {schema}"
        )
        publish_upsert(dele, topic, ["k"], row_kind_col=ROW_KIND,
                       value_format=fmt, options=opts)
        # the wire really excludes the key from the value payload
        if fmt == "json":
            import glob
            import os as _os

            lines = []
            for f in glob.glob(f"{topic}/*/part*"):
                lines += open(f).read().splitlines()
            live = [_json.loads(ln) for ln in lines if _json.loads(ln)["v"]]
            assert all("k" not in e["v"] for e in live), live
        got = {
            r["k"]: (r["v"], r["n"])
            for r in read_upsert_topic_batch(
                spark, topic, schema, ["k"], value_format=fmt, options=opts
            ).collect()
        }
        assert got == {1: ("a", 10)}, (fmt, got)
        cl = read_upsert_topic_changelog(
            spark, topic, schema, ["k"], value_format=fmt, options=opts
        ).collect()
        assert {(r[ROW_KIND], r["k"]) for r in cl} == {
            ("+U", 1), ("+U", 2), ("-D", 2),
        }, (fmt, cl)

    # DDL front door validates and threads the option through
    eng = EngineSession(spark)
    topic = str(tmp_path / "uk_ek_ddl")
    eng.sql(
        f"""CREATE TABLE uk_ek (k BIGINT, v STRING,
                                PRIMARY KEY (k) NOT ENFORCED) WITH (
              'connector' = 'upsert-kafka', 'topic' = '{topic}',
              'value.fields-include' = 'EXCEPT_KEY')"""
    )
    eng.sql("INSERT INTO uk_ek VALUES (7, 'x'), (8, 'y')")
    assert {
        (r["k"], r["v"]) for r in eng.sql("SELECT * FROM uk_ek").collect()
    } == {(7, "x"), (8, "y")}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="EXCEPT_KEY"):
        eng.sql(
            f"""CREATE TABLE uk_bad (k BIGINT, v STRING,
                                     PRIMARY KEY (k) NOT ENFORCED) WITH (
                  'connector' = 'upsert-kafka', 'topic' = '{topic}',
                  'value.fields-include' = 'SOME')"""
        )


def test_kafka_topic_list_and_pattern(spark, tmp_path):
    """The 1.12 factory's source addressing: 'topic' accepts a
    semicolon-separated list and 'topic-pattern' a pattern (a filesystem
    glob here) — both union the matched topics' batches; the two options
    are mutually exclusive, and neither form can be a sink (a producer
    needs one concrete topic). New topics matching the pattern appear on
    the next query (scan resolves at query time)."""
    import pyspark.sql.functions as SF
    import pytest as _pytest

    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish

    def _pub(topic, *kv):
        publish(
            spark.createDataFrame(list(kv), "k bigint, v string").select(
                SF.to_json(SF.struct("k", "v")).alias("value")
            ),
            topic,
        )

    eng = EngineSession(spark)
    t1, t2 = str(tmp_path / "orders_eu"), str(tmp_path / "orders_us")
    _pub(t1, (1, "eu"))
    _pub(t2, (2, "us"))
    eng.sql(
        f"""CREATE TABLE k_list (k BIGINT, v STRING) WITH (
              'connector' = 'kafka', 'topic' = '{t1};{t2}',
              'format' = 'json')"""
    )
    assert {r["k"] for r in eng.sql("SELECT * FROM k_list").collect()} == {
        1, 2,
    }
    # streaming union of the list
    from flink_1_12_2_spark.streaming.core import run_to_memory

    got = {r["k"] for r in run_to_memory(eng.stream_table("k_list")).collect()}
    assert got == {1, 2}

    eng.sql(
        f"""CREATE TABLE k_pat (k BIGINT, v STRING) WITH (
              'connector' = 'kafka',
              'topic-pattern' = '{tmp_path}/orders_*',
              'format' = 'json')"""
    )
    assert {r["k"] for r in eng.sql("SELECT * FROM k_pat").collect()} == {
        1, 2,
    }
    # a NEW topic matching the pattern appears on the next query
    t3 = str(tmp_path / "orders_apac")
    _pub(t3, (3, "apac"))
    assert {r["k"] for r in eng.sql("SELECT * FROM k_pat").collect()} == {
        1, 2, 3,
    }

    with _pytest.raises(ValueError, match="exclusive"):
        eng.sql(
            f"""CREATE TABLE k_both (k BIGINT) WITH (
                  'connector' = 'kafka', 'topic' = '{t1}',
                  'topic-pattern' = '{tmp_path}/orders_*')"""
        )
    for tbl in ("k_list", "k_pat"):
        with _pytest.raises(ValueError, match="single 'topic'"):
            eng.sql(f"INSERT INTO {tbl} VALUES (9, 'x')")


def test_kafka_metadata_columns(spark, tmp_path):
    """FLIP-107 metadata columns (new in Flink 1.12 —
    SqlMetadataColumn + the kafka source's readable metadata): `name
    TYPE METADATA [FROM 'key'] [VIRTUAL]` columns read from the
    connector beside the payload. Emulation mappings: topic = the topic
    directory name, partition = 0, timestamp = the producer batch's
    mtime (the scan.startup 'timestamp' axis), timestamp-type =
    'CreateTime'. Declared column ORDER is preserved in SELECT *;
    INSERT maps positionally over physical columns only; unsupported
    keys and non-kafka connectors fail descriptively."""
    import datetime as _dt

    import pyspark.sql.functions as SF
    import pytest as _pytest

    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish

    eng = EngineSession(spark)
    topic = str(tmp_path / "md_topic")
    publish(
        spark.createDataFrame([(1, "a")], "k bigint, v string").select(
            SF.to_json(SF.struct("k", "v")).alias("value")
        ),
        topic,
    )
    eng.sql(
        f"""CREATE TABLE kmd (
              k BIGINT,
              topic STRING METADATA VIRTUAL,
              v STRING,
              part INT METADATA FROM 'partition' VIRTUAL,
              ts TIMESTAMP_LTZ METADATA FROM 'timestamp',
              tstype STRING METADATA FROM 'timestamp-type'
            ) WITH ('connector' = 'kafka', 'topic' = '{topic}',
                    'format' = 'json')"""
    )
    # declared order, not payload-then-metadata
    df = eng.sql("SELECT * FROM kmd")
    assert df.columns == ["k", "topic", "v", "part", "ts", "tstype"]
    r = df.first()
    assert (r["k"], r["v"], r["topic"], r["part"], r["tstype"]) == (
        1, "a", "md_topic", 0, "CreateTime",
    )
    assert isinstance(r["ts"], _dt.datetime)
    # INSERT maps positionally over the PHYSICAL columns only (metadata
    # is read-only — Flink's VIRTUAL semantics)
    eng.sql("INSERT INTO kmd VALUES (2, 'b')")
    got = {(r["k"], r["v"]) for r in eng.sql("SELECT k, v FROM kmd").collect()}
    assert got == {(1, "a"), (2, "b")}
    # the streaming twin carries the same metadata
    from flink_1_12_2_spark.streaming.core import run_to_memory

    srows = run_to_memory(eng.stream_table("kmd")).collect()
    assert {r["topic"] for r in srows} == {"md_topic"}
    assert {r["k"] for r in srows} == {1, 2}

    # unsupported metadata key → descriptive error at scan build
    with _pytest.raises(Exception, match="offset"):
        eng.sql(
            f"""CREATE TABLE kmd_bad (k BIGINT,
                  off BIGINT METADATA FROM 'offset'
                ) WITH ('connector' = 'kafka', 'topic' = '{topic}',
                        'format' = 'json')"""
        )
    # metadata on a non-kafka connector → rejected at parse
    with _pytest.raises(ValueError, match="METADATA"):
        eng.sql(
            """CREATE TABLE fs_md (k BIGINT, t STRING METADATA FROM 'topic')
               WITH ('connector' = 'filesystem', 'path' = '/tmp/x')"""
        )


def test_kafka_metadata_columns_cdc_and_avro(spark, tmp_path):
    """Metadata columns compose with the CDC and avro-confluent value
    formats (the decode paths carry them through)."""
    import pyspark.sql.functions as SF

    from flink_1_12_2_spark.sources.kafka_emu import (
        publish,
        read_topic_batch,
        topic_table,
    )
    from flink_1_12_2_spark.sources.schema_registry import (
        avro_registry_encode,
    )

    md = (("topic", "string", "topic"), ("part", "int", "partition"))
    # debezium envelope with metadata passthrough
    topic = str(tmp_path / "cdc_md")
    env = spark.createDataFrame([(7, 1.5)], "k bigint, p double").select(
        SF.to_json(
            SF.struct(
                SF.lit(None).cast("struct<k bigint, p double>").alias("before"),
                SF.struct("k", "p").alias("after"),
                SF.lit("c").alias("op"),
                SF.lit(1).cast("bigint").alias("ts_ms"),
            )
        ).alias("value")
    )
    publish(env, topic)
    got = read_topic_batch(
        spark, topic, "debezium-json", "k bigint, p double",
        metadata_cols=md,
    ).collect()
    assert len(got) == 1
    assert (got[0]["topic"], got[0]["part"], got[0]["k"]) == ("cdc_md", 0, 7)

    # avro-confluent with metadata rides the struct decode
    topic2 = str(tmp_path / "avro_md")
    reg = str(tmp_path / "reg.json")
    opts = {"avro-confluent.schema-registry.url": f"file:{reg}",
            "avro-confluent.subject": "avro_md-value"}
    framed = avro_registry_encode(
        spark.createDataFrame([(9, "z")], "k bigint, v string"),
        reg, "avro_md-value",
    )
    publish(framed.select(SF.base64("value").alias("value")), topic2)
    got2 = topic_table(
        spark, topic2, "avro-confluent", options=opts, metadata_cols=md
    ).collect()
    assert len(got2) == 1
    assert (got2[0]["k"], got2[0]["v"], got2[0]["topic"], got2[0]["part"]) \
        == (9, "z", "avro_md", 0)


def test_upsert_avro_tombstone_then_reinsert_in_one_batch(spark, tmp_path):
    """Intra-batch order survives the avro path's live/tombstone split:
    a -D followed by a +I re-inserting the SAME key must resolve to the
    re-insert (the union must not stamp tombstones after live rows)."""
    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.sources.kafka_emu import (
        publish_upsert,
        read_upsert_topic_batch,
    )

    topic = str(tmp_path / "t_av")
    reg = str(tmp_path / "registry.json")
    opts = {"avro-confluent.schema-registry.url": f"file:{reg}"}
    batch = spark.createDataFrame(
        [("+I", 1, "first"), ("-D", 1, None), ("+I", 1, "again")],
        f"{ROW_KIND} string, k int, v string",
    ).coalesce(1)
    publish_upsert(
        batch, topic, ["k"], row_kind_col=ROW_KIND,
        value_format="avro-confluent", options=opts,
    )
    rows = read_upsert_topic_batch(
        spark, topic, "k int, v string", ["k"],
        value_format="avro-confluent", options=opts,
    ).collect()
    assert len(rows) == 1 and rows[0]["v"] == "again"


def test_kafka_metadata_on_topic_list_stream(spark, tmp_path):
    """Metadata columns must resolve on a semicolon TOPIC LIST (per-frame
    attachment — Spark's _metadata struct does not resolve over a Union)
    and report each record's OWN topic name."""
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish
    from flink_1_12_2_spark.streaming.core import run_to_memory

    eng = EngineSession(spark)
    ta, tb = str(tmp_path / "lista"), str(tmp_path / "listb")
    publish(spark.createDataFrame([('{"k": 1}',)], "value string"), ta)
    publish(spark.createDataFrame([('{"k": 2}',)], "value string"), tb)
    eng.sql(
        f"""CREATE TABLE klist (k BIGINT, tname STRING METADATA
            FROM 'topic' VIRTUAL) WITH (
            'connector'='kafka', 'topic'='{ta};{tb}', 'format'='json')"""
    )
    got = {
        r["k"]: r["tname"]
        for r in run_to_memory(eng.stream_table("klist")).collect()
    }
    assert got == {1: "lista", 2: "listb"}
    # bounded scan agrees
    got_b = {r["k"]: r["tname"] for r in spark.table("klist").collect()}
    assert got_b == {1: "lista", 2: "listb"}


def test_kafka_metadata_topic_name_on_transactional_batch(spark, tmp_path):
    """The 'topic' metadata value must be the TOPIC name even for rows
    published through an exactly-once transaction (whose files nest one
    directory deeper than plain producer batches)."""
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import (
        begin_transaction,
        commit_transaction,
        publish_transactional,
    )

    eng = EngineSession(spark)
    topic = str(tmp_path / "txn_topic")
    import os

    os.makedirs(topic, exist_ok=True)
    txn = begin_transaction(topic)
    publish_transactional(
        spark.createDataFrame([('{"k": 7}',)], "value string"), topic, txn
    )
    commit_transaction(topic, txn)
    eng.sql(
        f"""CREATE TABLE ktxn (k BIGINT, tname STRING METADATA
            FROM 'topic' VIRTUAL) WITH (
            'connector'='kafka', 'topic'='{topic}', 'format'='json')"""
    )
    rows = spark.table("ktxn").collect()
    assert [(r["k"], r["tname"]) for r in rows] == [(7, "txn_topic")]


def test_debezium_avro_confluent_pipeline(spark, tmp_path):
    """debezium-avro-confluent (DebeziumAvroDeserializationSchema.java:119
    — the before/after/op envelope, Avro-coded against the registry):
    producer frames envelope records (nested-record Avro), the table
    scan decodes to changelog rows identical to debezium-json's."""
    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import publish
    from flink_1_12_2_spark.sources.schema_registry import (
        avro_registry_encode,
    )

    topic = str(tmp_path / "dbz_avro")
    reg = str(tmp_path / "registry.json")
    payload = "id bigint, name string"
    env_schema = (
        f"before struct<{payload}>, after struct<{payload}>, "
        "op string, ts_ms bigint"
    )
    envelopes = spark.createDataFrame(
        [
            (None, (1, "ann"), "c", 1000),
            (None, (2, "bob"), "c", 1001),
            ((2, "bob"), (2, "bo"), "u", 1002),
            ((1, "ann"), None, "d", 1003),
        ],
        env_schema,
    )
    framed = avro_registry_encode(
        envelopes, reg, "dbz_avro-value",
        payload_cols=["before", "after", "op", "ts_ms"],
    )
    import os

    os.makedirs(topic, exist_ok=True)
    # the text transport carries binary base64-coded (raw-format contract)
    import pyspark.sql.functions as F

    publish(framed.select(F.base64("value").alias("value")), topic)

    eng = EngineSession(spark)
    eng.sql(
        f"""CREATE TABLE dbz (id BIGINT, name STRING) WITH (
            'connector'='kafka', 'topic'='{topic}',
            'format'='debezium-avro-confluent',
            'avro-confluent.schema-registry.url'='file:{reg}')"""
    )
    rows = sorted(
        (r["_row_kind"], r["id"], r["name"])
        for r in spark.table("dbz").collect()
    )
    assert rows == [
        ("+I", 1, "ann"),
        ("+I", 2, "bob"),
        ("+U", 2, "bo"),
        ("-D", 1, "ann"),
        ("-U", 2, "bob"),
    ]
