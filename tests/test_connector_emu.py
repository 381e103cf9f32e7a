"""Elasticsearch sink + HBase scan emulations (r10 connector breadth).

Reference semantics pinned here:
- elasticsearch-base RowElasticsearchSinkFunction.java:76 — +I/+U upsert
  the doc at the KeyExtractor ``_id``; -D deletes it; -U is dropped.
- KeyExtractor.java:40 — PK fields formatted per type, joined with the
  key delimiter; TIMESTAMP formats as LocalDateTime.toString (ISO 'T').
- HBaseTableSchema.java:48 — rowkey + families of typed qualifiers;
  scans return the latest cell version; absent qualifiers are NULL.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F
import pytest


def _tmp(prefix: str) -> str:
    return os.path.join(tempfile.gettempdir(), prefix + uuid.uuid4().hex[:10])


def test_es_doc_id_formats_timestamp_and_delimiter(spark):
    from flink_1_12_2_spark.sources.elasticsearch_emu import doc_id_expr

    df = spark.sql(
        """SELECT 42 AS k1, 'a_b' AS k2,
                  TIMESTAMP '2000-03-01 12:34:56' AS k3,
                  DATE '1999-12-31' AS k4"""
    )
    got = df.select(
        doc_id_expr(df, ["k1", "k2", "k3", "k4"], key_delimiter="|").alias("i")
    ).first()["i"]
    assert got == "42|a_b|2000-03-01T12:34:56|1999-12-31"


def test_es_doc_id_timestamp_localdatetime_tostring_parity(spark):
    """TimestampData.toString() / LocalDateTime.toString() cases: whole
    minute drops the seconds field, fractions keep full (non-colliding)
    precision in 3- or 6-digit groups with no trailing zeros."""
    from flink_1_12_2_spark.sources.elasticsearch_emu import doc_id_expr

    cases = [
        ("2000-03-01 12:34:00", "2000-03-01T12:34"),
        ("2000-03-01 12:34:56", "2000-03-01T12:34:56"),
        ("2000-03-01 12:34:00.500", "2000-03-01T12:34:00.500"),
        ("2000-03-01 12:34:56.123", "2000-03-01T12:34:56.123"),
        ("2000-03-01 12:34:56.123456", "2000-03-01T12:34:56.123456"),
        ("2000-03-01 12:34:56.000001", "2000-03-01T12:34:56.000001"),
    ]
    sel = " UNION ALL ".join(
        f"SELECT TIMESTAMP '{ts}' AS k, '{want}' AS want" for ts, want in cases
    )
    df = spark.sql(sel)
    rows = df.select(
        doc_id_expr(df, ["k"]).alias("got"), "want"
    ).collect()
    for r in rows:
        assert r["got"] == r["want"], (r["got"], r["want"])
    # distinct sub-second keys never share an _id
    assert len({r["got"] for r in rows}) == len(cases)


def test_es_upsert_then_delete_across_batches(spark):
    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.sources.elasticsearch_emu import (
        es_scan,
        es_upsert_batch,
    )

    idx = _tmp("es_ut_")
    b1 = spark.createDataFrame(
        [("+I", 1, "v1", 0), ("+I", 2, "v1", 0), ("+U", 1, "v2", 1)],
        f"{ROW_KIND} string, k bigint, payload string, seq int",
    )
    b2 = spark.createDataFrame(
        [("+U", 2, "v2", 2), ("-D", 1, "", 3), ("+I", 3, "v1", 4)],
        f"{ROW_KIND} string, k bigint, payload string, seq int",
    )
    for b in (b1, b2):
        es_upsert_batch(b, idx, pk_cols=["k"], order_cols=["seq"])
    rows = {
        r["_id"]: r["payload"]
        for r in es_scan(spark, idx).select("_id", "payload").collect()
    }
    # doc 1 deleted, doc 2 upserted to v2 (overwriting batch-1 state), doc 3 new
    assert rows == {"2": "v2", "3": "v1"}


def test_es_update_before_rows_are_dropped(spark):
    """-U carries the PRE-update image; the upsert sink must ignore it
    (DropUpdateBefore), or the stale image would win over +U on seq."""
    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.sources.elasticsearch_emu import (
        es_scan,
        es_upsert_batch,
    )

    idx = _tmp("es_ub_")
    b = spark.createDataFrame(
        [("+I", 1, "old", 0), ("-U", 1, "old", 1), ("+U", 1, "new", 1)],
        f"{ROW_KIND} string, k bigint, payload string, seq int",
    )
    es_upsert_batch(b, idx, pk_cols=["k"], order_cols=["seq"])
    assert [
        r["payload"] for r in es_scan(spark, idx).collect()
    ] == ["new"]


def test_es_streaming_sink_availablenow(spark, tmp_path):
    """foreachBatch flavor over a rate-limited file stream: same final
    state as the batch merge."""
    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.sources.elasticsearch_emu import (
        es_scan,
        es_sink_stream,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("+I", 1, 10, 0), ("+U", 1, 20, 1), ("+I", 2, 5, 0)],
        f"{ROW_KIND} string, k bigint, v bigint, seq int",
    ).write.json(src)
    stream = spark.readStream.schema(
        f"{ROW_KIND} string, k bigint, v bigint, seq int"
    ).json(src)
    q = es_sink_stream(
        stream,
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
        pk_cols=["k"],
        order_cols=["seq"],
    )
    q.awaitTermination(120)
    got = {
        r["k"]: r["v"]
        for r in es_scan(spark, str(tmp_path / "idx")).collect()
    }
    assert got == {1: 20, 2: 5}


def test_es_append_mode_no_pk(spark, tmp_path):
    from flink_1_12_2_spark.operators.changelog import ROW_KIND
    from flink_1_12_2_spark.sources.elasticsearch_emu import (
        es_append_batch,
        es_scan,
    )

    idx = str(tmp_path / "append_idx")
    rows = spark.createDataFrame(
        [("+I", "a"), ("+I", "a"), ("-D", "x")],
        f"{ROW_KIND} string, payload string",
    )
    es_append_batch(rows, idx)
    # append-only: duplicates retained, -D is not an append action
    assert sorted(
        r["payload"] for r in es_scan(spark, idx).collect()
    ) == ["a", "a"]


def test_hbase_scan_latest_version_and_sparse_rows(spark):
    from flink_1_12_2_spark.sources.hbase_emu import _flatten, hbase_scan

    cells = spark.createDataFrame(
        [
            # rowkey 1: two versions of f:a (v2 wins), one f:b
            (1, "f", "a", "old", 10),
            (1, "f", "a", "new", 20),
            (1, "f", "b", "7", 5),
            # rowkey 2: sparse — only g:x
            (2, "g", "x", "1", 1),
        ],
        "rowkey bigint, family string, qualifier string, value string, version_ts bigint",
    )
    families = {
        "f": {"a": "string", "b": "bigint"},
        "g": {"x": "bigint"},
    }
    got = {
        r["rowkey"]: (r["f_a"], r["f_b"], r["g_x"])
        for r in _flatten(hbase_scan(cells, families), families).collect()
    }
    assert got == {1: ("new", 7, None), 2: (None, None, 1)}


def test_hbase_scan_struct_shape(spark):
    """The unflattened output keeps the Flink SQL shape: one ROW column
    per family with the declared typed fields."""
    from flink_1_12_2_spark.sources.hbase_emu import hbase_scan

    cells = spark.createDataFrame(
        [(1, "f", "a", "3", 1)],
        "rowkey bigint, family string, qualifier string, value string, version_ts bigint",
    )
    out = hbase_scan(cells, {"f": {"a": "bigint", "b": "string"}})
    assert dict(out.dtypes)["f"] == "struct<a:bigint,b:string>"
    row = out.first()
    assert row["f"]["a"] == 3 and row["f"]["b"] is None


def test_hbase_sink_put_delete_roundtrip(spark, tmp_path):
    """HBase sink parity (RowDataToMutationConverter.java:51): +I/+U rows
    PUT every declared cell, -U/-D rows DELETE the row via a tombstone
    that masks strictly older cells; the scan resolves masking."""
    from flink_1_12_2_spark.sources.hbase_emu import (
        _flatten,
        hbase_scan,
        hbase_write,
    )

    fams = {"f": {"name": "string", "age": "int"}}
    store = str(tmp_path / "cells")

    def row(kind, k, name, age):
        return (kind, k, (name, age))

    batch1 = spark.createDataFrame(
        [row("+I", "r1", "ann", 30), row("+I", "r2", "bob", 40)],
        "_row_kind string, rowkey string, f struct<name string, age int>",
    )
    hbase_write(batch1, store, fams, row_kind_col="_row_kind")
    batch2 = spark.createDataFrame(
        [
            row("-U", "r1", None, None),   # re-key: delete r1 ...
            row("+U", "r9", "ann", 31),    # ... put r9
            row("-D", "r2", None, None),   # plain delete
            row("+I", "r3", "cat", 9),
        ],
        "_row_kind string, rowkey string, f struct<name string, age int>",
    )
    hbase_write(batch2, store, fams, row_kind_col="_row_kind")
    got = {
        r["rowkey"]: (r["f_name"], r["f_age"])
        for r in _flatten(
            hbase_scan(spark.read.parquet(store), fams), fams
        ).collect()
    }
    assert got == {"r9": ("ann", 31), "r3": ("cat", 9)}


def test_hbase_sink_same_key_update_pair_resolves_to_put(spark, tmp_path):
    """A same-rowkey -U/+U pair in ONE batch resolves to the put (delete
    stamps version, put version+1 — the sequential mutation order)."""
    from flink_1_12_2_spark.sources.hbase_emu import (
        _flatten,
        hbase_scan,
        hbase_write,
    )

    fams = {"f": {"v": "string"}}
    store = str(tmp_path / "cells2")
    hbase_write(
        spark.createDataFrame(
            [("+I", "k", ("old",))],
            "_row_kind string, rowkey string, f struct<v string>",
        ),
        store, fams, row_kind_col="_row_kind",
    )
    hbase_write(
        spark.createDataFrame(
            [("-U", "k", (None,)), ("+U", "k", ("new",))],
            "_row_kind string, rowkey string, f struct<v string>",
        ),
        store, fams, row_kind_col="_row_kind",
    )
    got = _flatten(
        hbase_scan(spark.read.parquet(store), fams), fams
    ).collect()
    assert len(got) == 1 and got[0]["f_v"] == "new"
