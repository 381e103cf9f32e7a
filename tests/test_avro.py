"""Avro format capability gate: round-trip when spark-avro is on the
classpath, a clean NotImplementedError (with deployment guidance) otherwise.
Reference parity: flink-formats/flink-avro AvroFileFormatFactory."""

from __future__ import annotations

import pytest

from flink_1_12_2_spark.sources import filesystem as fs


def test_avro_roundtrip(spark, sf_dir, tmp_path):
    """Round-trips on EVERY deployment: spark-avro when the jar is present,
    the pure-Python object-container fallback (sources/avro_py.py,
    Avro 1.x spec: magic Obj\x01, metadata map, sync-marked blocks)
    otherwise."""
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    path = str(tmp_path / "avro_rt")
    fs.write_table(df, path, fmt="avro")
    back = fs.read_table(spark, path, fmt="avro")
    assert sorted(r.v for r in back.collect()) == [0, 2, 4, 6, 8]


def test_avro_py_container_spec(spark, tmp_path):
    """The fallback writes SPEC-compliant containers: correct magic,
    metadata schema, sync-marker integrity, nullable unions, deflate codec,
    and multi-partition parallel write/read."""
    import pyspark.sql.functions as F

    from flink_1_12_2_spark.sources.avro_py import (
        decode_container,
        encode_container,
        read_avro_py,
        write_avro_py,
    )

    df = (
        spark.range(100)
        .repartition(4)
        .selectExpr(
            "id",
            "CAST(id * 1.5 AS DOUBLE) AS d",
            "CONCAT('s', id) AS s",
            "CASE WHEN id % 3 = 0 THEN NULL ELSE id * 2 END AS nv",
            "id % 2 = 0 AS b",
        )
    )
    path = str(tmp_path / "avro_spec")
    write_avro_py(df, path)
    import glob

    parts = glob.glob(path + "/part-*.avro")
    assert len(parts) == 4  # one container per partition, executor-written
    raw = open(sorted(parts)[0], "rb").read()
    assert raw[:4] == b"Obj\x01"
    schema, rows = decode_container(raw)
    assert [f["name"] for f in schema["fields"]] == ["id", "d", "s", "nv", "b"]
    back = read_avro_py(spark, path)
    got = sorted((r.id, r.d, r.s, r.nv, r.b) for r in back.collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want
    # deflate codec round-trip at the codec level
    enc = encode_container([(1, None), (2, 7)], {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "long"},
                   {"name": "n", "type": ["null", "long"]}],
    }, codec="deflate")
    _, rows2 = decode_container(enc)
    assert rows2 == [(1, None), (2, 7)]


def test_sequencefile_format_string_redirects(spark, tmp_path):
    # format="sequencefile" through the generic reader points at the
    # dedicated RDD-backed functions (which have their own round-trip query)
    with pytest.raises(NotImplementedError, match="read_sequencefile"):
        fs.read_table(spark, str(tmp_path), fmt="sequencefile")


def test_compressed_csv_roundtrip(spark, tmp_path):
    """flink-compress parity: compressed filesystem files are a writer
    option + transparent decode on read in Spark (no separate format)."""
    import glob

    df = spark.range(20).selectExpr("id", "id * 3 AS v")
    path = str(tmp_path / "gz_rt")
    fs.write_table(df, path, fmt="csv", options={"compression": "gzip"})
    assert glob.glob(path + "/*.csv.gz")  # actually compressed on disk
    back = fs.read_table(
        spark, path, fmt="csv", schema="id bigint, v bigint"
    )
    assert back.count() == 20
    assert back.agg({"v": "sum"}).collect()[0][0] == sum(i * 3 for i in range(20))
