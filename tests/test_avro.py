"""Avro format capability gate: round-trip when spark-avro is on the
classpath, a clean NotImplementedError (with deployment guidance) otherwise.
Reference parity: flink-formats/flink-avro AvroFileFormatFactory."""

from __future__ import annotations

import pytest

from flink_1_12_2_spark.sources import filesystem as fs


def test_avro_roundtrip_or_clean_gate(spark, sf_dir, tmp_path):
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    path = str(tmp_path / "avro_rt")
    if fs.avro_available(spark):
        fs.write_table(df, path, fmt="avro")
        back = fs.read_table(spark, path, fmt="avro")
        assert sorted(r.v for r in back.collect()) == [0, 2, 4, 6, 8]
    else:
        with pytest.raises(NotImplementedError, match="spark-avro"):
            fs.write_table(df, path, fmt="avro")
        with pytest.raises(NotImplementedError, match="spark-avro"):
            fs.read_table(spark, path, fmt="avro")
        pytest.skip("spark-avro not on the classpath — gate verified")


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
