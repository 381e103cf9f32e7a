"""Unit tests: multimodal stub codec behavior, lookup-join tiers, udf surface."""

from __future__ import annotations

import pandas as pd
import pytest
import pyspark.sql.functions as F

from flink_1_12_2_spark.llm.multimodal import (
    attach_fake_images,
    decode_image_header,
    decode_images,
    fake_image,
)


def test_fake_image_roundtrip():
    img = fake_image(640, 480, 3, b"payload")
    assert decode_image_header(img) == (640, 480, 3)


def test_real_codec_is_stubbed():
    # JPEG magic → explicit NotImplementedError, not silent garbage
    with pytest.raises(NotImplementedError):
        decode_image_header(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    with pytest.raises(NotImplementedError):
        decode_image_header(b"")


def test_decode_images_batching(spark):
    df = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    out = decode_images(attach_fake_images(df, "doc_id")).collect()
    assert len(out) == 10
    byid = {r.doc_id: r for r in out}
    assert byid[5].width == 5 % 64 + 16
    assert byid[5].payload_len == 16


def test_lookup_join_mapinpandas_batches_keys(spark):
    from flink_1_12_2_spark.operators.lookup import lookup_join_mapinpandas

    facts = spark.range(0, 100).select(F.col("id").alias("k"))

    def client_factory():
        def lookup(keys):
            # a real client would issue ONE batched request here
            return {k: {"name": f"v{k}"} for k in keys if k % 2 == 0}

        return lookup

    out = lookup_join_mapinpandas(
        facts, "k", client_factory, "k long, name string", ["name"]
    ).collect()
    got = {r.k: r.name for r in out}
    assert got[4] == "v4" and got[5] is None and len(got) == 100


def test_udf_general_vs_pandas(spark):
    from flink_1_12_2_spark.functions.udf import udf

    @udf("int", func_type="general")
    def plus1(x):
        return x + 1

    @udf("int", func_type="pandas")
    def plus2(x: pd.Series) -> pd.Series:
        return x + 2

    row = (
        spark.range(5)
        .select(plus1(F.col("id").cast("int")).alias("a"), plus2(F.col("id").cast("int")).alias("b"))
        .agg(F.sum("a").alias("sa"), F.sum("b").alias("sb"))
        .collect()[0]
    )
    assert (row.sa, row.sb) == (0 + 1 + 2 + 3 + 4 + 5, 0 + 1 + 2 + 3 + 4 + 10)


def test_bmp_roundtrip_and_topdown():
    """encode→decode is identity; top-down BMPs (negative height) decode to
    the same array as bottom-up."""
    import struct

    import numpy as np

    from flink_1_12_2_spark.llm.multimodal import decode_bmp, encode_bmp

    img = np.random.default_rng(7).integers(0, 256, (11, 6, 3), dtype=np.uint8)
    data = encode_bmp(img)
    assert (decode_bmp(data) == img).all()
    # flip to top-down: negate biHeight and reorder rows
    h = img.shape[0]
    td = bytearray(data)
    td[22:26] = struct.pack("<i", -h)
    off = struct.unpack("<I", data[10:14])[0]
    stride = (3 * img.shape[1] + 3) // 4 * 4
    rows = np.frombuffer(data, np.uint8, h * stride, off).reshape(h, stride)
    td[off : off + h * stride] = rows[::-1].tobytes()
    assert (decode_bmp(bytes(td)) == img).all()


def test_bmp_capability_gate():
    import pytest as _pytest

    from flink_1_12_2_spark.llm.multimodal import decode_bmp

    with _pytest.raises(NotImplementedError):
        decode_bmp(b"\x89PNG\r\n\x1a\n----------------")


def test_nearest_resize_mapping():
    """The exact-integer nearest mapping: downscale 4x4 -> 2x2 picks source
    indices floor((2d+1)*4/4) = 1,3 on both axes."""
    import numpy as np

    from flink_1_12_2_spark.llm.multimodal import resize_nearest

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = resize_nearest(img, 2, 2)
    assert (out == img[np.ix_([1, 3], [1, 3])]).all()
