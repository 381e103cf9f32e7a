"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The Spark-side plumbing — schema, batch shape, partition sizing, UDF
signatures — is real and tested. The *codec* step is stubbed: this container
has no image/audio libraries, so ``decode_image`` parses a deterministic fake
header (see ``fake_image``) and raises ``NotImplementedError`` for real
formats. Swapping in PIL/librosa later only changes the inside of the UDF.

Scale notes (100 TB of media):
- binary payloads stay columnar (Arrow) end-to-end; never hit Python
  row-at-a-time.
- ``mapInPandas`` yields per-batch DataFrames — batch size is governed by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``; media pipelines should
  lower it so a batch of decoded frames fits executor memory.
- metadata (width/height/codec) lives in plain columns so filters like
  ``width >= 512`` prune *before* decode.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# fake format: magic 'FIMG' | u16 width | u16 height | u8 channels | payload
# (plain constants + struct.pack calls — a module-level struct.Struct instance
# would break cloudpickle serialization of the mapInPandas closures)
_MAGIC = b"FIMG"
_FMT = ">4sHHB"
_HEADER_SIZE = struct.calcsize(_FMT)


def fake_image(width: int, height: int, channels: int, seed: bytes = b"") -> bytes:
    """Deterministic fake image bytes (header + seed payload)."""
    return struct.pack(_FMT, _MAGIC, width, height, channels) + seed


def attach_fake_images(df: DataFrame, id_col: str) -> DataFrame:
    """Derive a deterministic fake image column from an id column (test rig:
    width/height derived from the id, payload from md5)."""
    w = (F.col(id_col) % 64 + 16).cast("int")
    h = (F.col(id_col) % 48 + 16).cast("int")
    header = F.concat(
        F.lit(_MAGIC),
        # big-endian u16 width, u16 height, u8 channels=3
        F.expr(f"unhex(lpad(hex(CAST({id_col} % 64 + 16 AS INT)), 4, '0'))"),
        F.expr(f"unhex(lpad(hex(CAST({id_col} % 48 + 16 AS INT)), 4, '0'))"),
        F.lit(bytes([3])),
    )
    payload = F.unhex(F.md5(F.col(id_col).cast("string")))
    return df.withColumn("image", F.concat(header, payload)).withColumn(
        "meta_width", w
    ).withColumn("meta_height", h)


def decode_image_header(data: bytes) -> tuple[int, int, int]:
    """Stub codec: parse the fake header; real formats are not available in
    this environment."""
    if data is None or len(data) < _HEADER_SIZE or data[:4] != _MAGIC:
        raise NotImplementedError(
            "real image codecs (JPEG/PNG/...) are stubbed in this environment"
        )
    _, w, h, c = struct.unpack(_FMT, data[:_HEADER_SIZE])
    return int(w), int(h), int(c)


DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, payload_len int, "
    "payload_md5 string"
)


def decode_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode/feature-extract over mapInPandas (Arrow-batched)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for did, img in zip(pdf[id_col], pdf["image"]):
                w, h, c = decode_image_header(bytes(img))
                payload = bytes(img)[_HEADER_SIZE:]
                rows.append(
                    (
                        int(did),
                        w,
                        h,
                        c,
                        len(payload),
                        # checksum over the hex encoding (DuckDB md5 cannot
                        # hash BLOBs directly, so the oracle hashes hex too)
                        hashlib.md5(payload.hex().encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "width",
                    "height",
                    "channels",
                    "payload_len",
                    "payload_md5",
                ],
            )

    return df.select(id_col, "image").mapInPandas(fn, DECODE_SCHEMA)


# fake video: magic 'FVID' | u16 n_frames | u8 fps | n_frames × 8-byte frames
# (each frame = first 8 bytes of md5(doc_id ':' frame_idx) — reproducible in
# SQL, so the oracle verifies the sampled frame CONTENT, not just indices)
_VMAGIC = b"FVID"
_VFMT = ">4sHB"
_VHEADER_SIZE = struct.calcsize(_VFMT)
_FRAME_BYTES = 8


def attach_fake_videos(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic fake video column: n_frames = id % 20 + 5, fps 10."""
    n = (F.col(id_col) % 20 + 5).cast("int")
    header = F.concat(
        F.lit(_VMAGIC),
        F.expr(f"unhex(lpad(hex(CAST({id_col} % 20 + 5 AS INT)), 4, '0'))"),
        F.lit(bytes([10])),
    )
    frame = lambda i: F.substring(  # noqa: E731
        F.unhex(
            F.md5(
                F.concat_ws(
                    ":", F.col(id_col).cast("string"), i.cast("string")
                )
            )
        ),
        1,
        _FRAME_BYTES,
    )
    frames = F.aggregate(
        F.transform(F.sequence(F.lit(0), n - 1), frame),
        F.lit(b""),
        lambda acc, x: F.concat(acc, x),
    )
    return df.withColumn("video", F.concat(header, frames)).withColumn(
        "meta_frames", n
    )


FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx int, frame_md5 string"


def sample_frames(df: DataFrame, every: int, id_col: str = "doc_id") -> DataFrame:
    """Frame sampling (every k-th frame) over mapInPandas: parse the
    container header, slice the sampled frames out of the binary payload,
    emit one row per sampled frame with a content checksum. Real containers
    (mp4/mkv) would swap the header/frame parsing for pyav inside this same
    UDF — batch shape, schema and partitioning are the production ones."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for did, vid in zip(pdf[id_col], pdf["video"]):
                b = bytes(vid)
                if len(b) < _VHEADER_SIZE or b[:4] != _VMAGIC:
                    raise NotImplementedError(
                        "real video containers (mp4/mkv/...) are stubbed in "
                        "this environment"
                    )
                _, n, _fps = struct.unpack(_VFMT, b[:_VHEADER_SIZE])
                frames = b[_VHEADER_SIZE:]
                for idx in range(0, n, every):
                    fb = frames[idx * _FRAME_BYTES : (idx + 1) * _FRAME_BYTES]
                    rows.append(
                        (
                            int(did),
                            idx,
                            hashlib.md5(fb.hex().encode()).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "frame_md5"]
            )

    return df.select(id_col, "video").mapInPandas(fn, FRAME_SAMPLE_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, out_width int, out_height int, scale double"


def resize_images(df: DataFrame, target: int, id_col: str = "doc_id") -> DataFrame:
    """'Resize' = recompute target dims preserving aspect (codec stubbed:
    emits the geometry a real resize would produce)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, img in zip(pdf[id_col], pdf["image"]):
                w, h, _ = decode_image_header(bytes(img))
                scale = target / max(w, h)
                # floor(x+0.5): half-up rounding (Python round() is banker's,
                # which the SQL oracle could not reproduce)
                rows.append(
                    (
                        int(did),
                        int(w * scale + 0.5),
                        int(h * scale + 0.5),
                        scale,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "out_width", "out_height", "scale"]
            )

    return df.select(id_col, "image").mapInPandas(fn, RESIZE_SCHEMA)
