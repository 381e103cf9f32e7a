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


# ---------------------------------------------------------------------------
# REAL codec: BMP (BITMAPINFOHEADER, 24-bit BI_RGB). BMP is a header +
# raw-pixel format decodable in pure numpy — no image libraries needed — so
# this path is a REAL pixel transform end to end. JPEG/PNG remain behind the
# NotImplementedError capability gate above.

_BMP_FILE_FMT = "<2sIHHI"  # magic, file size, 2×reserved, pixel-data offset
_BMP_INFO_FMT = "<IiiHHIIiiII"  # BITMAPINFOHEADER


def encode_bmp(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (bottom-up rows, BGR byte order, rows padded to 4 bytes — the classic
    Windows 3.x layout every viewer accepts)."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = arr[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    data = rows.tobytes()
    off = struct.calcsize(_BMP_FILE_FMT) + struct.calcsize(_BMP_INFO_FMT)
    head = struct.pack(_BMP_FILE_FMT, b"BM", off + len(data), 0, 0, off)
    info = struct.pack(
        _BMP_INFO_FMT, struct.calcsize(_BMP_INFO_FMT), w, h, 1, 24, 0,
        len(data), 2835, 2835, 0, 0,
    )
    return head + info + data


def decode_bmp(data: bytes):
    """Decode a 24-bit uncompressed BMP into an (h, w, 3) uint8 RGB array.
    Handles bottom-up (positive height) and top-down (negative height)
    layouts and the 4-byte row padding. Raises NotImplementedError for
    palettized/compressed variants (same capability-gate style as the
    JPEG/PNG stub)."""
    import numpy as np

    fh = struct.calcsize(_BMP_FILE_FMT)
    if data is None or len(data) < fh or data[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    _, _, _, _, off = struct.unpack(_BMP_FILE_FMT, data[:fh])
    info = struct.unpack(_BMP_INFO_FMT, data[fh : fh + struct.calcsize(_BMP_INFO_FMT)])
    _, w, h, _planes, bpp, comp = info[0], info[1], info[2], info[3], info[4], info[5]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=off)
    rows = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def _nn_index(dst: int, src_n: int, dst_n: int):
    """EXACT-integer nearest-neighbor source index: floor((2·dst+1)·src /
    (2·out)) — pure integer arithmetic so the DuckDB oracle reproduces the
    mapping bit-for-bit (a float (dst+0.5)·src/out could round differently
    across engines at boundaries)."""
    return min(((2 * dst + 1) * src_n) // (2 * dst_n), src_n - 1)


def resize_nearest(img, out_w: int, out_h: int):
    """Nearest-neighbor resize of an (h, w, 3) array via numpy fancy
    indexing (vectorized — no Python pixel loops)."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    ys = np.array([_nn_index(i, h, out_h) for i in range(out_h)])
    xs = np.array([_nn_index(j, w, out_w) for j in range(out_w)])
    return img[np.ix_(ys, xs)]


def bmp_target_dims(w: int, h: int, target: int) -> tuple[int, int]:
    """Aspect-preserving target geometry in EXACT integer math:
    round-half-up of dim·target/max(w,h) = (2·dim·target + mx) // (2·mx)."""
    mx = max(w, h)
    return (2 * w * target + mx) // (2 * mx), (2 * h * target + mx) // (2 * mx)


def attach_fake_bmps(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a REAL BMP binary column whose pixel values follow the
    SQL-expressible formula ``(x·7 + y·13 + id + 97·ch) % 256`` — so a
    DuckDB oracle can verify the RESIZED PIXEL CONTENT (channel sums), not
    just geometry. Dimensions: w = id%16+8, h = id%12+8."""
    from collections.abc import Iterator as _It

    def fn(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = pdf.copy()
            bmps = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = did % 16 + 8, did % 12 + 8
                x = np.arange(w)[None, :, None]
                y = np.arange(h)[:, None, None]
                ch = np.arange(3)[None, None, :]
                px = ((x * 7 + y * 13 + did + 97 * ch) % 256).astype("uint8")
                bmps.append(encode_bmp(px))
            out["image_bmp"] = bmps
            yield out

    fields = ", ".join(f"{c.name} {c.dataType.simpleString()}" for c in df.schema)
    return df.mapInPandas(fn, f"{fields}, image_bmp binary")


BMP_RESIZE_SCHEMA = (
    "doc_id bigint, out_width int, out_height int, "
    "sum_r bigint, sum_g bigint, sum_b bigint"
)


def bmp_resize_stats(
    df: DataFrame, target: int, id_col: str = "doc_id"
) -> DataFrame:
    """REAL pixel transform over mapInPandas: decode the BMP bytes (pure
    numpy), nearest-neighbor resize to aspect-preserving ``target`` box,
    emit the resized per-channel integer pixel sums — exact values a SQL
    oracle can recompute from the generator formula + the integer index
    mapping. Batches stay Arrow-columnar; per-image work is vectorized
    numpy (no Python pixel loops)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, img in zip(pdf[id_col], pdf["image_bmp"]):
                px = decode_bmp(bytes(img))
                h, w = px.shape[0], px.shape[1]
                ow, oh = bmp_target_dims(w, h, target)
                small = resize_nearest(px, ow, oh).astype("int64")
                sums = small.sum(axis=(0, 1))
                rows.append(
                    (int(did), ow, oh, int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "out_width", "out_height", "sum_r", "sum_g", "sum_b",
                ],
            )

    return df.select(id_col, "image_bmp").mapInPandas(fn, BMP_RESIZE_SCHEMA)


# fake audio: magic 'FPCM' | u16 n_samples | u16 sample_rate | n_samples
# unsigned-byte samples (sample i = first byte of md5(doc_id ':' i) —
# reproducible in SQL, so the oracle verifies window ENERGY computed from
# the exact sample values, not just window counts). Real containers
# (wav/flac/ogg) would swap the header/sample parsing for soundfile inside
# the same mapInPandas body.
_AMAGIC = b"FPCM"
_AFMT = ">4sHH"
_AHEADER_SIZE = struct.calcsize(_AFMT)


def attach_fake_audio(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic fake PCM column: n_samples = id % 240 + 120 (3-9
    40-sample windows), sample_rate 8000."""
    n = (F.col(id_col) % 240 + 120).cast("int")
    header = F.concat(
        F.lit(_AMAGIC),
        F.expr(f"unhex(lpad(hex(CAST({id_col} % 240 + 120 AS INT)), 4, '0'))"),
        F.expr("unhex(lpad(hex(8000), 4, '0'))"),
    )
    sample = lambda i: F.substring(  # noqa: E731
        F.unhex(
            F.md5(
                F.concat_ws(
                    ":", F.col(id_col).cast("string"), i.cast("string")
                )
            )
        ),
        1,
        1,
    )
    samples = F.aggregate(
        F.transform(F.sequence(F.lit(0), n - 1), sample),
        F.lit(b""),
        lambda acc, x: F.concat(acc, x),
    )
    return df.withColumn("audio", F.concat(header, samples)).withColumn(
        "meta_samples", n
    ).withColumn("meta_rate", F.lit(8000))


AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, win_idx int, n_samples int, energy bigint, "
    "zero_crossings int"
)


def audio_window_features(
    df: DataFrame, window: int = 40, id_col: str = "doc_id"
) -> DataFrame:
    """Windowed audio features over Arrow-batched mapInPandas: parse the
    PCM container header, frame the byte samples into fixed windows, and
    emit per-window ENERGY (sum of squared samples — exact integer) and
    ZERO-CROSSINGS around the u8 midline (127.5: strictly-opposite-side
    sign products only, so the count is an exact integer too). Both
    features are content-derived, so the DuckDB oracle recomputes them
    from the generator formula — verifying the decode path end-to-end.

    Scale: decode work is per-row Python but Arrow-batched and
    embarrassingly parallel; filter/prune BEFORE this operator (the
    filter-before-decode pattern) so only surviving rows pay it. The
    trailing short window is emitted (real feature extractors pad or
    drop; downstream sees n_samples)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf["audio"]):
                b = bytes(blob)
                magic, n, _rate = struct.unpack(_AFMT, b[:_AHEADER_SIZE])
                if magic != _AMAGIC:
                    raise NotImplementedError(
                        "real audio containers (wav/flac/ogg) are stubbed "
                        "in this environment; plug soundfile into this "
                        "mapInPandas body"
                    )
                vals = list(b[_AHEADER_SIZE:_AHEADER_SIZE + n])
                for w0 in range(0, n, window):
                    win = vals[w0:w0 + window]
                    zc = sum(
                        1
                        for a, b2 in zip(win, win[1:])
                        if (a - 127.5) * (b2 - 127.5) < 0
                    )
                    rows.append(
                        (
                            int(did),
                            w0 // window,
                            len(win),
                            sum(v * v for v in win),
                            zc,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "win_idx", "n_samples", "energy",
                    "zero_crossings",
                ],
            )

    return df.select(id_col, "audio").mapInPandas(fn, AUDIO_FEATURES_SCHEMA)
