"""Pure-Python Avro object-container fallback — un-gates format=avro when
the spark-avro jar is absent.

Implements the public Avro 1.x object container file spec (magic ``Obj\\x01``,
metadata map with ``avro.schema``/``avro.codec``, 16-byte sync marker,
blocks of <count, byte-length, records>) with the ``null`` and ``deflate``
codecs, for flat record schemas over the primitive types Spark's flat
DataFrames use: boolean, int, long, float, double, string, bytes, and their
``["null", T]`` nullable unions. Reference parity: flink-formats/flink-avro
(AvroFileFormatFactory) reads/writes the same container format.

Distribution model: WRITE encodes per input partition inside ``mapInPandas``
(one ``part-NNNNN.avro`` per partition, named by TaskContext partition id —
executor-parallel, no driver funnel); READ lists files via Spark's
``binaryFile`` source and decodes each file in ``mapInPandas`` (parallel per
file). At real scale the spark-avro jar takes over via the same
``read_table/write_table`` front door (sources/filesystem.py prefers it);
this fallback keeps semantics identical where the jar is missing.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
)

_MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    BooleanType: "boolean",
    IntegerType: "int",
    LongType: "long",
    FloatType: "float",
    DoubleType: "double",
    StringType: "string",
    BinaryType: "bytes",
}
_AVRO_TO_SPARK_DDL = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


def spark_schema_to_avro(schema: StructType, name: str = "record0") -> dict:
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, StructType):
            # nested record (the Debezium envelope's before/after rows)
            t = spark_schema_to_avro(f.dataType, name=f"{name}_{f.name}")
        else:
            t = _SPARK_TO_AVRO.get(type(f.dataType))
        if t is None:
            raise NotImplementedError(
                f"avro_py supports primitive and nested-record schemas; "
                f"field {f.name!r} has {f.dataType.simpleString()}"
            )
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return {"type": "record", "name": name, "fields": fields}


def avro_type_to_ddl(ft) -> str:
    """Avro field type → Spark DDL type, records included (recursive)."""
    t = ft[1] if isinstance(ft, list) else ft
    if isinstance(t, dict) and t.get("type") == "record":
        inner = ", ".join(
            f"{f['name']}: {avro_type_to_ddl(f['type'])}"
            for f in t["fields"]
        )
        return f"struct<{inner}>"
    return _AVRO_TO_SPARK_DDL[t]


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _enc_value(t, v) -> bytes:
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        return _zigzag_encode(int(v))
    if t == "float":
        return struct.pack("<f", float(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "string":
        b = str(v).encode("utf-8")
        return _zigzag_encode(len(b)) + b
    if t == "bytes":
        b = bytes(v)
        return _zigzag_encode(len(b)) + b
    if isinstance(t, dict) and t.get("type") == "record":
        # nested record: v is a Row/dict/tuple aligned with the fields
        out = b""
        for i, f in enumerate(t["fields"]):
            if isinstance(v, dict):
                fv = v.get(f["name"])
            elif hasattr(v, "__fields__"):  # pyspark Row
                fv = v[f["name"]]
            else:
                fv = v[i]
            out += _enc_field(f["type"], fv)
        return out
    raise NotImplementedError(t)


def _enc_field(ft, v) -> bytes:
    if isinstance(ft, list):  # ["null", T]
        if v is None:
            return _zigzag_encode(0)
        return _zigzag_encode(1) + _enc_value(ft[1], v)
    return _enc_value(ft, v)


def _dec_value(t, buf: io.BytesIO):
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _zigzag_decode(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "string":
        n = _zigzag_decode(buf)
        return buf.read(n).decode("utf-8")
    if t == "bytes":
        n = _zigzag_decode(buf)
        return buf.read(n)
    if isinstance(t, dict) and t.get("type") == "record":
        return {
            f["name"]: _dec_field(f["type"], buf) for f in t["fields"]
        }
    raise NotImplementedError(t)


def _dec_field(ft, buf: io.BytesIO):
    if isinstance(ft, list):
        idx = _zigzag_decode(buf)
        branch = ft[idx]
        return None if branch == "null" else _dec_value(branch, buf)
    return _dec_value(ft, buf)


def encode_container(
    rows: list[tuple], avro_schema: dict, codec: str = "null"
) -> bytes:
    """Rows → one Avro object-container file (single block)."""
    sync = os.urandom(16)
    meta = {
        "avro.schema": json.dumps(avro_schema).encode(),
        "avro.codec": codec.encode(),
    }
    out = io.BytesIO()
    out.write(_MAGIC)
    out.write(_zigzag_encode(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        out.write(_zigzag_encode(len(kb)) + kb)
        out.write(_zigzag_encode(len(v)) + v)
    out.write(_zigzag_encode(0))  # end of metadata map
    out.write(sync)
    ftypes = [f["type"] for f in avro_schema["fields"]]
    body = bytearray()
    for row in rows:
        for ft, v in zip(ftypes, row):
            body += _enc_field(ft, v)
    payload = bytes(body)
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
    if rows:
        out.write(_zigzag_encode(len(rows)))
        out.write(_zigzag_encode(len(payload)))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


def decode_container(data: bytes) -> tuple[dict, list[tuple]]:
    """One Avro object-container file → (schema dict, rows)."""
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _zigzag_decode(buf)
        if n == 0:
            break
        if n < 0:
            # Avro spec: a negative block count is followed by the block's
            # byte size (fast-skip affordance) — consume it before iterating
            _zigzag_decode(buf)
        for _ in range(abs(n)):
            kl = _zigzag_decode(buf)
            k = buf.read(kl).decode()
            vl = _zigzag_decode(buf)
            meta[k] = buf.read(vl)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    ftypes = [f["type"] for f in schema["fields"]]
    rows: list[tuple] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        count = _zigzag_decode(buf)
        blen = _zigzag_decode(buf)
        block = buf.read(blen)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(count):
            rows.append(tuple(_dec_field(ft, bbuf) for ft in ftypes))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, rows


def write_avro_py(df: DataFrame, path: str, codec: str = "null") -> None:
    """Executor-parallel Avro write: one container file per partition."""
    import pandas as pd

    avro_schema = spark_schema_to_avro(df.schema)
    cols = [f.name for f in df.schema.fields]
    os.makedirs(path, exist_ok=True)

    def enc(pdfs):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows: list[tuple] = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                rows.append(
                    tuple(None if pd.isna(v) else v for v in r)
                )
        fn = os.path.join(path, f"part-{pid:05d}.avro")
        with open(fn, "wb") as fh:
            fh.write(encode_container(rows, avro_schema, codec))
        yield pd.DataFrame({"file": [fn], "n": [len(rows)]})

    df.mapInPandas(enc, "file string, n long").collect()


def read_avro_py(spark: SparkSession, path: str) -> DataFrame:
    """Parallel Avro read: binaryFile listing + per-file decode."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.avro")
    )
    # schema from the first file (all parts share the writer schema)
    first = sorted(
        f for f in os.listdir(path) if f.endswith(".avro")
    )[0]
    with open(os.path.join(path, first), "rb") as fh:
        schema, _ = decode_container(fh.read())
    names = [f["name"] for f in schema["fields"]]
    ddl = ", ".join(
        f"{f['name']} "
        + _AVRO_TO_SPARK_DDL[
            f["type"][1] if isinstance(f["type"], list) else f["type"]
        ]
        for f in schema["fields"]
    )

    def dec(pdfs):
        for pdf in pdfs:
            for content in pdf["content"]:
                _, rows = decode_container(bytes(content))
                yield pd.DataFrame(rows, columns=names)

    return files.select("content").mapInPandas(dec, ddl)
