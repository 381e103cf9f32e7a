"""CDC changelog-format decoders: debezium-json, canal-json, maxwell-json.

Flink parity: flink-formats/flink-json — debezium/DebeziumJsonDeserializationSchema.java
(envelope ``{before, after, op}``; op c|r → +I, u → -U,+U, d → -D),
canal/CanalJsonDeserializationSchema.java (``{data: [...], old: [...], type}``;
``old`` rows carry only the CHANGED columns and overlay ``data`` to form the
-U pre-image), maxwell/MaxwellJsonDeserializationSchema.java (single-row
``data``/``old``, lowercase type). Each decoder turns one JSON-string column
into changelog rows carrying the engine's ``_row_kind`` column
(operators/changelog.py), so the output feeds changelog_normalize /
drop_update_before / upsert sinks directly.

Spark-first shape: ``from_json`` + a per-op array of (kind, payload) structs
+ ``explode`` — one narrow projection, no UDFs, whole-stage codegen; at
100 TB the decode is embarrassingly parallel on the kafka/file scan."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import _parse_datatype_string

from flink_1_12_2_spark.operators.changelog import (
    DELETE,
    INSERT,
    ROW_KIND,
    UPDATE_AFTER,
    UPDATE_BEFORE,
)


def _payload_fields(payload_schema: str) -> list[str]:
    return [f.name for f in _parse_datatype_string(payload_schema).fields]


def _kp(kind: str, payload: Column) -> Column:
    return F.struct(F.lit(kind).alias("k"), payload.alias("p"))


def _emit(df: DataFrame, json_col: str, rows: Column, fields: list[str]) -> DataFrame:
    """Explode (kind, payload) structs; keep all non-JSON passthrough cols."""
    keep = [c for c in df.columns if c != json_col]
    out = df.select(*keep, F.explode(rows).alias("__r"))
    return out.select(
        F.col("__r.k").alias(ROW_KIND),
        *[F.col(f"__r.p.{f}").alias(f) for f in fields],
        *keep,
    )


def parse_debezium_json(
    df: DataFrame, json_col: str, payload_schema: str
) -> DataFrame:
    """Decode debezium-json envelopes into changelog rows.

    op 'c' (create) / 'r' (snapshot read) → +I(after); 'u' → -U(before),
    +U(after); 'd' → -D(before) — DebeziumJsonDeserializationSchema.java:100.
    """
    fields = _payload_fields(payload_schema)
    env = F.from_json(
        F.col(json_col),
        f"before struct<{payload_schema}>, after struct<{payload_schema}>, "
        "op string, ts_ms bigint",
    )
    rows = (
        F.when(env["op"].isin("c", "r"), F.array(_kp(INSERT, env["after"])))
        .when(
            env["op"] == "u",
            F.array(_kp(UPDATE_BEFORE, env["before"]), _kp(UPDATE_AFTER, env["after"])),
        )
        .when(env["op"] == "d", F.array(_kp(DELETE, env["before"])))
        .otherwise(F.array().cast(f"array<struct<k string, p struct<{payload_schema}>>>"))
    )
    # ts_ms: the envelope's source timestamp — surfaces as a column so
    # downstream normalize can order changes per key (NULL when absent)
    return _emit(df.withColumn("ts_ms", env["ts_ms"]), json_col, rows, fields)


def _overlay(old: Column, data: Column, fields: list[str]) -> Column:
    """canal/maxwell -U pre-image: ``old`` carries only changed columns —
    overlay them onto the post-image (NULL in old ⇒ column unchanged)."""
    return F.struct(
        *[F.coalesce(old[f], data[f]).alias(f) for f in fields]
    )


def parse_canal_json(df: DataFrame, json_col: str, payload_schema: str) -> DataFrame:
    """Decode canal-json envelopes (batched ``data``/``old`` arrays,
    type INSERT|UPDATE|DELETE) into changelog rows —
    CanalJsonDeserializationSchema.java:116."""
    fields = _payload_fields(payload_schema)
    env = F.from_json(
        F.col(json_col),
        f"data array<struct<{payload_schema}>>, "
        f"old array<struct<{payload_schema}>>, type string",
    )
    pair_t = f"array<struct<k string, p struct<{payload_schema}>>>"
    updates = F.flatten(
        F.transform(
            F.arrays_zip(env["old"].alias("o"), env["data"].alias("d")),
            lambda z: F.array(
                _kp(UPDATE_BEFORE, _overlay(z["o"], z["d"], fields)),
                _kp(UPDATE_AFTER, z["d"]),
            ),
        )
    )
    rows = (
        F.when(
            env["type"] == "INSERT",
            F.transform(env["data"], lambda d: _kp(INSERT, d)),
        )
        .when(
            env["type"] == "DELETE",
            F.transform(env["data"], lambda d: _kp(DELETE, d)),
        )
        .when(env["type"] == "UPDATE", updates)
        .otherwise(F.array().cast(pair_t))
    )
    return _emit(df, json_col, rows, fields)


def parse_maxwell_json(
    df: DataFrame, json_col: str, payload_schema: str
) -> DataFrame:
    """Decode maxwell-json envelopes (single-row ``data``/``old``, lowercase
    type) into changelog rows — MaxwellJsonDeserializationSchema.java:95."""
    fields = _payload_fields(payload_schema)
    env = F.from_json(
        F.col(json_col),
        f"data struct<{payload_schema}>, old struct<{payload_schema}>, "
        "type string",
    )
    rows = (
        F.when(env["type"] == "insert", F.array(_kp(INSERT, env["data"])))
        .when(
            env["type"] == "update",
            F.array(
                _kp(UPDATE_BEFORE, _overlay(env["old"], env["data"], fields)),
                _kp(UPDATE_AFTER, env["data"]),
            ),
        )
        .when(env["type"] == "delete", F.array(_kp(DELETE, env["data"])))
        .otherwise(F.array().cast(f"array<struct<k string, p struct<{payload_schema}>>>"))
    )
    return _emit(df, json_col, rows, fields)
