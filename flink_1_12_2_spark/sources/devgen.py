"""datagen / print / blackhole dev connectors — the table factories every
Flink tutorial starts from.

Flink parity: flink-table/flink-table-api-java-bridge/.../factories/
DataGenTableSourceFactory.java:48 (options ``rows-per-second`` default
10000, ``number-of-rows`` = bounded, per-field ``fields.<name>.kind`` =
random|sequence with random ``min``/``max``/``length`` —
RandomGeneratorVisitor.java:68 type-default bounds — and sequence
``start``/``end`` — SequenceGeneratorVisitor.java:68);
PrintTableSinkFactory.java:57 (``print-identifier``, ``standard-error``,
row format ``+I[v1, v2]``); BlackHoleTableSinkFactory.java.

Spark-first translation:
- bounded datagen = ``spark.range(N)`` + per-field Catalyst expressions
  (whole-stage codegen, zero Python); N = min(number-of-rows, smallest
  sequence span) — the reference source terminates when any sequence
  exhausts.
- streaming datagen = the ``rate`` source at ``rows-per-second``, with
  the same field expressions over its monotone ``value``; sequence /
  number-of-rows bounds become a filter, so the stream yields exactly
  the bounded prefix then idles (a terminated Flink source = an idle
  Spark stream).
- print = a driver-side row printer in Flink's changelog row format
  (the reference prints on task stdout — a dev/debug sink either way,
  never a data path).

Scale note: bounded datagen partitions like ``range`` (parallelism =
default parallelism) and every generator expression is branch-free
column math — generation throughput is memory-bandwidth bound, the
right property for seeding 100 TB load tests.
"""

from __future__ import annotations

import sys

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# RandomGeneratorVisitor type-default bounds (min, max)
_RANDOM_BOUNDS = {
    "tinyint": (-128, 127),
    "smallint": (-32768, 32767),
    "int": (-2147483648, 2147483647),
    "integer": (-2147483648, 2147483647),
    "bigint": (-(2**63), 2**63 - 1),
    "float": (0.0, 1.0),
    "double": (0.0, 1.0),
}
_STRINGY = ("string", "varchar", "char")
_RANDOM_STRING_LENGTH_DEFAULT = 100  # RandomGeneratorVisitor.java:68


def _fields(schema_ddl: str) -> list[tuple[str, str]]:
    from flink_1_12_2_spark.operators.cdc_formats import _payload_fields
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(f"struct<{schema_ddl}>")
    names = _payload_fields(schema_ddl)
    types = {f.name: f.dataType.simpleString() for f in st.fields}
    return [(n, types[n]) for n in names]


def _sequence_span(name: str, opts: dict) -> int:
    start = int(opts[f"fields.{name}.start"])
    end = int(opts[f"fields.{name}.end"])
    if end < start:
        raise ValueError(
            f"fields.{name}.end ({end}) < fields.{name}.start ({start})"
        )
    return end - start + 1


def _field_expr(name: str, typ: str, opts: dict):
    """One generator expression over the monotone ``id`` column."""
    kind = opts.get(f"fields.{name}.kind", "random")
    base = typ.split("(")[0].lower()
    if kind == "sequence":
        start = int(opts[f"fields.{name}.start"])
        col = (F.lit(start) + F.col("id")).cast(
            "bigint" if base in _STRINGY else typ
        )
        return col.cast("string") if base in _STRINGY else col
    if kind != "random":
        raise ValueError(
            f"fields.{name}.kind must be random or sequence, got {kind!r}"
        )
    if base in _STRINGY:
        length = int(
            opts.get(f"fields.{name}.length", _RANDOM_STRING_LENGTH_DEFAULT)
        )
        # md5 chunks of a per-row random → arbitrary-length random text
        chunk = F.md5(F.concat(F.col("id").cast("string"), F.rand()))
        reps = (length + 31) // 32
        return F.substring(
            F.concat(*([chunk] * max(1, reps))), 1, length
        ).alias(name)
    if base == "boolean":
        return (F.rand() < 0.5).alias(name)
    if base in _RANDOM_BOUNDS:
        d_min, d_max = _RANDOM_BOUNDS[base]
        if base in ("float", "double"):
            lo = float(opts.get(f"fields.{name}.min", d_min))
            hi = float(opts.get(f"fields.{name}.max", d_max))
            return (F.lit(lo) + F.rand() * (hi - lo)).cast(typ)
        lo_i = int(opts.get(f"fields.{name}.min", d_min))
        hi_i = int(opts.get(f"fields.{name}.max", d_max))
        if hi_i - lo_i + 1 > 2**63:
            # the default FULL bigint range: no float64 span arithmetic
            # can cover 2^64 values — a salted 64-bit hash is uniform
            # over exactly that range
            return F.xxhash64(
                F.col("id"), F.rand().cast("string")
            ).cast(typ)
        # least() clamps the float64 rounding edge at 2^63-scale spans
        # so the cast can never overflow past the declared max
        return F.least(
            F.floor(F.rand() * float(hi_i - lo_i + 1)).cast("bigint")
            + F.lit(lo_i),
            F.lit(hi_i),
        ).cast(typ)
    raise ValueError(
        f"datagen cannot generate type {typ!r} for field {name!r} "
        "(numeric, boolean and string kinds are wired; declare the "
        "column as a supported type or compute it downstream)"
    )


def _bounded_rows(schema_ddl: str, opts: dict) -> int | None:
    """The bounded row count, or None when the source is unbounded —
    min(number-of-rows, smallest sequence span), the reference's
    terminate-on-first-exhausted-sequence contract."""
    bounds = []
    if "number-of-rows" in opts:
        bounds.append(int(opts["number-of-rows"]))
    for name, _t in _fields(schema_ddl):
        if opts.get(f"fields.{name}.kind") == "sequence":
            bounds.append(_sequence_span(name, opts))
    return min(bounds) if bounds else None


def datagen_frame(
    spark: SparkSession, schema_ddl: str, opts: dict
) -> DataFrame:
    """Bounded datagen scan. Raises when the declared table is unbounded
    (no number-of-rows and no sequence field) — the reference's batch
    planner cannot consume an unbounded source either."""
    n = _bounded_rows(schema_ddl, opts)
    if n is None:
        raise ValueError(
            "datagen table is UNBOUNDED (no 'number-of-rows' and no "
            "sequence field) — batch scans need a bound; read it with "
            "stream_table() or add 'number-of-rows'"
        )
    rng = spark.range(n)
    return rng.select(
        *[
            _field_expr(name, typ, opts).alias(name)
            for name, typ in _fields(schema_ddl)
        ]
    )


def datagen_stream(
    spark: SparkSession, schema_ddl: str, opts: dict
) -> DataFrame:
    """Streaming datagen — the rate source at ``rows-per-second``; a
    bounded declaration yields exactly its prefix then idles."""
    rps = int(opts.get("rows-per-second", "10000"))
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rps))
        .load()
        .select(F.col("value").alias("id"), "timestamp")
    )
    n = _bounded_rows(schema_ddl, opts)
    if n is not None:
        raw = raw.filter(F.col("id") < n)
    return raw.select(
        *[
            _field_expr(name, typ, opts).alias(name)
            for name, typ in _fields(schema_ddl)
        ]
    )


def print_sink(
    df: DataFrame,
    options: dict | None = None,
    row_kind_col: str | None = None,
) -> int:
    """Print sink (PrintTableSinkFactory row format): one
    ``<identifier>> +I[v1, v2]`` line per row; returns the row count."""
    opts = options or {}
    ident = opts.get("print-identifier", "")
    prefix = f"{ident}> " if ident else ""
    out = (
        sys.stderr
        if opts.get("standard-error", "false").lower() == "true"
        else sys.stdout
    )
    cols = [c for c in df.columns if c != row_kind_col]
    # toLocalIterator ships ONE partition at a time to the driver —
    # driver memory is bounded by the largest partition, not the full
    # frame, so printing a huge table cannot OOM the way collect() would
    # (the reference's print sink is likewise a per-record subtask print,
    # never a global materialization)
    n = 0
    for r in df.toLocalIterator():
        kind = r[row_kind_col] if row_kind_col else "+I"
        body = ", ".join(
            "null" if r[c] is None else str(r[c]) for c in cols
        )
        print(f"{prefix}{kind}[{body}]", file=out)
        n += 1
    return n
