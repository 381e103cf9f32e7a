"""User-defined function surface mirroring pyflink.table.udf semantics.

Flink parity: flink-python/pyflink/table/udf.py — ``udf`` (:515), ``udtf``
(:570), ``udaf`` (:610), with ``func_type`` "general" | "pandas" (:328-333);
JVM-side contracts ScalarFunction / TableFunction / AggregateFunction
(flink-table/flink-table-common/.../functions/).

Mapping:
- ``udf(func_type="general")``  → row-at-a-time Python UDF (slow path, exists
  for API parity — prefer pandas).
- ``udf(func_type="pandas")``   → Arrow-vectorized ``pandas_udf`` (the native
  path in a Python-first engine).
- ``udtf``                      → one-to-many: function yields rows per input
  row; executed as array-returning UDF + ``explode`` (keeps Catalyst in
  control of the lateral join).
- ``udaf(func_type="pandas")``  → GROUPED_AGG ``pandas_udf`` usable inside
  ``groupBy().agg(...)``. Flink's ``retract()`` accumulator method has no
  batch meaning; in streaming update-mode the state store plays that role.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.types import ArrayType, DataType, StructType, _parse_datatype_string


def _to_dt(t: DataType | str) -> DataType:
    return t if isinstance(t, DataType) else _parse_datatype_string(t)


def udf(result_type: DataType | str, func_type: str = "pandas"):
    """Scalar UDF decorator: ``@udf("double")`` or
    ``@udf("double", func_type="general")``."""
    dt = _to_dt(result_type)

    def deco(fn: Callable):
        if func_type == "pandas":
            return F.pandas_udf(dt)(fn)
        return F.udf(fn, dt)

    return deco


def udtf(result_schema: StructType | str):
    """Table function decorator: the wrapped fn maps ONE input row's args to
    an iterable of output tuples. Returns a callable producing an
    array<struct> Column; compose with ``explode_rows`` for the lateral join.

    ``@udtf("word string, pos int")`` then
    ``df.select(explode_rows(my_udtf(col))).select("col.*")``.
    """
    schema = _to_dt(result_schema)
    arr = ArrayType(schema)

    def deco(fn: Callable):
        def gen(*args):
            return [tuple(r) for r in fn(*args)]

        return F.udf(gen, arr)

    return deco


def explode_rows(col: Column) -> Column:
    """Lateral explode of a udtf result (Flink Correlate parity)."""
    return F.explode(col)


def udaf(result_type: DataType | str):
    """Aggregate UDF decorator (pandas GROUPED_AGG):
    ``@udaf("double")`` wraps ``fn(*series) -> scalar`` for use in ``agg``."""
    dt = _to_dt(result_type)

    def deco(fn: Callable):
        return F.pandas_udf(dt)(fn)

    return deco
