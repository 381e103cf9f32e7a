"""The Flink scalar-function surface mapped onto Spark expressions.

Flink parity: FlinkSqlOperatorTable.java (1162 LoC, the SQL-callable surface)
and BuiltInFunctionDefinitions.java (136 Table-API definitions); runtime
semantics in SqlFunctionUtils.java / SqlDateTimeUtils.java. Strategy:

- ~90% of names exist in Spark with identical semantics → mapped 1:1 to
  ``pyspark.sql.functions`` (JVM-side, whole-stage-codegen'd — never a UDF).
- Flink-only names (SPLIT_INDEX, RAND_INTEGER, IS_DECIMAL, …) → thin Column
  *expression* shims (still pure Catalyst, no Python at row time).
- ``register_flink_sql_functions(spark)`` additionally registers the shim
  names as **SQL UDFs** (``CREATE FUNCTION … RETURN <expr>``, Spark ≥4.0) so
  Flink-dialect SQL strings calling them run verbatim — the function body is
  inlined into the plan by Catalyst, so this costs nothing at runtime.

``FLINK_FUNCTIONS`` maps UPPERCASE Flink names → callables building Columns;
``flink_call("NAME", *cols)`` is the dynamic entry point used by the SQL
front door and tests.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, SparkSession


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# --- shims (Flink-only names / different semantics) ------------------------


def split_index(s, delim, idx) -> Column:
    """SPLIT_INDEX(s, d, i): i is 0-based; NULL when out of range.
    Flink ref: SqlFunctionUtils.java splitIndex."""
    arr = F.split(_c(s), _c(delim))
    i = _c(idx)
    return F.when(F.size(arr) > i, F.element_at(arr, i + F.lit(1)))


def rand_integer(bound, seed: int | None = None) -> Column:
    """RAND_INTEGER(n) → uniform int in [0, n)."""
    r = F.rand(seed) if seed is not None else F.rand()
    return F.floor(r * _c(bound)).cast("int")


def is_decimal(s) -> Column:
    """IS_DECIMAL: parses as a number (SqlFunctionUtils.isDecimal)."""
    return _c(s).rlike(r"^[+-]?(\d+(\.\d*)?|\.\d+)$")


def is_digit(s) -> Column:
    return _c(s).rlike(r"^\d+$")


def is_alpha(s) -> Column:
    return _c(s).rlike(r"^[A-Za-z]+$")


def hash_code(s) -> Column:
    """HASH_CODE → a stable 32-bit hash. Value differs from Java's
    String.hashCode (documented deviation); stability is what matters."""
    return F.hash(_c(s))


def truncate(n, d=0) -> Column:
    """TRUNCATE(n, d): truncate toward zero to d decimal places."""
    scale = F.pow(F.lit(10.0), _c(d))
    x = _c(n) * scale
    return (
        F.when(_c(n) >= 0, F.floor(x)).otherwise(F.ceil(x)) / scale
    )


def cot(x) -> Column:
    return F.lit(1.0) / F.tan(_c(x))


def log2(x) -> Column:
    return F.log2(_c(x))


def chr_(i) -> Column:
    return F.char(_c(i))


def overlaps(s1, e1, s2, e2) -> Column:
    """(s1,e1) OVERLAPS (s2,e2) — SQL period overlap."""
    a1, b1 = F.least(_c(s1), _c(e1)), F.greatest(_c(s1), _c(e1))
    a2, b2 = F.least(_c(s2), _c(e2)), F.greatest(_c(s2), _c(e2))
    return (a1 <= b2) & (a2 <= b1)


def single_value(col) -> Column:
    """SINGLE_VALUE agg: the sole value of a 1-row group (error if >1 in
    Flink; here: max + count guard via assert_true pattern is heavy, so we
    return the value and let callers guard)."""
    return F.max(_c(col))


def sum0(col) -> Column:
    """SUM0: sum that returns 0 (not NULL) on empty/all-null input."""
    return F.coalesce(F.sum(_c(col)), F.lit(0))


def listagg(col, sep=",", sort: bool = True) -> Column:
    """LISTAGG with deterministic (sorted) element order."""
    lst = F.collect_list(_c(col))
    if sort:
        lst = F.array_sort(lst)
    return F.concat_ws(sep if isinstance(sep, str) else ",", lst)


def to_base64(s) -> Column:
    return F.base64(_c(s).cast("binary"))


def from_base64(s) -> Column:
    return F.unbase64(_c(s)).cast("string")


def sha224(s) -> Column:
    return F.sha2(_c(s), 224)


def sha384(s) -> Column:
    return F.sha2(_c(s), 384)


def sha256(s) -> Column:
    return F.sha2(_c(s), 256)


def sha512(s) -> Column:
    return F.sha2(_c(s), 512)


def regexp(s, pattern) -> Column:
    """Flink REGEXP(s, p): partial match (find), like RLIKE."""
    return _c(s).rlike(pattern) if isinstance(pattern, str) else _c(s).rlike(pattern)


def similar_to(s, pattern: str) -> Column:
    """SIMILAR TO — SQL regex dialect: full-string match, % → .*, _ → . ."""
    converted = (
        pattern.replace("%", ".*").replace("_", ".")
    )
    return _c(s).rlike(f"^{converted}$")


def instr(s, sub) -> Column:
    return F.instr(_c(s), sub)


def locate(sub, s, pos=None) -> Column:
    if pos is None:
        return F.locate(sub, _c(s))
    return F.locate(sub, _c(s), pos)


def timestamp_add(unit: str, n, ts) -> Column:
    return _c(ts) + F.expr(f"INTERVAL {n} {unit}")


def timestamp_diff(unit: str, t1, t2) -> Column:
    return F.timestamp_diff(unit, _c(t1), _c(t2))


def from_unixtime(sec, fmt=None) -> Column:
    return F.from_unixtime(_c(sec), fmt) if fmt else F.from_unixtime(_c(sec))


def e_() -> Column:
    return F.lit(math.e)


# --- the full name → builder map -------------------------------------------

def array_element(arr) -> Column:
    """ARRAY_ELEMENT(arr): the sole element of a 1-element array, NULL for
    an empty array (BuiltInFunctionDefinitions ARRAY_ELEMENT; Flink throws
    for size > 1 — here NULL, a documented relaxation: Catalyst expressions
    cannot raise data-dependent errors without a UDF)."""
    a = _c(arr)
    return F.when(F.size(a) == 1, F.element_at(a, 1))


def temporal_overlaps(l_start, l_end, r_start, r_end) -> Column:
    """TEMPORAL_OVERLAPS(ls, le, rs, re) — SQL (ls, le) OVERLAPS (rs, re):
    swaps each pair if reversed, then tests leftEnd >= rightStart AND
    leftStart <= rightEnd (SqlDateTimeUtils.overlaps parity)."""
    ls, le = F.least(_c(l_start), _c(l_end)), F.greatest(_c(l_start), _c(l_end))
    rs, re = F.least(_c(r_start), _c(r_end)), F.greatest(_c(r_start), _c(r_end))
    return (le >= rs) & (ls <= re)


def timestamp_diff(unit: str, t1, t2) -> Column:
    """TIMESTAMPDIFF(unit, t1, t2): signed count of complete `unit`
    boundaries from t1 to t2 (FlinkSqlOperatorTable TIMESTAMP_DIFF)."""
    return F.timestamp_diff(unit, _c(t1), _c(t2))


FLINK_FUNCTIONS: dict[str, object] = {
    # comparison / logic (native operators in both APIs; listed for coverage)
    "COALESCE": F.coalesce,
    "NULLIF": lambda a, b: F.when(_c(a) == _c(b), F.lit(None)).otherwise(_c(a)),
    "IF": lambda c, a, b: F.when(_c(c), _c(a)).otherwise(_c(b)),
    "IFNULL": lambda a, b: F.coalesce(_c(a), _c(b)),
    "IS_DISTINCT_FROM": lambda a, b: ~_c(a).eqNullSafe(_c(b)),
    "IS_NOT_DISTINCT_FROM": lambda a, b: _c(a).eqNullSafe(_c(b)),
    "BETWEEN": lambda x, lo, hi: _c(x).between(_c(lo), _c(hi)),
    "LIKE": lambda s, p: _c(s).like(p),
    "SIMILAR_TO": similar_to,
    # math
    "ABS": F.abs, "EXP": F.exp, "LN": F.log, "LOG": lambda b, x=None: F.log(b, x) if x is not None else F.log(b),
    "LOG10": F.log10, "LOG2": log2, "POWER": F.pow, "SQRT": F.sqrt, "MOD": lambda a, b: _c(a) % _c(b),
    "SIN": F.sin, "COS": F.cos, "TAN": F.tan, "COT": cot, "ASIN": F.asin, "ACOS": F.acos,
    "ATAN": F.atan, "ATAN2": F.atan2, "SINH": F.sinh, "COSH": F.cosh, "TANH": F.tanh,
    "DEGREES": F.degrees, "RADIANS": F.radians, "SIGN": F.signum, "ROUND": F.round,
    "TRUNCATE": truncate, "FLOOR": F.floor, "CEIL": F.ceil, "PI": lambda: F.lit(math.pi),
    "E": e_, "RAND": F.rand, "RAND_INTEGER": rand_integer, "BIN": F.bin,
    "HEX": F.hex, "UUID": lambda: F.expr("uuid()"),
    "DIV": lambda a, b: ((_c(a) - (_c(a) % _c(b))) / _c(b)).cast("long"),
    # string
    "CHAR_LENGTH": F.length, "CHARACTER_LENGTH": F.length, "UPPER": F.upper, "LOWER": F.lower,
    "INITCAP": F.initcap, "SUBSTRING": F.substring, "SUBSTR": F.substring,
    "LEFT": lambda s, n: F.substring(_c(s), 1, n), "RIGHT": lambda s, n: F.substring(_c(s), -n, n),
    "POSITION": lambda sub, s: F.locate(sub, _c(s)), "LOCATE": locate, "INSTR": instr,
    "OVERLAY": F.overlay, "TRIM": F.trim, "LTRIM": F.ltrim, "RTRIM": F.rtrim,
    "CONCAT": F.concat, "CONCAT_WS": F.concat_ws, "LPAD": F.lpad, "RPAD": F.rpad,
    "REPEAT": F.repeat, "REVERSE": F.reverse, "REPLACE": lambda s, a, b: F.replace(_c(s), _c(a), _c(b)),
    "REGEXP": regexp, "REGEXP_EXTRACT": F.regexp_extract, "REGEXP_REPLACE": F.regexp_replace,
    "SPLIT_INDEX": split_index, "PARSE_URL": F.parse_url, "STR_TO_MAP": F.str_to_map,
    "ENCODE": F.encode, "DECODE": F.decode, "ASCII": F.ascii, "CHR": chr_,
    "MD5": F.md5, "SHA1": F.sha1, "SHA2": F.sha2, "SHA224": sha224, "SHA256": sha256,
    "SHA384": sha384, "SHA512": sha512, "TO_BASE64": to_base64, "FROM_BASE64": from_base64,
    "IS_DECIMAL": is_decimal, "IS_DIGIT": is_digit, "IS_ALPHA": is_alpha, "HASH_CODE": hash_code,
    # temporal
    "EXTRACT": lambda field, ts: F.expr(f"extract({field} FROM {ts})") if isinstance(ts, str) else None,
    "YEAR": F.year, "QUARTER": F.quarter, "MONTH": F.month, "WEEK": F.weekofyear,
    "DAYOFYEAR": F.dayofyear, "DAYOFMONTH": F.dayofmonth, "DAYOFWEEK": F.dayofweek,
    "HOUR": F.hour, "MINUTE": F.minute, "SECOND": F.second,
    "FLOOR_TO": lambda ts, unit: F.date_trunc(unit, _c(ts)),
    "CURRENT_DATE": F.current_date, "CURRENT_TIMESTAMP": F.current_timestamp,
    "LOCALTIMESTAMP": F.localtimestamp, "NOW": F.current_timestamp,
    # Flink TIME → millis-of-day int (§1.2: Spark has no TIME type)
    "CURRENT_TIME": lambda: (
        (F.unix_micros(F.current_timestamp())
         - F.unix_micros(F.date_trunc("DAY", F.current_timestamp()))) / 1000
    ).cast("int"),
    "LOCALTIME": lambda: (
        (F.unix_micros(F.localtimestamp().cast("timestamp"))
         - F.unix_micros(F.date_trunc("DAY", F.localtimestamp().cast("timestamp")))) / 1000
    ).cast("int"),
    "UNIX_TIMESTAMP": F.unix_timestamp, "FROM_UNIXTIME": from_unixtime,
    "TO_DATE": F.to_date, "TO_TIMESTAMP": F.to_timestamp, "DATE_FORMAT": F.date_format,
    "CONVERT_TZ": F.convert_timezone if hasattr(F, "convert_timezone") else None,
    "TIMESTAMPADD": timestamp_add, "TIMESTAMPDIFF": timestamp_diff, "OVERLAPS": overlaps,
    # collections / constructors
    "ARRAY": F.array, "MAP": F.create_map, "ROW": F.struct, "ITEM": lambda a, i: F.element_at(_c(a), i),
    "CARDINALITY": F.size, "ELEMENT": lambda a: F.element_at(_c(a), 1),
    "AT": lambda a, i: F.element_at(_c(a), i), "FLATTEN": F.flatten, "GET": lambda s, f: _c(s).getField(f),
    # JSON predicates
    "IS_JSON_VALUE": lambda s: F.try_parse_json(_c(s)).isNotNull() if hasattr(F, "try_parse_json") else None,
    "IS_JSON_OBJECT": lambda s: F.get_json_object(_c(s), "$").isNotNull() & _c(s).rlike(r"^\s*\{"),
    "IS_JSON_ARRAY": lambda s: F.get_json_object(_c(s), "$").isNotNull() & _c(s).rlike(r"^\s*\["),
    "IS_JSON_SCALAR": lambda s: (
        (F.try_parse_json(_c(s)).isNotNull() & ~_c(s).rlike(r"^\s*[\[{]"))
        if hasattr(F, "try_parse_json")
        else None
    ),
    # grouping
    "GROUPING": F.grouping, "GROUPING_ID": F.grouping_id, "GROUP_ID": F.grouping_id,
    # aggregates
    "SUM": F.sum, "SUM0": sum0, "COUNT": F.count, "MIN": F.min, "MAX": F.max, "AVG": F.avg,
    "STDDEV": F.stddev, "STDDEV_POP": F.stddev_pop, "STDDEV_SAMP": F.stddev_samp,
    "VARIANCE": F.variance, "VAR_POP": F.var_pop, "VAR_SAMP": F.var_samp,
    "COLLECT": F.collect_list, "FIRST_VALUE": lambda c: F.first(_c(c), ignorenulls=True),
    "LAST_VALUE": lambda c: F.last(_c(c), ignorenulls=True), "LISTAGG": listagg,
    "SINGLE_VALUE": single_value,
    # window/rank
    "RANK": F.rank, "DENSE_RANK": F.dense_rank, "ROW_NUMBER": F.row_number,
    "LEAD": F.lead, "LAG": F.lag, "NTILE": F.ntile,
    # time attributes
    "PROCTIME": F.current_timestamp,
    "LOCALTIME": lambda: F.date_format(F.localtimestamp(), "HH:mm:ss"),
    "LOCALTIMESTAMP": F.localtimestamp,
    # remaining BuiltInFunctionDefinitions scalars (the other definitions in
    # that file are expression/syntax nodes — AND, CAST, OVER, ORDER_ASC… —
    # covered natively by Column operators)
    "ARRAY_ELEMENT": array_element,
    "TEMPORAL_OVERLAPS": temporal_overlaps,
    "TIMESTAMP_DIFF": timestamp_diff,
    # Table-API spelling aliases (BuiltInFunctionDefinitions INIT_CAP /
    # LOWERCASE / UPPERCASE vs SQL INITCAP / LOWER / UPPER)
    "INIT_CAP": F.initcap,
    "LOWERCASE": F.lower,
    "UPPERCASE": F.upper,
}
FLINK_FUNCTIONS = {k: v for k, v in FLINK_FUNCTIONS.items() if v is not None}


def flink_call(name: str, *args) -> Column:
    """Dynamic dispatch: ``flink_call("SPLIT_INDEX", col, ",", 2)``."""
    fn = FLINK_FUNCTIONS[name.upper()]
    return fn(*args)


# --- SQL-UDF registration (Flink-only names callable from SQL) -------------

_SQL_UDFS = {
    # name: (params, return expr)  — bodies are inlined by Catalyst.
    "SPLIT_INDEX": (
        "(s STRING, d STRING, i INT) RETURNS STRING",
        "CASE WHEN size(split(s, d)) > i THEN element_at(split(s, d), i + 1) END",
    ),
    "RAND_INTEGER": ("(n INT) RETURNS INT", "CAST(floor(rand() * n) AS INT)"),
    "IS_DECIMAL": (
        "(s STRING) RETURNS BOOLEAN",
        r"s RLIKE '^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$'",
    ),
    "IS_DIGIT": ("(s STRING) RETURNS BOOLEAN", r"s RLIKE '^\\d+$'"),
    "IS_ALPHA": ("(s STRING) RETURNS BOOLEAN", r"s RLIKE '^[A-Za-z]+$'"),
    "HASH_CODE": ("(s STRING) RETURNS INT", "hash(s)"),
    "TO_BASE64": ("(s STRING) RETURNS STRING", "base64(CAST(s AS BINARY))"),
    "FROM_BASE64": ("(s STRING) RETURNS STRING", "CAST(unbase64(s) AS STRING)"),
    "SHA224": ("(s STRING) RETURNS STRING", "sha2(s, 224)"),
    "SHA384": ("(s STRING) RETURNS STRING", "sha2(s, 384)"),
}
# Names like COT/LOG2/CHR that Flink defines but Spark ≥4 already ships as
# builtins are intentionally absent: Spark refuses to shadow a builtin with a
# SQL UDF, and the builtin semantics already match.


def register_flink_sql_functions(spark: SparkSession) -> None:
    """Register Flink-only function names as SQL UDFs (Spark ≥4.0).

    Bodies are pure SQL expressions — Catalyst inlines them, so Flink-dialect
    SQL calling these names pays zero overhead vs hand-written Spark SQL.
    """
    for name, (sig, body) in _SQL_UDFS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig.split(' RETURNS ')[0]} "
            f"RETURNS {sig.split(' RETURNS ')[1]} RETURN {body}"
        )
