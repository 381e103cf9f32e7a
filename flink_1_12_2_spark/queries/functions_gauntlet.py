"""Scalar-function surface gauntlets — prove the Flink→Spark function mappings
(SURVEY.md §2.9, FlinkSqlOperatorTable.java / SqlFunctionUtils.java /
SqlDateTimeUtils.java) value-for-value against DuckDB.

Each gauntlet evaluates a batch of functions through
``flink_1_12_2_spark.functions.registry.FLINK_FUNCTIONS`` (the same builders
the Table-API surface exposes) so the oracle checks the registry itself, not
ad-hoc expressions. Functions DuckDB cannot replicate (initcap, parse_url,
str_to_map, hash) are exercised in unit tests instead (tests/test_functions.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_12_2_spark.functions.registry import FLINK_FUNCTIONS as FN
from flink_1_12_2_spark.registry import EVENTS_US_CTE, load, query


@query(
    "fn_math_gauntlet",
    oracle="""
    SELECT p_partkey,
           ABS(p_retailprice - 1000.0)            AS f_abs,
           ROUND(p_retailprice, 1)                AS f_round,
           CAST(FLOOR(p_retailprice) AS DOUBLE)   AS f_floor,
           CAST(CEIL(p_retailprice) AS DOUBLE)    AS f_ceil,
           CAST(TRUNC(p_retailprice * 10) / 10.0 AS DOUBLE) AS f_trunc1,
           SQRT(p_retailprice)                    AS f_sqrt,
           LN(p_retailprice)                      AS f_ln,
           LOG10(p_retailprice)                   AS f_log10,
           LOG2(p_retailprice)                    AS f_log2,
           EXP(CAST(p_size AS DOUBLE) / 50.0)     AS f_exp,
           POWER(CAST(p_size AS DOUBLE), 2.0)     AS f_power,
           CAST(p_size % 7 AS INT)                AS f_mod,
           SIN(CAST(p_size AS DOUBLE))            AS f_sin,
           COS(CAST(p_size AS DOUBLE))            AS f_cos,
           TAN(CAST(p_size AS DOUBLE) / 10.0)     AS f_tan,
           1.0 / TAN(CAST(p_size AS DOUBLE) / 10.0) AS f_cot,
           ASIN(SIN(CAST(p_size AS DOUBLE)))      AS f_asin,
           ATAN2(CAST(p_size AS DOUBLE), 10.0)    AS f_atan2,
           (EXP(CAST(p_size AS DOUBLE)/25.0) - EXP(-CAST(p_size AS DOUBLE)/25.0)) / 2.0 AS f_sinh,
           (EXP(CAST(p_size AS DOUBLE)/12.5) - 1.0) / (EXP(CAST(p_size AS DOUBLE)/12.5) + 1.0) AS f_tanh,
           DEGREES(CAST(p_size AS DOUBLE) / 10.0) AS f_degrees,
           RADIANS(CAST(p_size AS DOUBLE))        AS f_radians,
           CAST(SIGN(p_retailprice - 1500.0) AS DOUBLE) AS f_sign,
           PI()                                   AS f_pi,
           EXP(1.0)                               AS f_e,
           CAST(p_partkey // 7 AS BIGINT)         AS f_div
    FROM part WHERE p_partkey <= 200 ORDER BY p_partkey
    """,
    tags=("batch", "functions", "math"),
)
def fn_math_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions (FlinkSqlOperatorTable math block) via the registry."""
    p = load(spark, sf_dir, "part")
    size_d = F.col("p_size").cast("double")
    price = F.col("p_retailprice")
    return (
        p.filter(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            FN["ABS"](price - 1000.0).alias("f_abs"),
            FN["ROUND"](price, 1).alias("f_round"),
            FN["FLOOR"](price).cast("double").alias("f_floor"),
            FN["CEIL"](price).cast("double").alias("f_ceil"),
            FN["TRUNCATE"](price, 1).cast("double").alias("f_trunc1"),
            FN["SQRT"](price).alias("f_sqrt"),
            FN["LN"](price).alias("f_ln"),
            FN["LOG10"](price).alias("f_log10"),
            FN["LOG2"](price).alias("f_log2"),
            FN["EXP"](size_d / 50.0).alias("f_exp"),
            FN["POWER"](size_d, F.lit(2.0)).alias("f_power"),
            FN["MOD"](F.col("p_size"), F.lit(7)).cast("int").alias("f_mod"),
            FN["SIN"](size_d).alias("f_sin"),
            FN["COS"](size_d).alias("f_cos"),
            FN["TAN"](size_d / 10.0).alias("f_tan"),
            FN["COT"](size_d / 10.0).alias("f_cot"),
            FN["ASIN"](F.sin(size_d)).alias("f_asin"),
            FN["ATAN2"](size_d, F.lit(10.0)).alias("f_atan2"),
            FN["SINH"](size_d / 25.0).alias("f_sinh"),
            FN["TANH"](size_d / 25.0).alias("f_tanh"),
            FN["DEGREES"](size_d / 10.0).alias("f_degrees"),
            FN["RADIANS"](size_d).alias("f_radians"),
            FN["SIGN"](price - 1500.0).cast("double").alias("f_sign"),
            FN["PI"]().alias("f_pi"),
            FN["E"]().alias("f_e"),
            FN["DIV"](F.col("p_partkey"), F.lit(7)).alias("f_div"),
        )
        .orderBy("p_partkey")
    )


@query(
    "fn_string_gauntlet",
    oracle="""
    SELECT doc_id,
           UPPER(text)                                   AS f_upper,
           LOWER(source)                                 AS f_lower,
           CAST(LENGTH(text) AS INT)                     AS f_char_length,
           SUBSTRING(text, 3, 8)                         AS f_substring,
           LEFT(text, 5)                                 AS f_left,
           RIGHT(text, 5)                                AS f_right,
           LPAD(source, 10, '*')                         AS f_lpad,
           RPAD(source, 10, '*')                         AS f_rpad,
           TRIM('  ' || source || ' ')                   AS f_trim,
           LTRIM('  ' || source)                         AS f_ltrim,
           RTRIM(source || '  ')                         AS f_rtrim,
           REPLACE(source, 'src', 'origin_')             AS f_replace,
           REVERSE(source)                               AS f_reverse,
           REPEAT(source, 2)                             AS f_repeat,
           CAST(ASCII(source) AS INT)                    AS f_ascii,
           CHR(65 + CAST(doc_id % 26 AS INT))            AS f_chr,
           source || '-' || lang                         AS f_concat,
           CONCAT_WS('|', source, lang)                  AS f_concat_ws,
           CAST(STRPOS(text, 'the') AS INT)              AS f_position,
           MD5(text)                                     AS f_md5,
           SHA256(text)                                  AS f_sha256,
           BASE64(ENCODE(source))                        AS f_to_base64,
           list_extract(string_split(text, ' '), 3)      AS f_split_index,
           REGEXP_EXTRACT(text, '([a-z]+)', 1)           AS f_regexp_extract,
           REGEXP_REPLACE(text, '[aeiou]', '_', 'g')     AS f_regexp_replace,
           CAST(REGEXP_MATCHES(lang, '^[a-z]+$') AS BOOLEAN) AS f_is_alpha,
           CAST(REGEXP_MATCHES(CAST(doc_id AS VARCHAR), '^[0-9]+$') AS BOOLEAN) AS f_is_digit
    FROM documents WHERE doc_id <= 100 ORDER BY doc_id
    """,
    tags=("batch", "functions", "string"),
)
def fn_string_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions (SqlFunctionUtils.java parity) via the registry."""
    d = load(spark, sf_dir, "documents")
    t, s = F.col("text"), F.col("source")
    return (
        d.filter(F.col("doc_id") <= 100)
        .select(
            "doc_id",
            FN["UPPER"](t).alias("f_upper"),
            FN["LOWER"](s).alias("f_lower"),
            FN["CHAR_LENGTH"](t).alias("f_char_length"),
            FN["SUBSTRING"](t, 3, 8).alias("f_substring"),
            FN["LEFT"](t, 5).alias("f_left"),
            FN["RIGHT"](t, 5).alias("f_right"),
            FN["LPAD"](s, 10, "*").alias("f_lpad"),
            FN["RPAD"](s, 10, "*").alias("f_rpad"),
            FN["TRIM"](F.concat(F.lit("  "), s, F.lit(" "))).alias("f_trim"),
            FN["LTRIM"](F.concat(F.lit("  "), s)).alias("f_ltrim"),
            FN["RTRIM"](F.concat(s, F.lit("  "))).alias("f_rtrim"),
            FN["REPLACE"](s, F.lit("src"), F.lit("origin_")).alias("f_replace"),
            FN["REVERSE"](s).alias("f_reverse"),
            FN["REPEAT"](s, 2).alias("f_repeat"),
            FN["ASCII"](s).alias("f_ascii"),
            FN["CHR"](F.lit(65) + (F.col("doc_id") % 26).cast("int")).alias("f_chr"),
            FN["CONCAT"](s, F.lit("-"), F.col("lang")).alias("f_concat"),
            FN["CONCAT_WS"]("|", s, F.col("lang")).alias("f_concat_ws"),
            FN["POSITION"]("the", t).alias("f_position"),
            FN["MD5"](t).alias("f_md5"),
            FN["SHA256"](t).alias("f_sha256"),
            FN["TO_BASE64"](s).alias("f_to_base64"),
            FN["SPLIT_INDEX"](t, F.lit(" "), F.lit(2)).alias("f_split_index"),
            FN["REGEXP_EXTRACT"](t, "([a-z]+)", 1).alias("f_regexp_extract"),
            FN["REGEXP_REPLACE"](t, "[aeiou]", "_").alias("f_regexp_replace"),
            FN["IS_ALPHA"](F.col("lang")).alias("f_is_alpha"),
            FN["IS_DIGIT"](F.col("doc_id").cast("string")).alias("f_is_digit"),
        )
        .orderBy("doc_id")
    )


@query(
    "fn_temporal_gauntlet",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT)       AS f_year,
           CAST(QUARTER(o_orderdate) AS INT)    AS f_quarter,
           CAST(MONTH(o_orderdate) AS INT)      AS f_month,
           CAST(WEEKOFYEAR(o_orderdate) AS INT) AS f_week,
           CAST(DAYOFYEAR(o_orderdate) AS INT)  AS f_dayofyear,
           CAST(DAYOFMONTH(o_orderdate) AS INT) AS f_dayofmonth,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS f_dayofweek,
           CAST(HOUR(o_orderdate) AS INT)       AS f_hour,
           CAST(MINUTE(o_orderdate) AS INT)     AS f_minute,
           CAST(SECOND(o_orderdate) AS INT)     AS f_second,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS f_trunc_month,
           CAST(DATE_TRUNC('day', o_orderdate) AS TIMESTAMP)   AS f_trunc_day,
           STRFTIME(o_orderdate, '%Y-%m-%d')    AS f_date_format,
           CAST(o_orderdate AS DATE)            AS f_to_date,
           o_orderdate + INTERVAL 3 DAY         AS f_plus_days,
           o_orderdate - INTERVAL 2 HOUR        AS f_minus_hours,
           CAST(DATE_DIFF('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT)
             AS f_days_since_95,
           CAST((DATE_PART('year', o_orderdate) BETWEEN 1995 AND 1996) AS BOOLEAN)
             AS f_between,
           CAST(EPOCH(o_orderdate) AS BIGINT)   AS f_epoch
    FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey
    """,
    tags=("batch", "functions", "temporal"),
)
def fn_temporal_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal functions (SqlDateTimeUtils.java parity) via the registry.

    Note DAYOFWEEK alignment: Spark 1=Sunday..7=Saturday; DuckDB dayofweek is
    0=Sunday..6 → oracle adds 1. EPOCH on NTZ = seconds since epoch of the
    wall-clock value, matching Spark's unix_timestamp under UTC semantics.
    """
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            FN["YEAR"](d).alias("f_year"),
            FN["QUARTER"](d).alias("f_quarter"),
            FN["MONTH"](d).alias("f_month"),
            FN["WEEK"](d).alias("f_week"),
            FN["DAYOFYEAR"](d).alias("f_dayofyear"),
            FN["DAYOFMONTH"](d).alias("f_dayofmonth"),
            FN["DAYOFWEEK"](d).alias("f_dayofweek"),
            FN["HOUR"](d).alias("f_hour"),
            FN["MINUTE"](d).alias("f_minute"),
            FN["SECOND"](d).alias("f_second"),
            FN["FLOOR_TO"](d, "month").alias("f_trunc_month"),
            FN["FLOOR_TO"](d, "day").alias("f_trunc_day"),
            FN["DATE_FORMAT"](d, "yyyy-MM-dd").alias("f_date_format"),
            FN["TO_DATE"](d).alias("f_to_date"),
            FN["TIMESTAMPADD"]("DAY", 3, d).alias("f_plus_days"),
            (d - F.expr("INTERVAL 2 HOURS")).alias("f_minus_hours"),
            FN["TIMESTAMPDIFF"](
                "DAY", F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"), d
            ).alias("f_days_since_95"),
            FN["BETWEEN"](F.year(d), F.lit(1995), F.lit(1996)).alias("f_between"),
            # session-timezone-independent epoch: NTZ diff from the NTZ epoch
            FN["TIMESTAMPDIFF"](
                "SECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), d
            ).alias("f_epoch"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "fn_collection_gauntlet",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS arr
      FROM documents WHERE doc_id <= 100)
    SELECT doc_id,
           CAST(len(arr) AS INT)                          AS f_cardinality,
           arr[1]                                         AS f_element_first,
           arr[-1]                                        AS f_element_last,
           CAST(list_contains(arr, 'the') AS BOOLEAN)     AS f_contains,
           CAST(len(list_distinct(arr)) AS INT)           AS f_distinct_n,
           list_sort(list_distinct(arr))[1]               AS f_sorted_first,
           array_to_string(list_slice(arr, 1, 3), '|')    AS f_slice_join,
           CAST(list_position(arr, 'data') AS INT)        AS f_position,
           list_reverse(arr)[1]                           AS f_reverse_first,
           CAST(len(list_filter(arr, x -> length(x) > 4)) AS INT) AS f_long_tokens,
           list_transform(arr, x -> upper(x))[1]          AS f_transform_first,
           CAST(list_reduce(list_transform(arr, x -> length(x)), (a,b) -> a + b) AS BIGINT)
             AS f_total_len
    FROM t ORDER BY doc_id
    """,
    tags=("batch", "functions", "collection"),
)
def fn_collection_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection/constructor functions (FlinkSqlOperatorTable ARRAY/MAP/ITEM/
    CARDINALITY/ELEMENT block + higher-order functions) via the registry."""
    from flink_1_12_2_spark.llm.text import tokens

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    arr = tokens(F.col("text"))
    return d.select(
        "doc_id",
        FN["CARDINALITY"](arr).alias("f_cardinality"),
        FN["ELEMENT"](arr).alias("f_element_first"),
        FN["AT"](arr, -1).alias("f_element_last"),
        F.array_contains(arr, "the").alias("f_contains"),
        F.size(F.array_distinct(arr)).alias("f_distinct_n"),
        F.element_at(F.array_sort(F.array_distinct(arr)), 1).alias("f_sorted_first"),
        F.array_join(F.slice(arr, 1, 3), "|").alias("f_slice_join"),
        F.array_position(arr, "data").cast("int").alias("f_position"),
        F.element_at(F.reverse(arr), 1).alias("f_reverse_first"),
        F.size(F.filter(arr, lambda x: F.length(x) > 4)).alias("f_long_tokens"),
        F.element_at(F.transform(arr, F.upper), 1).alias("f_transform_first"),
        F.aggregate(
            F.transform(arr, F.length),
            F.lit(0),
            lambda a, b: a + b,
        ).cast("bigint").alias("f_total_len"),
    ).orderBy("doc_id")


@query(
    "fn_json_gauntlet",
    oracle=EVENTS_US_CTE
    + """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT)       AS f_get_k,
           CAST(json_extract_string(props, '$.k') AS INT)       AS f_from_json_k,
           json_valid(props)                                    AS f_is_value_props,
           json_valid(event_type)                               AS f_is_value_raw,
           json_valid(props) AND json_type(props) = 'OBJECT'    AS f_is_object,
           json_valid(props) AND json_type(props) = 'ARRAY'     AS f_is_object_neg,
           json_valid('[1,2,' || json_extract_string(props, '$.k') || ']')
             AND json_type('[1,2,' || json_extract_string(props, '$.k') || ']')
                 = 'ARRAY'                                      AS f_is_array,
           json_valid(json_extract_string(props, '$.k'))
             AND json_type(json_extract_string(props, '$.k'))
                 NOT IN ('OBJECT', 'ARRAY')                     AS f_is_scalar,
           to_json(struct_pack(event_id := event_id,
                               event_type := event_type))       AS f_to_json
    FROM ev WHERE event_id <= 500 ORDER BY event_id
    """,
    tags=("batch", "functions", "json"),
)
def fn_json_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON predicates + extraction (FlinkSqlOperatorTable IS [NOT] JSON
    VALUE/OBJECT/ARRAY/SCALAR block, SURVEY §2.9) via the registry shims,
    over the events.props JSON column. Parse paths exercised: Spark
    get_json_object (JsonPath), from_json (schema'd struct), try_parse_json
    (VARIANT validity probe), to_json (struct serialization — byte-equal
    compact format in both engines)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    k = F.get_json_object("props", "$.k")
    arr = F.concat(F.lit("[1,2,"), k, F.lit("]"))
    return ev.select(
        "event_id",
        k.cast("int").alias("f_get_k"),
        F.from_json("props", "k INT").getField("k").alias("f_from_json_k"),
        FN["IS_JSON_VALUE"](F.col("props")).alias("f_is_value_props"),
        FN["IS_JSON_VALUE"](F.col("event_type")).alias("f_is_value_raw"),
        FN["IS_JSON_OBJECT"](F.col("props")).alias("f_is_object"),
        FN["IS_JSON_ARRAY"](F.col("props")).alias("f_is_object_neg"),
        FN["IS_JSON_ARRAY"](arr).alias("f_is_array"),
        FN["IS_JSON_SCALAR"](k).alias("f_is_scalar"),
        F.to_json(F.struct("event_id", "event_type")).alias("f_to_json"),
    ).orderBy("event_id")
