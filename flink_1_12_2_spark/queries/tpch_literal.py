"""LITERAL TPC-H query text through the SQL front door.

The reference's TPC-H end-to-end gate keeps four MODIFIED query files
(flink-end-to-end-tests/test-scripts/test-data/tpch/modified-query/
q{6,11,15,20}.sql — the stock queries adapted to what Blink's parser
accepted: backquoted ``value``, view-free q15, ``date '...'`` literals).
This module runs those four files byte-for-byte through
``sql/rewriter.rewrite`` + ``spark.sql`` over adapter views, the TPC-H
counterpart of ``tpcds_literal.py``; ``tests/test_tpch_literal.py``
asserts the embedded strings equal the reference files.

Adapter views over the driver parquet (documented deltas only — other
columns pass through):

- ``lineitem``: l_shipdate shifts back TWO YEARS (the driver's ship
  dates span 1995–2001; the spec's literal 1994/1996 windows then select
  non-empty subsets), l_extendedprice rounds to whole dollars and
  l_discount floors to SIXTEENTHS — both exactly representable doubles,
  so every revenue sum (``sum(l_extendedprice * (1-l_discount))``) is a
  sum of exact multiples of 1/16 and therefore ORDER-FREE: q15's
  ``total_revenue = (SELECT max(total_revenue) ...)`` float equality
  cannot flake on shuffle merge order, on any engine;
- ``nation``: n_name remaps onto the 25 real TPC-H nation names (the
  driver generator writes NATION_<k>), so the spec's literal 'GERMANY' /
  'CANADA' filters select non-empty subsets;
- ``supplier``: synthesized s_address / s_phone;
- ``part``: every 8th part's p_name gains the 'forest ' prefix so q20's
  ``LIKE 'forest%%'`` selects a non-empty subset;
- ``partsupp`` (absent from the driver tables): synthesized as
  part × range(4) with integer ps_availqty / ps_supplycost (exact int64
  products — q11's HAVING threshold is deterministic) and ps_suppkey
  spread across the actual supplier-key range via MIN + a scalar-subquery
  modulus (the driver's keys are 0-based), so the synthesis is
  scale-factor-independent and every supplier is reachable.

Scale: q6 is a pure scan-aggregate; q11/q20 join the synthesized
partsupp (4 rows per part — same cardinality class as real TPC-H's 4
suppliers per part); q15 is two aggregations of one subquery (Spark's
ReuseExchange dedups the identical subplans). The oracles render the
SAME mappings as DuckDB CTEs under different names (the Spark side must
shadow the real table names for the literal text; the oracle is free
not to).
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401 (parity with sibling modules)
from pyspark.sql import DataFrame, SparkSession

from flink_1_12_2_spark.registry import load, query
from flink_1_12_2_spark.sql.rewriter import rewrite

_NATIONS = (
    "'ALGERIA','ARGENTINA','BRAZIL','CANADA','EGYPT','ETHIOPIA','FRANCE',"
    "'GERMANY','INDIA','INDONESIA','IRAN','IRAQ','JAPAN','JORDAN','KENYA',"
    "'MOROCCO','MOZAMBIQUE','PERU','CHINA','ROMANIA','SAUDI ARABIA',"
    "'VIETNAM','RUSSIA','UNITED KINGDOM','UNITED STATES'"
)

_ADAPTER_SPARK = {
    "lineitem": """
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
               l_quantity,
               ROUND(l_extendedprice) AS l_extendedprice,
               FLOOR(l_discount * 16) / 16 AS l_discount,
               l_tax, l_returnflag, l_linestatus,
               l_shipdate - INTERVAL 2 YEAR AS l_shipdate
        FROM __tpch_lineitem
    """,
    "nation": f"""
        SELECT n_nationkey,
               element_at(array({_NATIONS}),
                          CAST(n_nationkey + 1 AS INT)) AS n_name,
               n_regionkey
        FROM __tpch_nation
    """,
    "supplier": """
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
               CONCAT('Addr#', LPAD(CAST(s_suppkey AS STRING), 6, '0'))
                 AS s_address,
               CONCAT('27-', LPAD(CAST(s_suppkey * 31 % 10000000 AS STRING),
                                  7, '0')) AS s_phone
        FROM __tpch_supplier
    """,
    "part": """
        SELECT p_partkey,
               CASE WHEN p_partkey % 8 = 0
                    THEN CONCAT('forest ', p_name) ELSE p_name END AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM __tpch_part
    """,
    "partsupp": """
        SELECT p_partkey AS ps_partkey,
               CAST((SELECT MIN(s_suppkey) FROM __tpch_supplier)
                    + (p_partkey * 7 + r.id * 13)
                    % (SELECT COUNT(*) FROM __tpch_supplier) AS BIGINT)
                 AS ps_suppkey,
               CAST(10 + (p_partkey * 3 + r.id * 17) % 990 AS INT)
                 AS ps_availqty,
               CAST(50 + (p_partkey * 11 + r.id * 23) % 950 AS INT)
                 AS ps_supplycost
        FROM __tpch_part CROSS JOIN (SELECT id FROM range(4)) r
    """,
}

_ADAPTER_DUCK = f"""
    li AS (
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
             l_quantity,
             ROUND(l_extendedprice) AS l_extendedprice,
             FLOOR(l_discount * 16) / 16 AS l_discount,
             l_tax, l_returnflag, l_linestatus,
             l_shipdate - INTERVAL 2 YEAR AS l_shipdate
      FROM lineitem),
    na AS (
      SELECT n_nationkey,
             ([{_NATIONS}])[CAST(n_nationkey + 1 AS INT)] AS n_name,
             n_regionkey
      FROM nation),
    su AS (
      SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
             'Addr#' || LPAD(CAST(s_suppkey AS VARCHAR), 6, '0') AS s_address,
             '27-' || LPAD(CAST(s_suppkey * 31 % 10000000 AS VARCHAR), 7, '0')
               AS s_phone
      FROM supplier),
    pa AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 8 = 0
                  THEN 'forest ' || p_name ELSE p_name END AS p_name,
             p_brand, p_type, p_size, p_retailprice
      FROM part),
    ps AS (
      SELECT p_partkey AS ps_partkey,
             CAST((SELECT MIN(s_suppkey) FROM supplier)
                  + (p_partkey * 7 + r.range * 13)
                  % (SELECT COUNT(*) FROM supplier) AS BIGINT) AS ps_suppkey,
             CAST(10 + (p_partkey * 3 + r.range * 17) % 990 AS INT)
               AS ps_availqty,
             CAST(50 + (p_partkey * 11 + r.range * 23) % 950 AS INT)
               AS ps_supplycost
      FROM part CROSS JOIN range(4) r)
"""


def _register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "nation", "supplier", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"__tpch_{t}")
    for name, body in _ADAPTER_SPARK.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {body}")


def _literal_df(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    """Run literal text over the adapter views, then RESTORE the raw-table
    bindings: the adapter must shadow the real table names (the literal
    text demands them) but spark.sql analysis is eager — the returned
    DataFrame has already resolved the adapter views — so rebinding the
    names to the raw parquet immediately keeps the shared gate/replay
    session from ever observing shifted dates or remapped nations through
    spark.table("lineitem") after a tpch_literal query runs."""
    _register_views(spark, sf_dir)
    df = spark.sql(rewrite(text))
    for t in ("lineitem", "nation", "supplier", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    spark.catalog.dropTempView("partsupp")  # synthetic — must not outlive df
    return df


QUERY6_SQL = "-- database: presto; groups: tpch; tables: lineitem\nSELECT sum(l_extendedprice * l_discount) AS revenue\nFROM\n  lineitem\nWHERE\n  l_shipdate >= DATE '1994-01-01'\n  AND l_shipdate < DATE '1994-01-01' + INTERVAL '1' YEAR\n-- AND l_discount BETWEEN decimal '0.06' - decimal '0.01' AND decimal '0.06' + decimal '0.01'\n-- Blink currently does not support the above feature\nAND l_discount BETWEEN 0.06 - 0.01 AND 0.06 + 0.01\nAND l_quantity < 24\n"



QUERY11_SQL = "-- database: presto; groups: tpch; tables: partsupp,supplier,nation\nSELECT\n  ps_partkey,\n--  sum(ps_supplycost * ps_availqty) AS value\n  sum(ps_supplycost * ps_availqty) AS `value`\nFROM\n  partsupp,\n  supplier,\n  nation\nWHERE\n  ps_suppkey = s_suppkey\n  AND s_nationkey = n_nationkey\n  AND n_name = 'GERMANY'\nGROUP BY\n  ps_partkey\nHAVING\n  sum(ps_supplycost * ps_availqty) > (\n    SELECT sum(ps_supplycost * ps_availqty) * 0.0001\n    FROM\n      partsupp,\n      supplier,\n      nation\n    WHERE\n      ps_suppkey = s_suppkey\n      AND s_nationkey = n_nationkey\n      AND n_name = 'GERMANY'\n  )\nORDER BY\n--  value DESC\n  `value` DESC\n"



QUERY15_SQL = "-- database: presto; groups: tpch; tables: lineitem,supplier\n-- CREATE OR REPLACE VIEW revenue AS\n--   SELECT\n--     l_suppkey AS supplier_no,\n--     sum(l_extendedprice * (1 - l_discount)) AS total_revenue\n--   FROM\n--     lineitem\n--   WHERE\n--     l_shipdate >= DATE '1996-01-01'\n--     AND l_shipdate < DATE '1996-01-01' + INTERVAL '3' MONTH\n-- GROUP BY\n--   l_suppkey;\n--\n-- SELECT\n--   s_suppkey,\n--   s_name,\n--   s_address,\n--   s_phone,\n--   total_revenue\n-- FROM\n--   supplier,\n--   revenue\n-- WHERE\n--   s_suppkey = supplier_no\n--   AND total_revenue = (\n--     SELECT max(total_revenue)\n--     FROM\n--       revenue\n--   )\n-- ORDER BY\n--   s_suppkey;\n-- Blink does not support view\n\nSELECT\n  s_suppkey,\n  s_name,\n  s_address,\n  s_phone,\n  total_revenue\nFROM\n  supplier, (\n  SELECT\n    l_suppkey AS supplier_no,\n    sum(l_extendedprice * (1 - l_discount)) AS total_revenue\n  FROM\n    lineitem\n  WHERE\n    l_shipdate >= DATE '1996-01-01'\n    AND l_shipdate < DATE '1996-01-01' + INTERVAL '3' MONTH\n  GROUP BY\n    l_suppkey) AS revenue\nWHERE\n  s_suppkey = supplier_no\n  AND total_revenue = (\n    SELECT max(total_revenue)\n    FROM (\n      SELECT\n        l_suppkey AS supplier_no,\n        sum(l_extendedprice * (1 - l_discount)) AS total_revenue\n      FROM\n        lineitem\n      WHERE\n        l_shipdate >= DATE '1996-01-01'\n        AND l_shipdate < DATE '1996-01-01' + INTERVAL '3' MONTH\n      GROUP BY\n        l_suppkey) AS revenue\n  )\nORDER BY\n  s_suppkey;\n"



QUERY20_SQL = "-- database: presto; groups: tpch; tables: supplier,nation,partsupp,lineitem,part\nSELECT\n  s_name,\n  s_address\nFROM\n  supplier, nation\nWHERE\n  s_suppkey IN (\n    SELECT ps_suppkey\n    FROM\n      partsupp\n    WHERE\n      ps_partkey IN (\n        SELECT p_partkey\n        FROM\n          part\n        WHERE\n          p_name LIKE 'forest%'\n      )\n      AND ps_availqty > (\n        SELECT 0.5 * sum(l_quantity)\n        FROM\n          lineitem\n        WHERE\n          l_partkey = ps_partkey\n          AND l_suppkey = ps_suppkey\n          -- AND l_shipdate >= date('1994-01-01')\n          -- AND l_shipdate < date('1994-01-01') + interval '1' YEAR\n          -- Blink does not support the above format\n          AND l_shipdate >= date '1994-01-01'\n          AND l_shipdate < date '1994-01-01' + interval '1' YEAR\n)\n)\nAND s_nationkey = n_nationkey\nAND n_name = 'CANADA'\nORDER BY s_name\n"



@query(
    "tpch_literal_q6",
    oracle=f"""
    WITH {_ADAPTER_DUCK}
    SELECT SUM(l_extendedprice * l_discount) AS revenue
    FROM li
    WHERE l_shipdate >= DATE '1994-01-01'
      AND l_shipdate < DATE '1994-01-01' + INTERVAL '1' YEAR
      AND l_discount BETWEEN 0.06 - 0.01 AND 0.06 + 0.01
      AND l_quantity < 24
    """,
    tags=("batch", "tpch", "literal-sql"),
)
def tpch_literal_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6.sql (the reference's modified-query file), unmodified —
    scan-aggregate with float-literal discount band; the revenue sum is
    order-free exact (dollars x sixteenths, see module docstring)."""
    return _literal_df(spark, sf_dir, QUERY6_SQL).toDF("revenue")


@query(
    "tpch_literal_q11",
    oracle=f"""
    WITH {_ADAPTER_DUCK}
    SELECT ps_partkey, SUM(ps_supplycost * ps_availqty) AS value
    FROM ps, su, na
    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'GERMANY'
    GROUP BY ps_partkey
    HAVING SUM(ps_supplycost * ps_availqty) > (
      SELECT SUM(ps_supplycost * ps_availqty) * 0.0001
      FROM ps, su, na
      WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'GERMANY')
    ORDER BY value DESC
    """,
    tags=("batch", "tpch", "literal-sql"),
)
def tpch_literal_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11.sql, unmodified (backquoted ``value`` identifier) —
    HAVING against an uncorrelated scalar subquery; products are exact
    int64, so the 0.0001-fraction threshold is deterministic."""
    return _literal_df(spark, sf_dir, QUERY11_SQL).toDF("ps_partkey", "value")


@query(
    "tpch_literal_q15",
    oracle=f"""
    WITH {_ADAPTER_DUCK},
    revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM li
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-01-01' + INTERVAL '3' MONTH
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, s_address, s_phone, total_revenue
    FROM su, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("batch", "tpch", "literal-sql"),
)
def tpch_literal_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15.sql, unmodified (the reference's view-free rewrite) —
    float equality against MAX over a repeated subquery. Safe here by
    construction: revenue sums are exact multiples of 1/16 (order-free),
    so both evaluations produce identical doubles."""
    return _literal_df(spark, sf_dir, QUERY15_SQL).toDF(
        "s_suppkey", "s_name", "s_address", "s_phone", "total_revenue"
    )


@query(
    "tpch_literal_q20",
    oracle=f"""
    WITH {_ADAPTER_DUCK}
    SELECT s_name, s_address
    FROM su, na
    WHERE s_suppkey IN (
        SELECT ps_suppkey FROM ps
        WHERE ps_partkey IN (SELECT p_partkey FROM pa
                             WHERE p_name LIKE 'forest%')
          AND ps_availqty > (
            SELECT 0.5 * SUM(l_quantity) FROM li
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= DATE '1994-01-01'
              AND l_shipdate < DATE '1994-01-01' + INTERVAL '1' YEAR))
      AND s_nationkey = n_nationkey AND n_name = 'CANADA'
    ORDER BY s_name
    """,
    tags=("batch", "tpch", "literal-sql"),
)
def tpch_literal_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20.sql, unmodified — nested IN subqueries with a CORRELATED
    scalar aggregate threshold (the availqty-vs-half-yearly-demand
    filter). NULL comparison semantics (no matching lineitems →
    NULL > threshold is false... actually availqty > NULL is NULL)
    match across engines."""
    return _literal_df(spark, sf_dir, QUERY20_SQL).toDF("s_name", "s_address")
