"""Batch relational core — scans, calc, joins, aggregates, rank, set ops.

Flink parity map (SURVEY.md §2.1–§2.8). Every query here is pure DataFrame API
→ Catalyst picks the physical strategy (broadcast/shuffled-hash/sort-merge join,
hash/sort aggregate, TakeOrderedAndProject …), which is exactly the Blink
planner's physical-strategy inventory re-used rather than re-implemented:
  - Calc (StreamExecCalc.scala:39)                → select/filter fusion
  - HashJoin/SortMergeJoin (HashJoinOperator.java:58, SortMergeJoinOperator.java:62)
  - Semi/anti joins (StreamingSemiAntiJoinOperator.java)
  - Hash/Sort aggregate (BytesHashMap.java:60)
  - Rank/TopN (RankOperator.java:33)
  - Deduplicate (RowTimeDeduplicateFunction.java:31)
  - Sort/Limit (SortOperator.java:42, LimitOperator.java:29)
  - Set ops (StreamExecUnion.scala:39 + rewrite rules)
  - Correlate/UNNEST (StreamExecCorrelate.scala:36)

Scale notes (100 TB): dimension tables (region/nation, and customer where it is
the small side) are explicitly ``broadcast()``-hinted so the big fact tables
never shuffle for those joins; fact-fact joins (orders⋈lineitem) shuffle on the
join key once and AQE handles skew. Aggregations are partial-agg (map-side
combine) automatically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from flink_1_12_2_spark.registry import load, query

# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (Calc → HashAggregate → Sort)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS DOUBLE)                          AS sum_qty,
           CAST(SUM(l_extendedprice) AS DOUBLE)                     AS sum_base_price,
           CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE)  AS sum_disc_price,
           CAST(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DOUBLE) AS sum_charge,
           AVG(l_quantity)                                          AS avg_qty,
           AVG(l_extendedprice)                                     AS avg_price,
           AVG(l_discount)                                          AS avg_disc,
           COUNT(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("batch", "agg", "calc"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → groupBy agg → orderBy; the minimum end-to-end slice."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_star_broadcast",
    oracle="""
    SELECT r.r_name AS region_name,
           CAST(COUNT(*) AS BIGINT) AS num_orders,
           CAST(SUM(o.o_totalprice) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    tags=("batch", "join", "broadcast"),
)
def join_star_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact ⋈ broadcast dims (Flink BatchExecHashJoin broadcast mode)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("num_orders"),
            F.sum("o_totalprice").alias("revenue"),
        )
        .orderBy("region_name")
    )


@query(
    "join_fact_fact_smj",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS order_count,
           CAST(SUM(l.l_extendedprice * (1 - l.l_discount)) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("batch", "join", "shuffle"),
)
def join_fact_fact_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi join: shuffles on the key once (SortMergeJoinOperator.java:62)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS num_customers,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS customers_without_orders
    FROM customer c
    LEFT JOIN (SELECT DISTINCT o_custkey, 1 AS o_orderkey FROM orders) o
           ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("batch", "join", "outer"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with NULL-side aggregation."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .withColumn("o_orderkey", F.lit(1))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("num_customers"),
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
                "customers_without_orders"
            ),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT
      CAST(COUNT(*) AS BIGINT) AS total_rows,
      CAST(SUM(CASE WHEN cs.nk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS supplier_only,
      CAST(SUM(CASE WHEN ss.nk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS customer_only
    FROM      (SELECT DISTINCT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000) cs
    FULL JOIN (SELECT DISTINCT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9000) ss
           ON cs.nk = ss.nk
    """,
    tags=("batch", "join", "outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (SortMergeFullOuterJoinIterator parity)."""
    cs = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("cnk"))
        .distinct()
    )
    ss = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("snk"))
        .distinct()
    )
    j = cs.join(ss, cs.cnk == ss.snk, "full_outer")
    return j.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.when(F.col("cnk").isNull(), 1).otherwise(0)).alias("supplier_only"),
        F.sum(F.when(F.col("snk").isNull(), 1).otherwise(0)).alias("customer_only"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS customers_with_orders
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("batch", "join", "semi"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (Flink SEMI_JOIN_RULES / StreamingSemiAntiJoinOperator)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers_with_orders"))
        .orderBy("c_mktsegment")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS customers_without_orders
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("batch", "join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS rewrite)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers_without_orders"))
        .orderBy("c_mktsegment")
    )


@query(
    "join_theta_nl",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS richer_pairs
    FROM supplier s1 JOIN supplier s2
         ON s1.s_nationkey = s2.s_nationkey AND s1.s_acctbal > s2.s_acctbal
    JOIN nation n ON s1.s_nationkey = n.n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("batch", "join", "theta"),
)
def join_theta_nl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi residual) join — BatchExecNestedLoopJoin parity; here the
    equi part shuffles and the inequality is a residual predicate."""
    s1 = load(spark, sf_dir, "supplier").alias("s1")
    s2 = load(spark, sf_dir, "supplier").alias("s2")
    n = load(spark, sf_dir, "nation")
    return (
        s1.join(
            s2,
            (F.col("s1.s_nationkey") == F.col("s2.s_nationkey"))
            & (F.col("s1.s_acctbal") > F.col("s2.s_acctbal")),
        )
        .join(F.broadcast(n), F.col("s1.s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("richer_pairs"))
        .orderBy("n_name")
    )


@query(
    "join_cross",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS pairs,
           CAST(SUM(CASE WHEN n_regionkey = r_regionkey THEN 1 ELSE 0 END) AS BIGINT)
             AS matching
    FROM nation CROSS JOIN region
    """,
    tags=("batch", "join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (DataSet.cross / CrossDriver parity)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.crossJoin(r).agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum(F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1).otherwise(0)).alias(
            "matching"
        ),
    )


@query(
    "scalar_subquery",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS above_avg_customers
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("batch", "join", "subquery"),
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery → single-row broadcast join (BatchExecSingleRowJoinRule)."""
    c = load(spark, sf_dir, "customer")
    avg_bal = c.agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("above_avg_customers"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Aggregation variants
# ---------------------------------------------------------------------------


@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers,
           CAST(COUNT(*) AS BIGINT) AS num_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("batch", "agg", "distinct"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate (Flink SplitAggregateRule skew path → Catalyst Expand)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("unique_customers"),
            F.count(F.lit(1)).alias("num_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           CAST(COUNT(*) AS BIGINT) AS num_customers,
           CAST(SUM(c_acctbal) AS DOUBLE) AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region_name, nation_name
    """,
    tags=("batch", "agg", "groupingsets"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP → Expand (Flink DecomposeGroupingSetsRule.scala:205 parity)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("num_customers"),
            F.sum("c_acctbal").alias("total_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "num_customers",
            "total_bal",
        )
        .orderBy("region_name", "nation_name")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(l_quantity) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY rf, ls
    """,
    tags=("batch", "agg", "groupingsets"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over lineitem flags."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "cnt",
            "qty",
        )
        .orderBy("rf", "ls")
    )


@query(
    "agg_stddev_var",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(18,0))) AS s1,
             SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(18,0))
                 * CAST(ROUND(l_extendedprice * 100) AS DECIMAL(18,0))) AS s2
      FROM lineitem GROUP BY l_returnflag),
    c AS (
      SELECT l_returnflag, n,
             GREATEST(CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                        / CAST(n AS DOUBLE), 0.0) AS css
      FROM m)
    SELECT l_returnflag,
           CASE WHEN n <= 1 THEN NULL
                ELSE SQRT(css / CAST(n - 1 AS DOUBLE)) / 100.0 END AS sd_samp,
           SQRT(css / CAST(n AS DOUBLE)) / 100.0                   AS sd_pop,
           CASE WHEN n <= 1 THEN NULL
                ELSE css / CAST(n - 1 AS DOUBLE) / 10000.0 END     AS var_samp,
           css / CAST(n AS DOUBLE) / 10000.0                       AS var_pop
    FROM c ORDER BY l_returnflag
    """,
    tags=("batch", "agg"),
)
def agg_stddev_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STDDEV/VARIANCE family (Flink aggfunctions/ Stddev*,Var* parity).

    Computed from exact decimal moments (count, Σcents, Σcents²) so the
    result is bit-deterministic across engines and partition orders: a
    native double ``var_samp`` over ~1e9-magnitude values carries last-ulp
    noise that flips any fixed-point rounding (the r1 red row). The native
    ``F.stddev_samp``/``F.var_samp`` implementations are separately checked
    against this closed form in tests/test_functions.py. Flink parity:
    flink-table-planner-blink aggfunctions/DeclarativeAggregateFunction
    stddev/variance family rewrites to exactly these Σx/Σx² moments.

    Edge guards (on BOTH engine and oracle sides, so the pattern is safe to
    reuse on sparser group keys): css is clamped to ≥ 0 — a constant-valued
    group can make the subtraction a tiny negative, where Spark sqrt gives
    NaN but DuckDB raises — and the n-1 sample forms emit NULL for n ≤ 1,
    where Spark 0/0 yields NaN but DuckDB yields NULL.

    Determinism note: ``ROUND(x*100)`` assumes prices are not adversarially
    at a .5-cent tie (Spark rounds the decimal string HALF_UP; DuckDB rounds
    the binary double half-away-from-zero). l_extendedprice values land
    ~1e-9 from exact cents so ties cannot occur; data where they could
    should cast to decimal(15,2) at the scan instead.
    """
    li = load(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("decimal(18,0)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s1"),
        F.sum(cents * cents).alias("s2"),
    )
    nd = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    # centered sum of squares in cents², clamped (see docstring edge guards)
    css = F.greatest(s2d - s1d * s1d / nd, F.lit(0.0))
    n1 = F.when(F.col("n") > 1, nd - F.lit(1.0))  # NULL divisor when n <= 1
    return m.select(
        "l_returnflag",
        (F.sqrt(css / n1) / 100.0).alias("sd_samp"),
        (F.sqrt(css / nd) / 100.0).alias("sd_pop"),
        (css / n1 / 10000.0).alias("var_samp"),
        (css / nd / 10000.0).alias("var_pop"),
    ).orderBy("l_returnflag")


@query(
    "agg_listagg",
    oracle="""
    SELECT r_name,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
    tags=("batch", "agg", "listagg"),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG (Flink ListAggFunction) → sorted collect_list + concat_ws."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations")
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# Rank / TopN / Dedup / Sort / Limit
# ---------------------------------------------------------------------------


@query(
    "topn_per_group",
    oracle="""
    SELECT n_name, s_name, s_acctbal, rnk FROM (
      SELECT n.n_name, s.s_name, s.s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n.n_name
                                ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rnk
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey)
    WHERE rnk <= 3 ORDER BY n_name, rnk
    """,
    tags=("batch", "rank", "topn"),
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group (Flink RankOperator.java:33 / AppendOnlyTopNFunction)."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("n_name", "s_name", "s_acctbal", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .orderBy("n_name", "rnk")
    )


@query(
    "dedup_keep_first",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT user_id, event_id, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn
      FROM ev)
    WHERE rn = 1 ORDER BY user_id
    """,
    tags=("batch", "dedup"),
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup per key by event time (RowTimeDeduplicateFunction keep-first)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    )


@query(
    "dedup_keep_last",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT user_id, event_id, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev)
    WHERE rn = 1 ORDER BY user_id
    """,
    tags=("batch", "dedup"),
)
def dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-last dedup per key (ProcTimeDeduplicateKeepLastRowFunction parity)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    )


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    tags=("batch", "sort", "limit"),
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (local top-k + global merge,
    same two-phase shape as Flink BatchExecSortLimit)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "setop_union_distinct",
    oracle="""
    SELECT nk, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION
      SELECT s_nationkey AS nk FROM supplier) GROUP BY nk ORDER BY nk
    """,
    tags=("batch", "setop"),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + dedup (Flink rewrites UNION to union+agg)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return (
        c.union(s)
        .distinct()
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("nk")
    )


@query(
    "setop_intersect",
    oracle="""
    SELECT nk FROM (
      SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9500
      INTERSECT
      SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9500) ORDER BY nk
    """,
    tags=("batch", "setop"),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT → semi-join rewrite (ReplaceIntersectWithSemiJoinRule parity)."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(F.col("c_nationkey").alias("nk"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500)
        .select(F.col("s_nationkey").alias("nk"))
    )
    return c.intersect(s).orderBy("nk")


@query(
    "setop_except_all",
    oracle="""
    SELECT nk, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
      EXCEPT ALL
      SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9000)
    GROUP BY nk ORDER BY nk
    """,
    tags=("batch", "setop"),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (RewriteMinusAllRule parity) — bag semantics."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nk"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nk"))
    )
    return (
        c.exceptAll(s).groupBy("nk").agg(F.count(F.lit(1)).alias("cnt")).orderBy("nk")
    )


@query(
    "setop_intersect_all",
    oracle="""
    SELECT nk, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
      INTERSECT ALL
      SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 9000)
    GROUP BY nk ORDER BY nk
    """,
    tags=("batch", "setop"),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (RewriteIntersectAllRule parity)."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nk"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nk"))
    )
    return (
        c.intersectAll(s).groupBy("nk").agg(F.count(F.lit(1)).alias("cnt")).orderBy("nk")
    )


# ---------------------------------------------------------------------------
# Correlate / UNNEST
# ---------------------------------------------------------------------------


@query(
    "unnest_tokens",
    oracle="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token ORDER BY cnt DESC, token LIMIT 20
    """,
    tags=("batch", "unnest", "correlate"),
)
def unnest_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST / lateral explode (StreamExecCorrelate + SqlUnnestUtils parity)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
    )


_TOKS_SQL = r"list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"


@query(
    "lateral_table_udtf",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    ex AS (SELECT doc_id,
                  unnest(list_transform(toks,
                    (x, i) -> {{'w': x, 'p': i - 1}})) AS u
           FROM tk)
    SELECT doc_id, u.w AS word, CAST(u.p AS INT) AS pos
    FROM ex WHERE u.p < 2
    ORDER BY doc_id, pos
    """,
    tags=("batch", "correlate", "udtf", "lateral-table"),
)
def lateral_table_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's ``LATERAL TABLE(udtf(...)) AS T(cols)`` SQL front door
    (docs/dev/table/sql/queries.md UDTF join; StreamExecCorrelate) —
    rewritten to Spark's ``LATERAL VIEW inline(...)`` over the engine's
    array<struct> UDTF convention. The literal Flink-dialect text runs
    through rewrite()+spark.sql against a SQL-registered Python UDTF."""
    from flink_1_12_2_spark.sql.rewriter import rewrite

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")

    def split_words(text):
        return [(w, i) for i, w in enumerate(text.split())]

    spark.udf.register(
        "split_words", split_words, "array<struct<word:string,pos:int>>"
    )
    sql = """
    SELECT doc_id, word, pos
    FROM documents, LATERAL TABLE(split_words(text)) AS T(word, pos)
    WHERE pos < 2
    ORDER BY doc_id, pos
    """
    return spark.sql(rewrite(sql))


@query(
    "lateral_table_left_outer",
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    lw AS (SELECT doc_id,
                  unnest(list_filter(toks, x -> length(x) >= 8)) AS word
           FROM tk)
    SELECT d.doc_id, lw.word
    FROM documents d LEFT JOIN lw ON d.doc_id = lw.doc_id
    ORDER BY d.doc_id, word
    """,
    tags=("batch", "correlate", "udtf", "lateral-table"),
)
def lateral_table_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's ``LEFT JOIN LATERAL TABLE(f(x)) ON TRUE`` — empty UDTF
    expansions keep the left row with NULLs (Correlate LEFT semantics,
    SqlToRelConverter) → Spark ``LATERAL VIEW OUTER``."""
    from flink_1_12_2_spark.sql.rewriter import rewrite

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")

    def long_words(text):
        return [(w,) for w in text.split() if len(w) >= 8]

    spark.udf.register("long_words", long_words, "array<struct<word:string>>")
    sql = """
    SELECT doc_id, word
    FROM documents LEFT JOIN LATERAL TABLE(long_words(text)) AS T(word) ON TRUE
    ORDER BY doc_id, word
    """
    return spark.sql(rewrite(sql))
