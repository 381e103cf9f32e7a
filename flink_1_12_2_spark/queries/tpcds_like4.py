"""TPC-DS-style composite queries, tranche 6 (adapted to the driver's star
schema — gate context in tpcds_like.py).

Shapes: q9 (CASE selecting among per-band scalar aggregates), q28
(multi-band multi-DISTINCT battery), q44 (best/worst rank juxtaposition),
q43 (day-of-week pivot), q65 (per-group threshold from a second-level
aggregate), q75 (YoY decline report from a channel union), q30 (entity
share vs 1.2× its group average), q13 (multi-measure average under an
OR band battery), q22 (multi-level ROLLUP averages), q15 (HAVING against
a scalar computed over the aggregated series itself).

Determinism: averages round before any comparison or rank; rank orderings
tiebreak on the group key; day-of-week uses ISO numbering on both engines
(Spark ``weekday()+1`` == DuckDB ``ISODOW``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from flink_1_12_2_spark.registry import load, query


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "ds_q9_case_over_bands",
    oracle="""
    WITH b AS (
      SELECT
        COUNT(CASE WHEN l_quantity BETWEEN 1 AND 20 THEN 1 END) AS c1,
        ROUND(AVG(CASE WHEN l_quantity BETWEEN 1 AND 20
                       THEN l_extendedprice END), 2) AS p1,
        ROUND(AVG(CASE WHEN l_quantity BETWEEN 1 AND 20
                       THEN l_discount END), 4) AS d1,
        COUNT(CASE WHEN l_quantity BETWEEN 21 AND 35 THEN 1 END) AS c2,
        ROUND(AVG(CASE WHEN l_quantity BETWEEN 21 AND 35
                       THEN l_extendedprice END), 2) AS p2,
        ROUND(AVG(CASE WHEN l_quantity BETWEEN 21 AND 35
                       THEN l_discount END), 4) AS d2,
        COUNT(CASE WHEN l_quantity BETWEEN 36 AND 50 THEN 1 END) AS c3,
        ROUND(AVG(CASE WHEN l_quantity BETWEEN 36 AND 50
                       THEN l_extendedprice END), 2) AS p3,
        ROUND(AVG(CASE WHEN l_quantity BETWEEN 36 AND 50
                       THEN l_discount END), 4) AS d3
      FROM lineitem)
    SELECT CAST(CASE WHEN c1 > 10000 THEN p1 ELSE d1 END AS DOUBLE) AS bucket1,
           CAST(CASE WHEN c2 > 10000 THEN p2 ELSE d2 END AS DOUBLE) AS bucket2,
           CAST(CASE WHEN c3 > 10000 THEN p3 ELSE d3 END AS DOUBLE) AS bucket3
    FROM b
    """,
    tags=("batch", "tpcds", "case-battery", "scalar"),
)
def ds_q9_case_over_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q9 shape: a CASE expression SELECTING AMONG scalar
    aggregates — per quantity band, report the average price if the band
    is populous, else the average discount. The reference runs 15 scalar
    subqueries; Spark-first all 9 aggregates fold into ONE pass and the
    CASE picks projections afterward."""
    li = load(spark, sf_dir, "lineitem")

    def band(lo, hi, i):
        inb = F.col("l_quantity").between(lo, hi)
        return [
            F.count(F.when(inb, 1)).alias(f"c{i}"),
            F.round(F.avg(F.when(inb, F.col("l_extendedprice"))), 2).alias(f"p{i}"),
            F.round(F.avg(F.when(inb, F.col("l_discount"))), 4).alias(f"d{i}"),
        ]

    b = li.agg(*(band(1, 20, 1) + band(21, 35, 2) + band(36, 50, 3)))
    pick = lambda i: F.when(  # noqa: E731
        F.col(f"c{i}") > 10000, F.col(f"p{i}")
    ).otherwise(F.col(f"d{i}")).alias(f"bucket{i}")
    return b.select(pick(1), pick(2), pick(3))


@query(
    "ds_q28_distinct_band_battery",
    oracle="""
    SELECT
      CAST(ROUND(AVG(CASE WHEN l_quantity BETWEEN 1 AND 10
                          THEN l_extendedprice END), 2) AS DOUBLE) AS avg1,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 1 AND 10
                          THEN l_extendedprice END) AS BIGINT) AS cd1,
      CAST(ROUND(AVG(CASE WHEN l_quantity BETWEEN 11 AND 25
                          THEN l_extendedprice END), 2) AS DOUBLE) AS avg2,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 11 AND 25
                          THEN l_extendedprice END) AS BIGINT) AS cd2,
      CAST(ROUND(AVG(CASE WHEN l_quantity BETWEEN 26 AND 50
                          THEN l_extendedprice END), 2) AS DOUBLE) AS avg3,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 26 AND 50
                          THEN l_extendedprice END) AS BIGINT) AS cd3
    FROM lineitem
    """,
    tags=("batch", "tpcds", "distinct-agg", "battery"),
)
def ds_q28_distinct_band_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q28 shape: a battery of per-band (AVG, COUNT DISTINCT)
    pairs — the reference cross-joins six single-row subqueries; here one
    aggregation with THREE separate COUNT(DISTINCT CASE ...) columns
    (Catalyst's distinct-agg Expand handles the multi-distinct split)."""
    li = load(spark, sf_dir, "lineitem")

    def band(lo, hi, i):
        inb = F.col("l_quantity").between(lo, hi)
        v = F.when(inb, F.col("l_extendedprice"))
        return [
            F.round(F.avg(v), 2).alias(f"avg{i}"),
            F.count_distinct(v).alias(f"cd{i}"),
        ]

    return li.agg(*(band(1, 10, 1) + band(11, 25, 2) + band(26, 50, 3)))


@query(
    "ds_q44_best_worst_rank",
    oracle="""
    WITH g AS (
      SELECT l_partkey, ROUND(AVG(l_quantity), 2) AS aq
      FROM lineitem GROUP BY 1),
    best AS (
      SELECT l_partkey, ROW_NUMBER() OVER (ORDER BY aq DESC, l_partkey) AS rnk
      FROM g),
    worst AS (
      SELECT l_partkey, ROW_NUMBER() OVER (ORDER BY aq ASC, l_partkey) AS rnk
      FROM g)
    SELECT CAST(b.rnk AS BIGINT) AS rnk,
           pb.p_name AS best_name, pw.p_name AS worst_name
    FROM best b JOIN worst w ON b.rnk = w.rnk
    JOIN part pb ON b.l_partkey = pb.p_partkey
    JOIN part pw ON w.l_partkey = pw.p_partkey
    WHERE b.rnk <= 10 ORDER BY rnk
    """,
    tags=("batch", "tpcds", "rank", "juxtapose"),
)
def ds_q44_best_worst_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q44 shape: BEST and WORST performers juxtaposed — ascending
    and descending ranks over the same aggregated series joined on rank
    position, then item names resolved. The ranked series is the per-part
    aggregate (small), so the unpartitioned rank windows run over
    thousands of rows, not the fact. Metric rounds to 2dp and tiebreaks
    on partkey → ranks deterministic."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    g = li.groupBy("l_partkey").agg(F.round(F.avg("l_quantity"), 2).alias("aq"))
    best = g.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("aq"), F.col("l_partkey"))),
    ).filter(F.col("rnk") <= 10)
    worst = g.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.asc("aq"), F.col("l_partkey"))),
    ).filter(F.col("rnk") <= 10)
    pb = p.select(F.col("p_partkey").alias("bk"), F.col("p_name").alias("best_name"))
    pw = p.select(F.col("p_partkey").alias("wk"), F.col("p_name").alias("worst_name"))
    return (
        best.select("rnk", F.col("l_partkey").alias("bpk"))
        .join(worst.select("rnk", F.col("l_partkey").alias("wpk")), "rnk")
        .join(F.broadcast(pb), F.col("bpk") == F.col("bk"))
        .join(F.broadcast(pw), F.col("wpk") == F.col("wk"))
        .select(F.col("rnk").cast("bigint").alias("rnk"), "best_name", "worst_name")
        .orderBy("rnk")
    )


@query(
    "ds_q43_dow_pivot",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM(CASE WHEN ISODOW(o.o_orderdate) = 1
                 THEN o.o_totalprice END), 2) AS DOUBLE) AS mon,
           CAST(ROUND(SUM(CASE WHEN ISODOW(o.o_orderdate) = 3
                 THEN o.o_totalprice END), 2) AS DOUBLE) AS wed,
           CAST(ROUND(SUM(CASE WHEN ISODOW(o.o_orderdate) = 5
                 THEN o.o_totalprice END), 2) AS DOUBLE) AS fri,
           CAST(ROUND(SUM(CASE WHEN ISODOW(o.o_orderdate) IN (6, 7)
                 THEN o.o_totalprice END), 2) AS DOUBLE) AS weekend
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE YEAR(o.o_orderdate) = 1996
    GROUP BY 1 ORDER BY nation
    """,
    tags=("batch", "tpcds", "pivot", "dow"),
)
def ds_q43_dow_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q43 shape: day-of-week sales pivot per geography — one
    conditional-aggregation pass, no per-day scans. ISO day numbering on
    both engines (Spark ``weekday()+1`` == DuckDB ``ISODOW``: Monday=1)."""
    o = load(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    dow = F.weekday("o_orderdate") + 1

    def day(cond, alias):
        return F.round(F.sum(F.when(cond, F.col("o_totalprice"))), 2).alias(alias)

    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            day(dow == 1, "mon"),
            day(dow == 3, "wed"),
            day(dow == 5, "fri"),
            day(dow.isin(6, 7), "weekend"),
        )
        .orderBy("nation")
    )


@query(
    "ds_q65_below_group_threshold",
    oracle="""
    WITH pr AS (
      SELECT n.n_name AS nation, l.l_partkey AS partkey,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                 * CAST(100 - ROUND(l.l_discount * 100) AS BIGINT)) AS units
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2),
    avgs AS (SELECT nation, SUM(units) AS tot, COUNT(*) AS n FROM pr GROUP BY 1)
    SELECT pr.nation AS nation, pr.partkey AS partkey,
           CAST(pr.units / 10000.0 AS DOUBLE) AS rev,
           CAST(a.tot / a.n / 10000.0 AS DOUBLE) AS avg_rev
    FROM pr JOIN avgs a ON pr.nation = a.nation
    WHERE 2 * a.n * pr.units < a.tot
    ORDER BY nation, partkey
    """,
    tags=("batch", "tpcds", "two-level-agg"),
)
def ds_q65_below_group_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q65 shape: items underperforming THEIR GROUP — the filter
    threshold comes from a SECOND-level aggregate (avg of the per-item
    aggregates within the nation), joined back to the first level.

    Float discipline: revenue is summed in INTEGER basis-point units
    (price-cents × (100 − discount-points)) — integer addition is
    order-independent, so both engines produce identical sums, and the
    below-half-average predicate cross-multiplies to pure integers
    (`2·n·units < Σunits`). No float enters any comparison."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    units = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100)).cast("bigint")
    )
    pr = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("l_partkey").alias("partkey"))
        .agg(F.sum(units).alias("units"))
    )
    avgs = pr.groupBy("nation").agg(
        F.sum("units").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    return (
        pr.join(F.broadcast(avgs), "nation")
        .filter(2 * F.col("n") * F.col("units") < F.col("tot"))
        .select(
            "nation",
            "partkey",
            (F.col("units") / 10000.0).alias("rev"),
            (F.col("tot") / F.col("n") / 10000.0).alias("avg_rev"),
        )
        .orderBy("nation", "partkey")
    )


@query(
    "ds_q75_yoy_decline",
    oracle="""
    WITH yt AS (
      SELECT p.p_brand AS brand, YEAR(o.o_orderdate) AS yr,
             SUM(l.l_quantity) AS qty,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p   ON l.l_partkey = p.p_partkey
      WHERE YEAR(o.o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2)
    SELECT a.brand AS brand,
           CAST(a.qty AS DOUBLE) AS qty96, CAST(b.qty AS DOUBLE) AS qty97,
           CAST(a.rev AS DOUBLE) AS rev96, CAST(b.rev AS DOUBLE) AS rev97
    FROM yt a JOIN yt b ON a.brand = b.brand
    WHERE a.yr = 1996 AND b.yr = 1997 AND b.qty < a.qty
    ORDER BY brand
    """,
    tags=("batch", "tpcds", "yoy", "decline"),
)
def ds_q75_yoy_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q75 shape: year-over-year DECLINE report — current vs prior
    year quantities joined at item grain, keeping shrinking items.
    Quantity sums are integral → the decline predicate is exact. One-pass
    conditional aggregation replaces the reference's UNION + self-join."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part")
    yr = F.year("o_orderdate")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(yr.isin(1996, 1997))
    )
    g = base.groupBy(F.col("p_brand").alias("brand")).agg(
        F.sum(F.when(yr == 1996, F.col("l_quantity"))).alias("qty96"),
        F.sum(F.when(yr == 1997, F.col("l_quantity"))).alias("qty97"),
        F.round(F.sum(F.when(yr == 1996, _rev())), 2).alias("rev96"),
        F.round(F.sum(F.when(yr == 1997, _rev())), 2).alias("rev97"),
    )
    return (
        g.filter(
            F.col("qty96").isNotNull()
            & F.col("qty97").isNotNull()
            & (F.col("qty97") < F.col("qty96"))
        )
        .select("brand", "qty96", "qty97", "rev96", "rev97")
        .orderBy("brand")
    )


@query(
    "ds_q30_above_group_average",
    oracle="""
    WITH cr AS (
      SELECT n.n_name AS nation, c.c_custkey AS custkey,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                 * CAST(100 - ROUND(l.l_discount * 100) AS BIGINT)) AS units
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
      GROUP BY 1, 2),
    na AS (SELECT nation, SUM(units) AS tot, COUNT(*) AS n FROM cr GROUP BY 1)
    SELECT cr.nation AS nation, cr.custkey AS custkey,
           CAST(cr.units / 10000.0 AS DOUBLE) AS ret_rev
    FROM cr JOIN na ON cr.nation = na.nation
    WHERE 5 * na.n * cr.units > 6 * na.tot
    ORDER BY nation, custkey
    """,
    tags=("batch", "tpcds", "returns", "group-average"),
)
def ds_q30_above_group_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q30/q81 shape: customers whose RETURN volume exceeds 1.2×
    their geography's average — per-customer returns aggregate, per-nation
    second-level average, threshold join-back. Revenue is summed in
    INTEGER basis-point units and the 1.2× threshold cross-multiplies to
    `5·n·units > 6·Σunits` — fully integer-exact, no float comparison."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    units = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100)).cast("bigint")
    )
    cr = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("c_custkey").alias("custkey"))
        .agg(F.sum(units).alias("units"))
    )
    na = cr.groupBy("nation").agg(
        F.sum("units").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    return (
        cr.join(F.broadcast(na), "nation")
        .filter(5 * F.col("n") * F.col("units") > 6 * F.col("tot"))
        .select("nation", "custkey", (F.col("units") / 10000.0).alias("ret_rev"))
        .orderBy("nation", "custkey")
    )


@query(
    "ds_q13_multi_measure_bands",
    oracle="""
    SELECT CAST(ROUND(AVG(l.l_quantity), 4) AS DOUBLE) AS avg_qty,
           CAST(ROUND(AVG(l.l_extendedprice), 2) AS DOUBLE) AS avg_price,
           CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                AS DOUBLE) AS net_rev
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE (c.c_mktsegment = 'BUILDING'
             AND o.o_orderpriority IN ('1-URGENT', '2-HIGH')
             AND l.l_quantity BETWEEN 1 AND 25)
       OR (c.c_mktsegment = 'FURNITURE'
             AND o.o_orderpriority IN ('3-MEDIUM',)
             AND l.l_quantity BETWEEN 26 AND 50)
       OR (c.c_mktsegment = 'AUTOMOBILE'
             AND o.o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW')
             AND l.l_quantity BETWEEN 10 AND 40)
    """,
    tags=("batch", "tpcds", "filter-battery", "multi-measure"),
)
def ds_q13_multi_measure_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q13 shape: THREE averages/sums computed under an OR battery
    of (segment, priority, quantity-band) conjunctions — one filtered
    aggregation pass, every measure rounded."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    arm = lambda seg, prios, q1, q2: (  # noqa: E731
        (F.col("c_mktsegment") == seg)
        & F.col("o_orderpriority").isin(*prios)
        & F.col("l_quantity").between(q1, q2)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(
            arm("BUILDING", ["1-URGENT", "2-HIGH"], 1, 25)
            | arm("FURNITURE", ["3-MEDIUM"], 26, 50)
            | arm("AUTOMOBILE", ["4-NOT SPECIFIED", "5-LOW"], 10, 40)
        )
        .agg(
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.sum(_rev()), 2).alias("net_rev"),
        )
    )


@query(
    "ds_q22_rollup_avg",
    oracle="""
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(ROUND(AVG(p_retailprice), 4) AS DOUBLE) AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM part
    GROUP BY ROLLUP (p_brand, p_type, p_size)
    ORDER BY p_brand NULLS FIRST, p_type NULLS FIRST, p_size NULLS FIRST
    """,
    tags=("batch", "tpcds", "rollup"),
)
def ds_q22_rollup_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q22 shape: multi-level ROLLUP of AVERAGES over the item
    dimension (brand → type → size hierarchy + grand total) — Catalyst
    Expand feeds partial aggregation, one exchange."""
    p = load(spark, sf_dir, "part")
    return (
        p.rollup("p_brand", "p_type", "p_size")
        .agg(
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .withColumn("p_size", F.col("p_size").cast("bigint"))
        .select("p_brand", "p_type", "p_size", "avg_price", "n_parts")
        .orderBy(
            F.col("p_brand").asc_nulls_first(),
            F.col("p_type").asc_nulls_first(),
            F.col("p_size").asc_nulls_first(),
        )
    )


@query(
    "ds_q15_having_vs_series_avg",
    oracle="""
    WITH cr AS (
      SELECT o_custkey AS custkey,
             ROUND(SUM(o_totalprice), 2) AS rev
      FROM orders WHERE YEAR(o_orderdate) = 1996 GROUP BY 1),
    t AS (SELECT ROUND(AVG(rev), 2) AS thresh FROM cr)
    SELECT cr.custkey AS custkey, CAST(cr.rev AS DOUBLE) AS rev
    FROM cr CROSS JOIN t
    WHERE cr.rev > 2 * t.thresh
    ORDER BY custkey
    """,
    tags=("batch", "tpcds", "scalar-having"),
)
def ds_q15_having_vs_series_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q15/q23-b shape: HAVING against a scalar computed over the
    AGGREGATED SERIES ITSELF (customers above 2× the average customer) —
    the threshold subquery reads the same aggregate, so the plan reuses
    one aggregation and broadcasts the singleton."""
    o = load(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    cr = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    # both consumers read the identical aggregate subtree — Spark's
    # ReusedExchange dedups it, no persist (a persist here would pin
    # cache in the shared session with no unpersist point)
    t = cr.agg(F.round(F.avg("rev"), 2).alias("thresh"))
    return (
        cr.crossJoin(F.broadcast(t))
        .filter(F.col("rev") > 2 * F.col("thresh"))
        .select("custkey", "rev")
        .orderBy("custkey")
    )


@query(
    "ds_q19_compound_dim_predicate",
    oracle="""
    SELECT p.p_brand AS brand, n.n_name AS nation,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * CAST(100 - ROUND(l.l_discount * 100) AS BIGINT))
                / 10000.0 AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE ((p.p_type = 'PROMO'    AND p.p_size BETWEEN 1 AND 10
              AND l.l_quantity BETWEEN 1 AND 15)
        OR (p.p_type = 'STANDARD' AND p.p_size BETWEEN 11 AND 30
              AND l.l_quantity BETWEEN 16 AND 35)
        OR (p.p_type = 'ECONOMY'  AND p.p_size BETWEEN 31 AND 50
              AND l.l_quantity BETWEEN 36 AND 50))
      AND c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY 1, 2 ORDER BY brand, nation
    """,
    tags=("batch", "tpcds", "compound-predicate"),
)
def ds_q19_compound_dim_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q19 shape: a COMPOUND predicate COUPLING dimension and fact
    attributes (each arm constrains part type+size AND line quantity
    together) — the filter cannot fully push to either scan, so it
    evaluates post-join while the per-table conjuncts (segment list) still
    prune scan-side. Revenue in integer basis-point units."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    n = load(spark, sf_dir, "nation")
    units = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100)).cast("bigint")
    )
    arm = lambda t, s1, s2, q1, q2: (  # noqa: E731
        (F.col("p_type") == t)
        & F.col("p_size").between(s1, s2)
        & F.col("l_quantity").between(q1, q2)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .filter(
            arm("PROMO", 1, 10, 1, 15)
            | arm("STANDARD", 11, 30, 16, 35)
            | arm("ECONOMY", 31, 50, 36, 50)
        )
        .groupBy(F.col("p_brand").alias("brand"), F.col("n_name").alias("nation"))
        .agg((F.sum(units) / 10000.0).alias("revenue"))
        .orderBy("brand", "nation")
    )


@query(
    "ds_q46_cross_dim_inequality",
    oracle="""
    SELECT o.o_orderkey AS orderkey, c.c_name AS c_name,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS qty,
           CAST(COUNT(DISTINCT s.s_nationkey) AS BIGINT) AS n_foreign_nations
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey <> c.c_nationkey
      AND YEAR(o.o_orderdate) = 1996
    GROUP BY 1, 2
    HAVING SUM(l.l_quantity) BETWEEN 180 AND 220
    ORDER BY orderkey
    """,
    tags=("batch", "tpcds", "inequality-predicate", "order-grain"),
)
def ds_q46_cross_dim_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q46/q68 "different city" shape: order-grain trips where the
    SUPPLIER geography differs from the CUSTOMER's (the bought-outside-
    home-city predicate) — an INEQUALITY between two dimension attributes
    that only exists post-join, plus a COUNT DISTINCT of the foreign
    geographies and a HAVING band on integral quantity."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(F.col("o_orderkey").alias("orderkey"), F.col("c_name"))
        .agg(
            F.sum("l_quantity").alias("qty"),
            F.count_distinct(F.col("s_nationkey")).alias("n_foreign_nations"),
        )
        .filter(F.col("qty").between(180, 220))
        .orderBy("orderkey")
    )


@query(
    "ds_q69_semi_anti_cross_fact",
    oracle="""
    SELECT c.c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND YEAR(o.o_orderdate) = 1996)
      AND NOT EXISTS (
        SELECT 1 FROM orders o2
        JOIN lineitem l ON l.l_orderkey = o2.o_orderkey
        WHERE o2.o_custkey = c.c_custkey AND l.l_returnflag = 'R'
          AND l.l_quantity >= 48 AND YEAR(o2.o_orderdate) = 1996)
    GROUP BY 1 ORDER BY segment
    """,
    tags=("batch", "tpcds", "semi-anti", "cross-fact"),
)
def ds_q69_semi_anti_cross_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q69/q35 shape: EXISTS against one fact AND NOT EXISTS
    against a DIFFERENT fact path (active buyers who never returned
    big items in the period) — a LEFT SEMI then LEFT ANTI chain on the
    customer dimension; the anti side pre-reduces to distinct qualifying
    customers before the join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    active = (
        o.filter(F.year("o_orderdate") == 1996)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    returners = (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 48))
        .join(
            o.filter(F.year("o_orderdate") == 1996),
            li.l_orderkey == o.o_orderkey,
        )
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return (
        c.join(active, "c_custkey", "left_semi")
        .join(returners, "c_custkey", "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("segment")
    )


@query(
    "ds_q76_null_channel_union",
    oracle="""
    SELECT channel, yr,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(partkey) AS BIGINT) AS n_with_part,
           CAST(SUM(qty) AS DOUBLE) AS total_qty
    FROM (
      SELECT 'store' AS channel, YEAR(o.o_orderdate) AS yr,
             l.l_partkey AS partkey, l.l_quantity AS qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'N'
      UNION ALL
      SELECT 'web' AS channel, YEAR(o.o_orderdate) AS yr,
             CAST(NULL AS BIGINT) AS partkey, l.l_quantity AS qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'A'
      UNION ALL
      SELECT 'catalog' AS channel, YEAR(o.o_orderdate) AS yr,
             l.l_partkey AS partkey, l.l_quantity AS qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R')
    GROUP BY 1, 2 ORDER BY channel, yr
    """,
    tags=("batch", "tpcds", "union", "null-accounting"),
)
def ds_q76_null_channel_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q76 shape: a UNION ALL of channels where one channel
    contributes a NULL for a dimension key it lacks, and the aggregate
    counts rows WITH vs WITHOUT the key (COUNT(col) vs COUNT(*) null
    accounting) per (channel, year)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    base = li.join(o, li.l_orderkey == o.o_orderkey)

    def chan(flag, label, null_part):
        part = (
            F.lit(None).cast("bigint") if null_part else F.col("l_partkey")
        )
        return base.filter(F.col("l_returnflag") == flag).select(
            F.lit(label).alias("channel"),
            F.year("o_orderdate").alias("yr"),
            part.alias("partkey"),
            F.col("l_quantity").alias("qty"),
        )

    u = (
        chan("N", "store", False)
        .unionByName(chan("A", "web", True))
        .unionByName(chan("R", "catalog", False))
    )
    return (
        u.groupBy("channel", "yr")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("partkey").alias("n_with_part"),
            F.sum("qty").alias("total_qty"),
        )
        .orderBy("channel", "yr")
    )


@query(
    "ds_q2_wow_dow_share",
    oracle="""
    WITH w AS (
      SELECT WEEKOFYEAR(o_orderdate) AS wk, ISODOW(o_orderdate) AS dow,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS units
      FROM orders
      WHERE YEAR(o_orderdate) = 1996 AND WEEKOFYEAR(o_orderdate) BETWEEN 2 AND 50
      GROUP BY 1, 2)
    SELECT a.wk AS wk, CAST(a.dow AS BIGINT) AS dow,
           CAST(ROUND(CAST(b.units AS DOUBLE) / a.units, 6) AS DOUBLE)
             AS wow_ratio
    FROM w a JOIN w b ON b.wk = a.wk + 1 AND b.dow = a.dow
    WHERE a.units > 0
    ORDER BY wk, dow
    """,
    tags=("batch", "tpcds", "self-join", "wow"),
)
def ds_q2_wow_dow_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q2 shape: per-(week, day-of-week) totals SELF-JOINED on
    week+1 for the week-over-week ratio by weekday. ISO week/day numbering
    agrees across engines (Spark ``weekofyear``/``weekday()+1`` == DuckDB
    ``WEEKOFYEAR``/``ISODOW``); totals sum in integer cents and only the
    final ratio is floating (rounded to 6dp)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == 1996)
        & F.weekofyear("o_orderdate").between(2, 50)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    w = o.groupBy(
        F.weekofyear("o_orderdate").alias("wk"),
        (F.weekday("o_orderdate") + 1).alias("dow"),
    ).agg(F.sum(cents).alias("units"))
    a = w.select(
        F.col("wk").alias("wk"), F.col("dow").alias("dow"),
        F.col("units").alias("u_a"),
    )
    b = w.select(
        (F.col("wk") - 1).alias("wk"), F.col("dow").alias("dow"),
        F.col("units").alias("u_b"),
    )
    return (
        a.join(b, ["wk", "dow"])
        .filter(F.col("u_a") > 0)
        .select(
            "wk",
            F.col("dow").cast("bigint").alias("dow"),
            F.round(F.col("u_b") / F.col("u_a"), 6).alias("wow_ratio"),
        )
        .orderBy("wk", "dow")
    )
