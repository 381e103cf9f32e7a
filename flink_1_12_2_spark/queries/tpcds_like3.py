"""TPC-DS-style composite queries, tranches 4-5 (adapted to the driver's
star schema — see tpcds_like.py for the gate context:
flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/,
TpcdsTestProgram.java:48).

Archetypes here (each reproduces a remaining distinct plan shape of
the reference's 103-query gate); tranche 5 adds q32/q92 (per-item
scalar-threshold decorrelation), q37/q82 (dimension band + HAVING range),
q48 (OR band battery), q96 (pinpoint slot count), q6 (global scalar
threshold + HAVING count), q68/q79 (order-grain trip report), q85/q91
(double OR-battery over joined dims):

- q4/q11  — multi-year multi-channel CTE self-join on customer growth,
            rewritten as ONE conditional-aggregation pass (the q31-style
            collapse: 1 hash exchange instead of a 4-alias self-join).
- q64     — wide multi-join chain (fact ⋈ 6 dims + same-nation filter)
            with a two-year compare per group.
- q41     — correlated EXISTS battery over the item dimension alone.
- q21/q40 — before/after pivot-date quantity compare with ratio bounds
            (integer-exact cross-multiplied, no float boundary).
- q58/q83 — three-channel revenue compare, each channel within ±10% of
            the three-channel average (one conditional pass vs the
            reference's 3-CTE join).
- q99/q62 — shipping-delay bucket CASE battery, one pass.
- q45     — geo list OR key-IN-subquery revenue (semi-join on a union of
            qualifying sets).
- q8      — join on a DERIVED substring key against a deduped derived
            dimension (zip-prefix shape).
- q38     — INTERSECT of three channels' distinct customer sets.
- q87     — EXCEPT chain over the same three channels.

Determinism discipline (house rules from tpcds_like.py): every float that
feeds a comparison is rounded first (6dp ratios, 2dp revenues); ratio
bounds on integral quantities use cross-multiplication so the predicate is
integer-exact; outputs order by group keys only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_12_2_spark.registry import load, query


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "ds_q4_one_pass_growth",
    oracle="""
    WITH year_total AS (
      SELECT o.o_custkey AS custkey, YEAR(o.o_orderdate) AS yr,
             CASE WHEN l.l_returnflag = 'N' THEN 'st' ELSE 'wb' END AS channel,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS total
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE YEAR(o.o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2, 3)
    SELECT s1.custkey AS custkey,
           CAST(ROUND(s2.total / s1.total, 6) AS DOUBLE) AS store_growth,
           CAST(ROUND(w2.total / w1.total, 6) AS DOUBLE) AS web_growth
    FROM year_total s1
    JOIN year_total s2 ON s1.custkey = s2.custkey
    JOIN year_total w1 ON s1.custkey = w1.custkey
    JOIN year_total w2 ON s1.custkey = w2.custkey
    WHERE s1.channel = 'st' AND s1.yr = 1996
      AND s2.channel = 'st' AND s2.yr = 1997
      AND w1.channel = 'wb' AND w1.yr = 1996
      AND w2.channel = 'wb' AND w2.yr = 1997
      AND s1.total > 0 AND w1.total > 0
      AND ROUND(w2.total / w1.total, 6) > ROUND(s2.total / s1.total, 6)
    ORDER BY custkey
    """,
    tags=("batch", "tpcds", "self-join", "one-pass"),
)
def ds_q4_one_pass_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q4/q11 shape: per-customer year totals across two channels,
    self-joined 4 ways for the growth-ratio comparison. Spark-first
    rewrite: ONE conditional-aggregation pass per customer (sum(CASE) per
    (channel, year) cell — absent cells stay NULL, preserving the
    self-join's existence semantics) — 1 hash exchange where the reference
    plan re-joins year_total four times. Ratios round to 6dp before the
    comparison (float-sum order cannot flip the predicate)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    yr = F.year("o_orderdate")
    base = o.join(li, li.l_orderkey == o.o_orderkey).filter(yr.isin(1996, 1997))
    st = F.col("l_returnflag") == "N"

    def cell(chan_pred, year):
        # no otherwise → NULL when the (channel, year) cell has no rows,
        # exactly "no year_total row exists" in the self-join form
        return F.sum(F.when(chan_pred & (yr == year), _rev()))

    g = base.groupBy(F.col("o_custkey").alias("custkey")).agg(
        cell(st, 1996).alias("st1"),
        cell(st, 1997).alias("st2"),
        cell(~st, 1996).alias("wb1"),
        cell(~st, 1997).alias("wb2"),
    )
    store_growth = F.round(F.col("st2") / F.col("st1"), 6)
    web_growth = F.round(F.col("wb2") / F.col("wb1"), 6)
    return (
        g.filter(
            (F.col("st1") > 0)
            & (F.col("wb1") > 0)
            & F.col("st2").isNotNull()
            & F.col("wb2").isNotNull()
        )
        .filter(web_growth > store_growth)
        .select(
            "custkey",
            store_growth.alias("store_growth"),
            web_growth.alias("web_growth"),
        )
        .orderBy("custkey")
    )


@query(
    "ds_q64_wide_join_chain",
    oracle="""
    SELECT r.r_name AS region, p.p_brand AS brand,
           CAST(SUM(CASE WHEN YEAR(o.o_orderdate) = 1996
                 THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * CAST(100 - ROUND(l.l_discount * 100) AS BIGINT) END)
                / 10000.0 AS DOUBLE) AS rev96,
           CAST(SUM(CASE WHEN YEAR(o.o_orderdate) = 1997
                 THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      * CAST(100 - ROUND(l.l_discount * 100) AS BIGINT) END)
                / 10000.0 AS DOUBLE) AS rev97
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey = c.c_nationkey AND p.p_type = 'PROMO'
      AND YEAR(o.o_orderdate) IN (1996, 1997)
    GROUP BY 1, 2
    HAVING rev96 IS NOT NULL AND rev97 IS NOT NULL AND rev97 > rev96
    ORDER BY region, brand
    """,
    tags=("batch", "tpcds", "join", "multi-join"),
)
def ds_q64_wide_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q64 shape: a WIDE join chain — fact ⋈ orders ⋈ customer ⋈
    nation ⋈ region ⋈ part ⋈ supplier with a cross-dimension condition
    (customer and supplier share a nation), then a two-year compare per
    (region, brand). All dimensions broadcast (≤ nation-count × small
    rows); the only shuffle is the final group-by — the year compare is
    conditional aggregation, not a fact self-join. Revenue in integer
    basis-point units so both engines compare identical values."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    yr = F.year("o_orderdate")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter((F.col("s_nationkey") == F.col("c_nationkey")) & yr.isin(1996, 1997))
    )
    units = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100)).cast("bigint")
    )
    g = base.groupBy(
        F.col("r_name").alias("region"), F.col("p_brand").alias("brand")
    ).agg(
        (F.sum(F.when(yr == 1996, units)) / 10000.0).alias("rev96"),
        (F.sum(F.when(yr == 1997, units)) / 10000.0).alias("rev97"),
    )
    return (
        g.filter(
            F.col("rev96").isNotNull()
            & F.col("rev97").isNotNull()
            & (F.col("rev97") > F.col("rev96"))
        )
        .orderBy("region", "brand")
    )


@query(
    "ds_q41_exists_battery",
    oracle="""
    SELECT DISTINCT p1.p_name AS p_name
    FROM part p1
    WHERE p1.p_retailprice BETWEEN 940 AND 960
      AND EXISTS (
        SELECT 1 FROM part p2
        WHERE p2.p_brand = p1.p_brand
          AND ((p2.p_type = 'PROMO'   AND p2.p_size BETWEEN 1 AND 15)
            OR (p2.p_type = 'ECONOMY' AND p2.p_size BETWEEN 20 AND 35)))
    ORDER BY p_name
    """,
    tags=("batch", "tpcds", "exists", "dimension"),
)
def ds_q41_exists_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q41 shape: a correlated EXISTS battery entirely within the
    item dimension — distinct names of in-price-band parts whose BRAND has
    some part matching an OR-battery of (type, size-range) predicates.
    Spark: the battery decorrelates to a broadcast LEFT SEMI join on brand
    (the qualifying-brand set is tiny after dedup)."""
    p = load(spark, sf_dir, "part")
    battery = (
        ((F.col("p_type") == "PROMO") & F.col("p_size").between(1, 15))
        | ((F.col("p_type") == "ECONOMY") & F.col("p_size").between(20, 35))
    )
    brands = p.filter(battery).select("p_brand").distinct()
    return (
        p.filter(F.col("p_retailprice").between(940, 960))
        .join(F.broadcast(brands), "p_brand", "left_semi")
        .select("p_name")
        .distinct()
        .orderBy("p_name")
    )


@query(
    "ds_q21_before_after",
    oracle="""
    SELECT n.n_name AS nation, l.l_partkey AS partkey,
           CAST(SUM(CASE WHEN l.l_shipdate < DATE '1998-01-01'
                         THEN l.l_quantity ELSE 0 END) AS DOUBLE) AS qty_before,
           CAST(SUM(CASE WHEN l.l_shipdate >= DATE '1998-01-01'
                         THEN l.l_quantity ELSE 0 END) AS DOUBLE) AS qty_after
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE p.p_type = 'PROMO'
      AND l.l_shipdate BETWEEN DATE '1997-01-01' AND DATE '1998-12-31'
    GROUP BY 1, 2
    HAVING qty_before > 0 AND qty_after > 0
       AND 3 * qty_after >= 2 * qty_before
       AND 2 * qty_after <= 3 * qty_before
    ORDER BY nation, partkey
    """,
    tags=("batch", "tpcds", "agg", "pivot-date"),
)
def ds_q21_before_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q21/q40 shape: per (warehouse≈supplier-nation, item) quantity
    before vs after a pivot date, keeping groups whose after/before ratio
    sits in [2/3, 3/2]. The ratio bound is CROSS-MULTIPLIED — quantities
    are integral, so the predicate is integer-exact and float summation
    order cannot flip membership across engines."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    pivot = F.lit("1998-01-01").cast("date")
    base = (
        li.filter(
            F.col("l_shipdate").between("1997-01-01", "1998-12-31")
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
    )
    g = base.groupBy(
        F.col("n_name").alias("nation"), F.col("l_partkey").alias("partkey")
    ).agg(
        F.sum(
            F.when(F.col("l_shipdate") < pivot, F.col("l_quantity")).otherwise(0)
        ).alias("qty_before"),
        F.sum(
            F.when(F.col("l_shipdate") >= pivot, F.col("l_quantity")).otherwise(0)
        ).alias("qty_after"),
    )
    return (
        g.filter(
            (F.col("qty_before") > 0)
            & (F.col("qty_after") > 0)
            & (3 * F.col("qty_after") >= 2 * F.col("qty_before"))
            & (2 * F.col("qty_after") <= 3 * F.col("qty_before"))
        )
        .orderBy("nation", "partkey")
    )


@query(
    "ds_q58_three_channel_compare",
    oracle="""
    WITH g AS (
      SELECT p.p_brand AS brand,
             SUM(CASE WHEN l.l_returnflag = 'N'
                   THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * CAST(100 - ROUND(l.l_discount * 100) AS BIGINT)
                 END) AS u_n,
             SUM(CASE WHEN l.l_returnflag = 'A'
                   THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * CAST(100 - ROUND(l.l_discount * 100) AS BIGINT)
                 END) AS u_a,
             SUM(CASE WHEN l.l_returnflag = 'R'
                   THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * CAST(100 - ROUND(l.l_discount * 100) AS BIGINT)
                 END) AS u_r
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p   ON l.l_partkey = p.p_partkey
      WHERE YEAR(o.o_orderdate) = 1996
      GROUP BY 1)
    SELECT brand, CAST(u_n / 10000.0 AS DOUBLE) AS rev_n,
           CAST(u_a / 10000.0 AS DOUBLE) AS rev_a,
           CAST(u_r / 10000.0 AS DOUBLE) AS rev_r
    FROM g
    WHERE u_n IS NOT NULL AND u_a IS NOT NULL AND u_r IS NOT NULL
      AND 30 * u_n >= 9 * (u_n + u_a + u_r)
      AND 30 * u_n <= 11 * (u_n + u_a + u_r)
      AND 30 * u_a >= 9 * (u_n + u_a + u_r)
      AND 30 * u_a <= 11 * (u_n + u_a + u_r)
      AND 30 * u_r >= 9 * (u_n + u_a + u_r)
      AND 30 * u_r <= 11 * (u_n + u_a + u_r)
    ORDER BY brand
    """,
    tags=("batch", "tpcds", "agg", "three-way"),
)
def ds_q58_three_channel_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q58/q83 shape: per-item revenue in THREE channels, keeping
    items where every channel is within ±10% of the three-channel average.
    The reference joins three per-channel CTEs on item; Spark-first this is
    ONE conditional-aggregation pass (3 sums per brand, 1 exchange).
    Revenue sums in INTEGER basis-point units; the ±10% band
    cross-multiplies to `30·u between 9·T and 11·T` — integer-exact, no
    float in any comparison."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(F.year("o_orderdate") == 1996)
    )

    units = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100)).cast("bigint")
    )

    def chan(flag):
        return F.sum(F.when(F.col("l_returnflag") == flag, units))

    g = base.groupBy(F.col("p_brand").alias("brand")).agg(
        chan("N").alias("u_n"), chan("A").alias("u_a"), chan("R").alias("u_r")
    )
    tot = F.col("u_n") + F.col("u_a") + F.col("u_r")
    in_band = lambda c: (  # noqa: E731 — ±10% band, cross-multiplied
        (30 * F.col(c) >= 9 * tot) & (30 * F.col(c) <= 11 * tot)
    )
    return (
        g.filter(
            F.col("u_n").isNotNull()
            & F.col("u_a").isNotNull()
            & F.col("u_r").isNotNull()
            & in_band("u_n")
            & in_band("u_a")
            & in_band("u_r")
        )
        .select(
            "brand",
            (F.col("u_n") / 10000.0).alias("rev_n"),
            (F.col("u_a") / 10000.0).alias("rev_a"),
            (F.col("u_r") / 10000.0).alias("rev_r"),
        )
        .orderBy("brand")
    )


@query(
    "ds_q99_delay_buckets",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(SUM(CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate)
                              <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate)
                              BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
           CAST(SUM(CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate)
                              BETWEEN 61 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
           CAST(SUM(CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate)
                              BETWEEN 91 AND 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
           CAST(SUM(CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate)
                              > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d_more
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY priority
    """,
    tags=("batch", "tpcds", "agg", "case-battery"),
)
def ds_q99_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q99/q62 shape: shipping-delay histogram — day counts bucketed
    30/60/90/120/120+ per order priority, a CASE battery folded in ONE
    aggregation pass over the join (integer datediff, exact)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    d = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    base = li.join(o, li.l_orderkey == o.o_orderkey)

    def bucket(cond, alias):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(alias)

    return (
        base.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            bucket(d <= 30, "d30"),
            bucket(d.between(31, 60), "d60"),
            bucket(d.between(61, 90), "d90"),
            bucket(d.between(91, 120), "d120"),
            bucket(d > 120, "d_more"),
        )
        .orderBy("priority")
    )


@query(
    "ds_q45_geo_or_in_subquery",
    oracle="""
    WITH promo_buyers AS (
      SELECT DISTINCT o.o_custkey
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO' AND YEAR(o.o_orderdate) = 1996)
    SELECT n.n_name AS nation,
           CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE YEAR(o.o_orderdate) = 1997
      AND (n.n_name IN ('NATION_1', 'NATION_7', 'NATION_19')
           OR c.c_custkey IN (SELECT o_custkey FROM promo_buyers))
    GROUP BY 1 ORDER BY nation
    """,
    tags=("batch", "tpcds", "semi-join", "subquery"),
)
def ds_q45_geo_or_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q45 shape: revenue restricted by a GEO LIST **OR** a key-IN-
    subquery. The OR of a local predicate and a semi-join decorrelates to a
    LEFT SEMI join against the UNION of the two qualifying customer sets
    (listed-nation customers ∪ promo buyers) — one semi-join, no
    double-scan of the fact."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    geo = ["NATION_1", "NATION_7", "NATION_19"]
    promo_buyers = (
        o.filter(F.year("o_orderdate") == 1996)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    geo_customers = (
        c.join(F.broadcast(n.filter(F.col("n_name").isin(geo))),
               c.c_nationkey == n.n_nationkey)
        .select("c_custkey")
    )
    qualifying = geo_customers.unionByName(promo_buyers).distinct()
    return (
        li.join(o.filter(F.year("o_orderdate") == 1997),
                li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(qualifying, "c_custkey", "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy("nation")
    )


@query(
    "ds_q8_substring_join",
    oracle="""
    WITH zips AS (
      SELECT DISTINCT SUBSTRING(s_name, LENGTH(s_name) - 1, 2) AS zip2
      FROM supplier WHERE s_acctbal > 0)
    SELECT SUBSTRING(c.c_name, LENGTH(c.c_name) - 1, 2) AS zip2,
           CAST(ROUND(SUM(o.o_totalprice), 2) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN zips z ON SUBSTRING(c.c_name, LENGTH(c.c_name) - 1, 2) = z.zip2
    WHERE YEAR(o.o_orderdate) = 1996
    GROUP BY 1 ORDER BY zip2
    """,
    tags=("batch", "tpcds", "join", "derived-key"),
)
def ds_q8_substring_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q8 shape: equi-join on a DERIVED SUBSTRING key (zip prefix)
    against a deduped derived dimension — the join key exists in neither
    table's columns. The distinct prefix set is tiny → broadcast; the
    substring is computed scan-side so the join stays a hash join on the
    derived key."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    zip2 = lambda col: F.substring(col, -2, 2)  # noqa: E731
    zips = (
        s.filter(F.col("s_acctbal") > 0)
        .select(zip2(F.col("s_name")).alias("zip2"))
        .distinct()
    )
    return (
        o.filter(F.year("o_orderdate") == 1996)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("zip2", zip2(F.col("c_name")))
        .join(F.broadcast(zips), "zip2", "left_semi")
        .groupBy("zip2")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("zip2")
    )


@query(
    "ds_q38_intersect_three",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_hot_customers FROM (
      SELECT o.o_custkey FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE YEAR(o.o_orderdate) = 1996 AND l.l_returnflag = 'N'
      INTERSECT
      SELECT o.o_custkey FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE YEAR(o.o_orderdate) = 1996 AND l.l_returnflag = 'A'
      INTERSECT
      SELECT o.o_custkey FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE YEAR(o.o_orderdate) = 1996 AND l.l_returnflag = 'R')
    """,
    tags=("batch", "tpcds", "setop", "intersect"),
)
def ds_q38_intersect_three(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q38 shape: INTERSECT of three channels' distinct customer
    sets (customers active in ALL channels in the year). Spark INTERSECT
    compiles to a distinct + join chain; each branch prunes to the key
    column before the set op."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    base = o.join(li, li.l_orderkey == o.o_orderkey)

    def chan(flag):
        return base.filter(F.col("l_returnflag") == flag).select("o_custkey")

    hot = chan("N").intersect(chan("A")).intersect(chan("R"))
    return hot.agg(F.count(F.lit(1)).alias("n_hot_customers"))


@query(
    "ds_q87_except_chain",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_store_only FROM (
      SELECT o.o_custkey FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE YEAR(o.o_orderdate) = 1996 AND l.l_returnflag = 'N'
      EXCEPT
      SELECT o.o_custkey FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE YEAR(o.o_orderdate) = 1996 AND l.l_returnflag = 'A'
      EXCEPT
      SELECT o.o_custkey FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE YEAR(o.o_orderdate) = 1996 AND l.l_returnflag = 'R')
    """,
    tags=("batch", "tpcds", "setop", "except"),
)
def ds_q87_except_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q87 shape: EXCEPT chain — customers in the first channel and
    NEITHER of the other two (set difference, distinct semantics). Spark
    ``exceptAll``-vs-``subtract``: q87 needs DISTINCT semantics →
    ``subtract`` (compiles to left-anti after dedup)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    base = o.join(li, li.l_orderkey == o.o_orderkey)

    def chan(flag):
        return base.filter(F.col("l_returnflag") == flag).select("o_custkey")

    only = chan("N").subtract(chan("A")).subtract(chan("R"))
    return only.agg(F.count(F.lit(1)).alias("n_store_only"))


@query(
    "ds_q32_excess_threshold",
    oracle="""
    WITH t AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sum_c,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1)
    SELECT CAST(ROUND(SUM(l.l_extendedprice), 2) AS DOUBLE) AS excess_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN t ON l.l_partkey = t.l_partkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type = 'PROMO'
      AND 10 * CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) * t.n
            > 13 * t.sum_c
    """,
    tags=("batch", "tpcds", "subquery", "correlated"),
)
def ds_q32_excess_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q32/q92 shape: "excess discount" — lines whose price exceeds
    1.3× the per-item average, summed. The correlated scalar subquery
    decorrelates to a per-item aggregate joined back to the fact at LINE
    grain (two passes over lineitem, one co-partitioned join on partkey —
    Flink's planner produces the same decorrelation). The 1.3× threshold
    cross-multiplies in integer cents (`10·price·n > 13·Σprice`) so the
    boundary is engine-exact."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    t = li.groupBy("l_partkey").agg(
        F.sum(cents).alias("sum_c"), F.count(F.lit(1)).alias("n")
    )
    return (
        li.join(t, "l_partkey")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .filter(10 * cents * F.col("n") > 13 * F.col("sum_c"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("excess_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "ds_q82_having_range_report",
    oracle="""
    SELECT p.p_name AS p_name, p.p_brand AS brand,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_retailprice BETWEEN 930 AND 970
      AND p.p_size IN (5, 10, 15, 20, 25)
      AND l.l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    GROUP BY 1, 2
    HAVING SUM(l.l_quantity) BETWEEN 100 AND 500
    ORDER BY p_name, brand
    """,
    tags=("batch", "tpcds", "having", "dimension-band"),
)
def ds_q82_having_range_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q37/q82 shape: an item report gated by a dimension band
    (price range + size list) AND a HAVING range on the aggregated fact
    quantity — quantity sums are integral so the HAVING band is exact."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_retailprice").between(930, 970)
        & F.col("p_size").isin(5, 10, 15, 20, 25)
    )
    return (
        li.filter(F.col("l_shipdate").between("1996-01-01", "1996-12-31"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_name"), F.col("p_brand").alias("brand"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty").between(100, 500))
        .orderBy("p_name", "brand")
    )


@query(
    "ds_q48_or_band_battery",
    oracle="""
    SELECT CAST(SUM(l.l_quantity) AS DOUBLE) AS total_qty,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE (c.c_mktsegment = 'BUILDING'
             AND l.l_quantity BETWEEN 1 AND 15
             AND l.l_extendedprice BETWEEN 0 AND 20000)
       OR (c.c_mktsegment = 'MACHINERY'
             AND l.l_quantity BETWEEN 16 AND 35
             AND l.l_extendedprice BETWEEN 10000 AND 60000)
       OR (c.c_mktsegment = 'HOUSEHOLD'
             AND l.l_quantity BETWEEN 36 AND 50
             AND l.l_extendedprice BETWEEN 20000 AND 100000)
    """,
    tags=("batch", "tpcds", "filter-battery"),
)
def ds_q48_or_band_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q48 shape: a WHERE battery — the OR of three (segment,
    quantity-band, price-band) conjunctions — folded into one aggregation
    pass; the disjunction evaluates post-join as a single predicate (no
    per-arm scans, no union)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    arm = lambda seg, q1, q2, p1, p2: (  # noqa: E731
        (F.col("c_mktsegment") == seg)
        & F.col("l_quantity").between(q1, q2)
        & F.col("l_extendedprice").between(p1, p2)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(
            arm("BUILDING", 1, 15, 0, 20000)
            | arm("MACHINERY", 16, 35, 10000, 60000)
            | arm("HOUSEHOLD", 36, 50, 20000, 100000)
        )
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "ds_q96_slot_count",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE YEAR(l.l_shipdate) = 1997 AND MONTH(l.l_shipdate) = 6
      AND l.l_returnflag = 'R' AND l.l_quantity BETWEEN 20 AND 30
      AND o.o_orderpriority = '1-URGENT'
    """,
    tags=("batch", "tpcds", "count"),
)
def ds_q96_slot_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q96 shape: a pinpoint slot count — every predicate is a
    scan-level filter (month, flag, quantity band) plus one join; the
    whole query reduces to a single COUNT."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.filter(
            (F.year("l_shipdate") == 1997)
            & (F.month("l_shipdate") == 6)
            & (F.col("l_returnflag") == "R")
            & F.col("l_quantity").between(20, 30)
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "ds_q6_global_avg_threshold",
    oracle="""
    WITH g AS (SELECT SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sum_c,
                      COUNT(*) AS n
               FROM orders WHERE YEAR(o_orderdate) = 1996)
    SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_big_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    CROSS JOIN g
    WHERE YEAR(o.o_orderdate) = 1996
      AND 5 * CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * g.n > 6 * g.sum_c
    GROUP BY 1 HAVING COUNT(*) >= 10 ORDER BY nation
    """,
    tags=("batch", "tpcds", "scalar-subquery"),
)
def ds_q6_global_avg_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q6 shape: rows above a GLOBAL scalar threshold (1.2× the
    period's average price) counted per geography, HAVING a minimum count.
    The scalar aggregate reduces to ONE row and cross-joins back as a
    broadcast nested loop — no re-scan per row. The 1.2× threshold
    cross-multiplies in integer cents (`5·price·n > 6·Σprice`) so the
    boundary is engine-exact."""
    o = load(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    g = o.agg(F.sum(cents).alias("sum_c"), F.count(F.lit(1)).alias("n"))
    return (
        o.crossJoin(F.broadcast(g))
        .filter(5 * cents * F.col("n") > 6 * F.col("sum_c"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_big_orders"))
        .filter(F.col("n_big_orders") >= 10)
        .orderBy("nation")
    )


@query(
    "ds_q68_trip_report",
    oracle="""
    SELECT o.o_orderkey AS orderkey, c.c_name AS c_name,
           CAST(SUM(l.l_quantity) AS DOUBLE) AS trip_qty,
           CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                AS DOUBLE) AS trip_rev
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      AND YEAR(o.o_orderdate) = 1996
    GROUP BY 1, 2
    HAVING SUM(l.l_quantity) BETWEEN 150 AND 200
    ORDER BY orderkey
    """,
    tags=("batch", "tpcds", "having", "order-grain"),
)
def ds_q68_trip_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q68/q79 shape: ORDER-grain aggregates (one row per trip)
    HAVING a quantity band, with customer attributes carried through the
    group-by. Quantity sums are integral → exact band membership."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1996)
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("o_orderkey").alias("orderkey"), F.col("c_name"))
        .agg(
            F.sum("l_quantity").alias("trip_qty"),
            F.round(F.sum(_rev()), 2).alias("trip_rev"),
        )
        .filter(F.col("trip_qty").between(150, 200))
        .orderBy("orderkey")
    )


@query(
    "ds_q85_band_battery_join",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(ROUND(AVG(l.l_quantity), 4) AS DOUBLE) AS avg_qty,
           CAST(COUNT(*) AS BIGINT) AS n_returns
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND ((c.c_mktsegment = 'BUILDING'  AND c.c_acctbal BETWEEN 0 AND 5000)
        OR (c.c_mktsegment = 'MACHINERY' AND c.c_acctbal BETWEEN 2500 AND 7500)
        OR (c.c_mktsegment = 'HOUSEHOLD' AND c.c_acctbal BETWEEN 5000 AND 10000))
      AND ((l.l_quantity BETWEEN 1 AND 20 AND l.l_discount <= 0.05)
        OR (l.l_quantity BETWEEN 21 AND 50 AND l.l_discount > 0.05))
    GROUP BY 1 ORDER BY nation
    """,
    tags=("batch", "tpcds", "filter-battery", "returns"),
)
def ds_q85_band_battery_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q85/q91 shape: returned lines analyzed under TWO independent
    OR-batteries — one over customer attributes (segment × balance band),
    one over line attributes (quantity × discount band) — aggregated per
    nation. Both batteries are single predicates over the joined row; no
    per-arm unions."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cust_band = (
        ((F.col("c_mktsegment") == "BUILDING") & F.col("c_acctbal").between(0, 5000))
        | ((F.col("c_mktsegment") == "MACHINERY") & F.col("c_acctbal").between(2500, 7500))
        | ((F.col("c_mktsegment") == "HOUSEHOLD") & F.col("c_acctbal").between(5000, 10000))
    )
    line_band = (
        (F.col("l_quantity").between(1, 20) & (F.col("l_discount") <= 0.05))
        | (F.col("l_quantity").between(21, 50) & (F.col("l_discount") > 0.05))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .filter(cust_band & line_band)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("n_returns"),
        )
        .orderBy("nation")
    )
