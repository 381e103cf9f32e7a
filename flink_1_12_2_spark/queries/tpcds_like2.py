"""TPC-DS archetype tranche 2 (adapted to the driver's star schema).

Continues queries/tpcds_like.py toward the reference gate's 103 queries
(flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/, driver
TpcdsTestProgram.java:48) with the round-4 shapes:

- q5/q77/q80 — multi-fact channel rollups: sales and returns facts combined
  (q5: UNION ALL before one ROLLUP; q77: per-channel aggregates FULL OUTER
  joined then totaled; q80: line-grain sales LEFT JOIN returns with a promo
  dimension filter, then ROLLUP);
- q66 — the monthly pivot: 12 SUM(CASE month = m) columns per ship mode,
  two carrier halves UNION ALL'd then re-aggregated;
- q61 — promotional-revenue ratio: two scalar aggregates (promo / all)
  cross-joined into one ratio row;
- q90 — am/pm ratio battery: mutually exclusive time-slot CASE counts as
  singleton aggregates, cross-joined and divided.

Scale notes: dimension joins broadcast; every rollup/pivot aggregates
partially before Expand; the q80 fact-fact LEFT join co-partitions both
sides on (l_orderkey, l_linenumber) — at 100 TB that is the one genuine
shuffle here and it is key-balanced; the scalar-battery queries reduce each
side to ONE row before the BroadcastNestedLoopJoin so no data crosses.

Floating-point discipline matches tpcds_like.py: doubles rounded before any
rank/limit, rollup sort keys state NULLS FIRST explicitly on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_12_2_spark.registry import EVENTS_US_CTE, load, query


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "ds_q5_channel_rollup",
    oracle="""
    WITH facts AS (
      SELECT CASE l_suppkey % 3 WHEN 0 THEN 'store' WHEN 1 THEN 'web' ELSE 'catalog' END AS channel, l_linestatus AS id,
             l_extendedprice * (1 - l_discount) AS sales,
             0.0 AS returns, l_extendedprice * (1 - l_discount) * 0.1 AS profit
      FROM lineitem
      UNION ALL
      SELECT CASE l_suppkey % 3 WHEN 0 THEN 'store' WHEN 1 THEN 'web' ELSE 'catalog' END, l_linestatus, 0.0,
             l_extendedprice * (1 - l_discount),
             -(l_extendedprice * (1 - l_discount)) * 0.05
      FROM lineitem WHERE l_returnflag = 'R')
    SELECT channel, id,
           CAST(ROUND(SUM(sales), 2) AS DOUBLE)   AS total_sales,
           CAST(ROUND(SUM(returns), 2) AS DOUBLE) AS total_returns,
           CAST(ROUND(SUM(profit), 2) AS DOUBLE)  AS total_profit
    FROM facts GROUP BY ROLLUP (channel, id)
    ORDER BY channel NULLS FIRST, id NULLS FIRST
    """,
    tags=("batch", "tpcds", "rollup", "union", "multi-fact"),
)
def ds_q5_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q5 shape: sales and returns FACTS UNION ALL'd into one
    (channel, id, sales, returns, profit) stream, then a single
    ROLLUP(channel, id) — returns modeled as the l_returnflag='R' slice.
    The union concatenates partitions without a shuffle; the only exchange
    is the rollup's partial-agg hash."""
    li = load(spark, sf_dir, "lineitem")
    sales = li.select(
        F.when(F.col("l_suppkey") % 3 == 0, "store").when(F.col("l_suppkey") % 3 == 1, "web").otherwise("catalog").alias("channel"),
        F.col("l_linestatus").alias("id"),
        _rev().alias("sales"),
        F.lit(0.0).alias("returns"),
        (_rev() * 0.1).alias("profit"),
    )
    returns = li.filter(F.col("l_returnflag") == "R").select(
        F.when(F.col("l_suppkey") % 3 == 0, "store").when(F.col("l_suppkey") % 3 == 1, "web").otherwise("catalog").alias("channel"),
        F.col("l_linestatus").alias("id"),
        F.lit(0.0).alias("sales"),
        _rev().alias("returns"),
        (-_rev() * 0.05).alias("profit"),
    )
    return (
        sales.unionByName(returns)
        .rollup("channel", "id")
        .agg(
            F.round(F.sum("sales"), 2).alias("total_sales"),
            F.round(F.sum("returns"), 2).alias("total_returns"),
            F.round(F.sum("profit"), 2).alias("total_profit"),
        )
        .orderBy(F.asc_nulls_first("channel"), F.asc_nulls_first("id"))
    )


@query(
    "ds_q77_sales_returns_join",
    oracle="""
    WITH s AS (
      SELECT CASE l_suppkey % 3 WHEN 0 THEN 'store' WHEN 1 THEN 'web' ELSE 'catalog' END AS channel,
             SUM(l_extendedprice * (1 - l_discount)) AS sales,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1),
    r AS (
      SELECT CASE l_suppkey % 3 WHEN 0 THEN 'store' WHEN 1 THEN 'web' ELSE 'catalog' END AS r_channel,
             SUM(l_extendedprice * (1 - l_discount)) AS returns
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1)
    SELECT s.channel,
           CAST(ROUND(SUM(s.sales), 2) AS DOUBLE) AS sales,
           CAST(SUM(s.cnt) AS BIGINT) AS cnt,
           CAST(ROUND(SUM(COALESCE(r.returns, 0)), 2) AS DOUBLE) AS returns,
           CAST(ROUND(SUM(s.sales - COALESCE(r.returns, 0)), 2) AS DOUBLE)
             AS net
    FROM s LEFT JOIN r ON s.channel = r.r_channel
    GROUP BY ROLLUP (s.channel)
    ORDER BY channel NULLS FIRST
    """,
    tags=("batch", "tpcds", "rollup", "join", "multi-fact"),
)
def ds_q77_sales_returns_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q77 shape: sales and returns aggregated SEPARATELY per
    channel, outer-joined on the channel key (returns may be absent), then
    totaled with ROLLUP. Both aggregates reduce the fact before the join,
    so the join touches ≤ |channels| rows — broadcast-sized at any scale."""
    li = load(spark, sf_dir, "lineitem")
    s = li.groupBy(
        F.when(F.col("l_suppkey") % 3 == 0, "store")
        .when(F.col("l_suppkey") % 3 == 1, "web")
        .otherwise("catalog")
        .alias("channel")
    ).agg(
        F.sum(_rev()).alias("sales"), F.count(F.lit(1)).alias("cnt")
    )
    r = li.filter(F.col("l_returnflag") == "R").groupBy(
        F.when(F.col("l_suppkey") % 3 == 0, "store").when(F.col("l_suppkey") % 3 == 1, "web").otherwise("catalog").alias("r_channel")
    ).agg(F.sum(_rev()).alias("returns"))
    j = s.join(F.broadcast(r), s.channel == r.r_channel, "left")
    ret = F.coalesce(F.col("returns"), F.lit(0.0))
    return (
        j.select("channel", "sales", "cnt", ret.alias("returns"))
        .rollup("channel")
        .agg(
            F.round(F.sum("sales"), 2).alias("sales"),
            F.sum("cnt").alias("cnt"),
            F.round(F.sum("returns"), 2).alias("returns"),
            F.round(F.sum(F.col("sales") - F.col("returns")), 2).alias("net"),
        )
        .orderBy(F.asc_nulls_first("channel"))
    )


@query(
    "ds_q80_promo_returns_rollup",
    oracle="""
    WITH sales AS (
      SELECT CASE l.l_suppkey % 3 WHEN 0 THEN 'store' WHEN 1 THEN 'web' ELSE 'catalog' END AS channel, l.l_linestatus AS id,
             l.l_extendedprice * (1 - l.l_discount) AS amt,
             l.l_orderkey, l.l_linenumber
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO'),
    ret AS (
      SELECT l_orderkey, l_linenumber,
             l_extendedprice * (1 - l_discount) AS ret_amt
      FROM lineitem WHERE l_returnflag = 'R')
    SELECT s.channel, s.id,
           CAST(ROUND(SUM(s.amt), 2) AS DOUBLE) AS sales,
           CAST(ROUND(SUM(COALESCE(r.ret_amt, 0)), 2) AS DOUBLE) AS returns
    FROM sales s LEFT JOIN ret r
      ON s.l_orderkey = r.l_orderkey AND s.l_linenumber = r.l_linenumber
    GROUP BY ROLLUP (s.channel, s.id)
    ORDER BY channel NULLS FIRST, id NULLS FIRST
    """,
    tags=("batch", "tpcds", "rollup", "join", "multi-fact"),
)
def ds_q80_promo_returns_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q80 shape: promo-filtered sales LEFT JOIN returns at LINE
    grain (ticket+item in DS; orderkey+linenumber here), then
    ROLLUP(channel, id). The broadcast part dimension prunes before the
    fact-fact join; the line-grain join co-partitions both sides on the
    same composite key — the one real shuffle, key-balanced."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sales = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.when(F.col("l_suppkey") % 3 == 0, "store").when(F.col("l_suppkey") % 3 == 1, "web").otherwise("catalog").alias("channel"),
        F.col("l_linestatus").alias("id"),
        _rev().alias("amt"),
        "l_orderkey",
        "l_linenumber",
    )
    ret = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_ok"),
        F.col("l_linenumber").alias("r_ln"),
        _rev().alias("ret_amt"),
    )
    j = sales.join(
        ret,
        (sales.l_orderkey == ret.r_ok) & (sales.l_linenumber == ret.r_ln),
        "left",
    )
    return (
        j.select(
            "channel",
            "id",
            "amt",
            F.coalesce(F.col("ret_amt"), F.lit(0.0)).alias("ret_amt"),
        )
        .rollup("channel", "id")
        .agg(
            F.round(F.sum("amt"), 2).alias("sales"),
            F.round(F.sum("ret_amt"), 2).alias("returns"),
        )
        .orderBy(F.asc_nulls_first("channel"), F.asc_nulls_first("id"))
    )


_MONTHS = list(range(1, 13))


@query(
    "ds_q66_monthly_pivot",
    oracle="""
    WITH halves AS (
      SELECT CASE l_suppkey % 3 WHEN 0 THEN 'store' WHEN 1 THEN 'web' ELSE 'catalog' END AS channel, 'even' AS carrier, MONTH(l_shipdate) AS moy,
             l_extendedprice * (1 - l_discount) AS amt
      FROM lineitem WHERE l_linenumber % 2 = 0
      UNION ALL
      SELECT CASE l_suppkey % 3 WHEN 0 THEN 'store' WHEN 1 THEN 'web' ELSE 'catalog' END, 'odd', MONTH(l_shipdate),
             l_extendedprice * (1 - l_discount)
      FROM lineitem WHERE l_linenumber % 2 = 1),
    per_half AS (
      SELECT channel, carrier,
             """
    + ",\n             ".join(
        f"SUM(CASE WHEN moy = {m} THEN amt ELSE 0 END) AS m{m}"
        for m in _MONTHS
    )
    + """
      FROM halves GROUP BY channel, carrier)
    SELECT channel,
           """
    + ",\n           ".join(
        f"CAST(ROUND(SUM(m{m}), 2) AS DOUBLE) AS m{m}" for m in _MONTHS
    )
    + """
    FROM per_half GROUP BY channel ORDER BY channel
    """,
    tags=("batch", "tpcds", "pivot", "union"),
)
def ds_q66_monthly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q66 shape: the 12-column monthly pivot — SUM(CASE WHEN
    month = m) batteries per ship mode, computed per carrier half
    (web/catalog in DS; even/odd line numbers here), UNION ALL'd and
    re-aggregated. The pivot is a single pass (no per-month scans); the
    re-aggregation folds 2×|shipmodes| rows."""
    li = load(spark, sf_dir, "lineitem")

    def half(pred, tag):
        g = li.filter(pred).groupBy(F.when(F.col("l_suppkey") % 3 == 0, "store").when(F.col("l_suppkey") % 3 == 1, "web").otherwise("catalog").alias("channel")).agg(
            *[
                F.sum(
                    F.when(F.month("l_shipdate") == m, _rev()).otherwise(0.0)
                ).alias(f"m{m}")
                for m in _MONTHS
            ]
        )
        return g.withColumn("carrier", F.lit(tag))

    halves = half(F.col("l_linenumber") % 2 == 0, "even").unionByName(
        half(F.col("l_linenumber") % 2 == 1, "odd")
    )
    return (
        halves.groupBy("channel")
        .agg(*[F.round(F.sum(f"m{m}"), 2).alias(f"m{m}") for m in _MONTHS])
        .orderBy("channel")
    )


@query(
    "ds_q61_promo_ratio",
    oracle="""
    SELECT CAST(ROUND(p.promo_rev, 2) AS DOUBLE) AS promo_rev,
           CAST(ROUND(t.total_rev, 2) AS DOUBLE) AS total_rev,
           CAST(ROUND(p.promo_rev * 100.0 / t.total_rev, 4) AS DOUBLE)
             AS promo_pct
    FROM (SELECT SUM(l.l_extendedprice * (1 - l.l_discount)) AS promo_rev
          FROM lineitem l JOIN part pp ON l.l_partkey = pp.p_partkey
          WHERE pp.p_type = 'PROMO') p,
         (SELECT SUM(l_extendedprice * (1 - l_discount)) AS total_rev
          FROM lineitem) t
    """,
    tags=("batch", "tpcds", "scalar", "ratio"),
)
def ds_q61_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q61 shape: promotional revenue over total revenue — two
    scalar aggregates (one promo-dimension-filtered, one unfiltered)
    cross-joined into a single ratio row (BroadcastNestedLoopJoin of
    singletons, like q88's battery but with a division)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    promo = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.sum(_rev()).alias("promo_rev"))
    )
    total = li.agg(F.sum(_rev()).alias("total_rev"))
    return promo.crossJoin(total).select(
        F.round("promo_rev", 2).alias("promo_rev"),
        F.round("total_rev", 2).alias("total_rev"),
        F.round(F.col("promo_rev") * 100.0 / F.col("total_rev"), 4).alias(
            "promo_pct"
        ),
    )


@query(
    "ds_q90_am_pm_ratio",
    oracle=f"""
    {EVENTS_US_CTE}
    SELECT am.amc, pm.pmc,
           CAST(ROUND(CAST(am.amc AS DOUBLE) / pm.pmc, 4) AS DOUBLE)
             AS am_pm_ratio
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS amc FROM ev
           WHERE event_type = 'view' AND HOUR(ts) BETWEEN 6 AND 11) am,
         (SELECT CAST(COUNT(*) AS BIGINT) AS pmc FROM ev
           WHERE event_type = 'view' AND HOUR(ts) BETWEEN 18 AND 23) pm
    """,
    tags=("batch", "tpcds", "scalar", "ratio"),
)
def ds_q90_am_pm_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q90 shape: the am/pm ratio — two MUTUALLY EXCLUSIVE time-slot
    counts (morning 6-11 vs evening 18-23, web 'view' events) as singleton
    aggregates, cross-joined and divided. The two slot filters are
    exclusive CASE ranges, never double-counting a row."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    am = ev.filter(F.hour("ts").between(6, 11)).agg(
        F.count(F.lit(1)).alias("amc")
    )
    pm = ev.filter(F.hour("ts").between(18, 23)).agg(
        F.count(F.lit(1)).alias("pmc")
    )
    return am.crossJoin(pm).select(
        "amc",
        "pmc",
        F.round(F.col("amc").cast("double") / F.col("pmc"), 4).alias(
            "am_pm_ratio"
        ),
    )
