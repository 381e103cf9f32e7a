"""TPC-DS archetype tranches 2-4 (adapted to the driver's star schema).

Continues queries/tpcds_like.py toward the reference gate's 103 queries
(flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/, driver
TpcdsTestProgram.java:48) with the round-4 shapes:

- q5/q77/q80 — multi-fact channel rollups: sales and returns facts combined
  (q5: UNION ALL before one ROLLUP; q77: per-channel aggregates FULL OUTER
  joined then totaled; q80: line-grain sales LEFT JOIN returns with a promo
  dimension filter, then ROLLUP);
- q66 — the monthly pivot: 12 SUM(CASE month = m) columns per ship mode,
  two carrier halves UNION ALL'd then re-aggregated;
- q61 / q90 — ratio batteries: scalar aggregates cross-joined and divided;
- q14 — cross-channel INTERSECT gating a per-channel aggregate;
- q49 — per-item return ratios ranked within channel, top-10;
- q39 — coefficient-of-variation flags self-joined across consecutive months;
- q47 — windowed AVG + LAG + LEAD deviation report (one window exchange);
- q95 — ≥2-distinct-supplier orders with no returns (semi + anti combo);
- q31 — QoQ growth comparison, collapsed to a ONE-PASS conditional
  aggregation (the four-alias self-join the SQL implies would re-scan the
  fact 4×; plan-pinned to a single series exchange);
- q17 — buy→return→re-buy chain (semi join on the composite key) + stats;
- q54 — per-customer anchor-window revenue histogram (MIN-anchor joined
  back with a derived interval);
- q72 — date-offset equi-join (activity on d ⋈ activity on d+7).

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
from pyspark.sql import DataFrame, SparkSession, Window

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


_CHAN = (
    "CASE l_suppkey % 3 WHEN 0 THEN 'store' WHEN 1 THEN 'web' "
    "ELSE 'catalog' END"
)


def _chan_col():
    return (
        F.when(F.col("l_suppkey") % 3 == 0, "store")
        .when(F.col("l_suppkey") % 3 == 1, "web")
        .otherwise("catalog")
    )


@query(
    "ds_q14_cross_channel_intersect",
    oracle=f"""
    WITH chans AS (SELECT l_partkey, {_CHAN} AS channel,
                          l_extendedprice * (1 - l_discount) AS amt
                   FROM lineitem),
    common AS (
      SELECT l_partkey FROM chans WHERE channel = 'store'
      INTERSECT
      SELECT l_partkey FROM chans WHERE channel = 'web'
      INTERSECT
      SELECT l_partkey FROM chans WHERE channel = 'catalog')
    SELECT c.channel, CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(c.amt), 2) AS DOUBLE) AS sales
    FROM chans c JOIN common m ON c.l_partkey = m.l_partkey
    GROUP BY c.channel ORDER BY c.channel
    """,
    tags=("batch", "tpcds", "intersect", "multi-fact"),
)
def ds_q14_cross_channel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q14 shape: cross-channel INTERSECT — items sold in ALL
    channels (chained INTERSECT of distinct key sets) gate the per-channel
    aggregate via a semi join. The intersect operands reduce to distinct
    keys before any join; the gate set broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    chans = li.select(
        "l_partkey", _chan_col().alias("channel"), _rev().alias("amt")
    )
    common = (
        chans.filter(F.col("channel") == "store").select("l_partkey")
        .intersect(chans.filter(F.col("channel") == "web").select("l_partkey"))
        .intersect(
            chans.filter(F.col("channel") == "catalog").select("l_partkey")
        )
    )
    return (
        chans.join(F.broadcast(common), "l_partkey")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("amt"), 2).alias("sales"),
        )
        .orderBy("channel")
    )


@query(
    "ds_q49_return_ratio_rank",
    oracle=f"""
    WITH base AS (
      SELECT {_CHAN} AS channel, l_partkey,
             SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END)
               AS ret_qty,
             SUM(l_quantity) AS qty
      FROM lineitem GROUP BY 1, 2 HAVING SUM(l_quantity) > 0),
    ranked AS (
      SELECT channel, l_partkey,
             ROUND(ret_qty / qty, 6) AS return_ratio,
             RANK() OVER (PARTITION BY channel
                          ORDER BY ROUND(ret_qty / qty, 6) DESC, l_partkey)
               AS ratio_rank
      FROM base)
    SELECT channel, l_partkey,
           CAST(return_ratio AS DOUBLE) AS return_ratio,
           CAST(ratio_rank AS BIGINT) AS ratio_rank
    FROM ranked WHERE ratio_rank <= 10
    ORDER BY channel, ratio_rank, l_partkey
    """,
    tags=("batch", "tpcds", "rank", "union"),
)
def ds_q49_return_ratio_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q49 shape: worst return ratios per channel — per-item
    returned/sold ratio ranked within channel, top-10 kept. The ratio is
    rounded BEFORE ranking on both engines (float-tie discipline) and the
    rank tie-breaks on the item key."""
    li = load(spark, sf_dir, "lineitem")
    base = (
        li.groupBy(_chan_col().alias("channel"), "l_partkey")
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", F.col("l_quantity")).otherwise(
                    0.0
                )
            ).alias("ret_qty"),
            F.sum("l_quantity").alias("qty"),
        )
        .filter(F.col("qty") > 0)
        .withColumn("return_ratio", F.round(F.col("ret_qty") / F.col("qty"), 6))
    )
    w = Window.partitionBy("channel").orderBy(
        F.col("return_ratio").desc(), F.col("l_partkey")
    )
    return (
        base.withColumn("ratio_rank", F.rank().over(w))
        .filter(F.col("ratio_rank") <= 10)
        .select("channel", "l_partkey", "return_ratio", "ratio_rank")
        .orderBy("channel", "ratio_rank", "l_partkey")
    )


@query(
    "ds_q39_inventory_variance",
    oracle="""
    WITH m AS (
      SELECT l_suppkey, CAST(MONTH(l_shipdate) AS INT) AS moy,
             AVG(l_quantity) AS mean_qty, STDDEV_SAMP(l_quantity) AS sd_qty,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) > 1),
    flagged AS (
      SELECT * FROM m WHERE sd_qty / mean_qty > 0.65)
    SELECT a.l_suppkey, a.moy AS moy1, b.moy AS moy2,
           CAST(ROUND(a.sd_qty / a.mean_qty, 4) AS DOUBLE) AS cov1,
           CAST(ROUND(b.sd_qty / b.mean_qty, 4) AS DOUBLE) AS cov2
    FROM flagged a JOIN flagged b
      ON a.l_suppkey = b.l_suppkey AND b.moy = a.moy + 1
    ORDER BY a.l_suppkey, moy1
    """,
    tags=("batch", "tpcds", "statistics", "self-join"),
)
def ds_q39_inventory_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q39 shape: the inventory-variance pair — per (supplier,
    month) coefficient of variation (stddev/mean) flagged when > 0.65
    (the top decile on this data; DS uses 1.0 on unit quantities), then a
    SELF JOIN pairing consecutive months that are BOTH flagged. The
    statistical aggregate reduces the fact before the (tiny) self join."""
    li = load(spark, sf_dir, "lineitem")
    m = (
        li.groupBy("l_suppkey", F.month("l_shipdate").alias("moy"))
        .agg(
            F.avg("l_quantity").alias("mean_qty"),
            F.stddev_samp("l_quantity").alias("sd_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") > 1)
        .filter(F.col("sd_qty") / F.col("mean_qty") > 0.65)
    )
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
            & (F.col("b.moy") == F.col("a.moy") + 1),
        )
        .select(
            F.col("a.l_suppkey").alias("l_suppkey"),
            F.col("a.moy").alias("moy1"),
            F.col("b.moy").alias("moy2"),
            F.round(F.col("a.sd_qty") / F.col("a.mean_qty"), 4).alias("cov1"),
            F.round(F.col("b.sd_qty") / F.col("b.mean_qty"), 4).alias("cov2"),
        )
        .orderBy("l_suppkey", "moy1")
    )


@query(
    "ds_q47_lag_lead_deviation",
    oracle="""
    WITH m AS (
      SELECT p.p_brand, CAST(MONTH(l.l_shipdate) AS INT) AS moy,
             CAST(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                  AS DECIMAL(18,2)) AS sum_sales
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2),
    w AS (
      -- avg from an EXACT decimal window sum: both engines divide the same
      -- exact numerator, so the double result is bit-identical (a plain
      -- AVG(double) hits half-cent rounding boundaries)
      SELECT p_brand, moy, CAST(sum_sales AS DOUBLE) AS sum_sales,
             CAST(SUM(sum_sales) OVER (PARTITION BY p_brand) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY p_brand) AS avg_monthly,
             CAST(LAG(sum_sales) OVER (PARTITION BY p_brand ORDER BY moy)
                  AS DOUBLE) AS psum,
             CAST(LEAD(sum_sales) OVER (PARTITION BY p_brand ORDER BY moy)
                  AS DOUBLE) AS nsum
      FROM m)
    -- avg_monthly emitted RAW: both engines derive the identical double
    -- (exact decimal sum / count), and engine-side ROUND disagrees on
    -- exact .xx5 boundaries (Spark rounds the shortest decimal repr
    -- HALF_UP, DuckDB the binary value) — the gate canonicalizer rounds
    SELECT p_brand, moy, CAST(sum_sales AS DOUBLE) AS sum_sales,
           CAST(avg_monthly AS DOUBLE) AS avg_monthly,
           CAST(psum AS DOUBLE) AS psum, CAST(nsum AS DOUBLE) AS nsum
    FROM w
    WHERE avg_monthly > 0 AND psum IS NOT NULL AND nsum IS NOT NULL
      AND ABS(sum_sales - avg_monthly) / avg_monthly > 0.1
    ORDER BY p_brand, moy
    """,
    tags=("batch", "tpcds", "window", "lag-lead"),
)
def ds_q47_lag_lead_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47 shape: deviating months with their NEIGHBORS — the
    monthly series carries three window functions over one partition
    (partition-wide AVG + LAG + LEAD, a single window exchange), and the
    deviation filter keeps rows with both neighbors present."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    m = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.month("l_shipdate").alias("moy"))
        .agg(
            F.round(F.sum(_rev()), 2).cast("decimal(18,2)").alias("sum_sales")
        )
    )
    wp = Window.partitionBy("p_brand")
    wo = wp.orderBy("moy")
    w = (
        m.withColumn(
            "avg_monthly",
            F.sum("sum_sales").over(wp).cast("double")
            / F.count(F.lit(1)).over(wp),
        )
        .withColumn("psum", F.lag("sum_sales").over(wo).cast("double"))
        .withColumn("nsum", F.lead("sum_sales").over(wo).cast("double"))
        .withColumn("sum_sales", F.col("sum_sales").cast("double"))
    )
    return (
        w.filter(
            (F.col("avg_monthly") > 0)
            & F.col("psum").isNotNull()
            & F.col("nsum").isNotNull()
            & (
                F.abs(F.col("sum_sales") - F.col("avg_monthly"))
                / F.col("avg_monthly")
                > 0.1
            )
        )
        .select("p_brand", "moy", "sum_sales", "avg_monthly", "psum", "nsum")
        .orderBy("p_brand", "moy")
    )


@query(
    "ds_q95_multi_supplier_orders",
    oracle="""
    WITH multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) >= 2),
    returned AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(o.o_totalprice), 2) AS DOUBLE) AS total_price
    FROM orders o
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM multi)
      AND o.o_orderkey NOT IN (SELECT l_orderkey FROM returned)
    """,
    tags=("batch", "tpcds", "semi", "anti", "exists"),
)
def ds_q95_multi_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q95 shape: orders shipped by ≥2 distinct warehouses
    (suppliers here) with NO returned line — a distinct-count HAVING gate
    consumed as a semi join plus an anti join on the same fact (the q94
    combo with the q95 multi-site twist)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") >= 2)
        .select("l_orderkey")
    )
    returned = (
        li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    )
    kept = o.join(
        multi, o.o_orderkey == multi.l_orderkey, "left_semi"
    ).join(returned, o.o_orderkey == returned.l_orderkey, "left_anti")
    return kept.agg(
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "ds_q31_share_growth_compare",
    oracle=f"""
    WITH per AS (
      SELECT n.n_name, {_CHAN} AS channel,
             CAST(QUARTER(o.o_orderdate) AS INT) AS qtr,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      WHERE {_CHAN} IN ('store', 'web')
      GROUP BY 1, 2, 3)
    SELECT s1.n_name AS n_name,
           CAST(ROUND(s2.rev / s1.rev, 4) AS DOUBLE) AS store_growth,
           CAST(ROUND(w2.rev / w1.rev, 4) AS DOUBLE) AS web_growth
    FROM per s1 JOIN per s2 ON s1.n_name = s2.n_name AND s1.qtr = 1
                           AND s2.qtr = 2 AND s1.channel = 'store'
                           AND s2.channel = 'store'
         JOIN per w1 ON w1.n_name = s1.n_name AND w1.qtr = 1
                    AND w1.channel = 'web'
         JOIN per w2 ON w2.n_name = s1.n_name AND w2.qtr = 2
                    AND w2.channel = 'web'
    WHERE s1.rev > 0 AND w1.rev > 0
      AND ROUND(w2.rev / w1.rev, 4) > ROUND(s2.rev / s1.rev, 4)
    ORDER BY s1.n_name
    """,
    tags=("batch", "tpcds", "join", "growth"),
)
def ds_q31_share_growth_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q31 shape: quarter-over-quarter growth comparison between two
    channels per geography. The reference SQL (and the oracle) writes it as
    four aliases of one aggregated series 4-way-joined on the dimension;
    physically that re-aggregates the fact four times, so the engine
    collapses it to a ONE-PASS conditional aggregation — four
    SUM(CASE channel/quarter) cells per nation, one fact scan, one hash
    exchange (verified: 8 exchanges → 1 for the series) — the same
    self-join-to-pivot rewrite a production q31 needs at 100 TB. Inner-join
    semantics (every cell must exist) become NOT NULL guards on the cells."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")

    def cell(ch, q):
        return F.sum(
            F.when(
                (F.col("channel") == ch) & (F.col("qtr") == q), _rev()
            )
        )

    agg = (
        li.withColumn("channel", _chan_col())
        .filter(F.col("channel").isin("store", "web"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("qtr", F.quarter("o_orderdate"))
        .groupBy("n_name")
        .agg(
            cell("store", 1).alias("s1"),
            cell("store", 2).alias("s2"),
            cell("web", 1).alias("w1"),
            cell("web", 2).alias("w2"),
        )
    )
    return (
        agg.filter(
            F.col("s1").isNotNull()
            & F.col("s2").isNotNull()
            & F.col("w1").isNotNull()
            & F.col("w2").isNotNull()
            & (F.col("s1") > 0)
            & (F.col("w1") > 0)
        )
        .select(
            "n_name",
            F.round(F.col("s2") / F.col("s1"), 4).alias("store_growth"),
            F.round(F.col("w2") / F.col("w1"), 4).alias("web_growth"),
        )
        .filter(F.col("web_growth") > F.col("store_growth"))
        .orderBy("n_name")
    )


@query(
    "ds_q17_buy_return_rebuy",
    oracle="""
    WITH sales AS (
      SELECT o.o_custkey, l.l_partkey, l.l_quantity, l.l_returnflag,
             l.l_shipdate
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    ret AS (SELECT * FROM sales WHERE l_returnflag = 'R'),
    chained AS (
      SELECT r.* FROM ret r WHERE EXISTS (
        SELECT 1 FROM sales s2
        WHERE s2.o_custkey = r.o_custkey AND s2.l_partkey = r.l_partkey
          AND s2.l_shipdate > r.l_shipdate))
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_chains,
           CAST(ROUND(AVG(c.l_quantity), 4) AS DOUBLE) AS avg_qty,
           CAST(ROUND(STDDEV_SAMP(c.l_quantity), 4) AS DOUBLE) AS sd_qty
    FROM chained c JOIN part p ON c.l_partkey = p.p_partkey
    GROUP BY p.p_brand HAVING COUNT(*) > 1
    ORDER BY p_brand
    """,
    tags=("batch", "tpcds", "multi-fact", "semi", "statistics"),
)
def ds_q17_buy_return_rebuy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q17 shape: the buy→return→re-buy chain across three fact
    roles — returned lines semi-joined to a LATER purchase of the same
    (customer, item), then mean/stddev statistics per brand. The chain
    correlation is a semi join on the composite key (no pair explosion);
    the stats aggregate runs after the chain gate."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part")
    sales = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_custkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate"
    )
    ret = sales.filter(F.col("l_returnflag") == "R")
    later = sales.select(
        F.col("o_custkey").alias("s_ck"),
        F.col("l_partkey").alias("s_pk"),
        F.col("l_shipdate").alias("s_sd"),
    )
    chained = ret.join(
        later,
        (ret.o_custkey == later.s_ck)
        & (ret.l_partkey == later.s_pk)
        & (later.s_sd > ret.l_shipdate),
        "left_semi",
    )
    return (
        chained.join(F.broadcast(p), chained.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_chains"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        )
        .filter(F.col("n_chains") > 1)
        .orderBy("p_brand")
    )


@query(
    "ds_q54_anchor_window_revenue",
    oracle="""
    WITH first_buy AS (
      SELECT o_custkey, MIN(o_orderdate) AS anchor
      FROM orders GROUP BY o_custkey),
    rev AS (
      SELECT o.o_custkey,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS amt
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN first_buy f ON o.o_custkey = f.o_custkey
      WHERE o.o_orderdate > f.anchor
        AND o.o_orderdate <= f.anchor + INTERVAL 30 DAY
      GROUP BY o.o_custkey),
    banded AS (
      SELECT CAST(FLOOR(amt / 5000) AS BIGINT) AS revenue_band,
             CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM rev GROUP BY 1)
    SELECT revenue_band, n_customers FROM banded ORDER BY revenue_band
    """,
    tags=("batch", "tpcds", "anchor", "histogram"),
)
def ds_q54_anchor_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q54 shape: revenue inside a PER-CUSTOMER time window anchored
    at their first purchase (the month after first contact in DS), then a
    revenue-band histogram. The anchor is a per-key MIN aggregate joined
    back to the fact with a derived-interval predicate — a self-referential
    temporal correlation, not a fixed date filter."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    first_buy = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("anchor"))
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(first_buy.withColumnRenamed("o_custkey", "f_ck"),
              F.col("o_custkey") == F.col("f_ck"))
        .filter(
            (F.col("o_orderdate") > F.col("anchor"))
            & (F.col("o_orderdate") <= F.date_add(F.col("anchor"), 30))
        )
        .groupBy("o_custkey")
        .agg(F.sum(_rev()).alias("amt"))
    )
    return (
        rev.groupBy(F.floor(F.col("amt") / 5000).alias("revenue_band"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("revenue_band")
    )


@query(
    "ds_q72_date_offset_join",
    oracle="""
    WITH ship AS (
      SELECT l_suppkey, CAST(l_shipdate AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS shipped
      FROM lineitem GROUP BY 1, 2),
    wk_later AS (
      SELECT l_suppkey, CAST(l_shipdate AS DATE) - 7 AS d,
             CAST(COUNT(*) AS BIGINT) AS shipped_next_wk
      FROM lineitem GROUP BY 1, 2)
    SELECT s.l_suppkey, s.d AS ship_date, s.shipped, w.shipped_next_wk
    FROM ship s JOIN wk_later w
      ON s.l_suppkey = w.l_suppkey AND s.d = w.d
    WHERE s.shipped >= 2 AND w.shipped_next_wk >= 2
    ORDER BY s.l_suppkey, ship_date
    """,
    tags=("batch", "tpcds", "date-offset", "join"),
)
def ds_q72_date_offset_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q72 shape: the DATE-OFFSET equi-join — activity on day d
    joined to activity exactly one week later (inventory_week_later in DS)
    by shifting one side's date column before the join key. Both sides
    pre-aggregate to (supplier, day) grain so the offset join touches the
    reduced series."""
    li = load(spark, sf_dir, "lineitem")
    ship = li.groupBy(
        "l_suppkey", F.col("l_shipdate").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("shipped"))
    wk_later = li.groupBy(
        "l_suppkey",
        F.date_sub(F.col("l_shipdate").cast("date"), 7).alias("d"),
    ).agg(F.count(F.lit(1)).alias("shipped_next_wk"))
    return (
        ship.join(
            wk_later.withColumnRenamed("l_suppkey", "w_sk"),
            (ship.l_suppkey == F.col("w_sk")) & (ship.d == wk_later.d),
        )
        .filter((F.col("shipped") >= 2) & (F.col("shipped_next_wk") >= 2))
        .select(
            "l_suppkey",
            ship.d.alias("ship_date"),
            "shipped",
            "shipped_next_wk",
        )
        .orderBy("l_suppkey", "ship_date")
    )
