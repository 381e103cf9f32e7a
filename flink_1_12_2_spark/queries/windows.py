"""Over (analytic) windows, group windows (tumble/hop/session), interval join,
temporal as-of join — batch-verifiable forms.

Flink parity (SURVEY.md §2.5, §2.6, §2.3):
  - BufferDataOverWindowOperator + frames RT/over/frame/* → Window.rowsBetween/
    rangeBetween/lead/lag (native Catalyst WindowExec).
  - WindowOperator.java:93 (TUMBLE/HOP/SESSION group windows) → F.window /
    F.session_window expressions (batch form; streaming form in streaming/).
  - TimeIntervalJoin.java:53 → time-range-conditioned self join.
  - TemporalRowTimeJoinOperator.java:77 (FOR SYSTEM_TIME AS OF) → as-of join
    composed from join + max-per-key (batch), streaming variant in streaming/.

Scale notes: over-windows partition by key → one shuffle on the partition key;
frames evaluate within partitions (no extra shuffle). The interval join keys on
user_id first (equi shuffle) with the time predicate as residual — at 100 TB
the equi key bounds the join state, and AQE splits skewed users.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from flink_1_12_2_spark.operators.asof import asof_join
from flink_1_12_2_spark.registry import load, query


@query(
    "over_running_sum",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           CAST(SUM(s_acctbal) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_bal,
           CAST(COUNT(*) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS running_cnt
    FROM supplier ORDER BY s_nationkey, s_suppkey
    """,
    tags=("batch", "over"),
)
def over_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS UNBOUNDED PRECEDING frame (RowUnboundedPrecedingOverFrame parity)."""
    s = load(spark, sf_dir, "supplier")
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy("s_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.sum("s_acctbal").over(w).alias("running_bal"),
        F.count(F.lit(1)).over(w).alias("running_cnt"),
    ).orderBy("s_nationkey", "s_suppkey")


@query(
    "over_sliding_rows",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           CAST(AVG(s_acctbal) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS avg3
    FROM supplier ORDER BY s_nationkey, s_suppkey
    """,
    tags=("batch", "over"),
)
def over_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame (RowSlidingOverFrame parity)."""
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_suppkey").rowsBetween(-2, 0)
    return s.select(
        "s_suppkey", "s_nationkey", F.avg("s_acctbal").over(w).alias("avg3")
    ).orderBy("s_nationkey", "s_suppkey")


@query(
    "over_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS near_cheaper_orders
    FROM orders ORDER BY o_custkey, o_totalprice, o_orderkey
    """,
    tags=("batch", "over"),
)
def over_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with numeric bound (RangeSlidingOverFrame parity)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-1000, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("near_cheaper_orders"),
    ).orderBy("o_custkey", "o_totalprice", "o_orderkey")


@query(
    "over_lead_lag",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT user_id, event_id,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)  AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           value - COALESCE(LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0.0)
             AS delta
    FROM ev ORDER BY user_id, event_id
    """,
    tags=("batch", "over"),
)
def over_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD/LAG (OffsetOverFrame parity)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0))).alias("delta"),
    ).orderBy("user_id", "event_id")


@query(
    "over_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drnk,
           NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    ORDER BY c_mktsegment, rnk, c_custkey LIMIT 500
    """,
    tags=("batch", "over", "rank"),
)
def over_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK/DENSE_RANK/NTILE window functions (Flink aggfunctions Rank/DenseRank)."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("c_mktsegment", "rnk", "c_custkey")
        .limit(500)
    )


@query(
    "over_first_last_value",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           FIRST_VALUE(s_name) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest,
           LAST_VALUE(s_name) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest
    FROM supplier ORDER BY s_nationkey, s_suppkey
    """,
    tags=("batch", "over"),
)
def over_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE over full-partition frame (FirstValue/LastValue aggs)."""
    s = load(spark, sf_dir, "supplier")
    w = (
        Window.partitionBy("s_nationkey")
        .orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.first("s_name").over(w).alias("richest"),
        F.last("s_name").over(w).alias("poorest"),
    ).orderBy("s_nationkey", "s_suppkey")


# ---------------------------------------------------------------------------
# Group windows (TUMBLE / HOP / SESSION) — batch-verifiable forms
# ---------------------------------------------------------------------------


@query(
    "window_tumble",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(value) AS DOUBLE) AS total_value
    FROM ev
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("batch", "window", "tumble"),
)
def window_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUMBLE group window (TumblingWindowAssigner.java:34 parity) via F.window."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"), "event_type", "cnt", "total_value"
        )
        .orderBy("win_start", "event_type")
    )


@query(
    "window_hop",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    buckets AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS b, value FROM ev),
    wins AS (
      SELECT b AS win_start, value FROM buckets
      UNION ALL
      SELECT b - INTERVAL '30 minutes' AS win_start, value FROM buckets)
    SELECT win_start, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(value) AS DOUBLE) AS total_value
    FROM wins GROUP BY win_start ORDER BY win_start
    """,
    tags=("batch", "window", "hop"),
)
def window_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP (sliding) window, size 1h slide 30m (SlidingWindowAssigner.java:40).
    Each row lands in size/slide = 2 windows."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
        .select(F.col("win.start").alias("win_start"), "cnt", "total_value")
        .orderBy("win_start")
    )


@query(
    "interval_join",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT a.event_type AS left_type, b.event_type AS right_type,
           CAST(COUNT(*) AS BIGINT) AS pairs
    FROM ev a JOIN ev b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '5 minutes'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("batch", "join", "interval"),
)
def interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (TimeIntervalJoin.java:53): equi key + time-range residual.

    The probe side fans out across cores: the per-row range probe is the
    CPU-heavy stage here, and the driver testdata is one row group (an
    unsplittable scan). No-op at real scale (multi-file inputs)."""
    from flink_1_12_2_spark.llm.dedup import fan_out

    a = fan_out(load(spark, sf_dir, "events")).alias("a")
    b = load(spark, sf_dir, "events").alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .groupBy(
            F.col("a.event_type").alias("left_type"),
            F.col("b.event_type").alias("right_type"),
        )
        .agg(F.count(F.lit(1)).alias("pairs"))
        .orderBy("left_type", "right_type")
    )


@query(
    "asof_join_event_time",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT p.event_id, p.user_id, p.value AS purchase_value,
           (SELECT MAX(c.ts) FROM ev c
             WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts)
             AS last_click_ts
    FROM ev p WHERE p.event_type = 'purchase'
    ORDER BY p.event_id
    """,
    tags=("batch", "join", "temporal", "asof"),
)
def asof_join_event_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time as-of join (TemporalRowTimeJoinOperator.java:77 parity):
    each purchase joined to the latest click at-or-before its timestamp."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("c_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        left_key="user_id",
        right_key="c_user_id",
        left_time="ts",
        right_time="c_ts",
    )
    return joined.select(
        "event_id", "user_id", "purchase_value", F.col("c_ts").alias("last_click_ts")
    ).orderBy("event_id")


@query(
    "window_session_dynamic_gap",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    e AS (
      SELECT user_id, ts, value,
             CASE WHEN event_type = 'click' THEN INTERVAL 10 MINUTE
                  ELSE INTERVAL 30 MINUTE END AS gap
      FROM ev),
    m AS (
      SELECT *, MAX(ts + gap) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM e),
    s AS (
      -- boundary rule: a row AT exactly prev_end MERGES (touching
      -- windows merge — Spark session_window and Flink
      -- SessionWindowAssigner/TimeWindow.intersects agree; pinned in
      -- tests/test_oracle_parity.py) -> strict > starts a new session
      SELECT *, SUM(CASE WHEN prev_end IS NULL OR ts > prev_end
                         THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sess
      FROM m)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts + gap) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(value) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, sess
    ORDER BY user_id, session_start
    """,
    tags=("batch", "window", "session", "dynamic-gap"),
)
def window_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window with per-row dynamic gap (DataStream
    SessionWindowTimeGapExtractor parity — SURVEY §2.5 'Session + dynamic
    gap'): clicks keep the session alive 10 min, everything else 30 min.
    Pure ``F.session_window`` with a Column gap — the merge runs inside
    Spark's session aggregation (one shuffle on user_id); the oracle derives
    the same sessions via gaps-and-islands (running max of ts+gap)."""
    ev = load(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "click", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    out = (
        ev.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            F.round("total_value", 6).alias("total_value"),
        )
        .orderBy("user_id", "session_start")
    )
    return out


@query(
    "temporal_join_sql_front_door",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT p.event_id, p.user_id, p.value AS purchase_value,
           (SELECT MAX(c.ts) FROM ev c
             WHERE c.user_id = p.user_id AND c.event_type = 'click'
               AND c.ts <= p.ts) AS last_click_ts
    FROM ev p WHERE p.event_type = 'purchase'
    ORDER BY p.event_id
    """,
    tags=("batch", "temporal", "sql", "front-door"),
)
def temporal_join_sql_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOR SYSTEM_TIME AS OF through the SQL front door
    (StreamExecTemporalJoin.scala:56 SQL surface): the versioned dim's time
    attribute comes from the registry's WATERMARK metadata, the lowering is
    the union+window as-of operator (same plan as asof_join_event_time)."""
    from flink_1_12_2_spark.session import EngineSession, TableMeta

    ev = load(spark, sf_dir, "events")
    ev.filter(F.col("event_type") == "purchase").createOrReplaceTempView(
        "purchases_tj"
    )
    ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("version_ts")
    ).createOrReplaceTempView("clicks_tj")
    eng = EngineSession(spark)
    eng.register_view_meta(
        "clicks_tj",
        TableMeta(path="(view)", fmt="parquet", event_time_col="version_ts"),
    )
    return eng.sql(
        """SELECT f.event_id, f.user_id, f.value AS purchase_value,
                  d.version_ts AS last_click_ts
           FROM purchases_tj f
           JOIN clicks_tj FOR SYSTEM_TIME AS OF f.ts AS d
           ON f.user_id = d.user_id
           ORDER BY f.event_id"""
    )


@query(
    "window_count_evictor",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    b AS (SELECT *, time_bucket(INTERVAL '1 hour', ts) AS win_start FROM ev),
    r AS (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY user_id, win_start
              ORDER BY ts DESC, event_id DESC) AS rn
          FROM b)
    SELECT user_id, win_start,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(value) AS DOUBLE) AS total_value
    FROM r WHERE rn <= 3
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("batch", "window", "evictor"),
)
def window_count_evictor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountEvictor.of(3) on a tumbling 1h window (CountEvictor.java,
    evictBefore): only the last 3 buffered elements per (user, window) reach
    the aggregate. Pure window-function plan — one shuffle, no state."""
    from flink_1_12_2_spark.operators.evictors import count_evictor

    ev = load(spark, sf_dir, "events")
    ev = ev.withColumn("win", F.window("ts", "1 hour")).withColumn(
        "win_start", F.col("win.start")
    ).drop("win")
    kept = count_evictor(
        ev, ["user_id", "win_start"], ["ts", "event_id"], keep=3
    )
    return (
        kept.groupBy("user_id", "win_start")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
        .orderBy("user_id", "win_start")
    )


@query(
    "window_time_evictor",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    m AS (SELECT *, MAX(ts) OVER (PARTITION BY user_id) AS max_ts FROM ev)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS kept_cnt,
           CAST(SUM(value) AS DOUBLE) AS kept_sum
    FROM m WHERE ts >= max_ts - INTERVAL 6 HOUR
    GROUP BY user_id ORDER BY user_id
    """,
    tags=("batch", "window", "evictor"),
)
def window_time_evictor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimeEvictor.of(Time.hours(6)) on a per-user global window
    (TimeEvictor.java): keep only elements within 6h of the newest buffered
    element, then aggregate."""
    from flink_1_12_2_spark.operators.evictors import time_evictor

    ev = load(spark, sf_dir, "events")
    kept = time_evictor(ev, ["user_id"], "ts", keep_seconds=6 * 3600)
    return (
        kept.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("kept_cnt"), F.sum("value").alias("kept_sum"))
        .orderBy("user_id")
    )


@query(
    "window_delta_evictor",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    l AS (SELECT *, FIRST_VALUE(value) OVER (
              PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS last_val
          FROM ev)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS kept_cnt,
           CAST(SUM(CAST(ROUND(value * 100) AS DECIMAL(18,0))) AS DOUBLE)
             / COUNT(*) / 100.0 AS kept_avg
    FROM l WHERE ABS(value - last_val) < 25.0
    GROUP BY user_id ORDER BY user_id
    """,
    tags=("batch", "window", "evictor"),
)
def window_delta_evictor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeltaEvictor.of(25.0, absDelta) on a per-user global window
    (DeltaEvictor.java): evict elements whose delta vs the LAST buffered
    element is >= threshold, then aggregate the survivors.

    ``kept_avg`` averages via exact cents (events.value is 2dp-quantized):
    a plain double AVG over ~300 survivors carries enough summation-order
    noise to straddle a .005 canonical-rounding boundary across engines —
    observed at sf0.1 (user 1336: 20.295 rounding 20.30 vs 20.29)."""
    from flink_1_12_2_spark.operators.evictors import delta_evictor

    ev = load(spark, sf_dir, "events")
    kept = delta_evictor(
        ev, ["user_id"], ["ts", "event_id"], "value", threshold=25.0
    )
    cents = F.round(F.col("value") * 100).cast("decimal(18,0)")
    return (
        kept.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("kept_cnt"),
            (F.sum(cents).cast("double") / F.count(F.lit(1)) / 100.0).alias(
                "kept_avg"
            ),
        )
        .orderBy("user_id")
    )


@query(
    "window_delta_trigger",
    oracle="""
    WITH RECURSIVE ev AS (
      SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    o AS (SELECT user_id, event_id, value, ROW_NUMBER() OVER (
              PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM ev),
    scan AS (
      SELECT user_id, rn, value AS anchor, FALSE AS fired, event_id, value
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.rn,
             CASE WHEN ABS(o.value - s.anchor) > 40.0
                  THEN o.value ELSE s.anchor END AS anchor,
             ABS(o.value - s.anchor) > 40.0 AS fired,
             o.event_id, o.value
      FROM scan s JOIN o ON o.user_id = s.user_id AND o.rn = s.rn + 1
    )
    SELECT user_id, event_id, CAST(value AS DOUBLE) AS value
    FROM scan WHERE fired ORDER BY user_id, event_id
    """,
    tags=("batch", "trigger", "stateful"),
)
def window_delta_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeltaTrigger.onElement FIRE points (DeltaTrigger.java): anchor-reset
    scan per user — fires when |value - last_fired_value| > 40, the firing
    element becomes the new anchor. Sequential per key, so Arrow-batched
    applyInPandas; the DuckDB oracle replays the same scan as a recursive
    CTE."""
    from flink_1_12_2_spark.operators.evictors import delta_trigger_fires

    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    fired = delta_trigger_fires(
        ev, ["user_id"], ["ts", "event_id"], "value", threshold=40.0
    )
    return fired.select("user_id", "event_id", "value").orderBy(
        "user_id", "event_id"
    )


@query(
    "window_tumble_offset",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
    SELECT time_bucket(INTERVAL '1 hour', ts, INTERVAL '15 minutes')
             AS win_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(value) AS DOUBLE) AS total_value
    FROM ev GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("batch", "window", "tumble", "offset"),
)
def window_tumble_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUMBLE with alignment offset (TumblingEventTimeWindows.of(size,
    offset) -- the timezone-aligned daily-window use case): Spark's
    startTime parameter is the identical epoch-relative shift."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "1 hour", "15 minutes").alias("win"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"), "event_type", "cnt", "total_value"
        )
        .orderBy("win_start", "event_type")
    )
