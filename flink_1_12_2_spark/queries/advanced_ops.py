"""Advanced operator queries: coGroup, flatAggregate, CUMULATE window,
changelog/_row_kind normalization (+ streaming upsert sink), iterations."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_12_2_spark.operators.advanced import (
    cogroup_apply,
    cumulate_window,
    flat_aggregate,
    iterate,
)
from flink_1_12_2_spark.operators.changelog import (
    DELETE,
    INSERT,
    ROW_KIND,
    UPDATE_AFTER,
    changelog_normalize,
    snapshot_diff,
    upsert_foreach_batch,
)
from flink_1_12_2_spark.registry import load, query


@query(
    "cogroup_nation_balance",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust,
                      MAX(c_acctbal) AS max_cust_bal
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp,
                      MAX(s_acctbal) AS max_supp_bal
               FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_customers,
           CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_suppliers,
           COALESCE(max_cust_bal, -1.0) AS max_customer_bal,
           COALESCE(max_supp_bal, -1.0) AS max_supplier_bal
    FROM c FULL JOIN s ON c.nk = s.nk
    ORDER BY nationkey
    """,
    tags=("batch", "cogroup"),
)
def cogroup_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coGroup customers × suppliers per nation (CoGroupedStreams /
    DataSet.coGroup parity): both sides arrive grouped, no join explosion."""

    def fn(key, cust: pd.DataFrame, supp: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "nationkey": [int(key[0])],
                "n_customers": [len(cust)],
                "n_suppliers": [len(supp)],
                "max_customer_bal": [
                    float(cust["c_acctbal"].max()) if len(cust) else -1.0
                ],
                "max_supplier_bal": [
                    float(supp["s_acctbal"].max()) if len(supp) else -1.0
                ],
            }
        )

    c = load(spark, sf_dir, "customer").select("c_nationkey", "c_acctbal")
    s = load(spark, sf_dir, "supplier").select("s_nationkey", "s_acctbal")
    out = cogroup_apply(
        c,
        s,
        ["c_nationkey"],
        ["s_nationkey"],
        fn,
        "nationkey bigint, n_customers bigint, n_suppliers bigint, "
        "max_customer_bal double, max_supplier_bal double",
    )
    return out.orderBy("nationkey")


@query(
    "flat_aggregate_top2",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC,
                                         l_orderkey, l_linenumber) AS rn
      FROM lineitem)
    SELECT l_returnflag, 'top' || rn AS kind, l_extendedprice AS amount
    FROM ranked WHERE rn <= 2
    UNION ALL
    SELECT l_returnflag, 'total' AS kind,
           CAST(SUM(l_extendedprice) AS DOUBLE) AS amount
    FROM lineitem GROUP BY l_returnflag
    ORDER BY l_returnflag, kind
    """,
    tags=("batch", "agg", "tableagg"),
)
def flat_aggregate_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table aggregate (flatAggregate, GroupTableAggFunction.java): one group
    in → multiple rows out (top-2 prices + a total row per flag)."""

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        top = pdf.sort_values(
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True],
        ).head(2)
        rows = [
            (key[0], f"top{i + 1}", float(v))
            for i, v in enumerate(top["l_extendedprice"])
        ]
        rows.append((key[0], "total", float(pdf["l_extendedprice"].sum())))
        return pd.DataFrame(rows, columns=["l_returnflag", "kind", "amount"])

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    out = flat_aggregate(
        li, ["l_returnflag"], fn, "l_returnflag string, kind string, amount double"
    )
    return out.orderBy("l_returnflag", "kind")


@query(
    "window_cumulate",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    base AS (
      -- integer seconds via floor division (Spark truncates; CAST(double)
      -- in DuckDB would round)
      SELECT value, epoch_us(ts) // 1000000 AS ts_s,
             (epoch_us(ts) // 1000000) - ((epoch_us(ts) // 1000000) % 7200)
               AS ws
      FROM ev),
    expanded AS (
      SELECT value, ws, we
      FROM base, unnest(generate_series(ws + 1800, ws + 7200, 1800)) AS u(we)
      WHERE we > ts_s)
    SELECT to_timestamp(ws)::TIMESTAMP AS win_start,
           to_timestamp(we)::TIMESTAMP AS win_end,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(value) AS DOUBLE) AS total_value
    FROM expanded GROUP BY ws, we ORDER BY win_start, win_end
    """,
    tags=("batch", "window", "cumulate"),
)
def window_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATE window (CumulativeWindowAssigner.java:37): 2h max size growing
    in 30-min steps — explode over window ends + hash agg, no custom state."""
    ev = load(spark, sf_dir, "events")
    w = cumulate_window(ev, "ts", step_seconds=1800, size_seconds=7200)
    return (
        w.groupBy("win_start", "win_end")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
        .orderBy("win_start", "win_end")
    )


def _events_as_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events → synthetic changelog: per user ordered by time, first event is
    +I, later ones +U; 'error' events act as -D (account closed)."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    return ev.select(
        F.when(F.col("event_type") == "error", F.lit(DELETE))
        .when(rn == 1, F.lit(INSERT))
        .otherwise(F.lit(UPDATE_AFTER))
        .alias(ROW_KIND),
        "user_id",
        "event_id",
        "ts",
        "value",
    )


@query(
    "changelog_normalize_batch",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    last AS (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev)
    SELECT user_id, CAST(event_id AS BIGINT) AS event_id, value
    FROM last WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """,
    tags=("batch", "changelog"),
)
def changelog_normalize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChangelogNormalize (StreamExecChangelogNormalize.scala:46): collapse a
    +I/+U/-D changelog to current state by PK; trailing -D evicts the key."""
    cl = _events_as_changelog(spark, sf_dir)
    out = changelog_normalize(cl, ["user_id"], ["ts", "event_id"])
    return out.select("user_id", "event_id", "value").orderBy("user_id")


@query(
    "changelog_snapshot_diff",
    oracle="""
    WITH old AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 <> 0),
    new AS (SELECT c_custkey,
                   CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0
                        ELSE c_acctbal END AS c_acctbal
            FROM customer WHERE c_custkey % 3 <> 1)
    SELECT kind, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      SELECT CASE WHEN o.c_custkey IS NULL THEN '+I'
                  WHEN n.c_custkey IS NULL THEN '-D'
                  ELSE '+U' END AS kind
      FROM old o FULL JOIN new n ON o.c_custkey = n.c_custkey
      WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
            OR o.c_acctbal <> n.c_acctbal)
    GROUP BY kind ORDER BY kind
    """,
    tags=("batch", "changelog"),
)
def changelog_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff → changelog (+I/-U/+U/-D), the foreachBatch incremental-
    merge building block. Output: change-kind histogram (note -U count always
    equals +U count by construction, so the oracle checks +U only)."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    old = c.filter(F.col("c_custkey") % 3 != 0)
    new = c.filter(F.col("c_custkey") % 3 != 1).withColumn(
        "c_acctbal",
        F.when(F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 100.0).otherwise(
            F.col("c_acctbal")
        ),
    )
    diff = snapshot_diff(old, new, ["c_custkey"])
    return (
        diff.filter(F.col(ROW_KIND) != "-U")
        .groupBy(F.col(ROW_KIND).alias("kind"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("kind")
    )


@query(
    "stream_changelog_upsert",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    last AS (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev)
    SELECT user_id, CAST(event_id AS BIGINT) AS event_id, value
    FROM last WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """,
    tags=("streaming", "changelog", "upsert"),
)
def stream_changelog_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert sink via foreachBatch MERGE (upsert-kafka parity): the streamed
    changelog is merged per micro-batch into a keyed parquet state table."""
    import uuid

    from flink_1_12_2_spark.streaming.core import stream_events

    ev = stream_events(spark, sf_dir)
    from pyspark.sql import Window as W2

    # per-batch changelog derivation happens inside foreachBatch via the
    # unified upsert merge; here we pre-tag kinds from event semantics
    cl = ev.select(
        F.when(F.col("event_type") == "error", F.lit(DELETE))
        .otherwise(F.lit(UPDATE_AFTER))
        .alias(ROW_KIND),
        "user_id",
        "event_id",
        F.col("ts_us").alias("ts_key"),
        "value",
    )
    state_dir = os.path.join(
        tempfile.gettempdir(), "upsert_state_" + uuid.uuid4().hex[:10]
    )
    ckpt = tempfile.mkdtemp(prefix="upsert_ckpt_")
    q = (
        cl.writeStream.foreachBatch(
            upsert_foreach_batch(state_dir, ["user_id"], ["ts_key", "event_id"])
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return (
        spark.read.parquet(state_dir)
        .select("user_id", "event_id", "value")
        .orderBy("user_id")
    )


@query(
    "iterate_connected_components",
    oracle="""
    SELECT n.n_nationkey AS nationkey,
           CAST(MIN(n2.n_nationkey) AS BIGINT) AS component
    FROM nation n JOIN nation n2 ON n.n_regionkey = n2.n_regionkey
    GROUP BY n.n_nationkey ORDER BY nationkey
    """,
    tags=("batch", "iteration", "graph"),
)
def iterate_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk iteration (DataSet.iterate parity): label-propagation connected
    components over a path graph of nations chained within each region —
    needs multiple supersteps to converge; ground truth = min key per region."""
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    from pyspark.sql import Window as W3

    w = W3.partitionBy("n_regionkey").orderBy("n_nationkey")
    chained = n.withColumn("next_key", F.lead("n_nationkey").over(w))
    edges_dir = chained.filter(F.col("next_key").isNotNull()).select(
        F.col("n_nationkey").alias("src"), F.col("next_key").alias("dst")
    )
    edges = edges_dir.union(
        edges_dir.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()

    labels0 = n.select(
        F.col("n_nationkey").alias("vid"), F.col("n_nationkey").alias("component")
    )

    def step(labels: DataFrame) -> DataFrame:
        neighbor_min = (
            edges.join(labels, edges.src == labels.vid)
            .groupBy(F.col("dst").alias("vid2"))
            .agg(F.min("component").alias("nbr_min"))
        )
        return (
            labels.join(neighbor_min, labels.vid == F.col("vid2"), "left")
            .select(
                "vid",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
        )

    def converged(prev: DataFrame, cur: DataFrame) -> bool:
        return (
            prev.alias("p")
            .join(cur.alias("c"), F.col("p.vid") == F.col("c.vid"))
            .filter(F.col("p.component") != F.col("c.component"))
            .limit(1)
            .count()
            == 0
        )

    final = iterate(labels0, step, max_iterations=15, converged=converged)
    return final.select(
        F.col("vid").alias("nationkey"), "component"
    ).orderBy("nationkey")


@query(
    "window_count_tumbling",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    r AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
               AS rn
      FROM ev)
    SELECT user_id, CAST(rn // 5 AS BIGINT) AS win_id,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(value) AS DOUBLE) AS total_value
    FROM r GROUP BY user_id, rn // 5 ORDER BY user_id, win_id
    """,
    tags=("batch", "window", "count"),
)
def window_count_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT window: tumbling windows of 5 events per user in event-time
    order (DataStream countWindow parity — no SS equivalent)."""
    from flink_1_12_2_spark.operators.advanced import count_window

    ev = load(spark, sf_dir, "events")
    w = count_window(ev, ["user_id"], ["ts", "event_id"], size=5)
    return (
        w.groupBy("user_id", "win_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
        .orderBy("user_id", "win_id")
    )


@query(
    "late_data_side_output",
    oracle="""
    WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
    -- deterministic disordered replay: arrival order = md5(event_id)
    t AS (
      SELECT event_type, epoch_us(ts) // 1000000 AS ts_s,
             MAX(epoch_us(ts) // 1000000) OVER (
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM ev)
    SELECT event_type,
           CAST(SUM(CASE WHEN prev_max IS NOT NULL AND ts_s < prev_max - 600
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_rows,
           CAST(COUNT(*) AS BIGINT) AS total_rows
    FROM t GROUP BY event_type ORDER BY event_type
    """,
    tags=("batch", "streaming", "lateness"),
)
def late_data_side_output(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data side output (sideOutputLateData parity): rows below the
    running watermark (10-min delay) are tagged and counted per type — the
    side-output stream Flink exposes and SS drops. Arrival order is a
    deterministic shuffle (md5 of event_id) so the replay genuinely contains
    late rows; the generated events are otherwise time-ordered."""
    from flink_1_12_2_spark.operators.advanced import tag_late_rows

    ev = load(spark, sf_dir, "events").withColumn(
        "arrival", F.concat(F.md5(F.col("event_id").cast("string")),
                            F.lpad(F.col("event_id").cast("string"), 12, "0"))
    )
    tagged = tag_late_rows(ev, "ts", "arrival", delay_seconds=600)
    return (
        tagged.groupBy("event_type")
        .agg(
            F.sum(F.col("is_late").cast("int")).cast("bigint").alias("late_rows"),
            F.count(F.lit(1)).alias("total_rows"),
        )
        .orderBy("event_type")
    )


def _pagerank_oracle(num_iter: int = 10, damping: float = 0.85) -> str:
    """Unrolled-iteration PageRank in DuckDB SQL (recursive CTEs can't
    aggregate in the recursive term, so each superstep is its own CTE —
    generated, like the minhash oracle)."""
    steps = []
    prev = "r0"
    for i in range(1, num_iter + 1):
        steps.append(
            f"""r{i} AS (
              SELECT n.node,
                     (1.0 - {damping})/(SELECT n FROM nn)
                     + {damping} * COALESCE(s.s, 0.0) AS rank
              FROM nodes n LEFT JOIN (
                SELECT e.dst AS node, SUM(p.rank / d.deg) AS s
                FROM edges e
                JOIN {prev} p ON e.src = p.node
                JOIN deg d ON e.src = d.src
                GROUP BY e.dst) s ON n.node = s.node)"""
        )
        prev = f"r{i}"
    body = ",\n    ".join(steps)
    return f"""
    WITH edges AS (
      SELECT 'c' || c_custkey AS src, 'n' || c_nationkey AS dst FROM customer
      UNION ALL
      SELECT 's' || s_suppkey, 'n' || s_nationkey FROM supplier
      UNION ALL
      SELECT 'n' || n_nationkey, 'r' || n_regionkey FROM nation),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS rank FROM nodes),
    {body}
    SELECT node, CAST(ROUND(rank * 1000000, 0) AS BIGINT) AS rank_ppm
    FROM {prev} ORDER BY node
    """


@query(
    "iterate_pagerank",
    oracle=_pagerank_oracle(),
    tags=("batch", "iteration", "graph", "pagerank"),
)
def iterate_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (10 supersteps, d=0.85) over the customer→nation,
    supplier→nation, nation→region entity graph — bulk-iteration parity
    (DataSet.iterate / Gelly). Ranks quantized to integer ppm so the
    cross-engine hash is float-noise-proof."""
    from flink_1_12_2_spark.operators.advanced import pagerank

    c = load(spark, sf_dir, "customer").select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("n"), F.col("c_nationkey")).alias("dst"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s"), F.col("s_suppkey")).alias("src"),
        F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
    )
    nt = load(spark, sf_dir, "nation").select(
        F.concat(F.lit("n"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("r"), F.col("n_regionkey")).alias("dst"),
    )
    ranks = pagerank(c.union(s).union(nt), num_iterations=10, damping=0.85)
    return ranks.select(
        "node",
        F.round(F.col("rank") * 1_000_000, 0).cast("bigint").alias("rank_ppm"),
    ).orderBy("node")
