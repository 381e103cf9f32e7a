"""Gelly graph-library queries: degrees, delta-iteration SSSP
(flink-gelly Graph.java:85, library/SingleSourceShortestPaths.java)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from flink_1_12_2_spark.graph import Graph
from flink_1_12_2_spark.registry import load, query


@query(
    "graph_degrees",
    oracle="""
    WITH e AS (
      SELECT 'c' || c_custkey AS src, 'n' || c_nationkey AS dst FROM customer
      UNION ALL SELECT 's' || s_suppkey, 'n' || s_nationkey FROM supplier
      UNION ALL SELECT 'n' || n_nationkey, 'r' || n_regionkey FROM nation
    ),
    ends AS (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)
    SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
    FROM ends GROUP BY id ORDER BY id
    """,
    tags=("batch", "graph", "gelly"),
)
def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph.getDegrees over the customer/supplier—nation—region entity
    graph (vertex set derived from edges, so every vertex has degree ≥ 1
    and the oracle is a plain endpoint count)."""
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
    g = Graph.from_edges(c.union(s).union(nt))
    return g.degrees().orderBy("id")


@query(
    "graph_sssp_delta",
    oracle="""
    WITH ordered AS (
      SELECT n_nationkey, ROW_NUMBER() OVER (ORDER BY n_name) AS pos
      FROM nation WHERE n_regionkey = 0
    ),
    hop AS (
      SELECT b.pos,
             CAST(((a.n_nationkey + b.n_nationkey) % 5) + 1 AS DOUBLE) AS wt
      FROM ordered a JOIN ordered b ON b.pos = a.pos + 1
    )
    SELECT o.n_nationkey AS node,
           CAST(COALESCE(
             (SELECT SUM(h.wt) FROM hop h WHERE h.pos <= o.pos), 0
           ) AS DOUBLE) AS dist
    FROM ordered o ORDER BY node
    """,
    tags=("batch", "graph", "gelly", "iteration", "sssp"),
)
def graph_sssp_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source shortest paths by DELTA iteration (Gelly
    library/SingleSourceShortestPaths.java): region-0 nations chained by
    name order into an undirected weighted path, source = min-name nation.
    The path graph makes the ground truth a prefix sum of hop weights
    (exactly one simple path to each vertex) while the engine genuinely
    runs Bellman-Ford relaxation supersteps until the workset drains."""
    n0 = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    w = Window.orderBy("n_name")
    chained = n0.select("n_nationkey", "n_name").withColumn(
        "nxt", F.lead("n_nationkey").over(w)
    )
    hops = chained.filter(F.col("nxt").isNotNull()).select(
        F.col("n_nationkey").alias("src"),
        F.col("nxt").alias("dst"),
        (((F.col("n_nationkey") + F.col("nxt")) % 5) + 1)
        .cast("double")
        .alias("weight"),
    )
    g = Graph.from_edges(hops).get_undirected()
    source = chained.orderBy("n_name").select("n_nationkey").first()[0]
    return (
        g.run_sssp(source, max_iterations=10)
        .select(F.col("node"), F.col("dist"))
        .orderBy("node")
    )
