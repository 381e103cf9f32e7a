"""DataSet API facade queries: WordCount, delta-iteration connected
components, grouped minBy — the reference's legacy batch surface
(flink-java/.../DataSet.java) expressed through :mod:`flink_1_12_2_spark.dataset`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_12_2_spark.dataset import DataSet, ExecutionEnvironment
from flink_1_12_2_spark.registry import load, query


@query(
    "dataset_wordcount",
    oracle="""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    """,
    tags=("batch", "dataset-api", "wordcount"),
)
def dataset_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical Flink batch example (flink-examples-batch
    .../wordcount/WordCount.java: flatMap tokenizer → groupBy(0) → sum(1))
    via the DataSet facade. Tokenization is a JVM-side split+explode —
    no Python in the hot path; the plan is scan → generate → partial
    agg → shuffle → final agg, identical to a hand-written DataFrame."""
    env = ExecutionEnvironment(spark)
    docs = env.from_dataframe(load(spark, sf_dir, "documents"))
    return (
        docs.flat_map(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), "word")
        .filter(F.col("word") != "")
        .group_by("word")
        .aggregate(F.count(F.lit(1)).alias("cnt"))
        .df.orderBy(F.col("cnt").desc(), "word")
    )


@query(
    "dataset_delta_cc",
    oracle="""
    WITH nodes AS (
      SELECT 'c' || c_custkey AS id, n_regionkey AS r
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      UNION ALL
      SELECT 's' || s_suppkey, n_regionkey
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      UNION ALL SELECT 'n' || n_nationkey, n_regionkey FROM nation
      UNION ALL SELECT DISTINCT 'r' || n_regionkey, n_regionkey FROM nation
    ),
    comp AS (SELECT r, MIN(id) AS component FROM nodes GROUP BY r)
    SELECT id AS node, component FROM nodes JOIN comp USING (r)
    ORDER BY node
    """,
    tags=("batch", "dataset-api", "iteration", "graph"),
)
def dataset_delta_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by DELTA iteration — the exact algorithm of
    flink-examples-batch .../graph/ConnectedComponents.java
    (DataSet.iterateDelta, DataSet.java:1234): workset = vertices whose
    component label changed last superstep; converges when the workset is
    empty. Entity graph: customer—nation—supplier—region (one component
    per region; ground truth = lexicographic-min node id per region)."""
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
    edges_dir = c.union(s).union(nt)
    edges = edges_dir.union(
        edges_dir.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()

    vertices = (
        edges.select(F.col("src").alias("node")).distinct()
        .select("node", F.col("node").alias("component"))
    )

    def step(solution: DataFrame, workset: DataFrame):
        candidates = (
            edges.join(workset, edges.src == workset.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("cand"))
        )
        delta = (
            solution.join(candidates, "node")
            .filter(F.col("cand") < F.col("component"))
            .select("node", F.col("cand").alias("component"))
        )
        return delta, delta

    result = DataSet(vertices).iterate_delta(
        DataSet(vertices), ["node"], step, max_iterations=10
    )
    return result.df.orderBy("node")


@query(
    "dataset_min_by",
    oracle="""
    SELECT c_nationkey AS nationkey, c_custkey AS custkey,
           c_acctbal AS acctbal
    FROM (SELECT c_nationkey, c_custkey, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal, c_custkey) AS rn
          FROM customer)
    WHERE rn = 1 ORDER BY nationkey
    """,
    tags=("batch", "dataset-api"),
)
def dataset_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped minBy (DataSet Grouping.minBy → whole-row argmin) with a
    deterministic key tie-break; lowers to one row_number window."""
    env = ExecutionEnvironment(spark)
    cust = env.from_dataframe(
        load(spark, sf_dir, "customer").select(
            "c_nationkey", "c_custkey", "c_acctbal"
        )
    )
    return (
        cust.group_by("c_nationkey")
        .min_by("c_acctbal", "c_custkey")
        .df.select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .orderBy("nationkey")
    )
