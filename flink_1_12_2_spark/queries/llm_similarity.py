"""Similarity-search queries over ``embeddings`` — brute-force cosine top-k
and LSH-bucketed ANN (BASELINE.json north-star operators)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_1_12_2_spark.llm import similarity as S
from flink_1_12_2_spark.registry import load, query

QUERY_IDS = list(range(10))
K = 5

_NORM_CTE = """
    n AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))) AS v
      FROM embeddings)
"""


@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH {_NORM_CTE},
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.v, c.v), 6) AS cosine
      FROM n q JOIN n c ON q.vec_id <> c.vec_id
      WHERE q.vec_id <= {max(QUERY_IDS)}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {K} ORDER BY query_id, rank
    """,
    tags=("llm", "similarity", "ann", "headline"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k for 10 query vectors (ANN baseline)."""
    e = load(spark, sf_dir, "embeddings")
    out = S.ann_bruteforce_topk(e, "vec_id", "embedding", QUERY_IDS, K)
    return out.withColumn("rank", out["rank"].cast("int")).orderBy(
        "query_id", "rank"
    )


def _lsh_oracle() -> str:
    planes = S.lsh_planes()
    bucket_expr = " + ".join(
        "CASE WHEN list_dot_product(v, ["
        + ", ".join(f"{c!r}" for c in plane)
        + f"]) >= 0 THEN {1 << p} ELSE 0 END"
        for p, plane in enumerate(planes)
    )
    return f"""
    WITH {_NORM_CTE},
    b AS (SELECT vec_id, v, ({bucket_expr}) AS bucket FROM n),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.v, c.v), 6) AS cosine
      FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE q.vec_id <= {max(QUERY_IDS)}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {K} ORDER BY query_id, rank
    """


@query("ann_lsh_topk", oracle=_lsh_oracle(), tags=("llm", "similarity", "ann", "lsh"))
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN top-k: candidates restricted to the query's bucket
    (8 deterministic md5-derived planes — oracle reproduces buckets exactly)."""
    e = load(spark, sf_dir, "embeddings")
    out = S.ann_lsh_topk(e, "vec_id", "embedding", QUERY_IDS, K)
    return out.withColumn("rank", out["rank"].cast("int")).orderBy(
        "query_id", "rank"
    )
