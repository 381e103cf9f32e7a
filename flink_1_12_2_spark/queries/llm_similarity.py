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


_IVF_ORACLE = f"""
    WITH {_NORM_CTE},
    cents AS (
      SELECT vec_id AS cent_id, v AS cvec FROM n
      WHERE vec_id < {S.NUM_CENTROIDS}),
    assigned AS (
      SELECT vec_id, cell, v FROM (
        SELECT n.vec_id, c.cent_id AS cell, n.v,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                 ORDER BY ROUND(list_dot_product(n.v, c.cvec), 6) DESC,
                          c.cent_id) AS crank
        FROM n CROSS JOIN cents c)
      WHERE crank = 1),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, c.cent_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                 ORDER BY ROUND(list_dot_product(q.v, c.cvec), 6) DESC,
                          c.cent_id) AS crank
        FROM n q CROSS JOIN cents c
        WHERE q.vec_id <= {max(QUERY_IDS)})
      WHERE crank <= {S.NPROBE}),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             ROUND(list_dot_product(p.qv, a.v), 6) AS cosine
      FROM probes p JOIN assigned a
        ON a.cell = p.cell AND a.vec_id <> p.query_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {K} ORDER BY query_id, rank
    """


@query("ann_ivf_topk", oracle=_IVF_ORACLE, tags=("llm", "similarity", "ann", "ivf"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k: nearest-centroid cell assignment (deterministic
    lowest-id centroids standing in for k-means|| init), queries probe their
    2 nearest cells. The inverted-file join replaces the cross product —
    shuffle on cell id only; oracle reproduces assignment + probing exactly."""
    e = load(spark, sf_dir, "embeddings")
    out = S.ann_ivf_topk(e, "vec_id", "embedding", QUERY_IDS, K)
    return out.withColumn("rank", out["rank"].cast("int")).orderBy(
        "query_id", "rank"
    )


_PQ_W = S.DIM // S.PQ_M  # 16 dims per subspace

_PQ_ORACLE = f"""
    WITH {_NORM_CTE},
    sub AS (
      SELECT vec_id, CAST(r.range AS INT) AS s,
             v[(r.range * {_PQ_W} + 1):((r.range + 1) * {_PQ_W})] AS sv
      FROM n CROSS JOIN range({S.PQ_M}) r),
    cb AS (
      SELECT vec_id AS j, s, sv AS cv FROM sub WHERE vec_id < {S.PQ_K}),
    enc AS (
      SELECT vec_id AS neighbor_id, s, j FROM (
        SELECT c.vec_id, c.s, cb.j,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id, c.s
                 ORDER BY ROUND(list_sum(list_transform(list_zip(c.sv, cb.cv),
                            x -> (x[1] - x[2]) * (x[1] - x[2]))), 6),
                          cb.j) AS rn
        FROM sub c JOIN cb ON cb.s = c.s)
      WHERE rn = 1),
    lut AS (
      SELECT q.vec_id AS query_id, q.s, cb.j,
             CAST(ROUND(list_sum(list_transform(list_zip(q.sv, cb.cv),
                      x -> (x[1] - x[2]) * (x[1] - x[2]))) * 1000000.0)
                  AS BIGINT) AS term_micro
      FROM sub q JOIN cb ON cb.s = q.s
      WHERE q.vec_id <= {max(QUERY_IDS)}),
    scored AS (
      SELECT l.query_id, e.neighbor_id,
             CAST(SUM(l.term_micro) AS BIGINT) AS adc_dist_micro
      FROM enc e JOIN lut l ON l.s = e.s AND l.j = e.j
      WHERE l.query_id <> e.neighbor_id
      GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_dist_micro, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, adc_dist_micro, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {K} ORDER BY query_id, rank
    """


@query("ann_pq_topk", oracle=_PQ_ORACLE, tags=("llm", "similarity", "ann", "pq"))
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN top-k: the corpus compresses to 4 codes
    per vector (vs 64 floats — the 100-TB memory-compression scale path);
    queries score via an in-engine ADC lookup table broadcast onto the
    unpivoted code stream. Codebooks are the deterministic lowest-id
    vectors (the same k-means-init stand-in policy as ann_ivf_topk), so
    the DuckDB oracle reproduces codes, LUT terms, and ranking exactly."""
    e = load(spark, sf_dir, "embeddings")
    out = S.ann_pq_topk(e, "vec_id", "embedding", QUERY_IDS, K)
    return out.withColumn("rank", out["rank"].cast("int")).orderBy(
        "query_id", "rank"
    )
