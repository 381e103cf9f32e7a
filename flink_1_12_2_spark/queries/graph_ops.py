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


@query(
    "graph_label_propagation",
    oracle="""
    SELECT n_nationkey AS node,
           MAX(n_nationkey) OVER (PARTITION BY n_regionkey) AS label
    FROM nation ORDER BY node
    """,
    tags=("batch", "graph", "gelly", "iteration"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Gelly
    library/LabelPropagation.java: neighbor label frequencies seeded
    with the vertex's own label at 1, winner by strictly greater count
    then strictly GREATER label — the r9-advice comparator fix). Graph =
    the five region cliques (all nation pairs within a region BOTH ways
    — the propagator follows out-edges as-is, like the reference, so the
    clique is materialized symmetric), labels initialized to vertex ids.
    On a clique, seeded sync LP converges in ONE superstep to the
    clique's MAXIMUM id — every vertex's candidates are all five ids at
    frequency 1 and the greatest wins (the max vertex keeps its own) —
    so the oracle is the per-region max while the engine genuinely runs
    the message/count/top-1 supersteps (4 rounds, past convergence).
    Scale: superstep cost is one map-combinable (node, label) count
    shuffle — no all-pairs joins."""
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = n.select(
        F.col("n_nationkey").alias("src"), F.col("n_regionkey").alias("r")
    )
    b = n.select(
        F.col("n_nationkey").alias("dst"), F.col("n_regionkey").alias("r")
    )
    edges = a.join(b, "r").filter(F.col("src") != F.col("dst")).select(
        "src", "dst"
    )
    g = Graph(
        n.select(
            F.col("n_nationkey").alias("id"),
            F.col("n_nationkey").alias("label"),
        ),
        edges,
    )
    return g.run_label_propagation(iterations=4).orderBy("node")


@query(
    "graph_triangle_enum",
    oracle="""
    WITH base AS (
      SELECT DISTINCT c_custkey % 40 AS src,
             (c_custkey % 40 + 1) % 40 AS dst
      FROM customer
      UNION
      SELECT DISTINCT c_custkey % 40, (c_custkey % 40 + 2) % 40
      FROM customer
    ),
    canon AS (
      SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM base WHERE src <> dst
    )
    SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
    FROM canon e1
    JOIN canon e2 ON e2.a = e1.b
    JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
    ORDER BY v1, v2, v3
    """,
    tags=("batch", "graph", "gelly"),
)
def graph_triangle_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration (Gelly library/TriangleEnumerator.java —
    Schank–Wagner degree orientation: 2-paths fan out from each
    triangle's lowest-(degree, id) corner only, closing with one
    equi-join). Graph = the circulant C40(1,2) derived from customer key
    residues (each vertex i links to i+1 and i+2 mod 40), which contains
    exactly the 40 triangles {i, i+1, i+2}. The oracle enumerates
    canonical a<b<c edge triples by a three-way self-join — a shape
    DuckDB evaluates directly, while the engine path exercises the
    oriented pair-generation plan that bounds candidate volume by
    sum(min-degree²) on skewed graphs."""
    cust = load(spark, sf_dir, "customer")
    e1 = cust.select(
        (F.col("c_custkey") % 40).alias("src"),
        ((F.col("c_custkey") % 40 + 1) % 40).alias("dst"),
    )
    e2 = cust.select(
        (F.col("c_custkey") % 40).alias("src"),
        ((F.col("c_custkey") % 40 + 2) % 40).alias("dst"),
    )
    edges = e1.union(e2).distinct().filter(F.col("src") != F.col("dst"))
    g = Graph.from_edges(edges)
    return g.run_triangle_enumeration().orderBy("v1", "v2", "v3")


# shared DuckDB prelude for the similarity queries: the same C40(1,2)
# circulant as graph_triangle_enum, expanded to (v, n) adjacency + degrees
_SIM_DUCK_PRELUDE = """
    WITH base AS (
      SELECT DISTINCT c_custkey % 40 AS src,
             (c_custkey % 40 + 1) % 40 AS dst
      FROM customer
      UNION
      SELECT DISTINCT c_custkey % 40, (c_custkey % 40 + 2) % 40
      FROM customer
    ),
    adj AS (
      SELECT src AS v, dst AS n FROM base WHERE src <> dst
      UNION
      SELECT dst, src FROM base WHERE src <> dst
    ),
    deg AS (SELECT v, COUNT(*) AS deg FROM adj GROUP BY v),
    pairs AS (
      SELECT a.v AS v1, b.v AS v2, a.n
      FROM adj a JOIN adj b ON a.n = b.n AND a.v < b.v
    )"""


def _circulant_graph(spark: SparkSession, sf_dir: str) -> Graph:
    cust = load(spark, sf_dir, "customer")
    e1 = cust.select(
        (F.col("c_custkey") % 40).alias("src"),
        ((F.col("c_custkey") % 40 + 1) % 40).alias("dst"),
    )
    e2 = cust.select(
        (F.col("c_custkey") % 40).alias("src"),
        ((F.col("c_custkey") % 40 + 2) % 40).alias("dst"),
    )
    return Graph.from_edges(
        e1.union(e2).distinct().filter(F.col("src") != F.col("dst"))
    )


@query(
    "graph_jaccard_index",
    oracle=f"""{_SIM_DUCK_PRELUDE},
    shared AS (
      SELECT v1, v2, COUNT(*) AS shared_count FROM pairs GROUP BY v1, v2)
    SELECT s.v1, s.v2, s.shared_count,
           d1.deg + d2.deg - s.shared_count AS distinct_count
    FROM shared s
    JOIN deg d1 ON d1.v = s.v1
    JOIN deg d2 ON d2.v = s.v2
    ORDER BY v1, v2
    """,
    tags=("batch", "graph", "gelly", "similarity"),
)
def graph_jaccard_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood Jaccard similarity (Gelly library/similarity/
    JaccardIndex.java): per vertex pair with a shared neighbor, the
    shared and distinct neighbor counts as EXACT integers (Gelly's
    Result fields; score = shared/distinct is the caller's division).
    Runs on the C40(1,2) circulant. Scale: pair generation is the
    inherent sum(deg(n)²) — identical shape to the dedup module's
    inverted index; cap hub degrees upstream on power-law graphs."""
    g = _circulant_graph(spark, sf_dir)
    return g.run_jaccard_index().orderBy("v1", "v2")


def _aa_weight_cte() -> str:
    """Per-vertex Adamic-Adar micro-weight via the SAME portable staged
    ln the engine evaluates in-plan — both engines run the identical
    correctly-rounded operation sequence (the DSIR determinism design)."""
    from flink_1_12_2_spark.llm.sampling import (
        _round_half_away_sql,
        portable_ln_stages,
        staged_select_sql,
    )

    stages = portable_ln_stages("dg", "deg")
    last = f"aw{len(stages) - 1}"
    return (
        # deg >= 2 mirrors the engine: only such vertices can be a shared
        # neighbor, and it keeps ln(1)=0 out of the reciprocal
        staged_select_sql("(SELECT * FROM deg WHERE deg >= 2)", stages, "aw")
        + f""",
    w AS (SELECT v AS n, {_round_half_away_sql("(1000000.0E0 / dg_ln)")}
                 AS w_micro
          FROM {last})"""
    )


@query(
    "graph_adamic_adar",
    oracle=f"""{_SIM_DUCK_PRELUDE},
    {_aa_weight_cte()}
    SELECT p.v1, p.v2, SUM(w.w_micro) AS aa_micro
    FROM pairs p JOIN w ON w.n = p.n
    GROUP BY p.v1, p.v2
    ORDER BY v1, v2
    """,
    tags=("batch", "graph", "gelly", "similarity"),
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (Gelly library/similarity/
    AdamicAdar.java): score(a,b) = sum over shared neighbors z of
    1/ln(deg z), quantized per neighbor to exact integer micro-units via
    the portable staged ln + half-away quantizer (llm/sampling) so the
    per-pair BIGINT sum is bit-identical and addition-order-free in both
    engines — the DSIR micronat design reused on the graph library.
    The weight computes once per vertex (|V| rows) and broadcast-joins
    onto the shared-neighbor pair stream."""
    g = _circulant_graph(spark, sf_dir)
    return g.run_adamic_adar().orderBy("v1", "v2")


@query(
    "graph_clustering_coefficient",
    oracle=f"""{_SIM_DUCK_PRELUDE},
    canon AS (
      SELECT DISTINCT LEAST(v, n) AS a, GREATEST(v, n) AS b FROM adj),
    tri AS (
      SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
      FROM canon e1
      JOIN canon e2 ON e2.a = e1.b
      JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b),
    corners AS (
      SELECT v1 AS id FROM tri UNION ALL
      SELECT v2 FROM tri UNION ALL SELECT v3 FROM tri),
    tc AS (SELECT id, COUNT(*) AS triangle_count FROM corners GROUP BY id)
    SELECT d.v AS id, d.deg AS degree,
           COALESCE(tc.triangle_count, 0) AS triangle_count,
           d.deg * (d.deg - 1) // 2 AS pair_count
    FROM deg d LEFT JOIN tc ON tc.id = d.v
    ORDER BY id
    """,
    tags=("batch", "graph", "gelly", "clustering"),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient (Gelly library/clustering/undirected/
    LocalClusteringCoefficient.java): per vertex its degree, triangle
    count, and potential-pair count deg·(deg−1)/2 as EXACT integers (the
    coefficient is the caller's ratio, exactly Gelly's Result contract).
    On C40(1,2) every vertex sits in 3 of the 40 triangles with degree 4
    → coefficient 3/6 = 0.5. Built on the degree-oriented triangle
    enumerator, so the expensive step inherits its sum(min-degree²)
    bound."""
    g = _circulant_graph(spark, sf_dir)
    return g.run_local_clustering_coefficient().orderBy("id")


@query(
    "graph_hits",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT c_custkey % 17 AS src,
             100 + ((c_custkey % 17) * 2 + c_custkey % 5) % 13 AS dst
      FROM customer
    ),
    verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    -- iteration 1: auth from hub0=1 (indegree), then hub from new auth
    a1 AS (SELECT dst AS id, COUNT(*) AS auth FROM edges GROUP BY dst),
    auth1 AS (SELECT v.id, COALESCE(a1.auth, 0) AS auth
              FROM verts v LEFT JOIN a1 USING (id)),
    h1 AS (SELECT e.src AS id, SUM(a.auth) AS hub
           FROM edges e JOIN auth1 a ON a.id = e.dst GROUP BY e.src),
    hub1 AS (SELECT v.id, COALESCE(h1.hub, 0) AS hub
             FROM verts v LEFT JOIN h1 USING (id)),
    -- iteration 2
    a2 AS (SELECT e.dst AS id, SUM(h.hub) AS auth
           FROM edges e JOIN hub1 h ON h.id = e.src GROUP BY e.dst),
    auth2 AS (SELECT v.id, COALESCE(a2.auth, 0) AS auth
              FROM verts v LEFT JOIN a2 USING (id)),
    h2 AS (SELECT e.src AS id, SUM(a.auth) AS hub
           FROM edges e JOIN auth2 a ON a.id = e.dst GROUP BY e.src),
    hub2 AS (SELECT v.id, COALESCE(h2.hub, 0) AS hub
             FROM verts v LEFT JOIN h2 USING (id)),
    norms AS (SELECT (SELECT SUM(auth * auth) FROM auth2) AS a2s,
                     (SELECT SUM(hub * hub) FROM hub2) AS h2s)
    SELECT a.id,
           CAST(FLOOR(a.auth * 1000000.0E0 / SQRT(CAST(n.a2s AS DOUBLE))
                      + 0.5E0) AS BIGINT) AS auth_micro,
           CAST(FLOOR(h.hub * 1000000.0E0 / SQRT(CAST(n.h2s AS DOUBLE))
                      + 0.5E0) AS BIGINT) AS hub_micro
    FROM auth2 a JOIN hub2 h USING (id), norms n
    ORDER BY id
    """,
    tags=("batch", "graph", "gelly", "linkanalysis"),
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Gelly library/linkanalysis/HITS.java,
    Kleinberg): 2 supersteps on an irregular bipartite residue graph
    (hub i = custkey%17 links to 5 overlapping authorities
    100 + (2i + custkey%5) mod 13). Scores stay exact integers through
    the supersteps (addition-order-free) with ONE final normalization by
    the exact integer sum of squares — correctly-rounded IEEE sqrt/÷ both
    engines compute identically — quantized to micro-units; the oracle
    unrolls the same two iterations in SQL. Same direction as Gelly's
    per-round-normalized fixed point (the update map is linear, so
    normalization only rescales)."""
    cust = load(spark, sf_dir, "customer")
    edges = cust.select(
        (F.col("c_custkey") % 17).alias("src"),
        (
            F.lit(100)
            + ((F.col("c_custkey") % 17) * 2 + F.col("c_custkey") % 5) % 13
        ).alias("dst"),
    ).distinct()
    g = Graph.from_edges(edges)
    return g.run_hits(iterations=2).orderBy("id")


@query(
    "graph_summarization",
    oracle="""
    WITH verts AS (
      SELECT n_nationkey AS id, n_regionkey AS value FROM nation),
    edges AS (
      SELECT n_nationkey AS src, (n_nationkey * 7 + 3) % 25 AS dst
      FROM nation),
    groups AS (
      SELECT value, MIN(id) AS rep, COUNT(*) AS vertex_group_count
      FROM verts GROUP BY value),
    mapping AS (
      SELECT v.id, g.rep FROM verts v JOIN groups g USING (value))
    SELECT ms.rep AS src, md.rep AS dst,
           COUNT(*) AS edge_group_count
    FROM edges e
    JOIN mapping ms ON ms.id = e.src
    JOIN mapping md ON md.id = e.dst
    GROUP BY ms.rep, md.rep
    ORDER BY src, dst
    """,
    tags=("batch", "graph", "gelly", "summarization"),
)
def graph_summarization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural graph summarization (Gelly library/Summarization.java):
    nations grouped by region (vertex value), nation→nation residue edges
    rolled up to region-to-region edges with counts. The reference's
    arbitrary group representative is pinned to MIN(id) (within its
    "one of the represented identifiers" contract), making the output
    deterministic and oracle-able. The summarized VERTEX side is covered
    by the same groups CTE (counts embedded in the representative ids);
    this query gates the edge roll-up, the part with real joins."""
    n = load(spark, sf_dir, "nation")
    g = Graph(
        n.select(
            F.col("n_nationkey").alias("id"),
            F.col("n_regionkey").alias("value"),
        ),
        n.select(
            F.col("n_nationkey").alias("src"),
            ((F.col("n_nationkey") * 7 + 3) % 25).alias("dst"),
        ),
    )
    _verts, edges = g.run_summarization()
    return edges.orderBy("src", "dst")


@query(
    "graph_triadic_census",
    oracle=f"""{_SIM_DUCK_PRELUDE},
    canon AS (
      SELECT DISTINCT LEAST(v, n) AS a, GREATEST(v, n) AS b FROM adj),
    tri AS (
      SELECT COUNT(*) AS t
      FROM canon e1
      JOIN canon e2 ON e2.a = e1.b
      JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b),
    metrics AS (
      SELECT (SELECT COUNT(DISTINCT v) FROM adj) AS n,
             (SELECT COUNT(*) FROM canon) AS m,
             (SELECT SUM(deg * (deg - 1) // 2) FROM deg) AS p2,
             (SELECT t FROM tri) AS t)
    SELECT n * (n - 1) * (n - 2) // 6
             - (m * (n - 2) - 2 * p2 + 3 * t)
             - (p2 - 3 * t) - t AS count_03,
           m * (n - 2) - 2 * p2 + 3 * t AS count_12,
           p2 - 3 * t AS count_21,
           t AS count_30
    FROM metrics
    """,
    tags=("batch", "graph", "gelly", "clustering"),
)
def graph_triadic_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triadic census (Gelly library/clustering/undirected/
    TriadicCensus.java): the 0/1/2/3-edge triad counts over all vertex
    triples of C40(1,2), via the same TriangleListing+VertexMetrics
    closed form the reference composes — exact integers end to end. On
    this circulant: 40 triangles, 40·(C(4,2)=6)−120=120 open wedges."""
    g = _circulant_graph(spark, sf_dir)
    return g.run_triadic_census()


@query(
    "graph_community_detection",
    oracle="""
    WITH mn AS (
      SELECT n_regionkey AS r, MIN(n_nationkey) AS m
      FROM nation GROUP BY n_regionkey)
    SELECT n.n_nationkey AS node, mn.m AS label,
           CASE WHEN n.n_nationkey = mn.m THEN 0.25E0 ELSE 0.5E0 END
             AS score
    FROM nation n JOIN mn ON mn.r = n.n_regionkey
    ORDER BY node
    """,
    tags=("batch", "graph", "gelly", "iteration"),
)
def graph_community_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scored label propagation with hop attenuation (Gelly
    library/CommunityDetection.java, Leung et al.). On the five region
    K5 cliques with unit weights, id labels and delta 0.5, two supersteps
    provably land every vertex on its clique's MINIMUM id: round 1 is an
    all-tie (5 singleton labels), which the reference's ascending-ordered
    strict-max breaks toward the smallest label (the min vertex takes the
    second-min), score 1 − 0.5; round 2 the min label out-sums 3·0.5 vs
    0.5 everywhere, re-scoring unchanged vertices to 0.5 and the min
    vertex (changed, −0.5/2) to 0.25. All scores are dyadic-exact
    doubles, so both engines agree bit-for-bit while the engine truly
    runs the message/sum/argmax/attenuate supersteps."""
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = n.select(
        F.col("n_nationkey").alias("src"), F.col("n_regionkey").alias("r")
    )
    b = n.select(
        F.col("n_nationkey").alias("dst"), F.col("n_regionkey").alias("r")
    )
    edges = a.join(b, "r").filter(F.col("src") < F.col("dst")).select(
        "src", "dst"
    )
    g = Graph(
        n.select(
            F.col("n_nationkey").alias("id"),
            F.col("n_nationkey").alias("label"),
        ),
        edges,
    )
    return g.run_community_detection(iterations=2, delta=0.5).orderBy("node")


def _directed_nation_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Deterministic DIRECTED test graph over the 25 fixed nations: arc
    i→j iff same region and (7i + 3j) mod 4 < 2 — a reproducible mix of
    one-way, mutual, and absent pairs inside each region clique, so the
    directed clustering family has all 2-bit edge states to classify."""
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    a = n.select(
        F.col("n_nationkey").alias("src"), F.col("n_regionkey").alias("r")
    )
    b = n.select(
        F.col("n_nationkey").alias("dst"), F.col("n_regionkey").alias("r")
    )
    arcs = (
        a.join(b, "r")
        .filter(F.col("src") != F.col("dst"))
        .filter((F.col("src") * 7 + F.col("dst") * 3) % 4 < 2)
        .select("src", "dst")
    )
    return Graph(n.select(F.col("n_nationkey").alias("id")), arcs)


# DuckDB twin of _directed_nation_graph + the EdgeOrder pair masks
# (bits: FORWARD lo→hi = 2, REVERSE hi→lo = 1) and distinct-neighbor
# degrees — the shared prelude of the three directed-library oracles.
_DIRECTED_DUCK_PRELUDE = """
    arcs AS (
      SELECT a.n_nationkey AS src, b.n_nationkey AS dst
      FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
      WHERE a.n_nationkey <> b.n_nationkey
        AND (a.n_nationkey * 7 + b.n_nationkey * 3) % 4 < 2),
    pairs AS (
      SELECT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi,
             MAX(CASE WHEN src < dst THEN 2 ELSE 0 END)
               + MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) AS mask
      FROM arcs GROUP BY 1, 2),
    deg AS (
      SELECT id, COUNT(*) AS d
      FROM (SELECT lo AS id FROM pairs UNION ALL SELECT hi FROM pairs)
      GROUP BY id),
    tri AS (
      SELECT p12.lo AS v1, p12.hi AS v2, p13.hi AS v3,
             p12.mask * 16 + p13.mask * 4 + p23.mask AS bm
      FROM pairs p12
      JOIN pairs p13 ON p13.lo = p12.lo AND p13.hi > p12.hi
      JOIN pairs p23 ON p23.lo = p12.hi AND p23.hi = p13.hi)"""


@query(
    "graph_directed_clustering",
    oracle=f"""
    WITH {_DIRECTED_DUCK_PRELUDE},
    credits AS (
      SELECT v1 AS id, CASE WHEN bm % 4 = 3 THEN 2 ELSE 1 END AS c
      FROM tri
      UNION ALL
      SELECT v2, CASE WHEN (bm // 4) % 4 = 3 THEN 2 ELSE 1 END FROM tri
      UNION ALL
      SELECT v3, CASE WHEN (bm // 16) % 4 = 3 THEN 2 ELSE 1 END FROM tri),
    tc AS (SELECT id, CAST(SUM(c) AS BIGINT) AS t FROM credits GROUP BY id)
    SELECT n_nationkey AS id,
           COALESCE(d, 0) AS degree,
           COALESCE(t, 0) AS triangle_count,
           COALESCE(d, 0) * (COALESCE(d, 0) - 1) AS neighbor_pairs
    FROM nation
    LEFT JOIN deg ON deg.id = n_nationkey
    LEFT JOIN tc ON tc.id = n_nationkey
    ORDER BY id
    """,
    tags=("batch", "graph", "gelly", "clustering", "directed"),
)
def graph_directed_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed local clustering coefficient (Gelly library/clustering/
    directed/LocalClusteringCoefficient.java): per vertex its distinct-
    neighbor degree and the number of ARCS between its neighbors — a
    mutual pair counts 2, one-way counts 1, the reference's
    SplitTriangles bitmask credit — with the exact ordered-pair
    denominator degree·(degree−1). The engine runs the shared oriented
    triangle enumerator plus three mask joins; the oracle recomputes the
    listing declaratively on the fixed 25-nation directed graph. Exact
    integers only."""
    g = _directed_nation_graph(spark, sf_dir)
    return g.run_local_clustering_coefficient_directed().orderBy("id")


def _triad_type_values() -> str:
    """The Batagelj–Mrvar 64-entry bitmask→type table as a VALUES body —
    generated from the single Python source of truth (Graph._TRIAD_TYPE_
    TABLE) so the oracle can never drift from the engine."""
    return ", ".join(
        f"({m}, {t})" for m, t in enumerate(Graph._TRIAD_TYPE_TABLE)
    )


@query(
    "graph_directed_triadic_census",
    oracle=f"""
    WITH {_DIRECTED_DUCK_PRELUDE},
    tt(mask, typ) AS (VALUES {_triad_type_values()}),
    tcounts AS (
      SELECT typ, COUNT(*) AS c FROM tri JOIN tt ON tt.mask = tri.bm
      GROUP BY typ),
    vstats AS (
      SELECT COALESCE(d, 0) AS d, COALESCE(od, 0) AS od,
             COALESCE(idg, 0) AS idg
      FROM nation
      LEFT JOIN deg ON deg.id = n_nationkey
      LEFT JOIN (SELECT src AS id, COUNT(*) AS od FROM arcs GROUP BY src)
        o ON o.id = n_nationkey
      LEFT JOIN (SELECT dst AS id, COUNT(*) AS idg FROM arcs GROUP BY dst)
        i ON i.id = n_nationkey),
    sums AS (
      SELECT COUNT(*) AS vc,
             CAST(SUM((d - idg) + (d - od)) AS BIGINT) // 2 AS uec,
             CAST(SUM(idg + od - d) AS BIGINT) // 2 AS bec,
             CAST(SUM((d - idg) * (d - idg - 1) // 2) AS BIGINT) AS r021d,
             CAST(SUM((d - od) * (d - od - 1) // 2) AS BIGINT) AS r021u,
             CAST(SUM((d - idg) * (d - od)) AS BIGINT) AS r021c,
             CAST(SUM((d - od) * (idg + od - d)) AS BIGINT) AS r111d,
             CAST(SUM((d - idg) * (idg + od - d)) AS BIGINT) AS r111u,
             CAST(SUM((idg + od - d) * (idg + od - d - 1) // 2) AS BIGINT)
               AS r201
      FROM vstats),
    tris AS (
      SELECT COALESCE((SELECT c FROM tcounts WHERE typ = 9), 0) AS x030t,
             COALESCE((SELECT c FROM tcounts WHERE typ = 10), 0) AS x030c,
             COALESCE((SELECT c FROM tcounts WHERE typ = 12), 0) AS x120d,
             COALESCE((SELECT c FROM tcounts WHERE typ = 13), 0) AS x120u,
             COALESCE((SELECT c FROM tcounts WHERE typ = 14), 0) AS x120c,
             COALESCE((SELECT c FROM tcounts WHERE typ = 15), 0) AS x210,
             COALESCE((SELECT c FROM tcounts WHERE typ = 16), 0) AS x300),
    adj AS (
      SELECT vc, uec, bec, x030t, x030c, x120d, x120u, x120c, x210, x300,
             r201 - 3 * x300 - x210 AS t201,
             r111d - x210 - x120c - 2 * x120d AS t111d,
             r111u - x210 - x120c - 2 * x120u AS t111u,
             r021c - x120c - 3 * x030c - x030t AS t021c,
             r021u - x120u - x030t AS t021u,
             r021d - x120d - x030t AS t021d
      FROM sums, tris),
    fin AS (
      SELECT *,
             bec * (vc - 2) - t111d - t111u - 2 * t201
               - x120d - x120u - x120c - 2 * x210 - 3 * x300 AS e102,
             uec * (vc - 2) - 2 * (t021d + t021u + t021c)
               - t111d - t111u - 3 * (x030t + x030c)
               - 2 * (x120d + x120u + x120c) - x210 AS e012
      FROM adj)
    SELECT vc * (vc - 1) * (vc - 2) // 6 - e012 - e102
             - t021d - t021u - t021c - t111d - t111u
             - x030t - x030c - t201 - x120d - x120u - x120c - x210 - x300
             AS count_003,
           e012 AS count_012, e102 AS count_102,
           t021d AS count_021d, t021u AS count_021u, t021c AS count_021c,
           t111d AS count_111d, t111u AS count_111u,
           x030t AS count_030t, x030c AS count_030c, t201 AS count_201,
           x120d AS count_120d, x120u AS count_120u, x120c AS count_120c,
           x210 AS count_210, x300 AS count_300
    FROM fin
    """,
    tags=("batch", "graph", "gelly", "clustering", "directed"),
)
def graph_directed_triadic_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full 16-type directed triad census (Gelly library/clustering/
    directed/TriadicCensus.java): triangles classified through the
    published Batagelj–Mrvar 64-entry bitmask table, open triplets from
    the (degree, out, in) decomposition per center, single/empty triads
    by the reference's exact deduction ladder. Both engines share the
    type table (the oracle's VALUES body is generated from the same
    Python tuple) and both run the closed form — the engine on the
    oriented enumerator, the oracle on a declarative three-way pair
    join. Exact integers throughout."""
    g = _directed_nation_graph(spark, sf_dir)
    return g.run_triadic_census_directed()


@query(
    "graph_metrics",
    oracle=f"""
    WITH {_DIRECTED_DUCK_PRELUDE},
    vstats AS (
      SELECT COALESCE(d, 0) AS d, COALESCE(od, 0) AS od,
             COALESCE(idg, 0) AS idg
      FROM nation
      LEFT JOIN deg ON deg.id = n_nationkey
      LEFT JOIN (SELECT src AS id, COUNT(*) AS od FROM arcs GROUP BY src)
        o ON o.id = n_nationkey
      LEFT JOIN (SELECT dst AS id, COUNT(*) AS idg FROM arcs GROUP BY dst)
        i ON i.id = n_nationkey),
    vm AS (
      SELECT COUNT(*) AS vertex_count,
             CAST(SUM((d - idg) + (d - od)) AS BIGINT) // 2
               AS unidirectional_edge_count,
             CAST(SUM(idg + od - d) AS BIGINT) // 2
               AS bidirectional_edge_count,
             CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS triplet_count,
             MAX(d) AS maximum_degree,
             MAX(od) AS maximum_out_degree,
             MAX(idg) AS maximum_in_degree,
             MAX(d * (d - 1) // 2) AS maximum_triplets
      FROM vstats),
    low AS (
      SELECT id, COUNT(*) AS lo_cnt
      FROM (SELECT CASE WHEN dl.d <= dh.d THEN p.lo ELSE p.hi END AS id
            FROM pairs p
            JOIN deg dl ON dl.id = p.lo
            JOIN deg dh ON dh.id = p.hi)
      GROUP BY id),
    em AS (
      SELECT CAST(SUM(lo_cnt * (lo_cnt - 1) // 2) AS BIGINT)
               AS triangle_triplet_count,
             CAST(SUM(lo_cnt * (lo_cnt - 1) // 2
                      + lo_cnt * (deg.d - lo_cnt)) AS BIGINT)
               AS rectangle_triplet_count,
             MAX(lo_cnt * (lo_cnt - 1) // 2) AS maximum_triangle_triplets,
             MAX(lo_cnt * (lo_cnt - 1) // 2 + lo_cnt * (deg.d - lo_cnt))
               AS maximum_rectangle_triplets
      FROM deg JOIN low ON low.id = deg.id)
    SELECT * FROM vm, em
    """,
    tags=("batch", "graph", "gelly", "metric", "directed"),
)
def graph_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed VertexMetrics + EdgeMetrics in one row (Gelly
    library/metric/directed/{Vertex,Edge}Metrics.java): vertex count,
    uni/bidirectional edge counts (halved, each endpoint reports its
    incident arcs), Σ C(deg,2) triplets and the degree maxima, plus the
    Schank–Wagner orientation stats — per-vertex low-order neighbor
    count low(v) = |{{t : (d(v),v) < (d(t),t)}}| giving triangle triplets
    Σ C(low,2) and rectangle triplets Σ C(low,2)+low·(d−low), the
    candidate-volume planning numbers for every triangle algorithm.
    Exact integers; ties in the (degree, id) order resolve to the lower
    id exactly as the reference's EdgeStats comparator."""
    g = _directed_nation_graph(spark, sf_dir)
    # both sides are single driver-built rows; coalesce(1) keeps the
    # cross join at 1×1 tasks instead of defaultParallelism² empties
    vm = g.run_vertex_metrics_directed().coalesce(1)
    em = g.run_edge_metrics().coalesce(1)
    return vm.crossJoin(em)
