"""Gelly-style graph facade — Graph<K,VV,EV> over two DataFrames.

Flink parity: flink-libraries/flink-gelly/src/main/java/org/apache/flink/
graph/Graph.java:85 (fromDataSet, getDegrees, reverse, getUndirected,
subgraph, mapVertices/mapEdges, filterOnVertices, run(GraphAlgorithm));
library algorithms under flink-gelly/.../library/: ConnectedComponents,
SingleSourceShortestPaths (both delta iterations), PageRank,
LabelPropagation (sync most-frequent-neighbor supersteps),
CommunityDetection (Leung et al. scored LP, hop attenuation),
TriangleEnumerator (degree-oriented triad enumeration),
similarity/JaccardIndex + AdamicAdar (shared-neighbor pair stream),
clustering/undirected/LocalClusteringCoefficient + TriadicCensus,
clustering/directed/{TriangleListing, LocalClusteringCoefficient,
GlobalClusteringCoefficient, AverageClusteringCoefficient, TriadicCensus}
(EdgeOrder 6-bit direction bitmasks + the Batagelj–Mrvar 64-entry triad
type table), metric/{directed,undirected}/{Vertex,Edge}Metrics and
metric/ChecksumHashCode (stable-hash analogue),
linkanalysis/HITS (exact-integer supersteps, one final normalization),
and Summarization (group-by-value vertex/edge roll-up). The GSA
abstraction itself (gsa/GatherSumApplyIteration.java) is a first-class
driver too — run_gsa(gather, sum, apply) — so the GSA* library variants
are expressions over it (tests prove GSA-SSSP == run_sssp and GSA min-id
propagation == run_connected_components).

The GraphFrames pattern: vertices(id, ...) + edges(src, dst, ...) as plain
DataFrames; every transformation is a DataFrame op, every algorithm is a
driver-side (delta) iteration with localCheckpoint lineage truncation
(operators/advanced.iterate / iterate_delta). At 100 TB: edges are the big
table — pre-bucket them by src (sources/filesystem.write_bucketed) and every
superstep's workset-join shuffles only the (small, shrinking) workset.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from flink_1_12_2_spark.operators.advanced import (
    iterate,
    iterate_delta,
    pagerank,
)


class Graph:
    """vertices: (id, ...); edges: (src, dst[, weight])."""

    def __init__(self, vertices: DataFrame, edges: DataFrame):
        self.vertices = vertices
        self.edges = edges

    @staticmethod
    def from_edges(edges: DataFrame) -> "Graph":
        """fromDataSet parity — vertex set derived from edge endpoints."""
        verts = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        return Graph(verts, edges)

    # -- structure ----------------------------------------------------------
    def out_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )

    def in_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )

    def degrees(self) -> DataFrame:
        """getDegrees — in+out per vertex (0-degree vertices included)."""
        both = self.edges.select(F.col("src").alias("id")).union(
            self.edges.select(F.col("dst").alias("id"))
        )
        return (
            self.vertices.select("id")
            .join(both.groupBy("id").agg(F.count(F.lit(1)).alias("degree")),
                  "id", "left")
            .select("id", F.coalesce("degree", F.lit(0)).alias("degree"))
        )

    def reverse(self) -> "Graph":
        swapped = self.edges.withColumnRenamed("src", "__t").withColumnRenamed(
            "dst", "src"
        ).withColumnRenamed("__t", "dst")
        return Graph(self.vertices, swapped.select(self.edges.columns))

    def get_undirected(self) -> "Graph":
        return Graph(
            self.vertices, self.edges.unionByName(self.reverse().edges)
        )

    def subgraph(self, vertex_filter: Column, edge_filter: Column) -> "Graph":
        """subgraph parity: keep vertices passing vertex_filter and edges
        passing edge_filter whose BOTH endpoints survive."""
        verts = self.vertices.filter(vertex_filter)
        ids = verts.select("id")
        edges = (
            self.edges.filter(edge_filter)
            .join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select(self.edges.columns)
        )
        return Graph(verts, edges)

    def filter_on_vertices(self, cond: Column) -> "Graph":
        return self.subgraph(cond, F.lit(True))

    def map_vertices(self, **exprs: Column) -> "Graph":
        v = self.vertices
        for name, col in exprs.items():
            v = v.withColumn(name, col)
        return Graph(v, self.edges)

    def map_edges(self, **exprs: Column) -> "Graph":
        e = self.edges
        for name, col in exprs.items():
            e = e.withColumn(name, col)
        return Graph(self.vertices, e)

    # -- library algorithms (Gelly .../library/ parity) ---------------------
    def run_pagerank(self, num_iterations: int = 10, damping: float = 0.85) -> DataFrame:
        return pagerank(self.edges, num_iterations, damping)

    def run_connected_components(self, max_iterations: int = 30) -> DataFrame:
        """library/ConnectedComponents.java — delta iteration, min-id
        label propagation over the undirected graph."""
        edges = self.get_undirected().edges
        verts = self.vertices.select(
            F.col("id").alias("node"), F.col("id").alias("component")
        )

        def step(solution: DataFrame, workset: DataFrame):
            cand = (
                edges.join(workset.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("component").alias("cand"))
            )
            delta = (
                solution.join(cand, "node")
                .filter(F.col("cand") < F.col("component"))
                .select("node", F.col("cand").alias("component"))
            )
            return delta, delta

        return iterate_delta(verts, verts, ["node"], step, max_iterations)

    def run_label_propagation(self, iterations: int = 10) -> DataFrame:
        """library/LabelPropagation.java — synchronous supersteps with
        the reference's exact UpdateVertexLabel comparator: the candidate
        set is the received-message label frequencies SEEDED with the
        vertex's OWN current label at frequency 1 (``maxFrequency = 1``,
        ``mostFrequentLabel = vertex.getValue()`` before the entry loop),
        and a candidate wins only with a strictly greater count or an
        equal count and a strictly GREATER label — so a vertex whose
        neighbors all tie at frequency 1 keeps its label unless a greater
        one arrives, and no-message vertices keep their label for free.
        Messages flow along the OUT-edges of the graph AS-IS (the
        reference's SendNewLabelToNeighbors scatters over out-edges and
        never symmetrizes); callers wanting undirected propagation pass
        ``get_undirected()`` explicitly. Vertices need a ``label``
        column. Fixed iteration count, like the reference
        (setParallelism-independent sync model).

        Scale: each superstep is one map-combinable (node, label) count
        shuffle plus a per-node top-1 window over <= |distinct labels|
        rows — no all-pairs structure; supersteps materialize through
        ``iterate``'s localCheckpoint so lineage stays flat."""
        from pyspark.sql import Window

        edges = self.edges.select("src", "dst")
        init = self.vertices.select(F.col("id").alias("node"), "label")

        def step(labels: DataFrame) -> DataFrame:
            msgs = edges.join(
                labels.withColumnRenamed("node", "src"), "src"
            ).select(F.col("dst").alias("node"), "label")
            counts = msgs.groupBy("node", "label").agg(
                F.count(F.lit(1)).alias("cnt")
            )
            # Gelly's seed: (current label, frequency 1). A real message
            # count for the same label dominates via MAX (the reference's
            # `entry.getValue() > maxFrequency` branch) — never sums.
            seeded = (
                counts.unionByName(
                    labels.select(
                        "node", "label", F.lit(1).cast("long").alias("cnt")
                    )
                )
                .groupBy("node", "label")
                .agg(F.max("cnt").alias("cnt"))
            )
            w = Window.partitionBy("node").orderBy(
                F.desc("cnt"), F.desc("label")
            )
            return (
                seeded.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("node", "label")
            )

        return iterate(init, step, iterations)

    def run_triangle_enumeration(self) -> DataFrame:
        """library/TriangleEnumerator.java — the Schank–Wagner
        degree-oriented enumeration the reference implements: every
        undirected edge orients from its lower-(degree, id) endpoint, so
        2-path candidates fan out only from each triangle's LOWEST-degree
        corner (candidate volume is sum(min_degree²), not sum(degree²) —
        the property that makes this survive power-law graphs at 100 TB),
        then candidates close against the oriented edge set with one
        equi-join. Each triangle is found exactly once; returned as
        (v1, v2, v3) sorted ascending."""
        deg = self.degrees()
        und = (
            self.get_undirected()
            .edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        d_src = deg.select(
            F.col("id").alias("src"), F.col("degree").alias("dsrc")
        )
        d_dst = deg.select(
            F.col("id").alias("dst"), F.col("degree").alias("ddst")
        )
        src_first = F.struct("dsrc", "src") < F.struct("ddst", "dst")
        oriented = (
            und.join(d_src, "src")
            .join(d_dst, "dst")
            .select(
                F.when(src_first, F.col("src"))
                .otherwise(F.col("dst"))
                .alias("lo"),
                F.when(src_first, F.col("dst"))
                .otherwise(F.col("src"))
                .alias("hi"),
                F.when(
                    src_first,
                    F.struct(
                        F.col("ddst").alias("d"), F.col("dst").alias("v")
                    ),
                )
                .otherwise(
                    F.struct(
                        F.col("dsrc").alias("d"), F.col("src").alias("v")
                    )
                )
                .alias("hi_key"),
            )
            .distinct()
        )
        # consumed three times (pair-gen left/right + the closing join):
        # persist so the degree-attach join and dedup run once, the same
        # pattern as the dedup module's posting tables
        oriented = oriented.persist()
        left = oriented.select("lo", F.col("hi").alias("b"),
                               F.col("hi_key").alias("bk"))
        right = oriented.select("lo", F.col("hi").alias("c"),
                                F.col("hi_key").alias("ck"))
        paths = left.join(right, "lo").filter(F.col("bk") < F.col("ck"))
        closing = oriented.select(
            F.col("lo").alias("b"), F.col("hi").alias("c")
        )
        tri = paths.join(closing, ["b", "c"]).select(
            F.array_sort(F.array("lo", "b", "c")).alias("t")
        )
        out = tri.select(
            F.col("t")[0].alias("v1"),
            F.col("t")[1].alias("v2"),
            F.col("t")[2].alias("v3"),
        )
        # Materialize through the closing join, then release the oriented
        # cache: the clustering-coefficient/triadic-census callers invoke
        # this enumerator repeatedly on long-lived sessions, and an
        # unreleased persist per call accumulates cached partitions until
        # LRU eviction (r9 advice). localCheckpoint also cuts the
        # three-way self-join lineage, same as ``iterate``.
        out = out.localCheckpoint(eager=True)
        oriented.unpersist()
        return out

    def _undirected_adjacency(self) -> DataFrame:
        """(v, n) neighbor rows of the undirected simple graph (loops and
        duplicate edges dropped) — the input shape of the similarity
        library algorithms."""
        return (
            self.get_undirected()
            .edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .select(F.col("src").alias("v"), F.col("dst").alias("n"))
        )

    def _shared_neighbor_pairs(self) -> tuple[DataFrame, DataFrame]:
        """(pairs, deg): one row per (v1 < v2, shared neighbor n), plus
        per-vertex neighbor counts. Candidate volume is sum(deg(n)²) — the
        similarity algorithms' inherent cost (Gelly's JaccardIndex batches
        the same blow-up via groupSize); on power-law graphs cap hub
        degrees upstream with ``filter_on_vertices``, the df-cap pattern
        the dedup module uses."""
        adj = self._undirected_adjacency()
        deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
        a = adj.select(F.col("n"), F.col("v").alias("v1"))
        b = adj.select(F.col("n"), F.col("v").alias("v2"))
        pairs = a.join(b, "n").filter(F.col("v1") < F.col("v2"))
        return pairs, deg

    def run_jaccard_index(self) -> DataFrame:
        """library/similarity/JaccardIndex.java — for every vertex pair
        with at least one shared neighbor, the shared and distinct
        neighbor counts (Gelly's Result carries both; the score is their
        ratio). Returned as EXACT integers (v1, v2, shared_count,
        distinct_count) — the caller divides if it wants the float, and
        exact counts compare engine-independently."""
        pairs, deg = self._shared_neighbor_pairs()
        shared = pairs.groupBy("v1", "v2").agg(
            F.count(F.lit(1)).alias("shared_count")
        )
        d1 = deg.select(F.col("v").alias("v1"), F.col("deg").alias("d1"))
        d2 = deg.select(F.col("v").alias("v2"), F.col("deg").alias("d2"))
        return (
            shared.join(d1, "v1")
            .join(d2, "v2")
            .select(
                "v1",
                "v2",
                "shared_count",
                (F.col("d1") + F.col("d2") - F.col("shared_count")).alias(
                    "distinct_count"
                ),
            )
        )

    def run_adamic_adar(self) -> DataFrame:
        """library/similarity/AdamicAdar.java — score(a, b) =
        Σ_{z ∈ N(a)∩N(b)} 1 / ln(deg(z)). Quantized to exact integer
        MICRO-units per shared neighbor BEFORE the pair summation
        (``aa_micro = Σ round_half_away(1e6 / ln deg z)``), with ln
        evaluated by the engine-portable staged sequence
        (llm/sampling.portable_ln_stages) — the same determinism design as
        the DSIR micronat table, so two engines agree bit-for-bit and the
        per-pair sum is order-free. A shared neighbor has degree ≥ 2, so
        ln(deg) ≥ ln 2 and the reciprocal is finite. The per-vertex weight
        is computed once on the degree table (|V| rows), then broadcast-
        joined onto the pair stream — never recomputed per pair."""
        from flink_1_12_2_spark.llm.sampling import (
            _round_half_away_sql,
            portable_ln_stages,
        )

        pairs, deg = self._shared_neighbor_pairs()
        # only deg >= 2 vertices can BE a shared neighbor; filtering first
        # also keeps ln(1) = 0 out of the reciprocal (ANSI division)
        w = deg.filter(F.col("deg") >= 2)
        for col, expr in portable_ln_stages("dg", "deg"):
            w = w.withColumn(col, F.expr(expr))
        w = w.select(
            F.col("v").alias("n"),
            F.expr(
                _round_half_away_sql("(1000000.0E0 / dg_ln)")
            ).alias("w_micro"),
        )
        return (
            pairs.join(w, "n")
            .groupBy("v1", "v2")
            .agg(F.sum("w_micro").alias("aa_micro"))
        )

    def run_local_clustering_coefficient(self) -> DataFrame:
        """library/clustering/undirected/LocalClusteringCoefficient.java —
        per vertex: its degree, its triangle count, and the pair count
        deg·(deg−1)/2 (Gelly's Result exposes degree + triangle count and
        computes the coefficient as their ratio; we return the EXACT
        integer numerator/denominator so engines compare exactly). Built
        on :meth:`run_triangle_enumeration` (each triangle credits its
        three corners) joined to :meth:`degrees` — vertices in no
        triangle report 0."""
        tri = self.run_triangle_enumeration()
        corners = (
            tri.select(F.col("v1").alias("id"))
            .unionByName(tri.select(F.col("v2").alias("id")))
            .unionByName(tri.select(F.col("v3").alias("id")))
        )
        tcount = corners.groupBy("id").agg(
            F.count(F.lit(1)).alias("triangle_count")
        )
        return (
            self.degrees()
            .join(tcount, "id", "left")
            .select(
                "id",
                "degree",
                F.coalesce("triangle_count", F.lit(0)).alias(
                    "triangle_count"
                ),
                F.expr("degree * (degree - 1) DIV 2").alias("pair_count"),
            )
        )

    def run_hits(self, iterations: int = 3) -> DataFrame:
        """library/linkanalysis/HITS.java (Kleinberg): interdependent hub
        and authority scores on the DIRECTED graph — auth(v) sums the hub
        scores of in-neighbors, hub(v) sums the new authority scores of
        out-neighbors.

        Determinism design (the same exact-integer discipline as DSIR /
        Adamic–Adar): scores stay EXACT INTEGERS (path counts, init 1)
        through every superstep — integer sums are addition-order-free —
        and the reference's per-round normalization is applied ONCE at
        the end: score / sqrt(Σ score²) with Σ an exact integer sum of
        squares, sqrt/÷ correctly rounded IEEE, quantized to micro-units.
        The normalized values equal the reference's fixed-point direction
        (normalization is scale-only and the iteration map is linear), so
        rankings and ratios match Gelly. Returns (id, auth_micro,
        hub_micro). Keep ``iterations`` small: raw counts grow
        geometrically and must stay below isqrt(2^63 / |V|) so the
        exact-integer sum of squares fits BIGINT (loudly guarded)."""
        edges = self.edges.select("src", "dst").distinct()
        scores = self.vertices.select(
            F.col("id"),
            F.lit(1).cast("bigint").alias("hub"),
            F.lit(1).cast("bigint").alias("auth"),
        )
        for _ in range(iterations):
            auth = (
                edges.join(
                    scores.select(F.col("id").alias("src"), "hub"), "src"
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum("hub").alias("auth"))
            )
            with_auth = (
                scores.select("id", "hub")
                .join(auth, "id", "left")
                .select(
                    "id", "hub",
                    F.coalesce("auth", F.lit(0)).alias("auth"),
                )
            )
            hub = (
                edges.join(
                    with_auth.select(F.col("id").alias("dst"), "auth"),
                    "dst",
                )
                .groupBy(F.col("src").alias("id"))
                .agg(F.sum("auth").alias("hub"))
            )
            scores = (
                with_auth.select("id", "auth")
                .join(hub, "id", "left")
                .select(
                    "id",
                    F.coalesce("hub", F.lit(0)).alias("hub"),
                    "auth",
                )
                .localCheckpoint(eager=True)
            )
        stats = scores.select(
            F.max(F.greatest("hub", "auth")).alias("m"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        guard, n_verts = stats["m"], stats["n"]
        # The normalizer sums n score-squares in BIGINT; bounding every
        # score by floor(sqrt((2^63-1)/n)) makes Σ score² ≤ 2^63-1 exactly,
        # so the non-ANSI sum can never wrap (a raw 2^62 cap would let the
        # SUM overflow silently once any score passed ~2^31.5).
        import math

        bound = math.isqrt(((1 << 63) - 1) // max(n_verts, 1))
        if guard is not None and guard > bound:
            raise ValueError(
                f"HITS raw scores exceed {bound} (= isqrt(2^63/{n_verts})) "
                "— the exact-integer sum of squares would overflow BIGINT; "
                "reduce iterations"
            )
        sums = scores.select(
            F.sum(F.col("hub") * F.col("hub")).alias("h2"),
            F.sum(F.col("auth") * F.col("auth")).alias("a2"),
        ).first()
        # empty graph / all-zero side: keep the normalizer positive so the
        # division stays defined (scores are 0 anyway)
        h2 = int(sums["h2"] or 1)
        a2 = int(sums["a2"] or 1)
        return scores.select(
            "id",
            F.expr(
                f"CAST(FLOOR(auth * 1000000.0E0 / SQRT(CAST({a2} AS DOUBLE))"
                " + 0.5E0) AS BIGINT)"
            ).alias("auth_micro"),
            F.expr(
                f"CAST(FLOOR(hub * 1000000.0E0 / SQRT(CAST({h2} AS DOUBLE))"
                " + 0.5E0) AS BIGINT)"
            ).alias("hub_micro"),
        )

    def run_summarization(
        self, vertex_value_col: str = "value"
    ) -> tuple[DataFrame, DataFrame]:
        """library/Summarization.java — structural summarization: one
        summarized vertex per distinct vertex VALUE carrying the group
        size, and one summarized edge per (source group, target group)
        pair carrying the edge count. The reference assigns an arbitrary
        member id as the group representative ("guaranteed one of the
        represented vertex identifiers"); we pin MIN(id) — deterministic
        and within the reference's contract. Returns (vertices, edges):
        (id, value, vertex_group_count) and (src, dst, edge_group_count).

        Scale: two map-combinable groupBys plus two broadcast-able
        id→representative joins — the mapping table has one row per
        vertex, but only (value, rep) distinct rows matter for the join
        and Catalyst prunes to them."""
        groups = self.vertices.groupBy(vertex_value_col).agg(
            F.min("id").alias("__rep"),
            F.count(F.lit(1)).alias("vertex_group_count"),
        )
        out_verts = groups.select(
            F.col("__rep").alias("id"),
            F.col(vertex_value_col).alias("value"),
            "vertex_group_count",
        )
        mapping = self.vertices.join(
            groups.select(vertex_value_col, "__rep"), vertex_value_col
        ).select("id", "__rep")
        out_edges = (
            self.edges.select("src", "dst")
            .join(
                mapping.select(
                    F.col("id").alias("src"), F.col("__rep").alias("__s")
                ),
                "src",
            )
            .join(
                mapping.select(
                    F.col("id").alias("dst"), F.col("__rep").alias("__d")
                ),
                "dst",
            )
            .groupBy(
                F.col("__s").alias("src"), F.col("__d").alias("dst")
            )
            .agg(F.count(F.lit(1)).alias("edge_group_count"))
        )
        return out_verts, out_edges

    def run_community_detection(
        self, iterations: int = 2, delta: float = 0.5
    ) -> DataFrame:
        """library/CommunityDetection.java (Leung et al., "Towards
        real-time community detection in large networks"): scored label
        propagation with hop attenuation. Per superstep s (1-based), each
        vertex receives (label, score · edge_weight) from every neighbor,
        adopts the label with the HIGHEST SUMMED score (ties to the
        SMALLEST label — the reference's ascending TreeMap with a strict
        ``>``), and re-scores to that label's highest SINGLE message
        score, minus ``delta / s`` when the label changed. Initial score
        1.0 (AddScoreToVertexValuesMapper); vertices with no messages
        keep their value. Edges may carry a ``weight`` column (default
        1.0).

        Determinism note: with dyadic weights/delta (1.0, 0.5, …) every
        score stays an exactly-representable double, so the per-label
        sums are addition-order-free — the discipline the gate query
        relies on; arbitrary weights still run, with ordinary float
        summation semantics (like the reference)."""
        from pyspark.sql import Window

        has_w = "weight" in self.edges.columns
        edges = self.get_undirected().edges.select(
            "src",
            "dst",
            (F.col("weight") if has_w else F.lit(1.0))
            .cast("double")
            .alias("__w"),
        )
        scores = self.vertices.select(
            F.col("id").alias("node"),
            F.col("label"),
            F.lit(1.0).alias("score"),
        )
        for s in range(1, iterations + 1):
            msgs = edges.join(
                scores.select(
                    F.col("node").alias("src"), "label", "score"
                ),
                "src",
            ).select(
                F.col("dst").alias("node"),
                "label",
                (F.col("score") * F.col("__w")).alias("wscore"),
            )
            agg = msgs.groupBy("node", "label").agg(
                F.sum("wscore").alias("total"),
                F.max("wscore").alias("best"),
            )
            w = Window.partitionBy("node").orderBy(
                F.desc("total"), F.asc("label")
            )
            winner = (
                agg.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("node", F.col("label").alias("new_label"), "best")
            )
            updated = winner.join(
                scores.select("node", F.col("label").alias("old_label")),
                "node",
            ).select(
                "node",
                F.col("new_label").alias("label"),
                F.when(
                    F.col("new_label") != F.col("old_label"),
                    F.col("best") - F.lit(delta / s),
                )
                .otherwise(F.col("best"))
                .alias("score"),
            )
            silent = scores.join(
                updated.select("node"), "node", "left_anti"
            )
            scores = updated.unionByName(silent).localCheckpoint(
                eager=True
            )
        return scores

    def run_global_clustering_coefficient(self) -> DataFrame:
        """library/clustering/undirected/GlobalClusteringCoefficient.java
        — one row (triplet_count, triangle_count): closed triplets are
        3·triangles of the Σ C(deg,2) total (the reference's Result holds
        the two counts; the coefficient 3t/triplets is the caller's
        ratio, exact-integer-compare-friendly like the local variant)."""
        t = self.run_triangle_enumeration().count()
        lcc = self.run_local_clustering_coefficient()
        trip = int(
            lcc.select(F.sum("pair_count").alias("s")).first()["s"] or 0
        )
        return self.vertices.sparkSession.createDataFrame(
            [(trip, t)], "triplet_count bigint, triangle_count bigint"
        )

    def run_average_clustering_coefficient(self) -> DataFrame:
        """library/clustering/undirected/AverageClusteringCoefficient.java
        — one row (vertex_count, sum_cc_micro): the sum of per-vertex
        local coefficients (vertices with degree < 2 contribute 0, the
        reference's convention), quantized per vertex to exact integer
        micro-units so the sum is addition-order-free; average =
        sum_cc_micro / (1e6 · vertex_count) on the caller's side."""
        lcc = self.run_local_clustering_coefficient()
        per = lcc.select(
            F.when(
                F.col("pair_count") > 0,
                F.expr(
                    "CAST(FLOOR(triangle_count * 1000000.0E0 / "
                    "CAST(pair_count AS DOUBLE) + 0.5E0) AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0))
            .alias("cc_micro")
        )
        n = self.vertices.count()
        s = int(per.select(F.sum("cc_micro").alias("s")).first()["s"] or 0)
        return self.vertices.sparkSession.createDataFrame(
            [(n, s)], "vertex_count bigint, sum_cc_micro bigint"
        )

    def run_triadic_census(self) -> DataFrame:
        """library/clustering/undirected/TriadicCensus.java — counts of
        the four undirected triad types (0/1/2/3 connecting edges) over
        all vertex triples. Like the reference (which composes
        TriangleListing + VertexMetrics), the census is the exact
        closed form over n=|V|, m=|E|, wedges P2=Σ C(deg,2), triangles t:

            count_30 = t                      (each triangle counted once)
            count_21 = P2 − 3t                (open wedges)
            count_12 = m(n−2) − 2·P2 + 3t     (edge + detached vertex)
            count_03 = C(n,3) − the rest      (empty triads)

        All ingredients are exact integers (1-row bounded aggregates), so
        the result is engine-independent at any scale; the expensive
        ingredient is the triangle count, inherited from the oriented
        enumerator's sum(min-degree²) bound."""
        n = self.vertices.count()
        und = (
            self.get_undirected()
            .edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        m = und.count() // 2
        p2_row = (
            und.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .select(F.sum(F.expr("d * (d - 1) DIV 2")).alias("p2"))
            .first()
        )
        p2 = int(p2_row["p2"] or 0)
        t = self.run_triangle_enumeration().count()
        c30 = t
        c21 = p2 - 3 * t
        c12 = m * (n - 2) - 2 * p2 + 3 * t
        c03 = n * (n - 1) * (n - 2) // 6 - c12 - c21 - c30
        return self.vertices.sparkSession.createDataFrame(
            [(c03, c12, c21, c30)],
            "count_03 bigint, count_12 bigint, count_21 bigint,"
            " count_30 bigint",
        )

    # ------------------------------------------------------------------
    # Directed clustering family (library/clustering/directed/*.java).
    # Direction bookkeeping follows EdgeOrder.java: per unordered vertex
    # pair (lo < hi), FORWARD=0b10 marks the lo→hi edge, REVERSE=0b01 the
    # hi→lo edge, MUTUAL=0b11 both. A triangle over ID-sorted vertices
    # (v1 < v2 < v3) carries a 6-bit mask — bits 5-4 = pair (v1,v2),
    # bits 3-2 = (v1,v3), bits 1-0 = (v2,v3) — the layout the reference's
    # PermuteResult transposition algebra pins (TriangleListing.java:325).
    # ------------------------------------------------------------------

    def _directed_pair_masks(self) -> DataFrame:
        """(lo, hi, mask): one row per unordered neighbor pair of the
        directed simple graph (loops and duplicate arcs dropped), mask
        per the EdgeOrder convention above. One map-combinable bit_or
        aggregate over the deduped arc list."""
        arcs = (
            self.edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        return (
            arcs.select(
                F.least("src", "dst").alias("lo"),
                F.greatest("src", "dst").alias("hi"),
                F.when(F.col("src") < F.col("dst"), F.lit(2))
                .otherwise(F.lit(1))
                .cast("long")
                .alias("m"),
            )
            .groupBy("lo", "hi")
            .agg(F.expr("bit_or(m)").alias("mask"))
        )

    def run_triangle_listing_directed(self) -> DataFrame:
        """library/clustering/directed/TriangleListing.java — every
        3-clique of the directed graph's undirected support, listed once
        with vertices ID-sorted plus the 6-bit direction bitmask. The
        expensive half (which triples close) is the Schank–Wagner
        oriented enumerator shared with the undirected listing; the
        directions re-attach with three broadcast-friendly equi-joins
        against the (lo, hi, mask) pair table — the pair table is the
        edge set, so nothing here exceeds the undirected listing's
        sum(min-degree²) bound."""
        masks = self._directed_pair_masks().persist()
        tri = self.run_triangle_enumeration()
        m12 = masks.select(
            F.col("lo").alias("v1"), F.col("hi").alias("v2"),
            F.col("mask").alias("m12"),
        )
        m13 = masks.select(
            F.col("lo").alias("v1"), F.col("hi").alias("v3"),
            F.col("mask").alias("m13"),
        )
        m23 = masks.select(
            F.col("lo").alias("v2"), F.col("hi").alias("v3"),
            F.col("mask").alias("m23"),
        )
        out = (
            tri.join(m12, ["v1", "v2"])
            .join(m13, ["v1", "v3"])
            .join(m23, ["v2", "v3"])
            .select(
                "v1", "v2", "v3",
                (F.col("m12") * 16 + F.col("m13") * 4 + F.col("m23"))
                .cast("long")
                .alias("bitmask"),
            )
            .localCheckpoint(eager=True)
        )
        masks.unpersist()
        return out

    def run_local_clustering_coefficient_directed(self) -> DataFrame:
        """library/clustering/directed/LocalClusteringCoefficient.java —
        per vertex: its distinct-neighbor degree and the number of ARCS
        between its neighbors (a mutual neighbor pair counts 2, a
        one-way pair 1 — the reference's SplitTriangles bitmask credit),
        plus the exact denominator degree·(degree−1) (ordered neighbor
        pairs; no halving in the directed form). Zero-degree vertices
        report 0/0, matching includeZeroDegreeVertices=true."""
        tl = self.run_triangle_listing_directed()

        def credit(vcol: str, pair_bits: int) -> DataFrame:
            # SplitTriangles: a corner counts 2 when the OPPOSITE pair is
            # mutual (both bits of its 2-bit mask set), else 1.
            return tl.select(
                F.col(vcol).alias("id"),
                F.when(
                    F.expr(f"bitmask & {pair_bits}") == pair_bits, F.lit(2)
                )
                .otherwise(F.lit(1))
                .cast("long")
                .alias("c"),
            )

        corners = (
            credit("v1", 0b000011)   # opposite pair (v2, v3)
            .unionByName(credit("v2", 0b001100))  # (v1, v3)
            .unionByName(credit("v3", 0b110000))  # (v1, v2)
        )
        tcount = corners.groupBy("id").agg(F.sum("c").alias("triangle_count"))
        masks = self._directed_pair_masks()
        deg = (
            masks.select(F.col("lo").alias("id"))
            .unionByName(masks.select(F.col("hi").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        return (
            self.vertices.select("id")
            .join(deg, "id", "left")
            .join(tcount, "id", "left")
            .select(
                "id",
                F.coalesce("degree", F.lit(0)).alias("degree"),
                F.coalesce("triangle_count", F.lit(0)).alias(
                    "triangle_count"
                ),
                F.expr(
                    "coalesce(degree, 0) * (coalesce(degree, 0) - 1)"
                ).alias("neighbor_pairs"),
            )
        )

    def run_global_clustering_coefficient_directed(self) -> DataFrame:
        """library/clustering/directed/GlobalClusteringCoefficient.java —
        one row (triplet_count, triangle_count): triplets are
        Σ C(deg, 2) over distinct-neighbor degrees (directed
        VertexMetrics.java:151) and the triangle count is 3× the listing
        (each closed triplet counted from each corner, the reference's
        getResult comment). Exact integers; the NaN-when-zero ratio is
        the caller's division, as in the reference Result."""
        t = self.run_triangle_listing_directed().count()
        masks = self._directed_pair_masks()
        trip_row = (
            masks.select(F.col("lo").alias("id"))
            .unionByName(masks.select(F.col("hi").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
            .select(F.sum(F.expr("d * (d - 1) DIV 2")).alias("s"))
            .first()
        )
        trip = int(trip_row["s"] or 0)
        return self.vertices.sparkSession.createDataFrame(
            [(trip, 3 * t)], "triplet_count bigint, triangle_count bigint"
        )

    def run_average_clustering_coefficient_directed(self) -> DataFrame:
        """library/clustering/directed/AverageClusteringCoefficient.java
        — one row (vertex_count, sum_cc_micro): vertices with fewer than
        two neighbors contribute 0 (the reference's degree > 1 guard);
        each defined coefficient triangle_count/(deg·(deg−1)) quantizes
        to exact integer micro-units so the sum is addition-order-free.
        average = sum_cc_micro / (1e6 · vertex_count) caller-side."""
        lcc = self.run_local_clustering_coefficient_directed()
        per = lcc.select(
            F.when(
                F.col("neighbor_pairs") > 0,
                F.expr(
                    "CAST(FLOOR(triangle_count * 1000000.0E0 / "
                    "CAST(neighbor_pairs AS DOUBLE) + 0.5E0) AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0))
            .alias("cc_micro")
        )
        n = self.vertices.count()
        s = int(per.select(F.sum("cc_micro").alias("s")).first()["s"] or 0)
        return self.vertices.sparkSession.createDataFrame(
            [(n, s)], "vertex_count bigint, sum_cc_micro bigint"
        )

    # Batagelj & Mrvar, "A subquadratic triad census algorithm for large
    # sparse networks with small maximum degree" (Social Networks 23,
    # 2001) — the published 64-entry bitmask→triad-type table the
    # reference embeds (directed/TriadicCensus.java:233). Types 1..16 =
    # 003 012 102 021D 021U 021C 111D 111U 030T 030C 201 120D 120U 120C
    # 210 300.
    _TRIAD_TYPE_TABLE = (
        1, 2, 2, 3, 2, 4, 6, 8,
        2, 6, 5, 7, 3, 8, 7, 11,
        2, 6, 4, 8, 5, 9, 9, 13,
        6, 10, 9, 14, 7, 14, 12, 15,
        2, 5, 6, 7, 6, 9, 10, 14,
        4, 9, 9, 12, 8, 13, 14, 15,
        3, 7, 8, 11, 7, 12, 14, 15,
        8, 14, 13, 15, 11, 15, 15, 16,
    )

    def run_triadic_census_directed(self) -> DataFrame:
        """library/clustering/directed/TriadicCensus.java — the full
        16-type directed triad census, by the reference's exact
        composition: (a) classify every triangle of the support through
        the Batagelj–Mrvar type table, (b) count open triplets per
        center from the (degree, outDegree, inDegree) decomposition —
        021d = C(uniOut,2), 021u = C(uniIn,2), 021c = uniOut·uniIn,
        111d = uniIn·bi, 111u = uniOut·bi, 201 = C(bi,2) — then (c)
        deduct each closed triad from the open counts and each
        edge/empty triad by the same closed-form ladder as getResult
        (TriadicCensus.java:118-192). Every ingredient is an exact
        integer from a 1-row aggregate; the only heavy operator is the
        shared triangle listing."""
        # (b) degree decomposition — one aggregate row
        arcs = (
            self.edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        outd = arcs.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("od")
        )
        ind = arcs.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("idg")
        )
        masks = self._directed_pair_masks()
        deg = (
            masks.select(F.col("lo").alias("id"))
            .unionByName(masks.select(F.col("hi").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        per_vertex = (
            self.vertices.select("id")
            .join(deg, "id", "left")
            .join(outd, "id", "left")
            .join(ind, "id", "left")
            .select(
                F.coalesce("d", F.lit(0)).alias("d"),
                F.coalesce("od", F.lit(0)).alias("od"),
                F.coalesce("idg", F.lit(0)).alias("idg"),
            )
            .select(
                "d",
                (F.col("d") - F.col("idg")).alias("us"),  # uni as source
                (F.col("d") - F.col("od")).alias("ut"),   # uni as target
                (F.col("idg") + F.col("od") - F.col("d")).alias("bi"),
            )
        )
        agg = per_vertex.select(
            F.count(F.lit(1)).alias("vc"),
            F.sum(F.col("us") + F.col("ut")).alias("uec2"),
            F.sum("bi").alias("bec2"),
            F.sum(F.expr("us * (us - 1) DIV 2")).alias("t021d"),
            F.sum(F.expr("ut * (ut - 1) DIV 2")).alias("t021u"),
            F.sum(F.expr("us * ut")).alias("t021c"),
            F.sum(F.expr("ut * bi")).alias("t111d"),
            F.sum(F.expr("us * bi")).alias("t111u"),
            F.sum(F.expr("bi * (bi - 1) DIV 2")).alias("t201"),
        ).first()
        vc = int(agg["vc"] or 0)
        uec = int(agg["uec2"] or 0) // 2
        bec = int(agg["bec2"] or 0) // 2
        t021d, t021u, t021c = (
            int(agg["t021d"] or 0), int(agg["t021u"] or 0),
            int(agg["t021c"] or 0),
        )
        t111d, t111u, t201 = (
            int(agg["t111d"] or 0), int(agg["t111u"] or 0),
            int(agg["t201"] or 0),
        )
        # (a) triangle classification
        table = F.array(*[F.lit(t) for t in self._TRIAD_TYPE_TABLE])
        tri_types = (
            self.run_triangle_listing_directed()
            .select(
                F.element_at(table, (F.col("bitmask") + 1).cast("int"))
                .alias("tt")
            )
            .groupBy("tt")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_type = {int(r["tt"]): int(r["c"]) for r in tri_types}
        tri030t = by_type.get(9, 0)
        tri030c = by_type.get(10, 0)
        tri120d = by_type.get(12, 0)
        tri120u = by_type.get(13, 0)
        tri120c = by_type.get(14, 0)
        tri210 = by_type.get(15, 0)
        tri300 = by_type.get(16, 0)
        # (c) the reference's deduction ladder — exact Python ints
        t201 -= 3 * tri300 + tri210
        t111d -= tri210 + tri120c + 2 * tri120d
        t111u -= tri210 + tri120c + 2 * tri120u
        t021c -= tri120c + 3 * tri030c + tri030t
        t021u -= tri120u + tri030t
        t021d -= tri120d + tri030t
        e102 = (
            bec * (vc - 2)
            - t111d - t111u - 2 * t201
            - tri120d - tri120u - tri120c - 2 * tri210 - 3 * tri300
        )
        e012 = (
            uec * (vc - 2)
            - 2 * (t021d + t021u + t021c)
            - t111d - t111u
            - 3 * (tri030t + tri030c)
            - 2 * (tri120d + tri120u + tri120c)
            - tri210
        )
        t003 = (
            vc * (vc - 1) * (vc - 2) // 6
            - e012 - e102
            - t021d - t021u - t021c - t111d - t111u
            - tri030t - tri030c - t201
            - tri120d - tri120u - tri120c - tri210 - tri300
        )
        return self.vertices.sparkSession.createDataFrame(
            [(
                t003, e012, e102, t021d, t021u, t021c, t111d, t111u,
                tri030t, tri030c, t201, tri120d, tri120u, tri120c,
                tri210, tri300,
            )],
            "count_003 bigint, count_012 bigint, count_102 bigint,"
            " count_021d bigint, count_021u bigint, count_021c bigint,"
            " count_111d bigint, count_111u bigint, count_030t bigint,"
            " count_030c bigint, count_201 bigint, count_120d bigint,"
            " count_120u bigint, count_120c bigint, count_210 bigint,"
            " count_300 bigint",
        )

    # ------------------------------------------------------------------
    # metric/ library (directed + undirected Vertex/EdgeMetrics,
    # ChecksumHashCode).
    # ------------------------------------------------------------------

    def run_vertex_metrics_undirected(self) -> DataFrame:
        """library/metric/undirected/VertexMetrics.java — one row over
        the undirected simple support: vertex count, edge count (Σ deg/2,
        the reference's halving), triplet count Σ C(deg,2), maximum
        degree, maximum per-vertex triplets. Single map-combinable
        aggregate."""
        masks = self._directed_pair_masks()
        deg = (
            masks.select(F.col("lo").alias("id"))
            .unionByName(masks.select(F.col("hi").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        stats = (
            self.vertices.select("id")
            .join(deg, "id", "left")
            .select(F.coalesce("d", F.lit(0)).alias("d"))
            .select(
                F.count(F.lit(1)).alias("vc"),
                F.sum("d").alias("sd"),
                F.sum(F.expr("d * (d - 1) DIV 2")).alias("tc"),
                F.max("d").alias("md"),
                F.max(F.expr("d * (d - 1) DIV 2")).alias("mt"),
            )
            .first()
        )
        return self.vertices.sparkSession.createDataFrame(
            [(
                int(stats["vc"] or 0),
                int(stats["sd"] or 0) // 2,
                int(stats["tc"] or 0),
                int(stats["md"] or 0),
                int(stats["mt"] or 0),
            )],
            "vertex_count bigint, edge_count bigint, triplet_count bigint,"
            " maximum_degree bigint, maximum_triplets bigint",
        )

    def run_vertex_metrics_directed(self) -> DataFrame:
        """library/metric/directed/VertexMetrics.java — one row:
        vertex count, unidirectional edge count, bidirectional edge
        count (both halved, each endpoint reports its incident arcs),
        triplet count Σ C(deg,2) over distinct-neighbor degrees, and the
        maxima of degree / out-degree / in-degree / per-vertex triplets
        (VertexMetrics.java:144-161's accumulator set)."""
        arcs = (
            self.edges.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        outd = arcs.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("od")
        )
        ind = arcs.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("idg")
        )
        masks = self._directed_pair_masks()
        deg = (
            masks.select(F.col("lo").alias("id"))
            .unionByName(masks.select(F.col("hi").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        stats = (
            self.vertices.select("id")
            .join(deg, "id", "left")
            .join(outd, "id", "left")
            .join(ind, "id", "left")
            .select(
                F.coalesce("d", F.lit(0)).alias("d"),
                F.coalesce("od", F.lit(0)).alias("od"),
                F.coalesce("idg", F.lit(0)).alias("idg"),
            )
            .select(
                F.count(F.lit(1)).alias("vc"),
                F.sum(
                    (F.col("d") - F.col("idg")) + (F.col("d") - F.col("od"))
                ).alias("uec2"),
                F.sum(F.col("idg") + F.col("od") - F.col("d")).alias(
                    "bec2"
                ),
                F.sum(F.expr("d * (d - 1) DIV 2")).alias("tc"),
                F.max("d").alias("md"),
                F.max("od").alias("mod"),
                F.max("idg").alias("mid"),
                F.max(F.expr("d * (d - 1) DIV 2")).alias("mt"),
            )
            .first()
        )
        return self.vertices.sparkSession.createDataFrame(
            [(
                int(stats["vc"] or 0),
                int(stats["uec2"] or 0) // 2,
                int(stats["bec2"] or 0) // 2,
                int(stats["tc"] or 0),
                int(stats["md"] or 0),
                int(stats["mod"] or 0),
                int(stats["mid"] or 0),
                int(stats["mt"] or 0),
            )],
            "vertex_count bigint, unidirectional_edge_count bigint,"
            " bidirectional_edge_count bigint, triplet_count bigint,"
            " maximum_degree bigint, maximum_out_degree bigint,"
            " maximum_in_degree bigint, maximum_triplets bigint",
        )

    def run_edge_metrics(self) -> DataFrame:
        """library/metric/{directed,undirected}/EdgeMetrics.java — one
        row (triangle_triplet_count, rectangle_triplet_count,
        maximum_triangle_triplets, maximum_rectangle_triplets). Per
        vertex v with distinct-neighbor degree d and low = the number of
        neighbors t where (d(v), v) < (d(t), t) — v's out-degree in the
        Schank–Wagner orientation — the reference accumulates
        C(low, 2) and C(low, 2) + low·(d − low) (EdgeStats +
        EdgeMetricsHelper in both variants; the directed form first
        dedups arc pairs, which _directed_pair_masks already does).
        These are the oriented enumerator's candidate-volume stats —
        the planning numbers for the triangle algorithms."""
        masks = self._directed_pair_masks()
        deg = (
            masks.select(F.col("lo").alias("id"))
            .unionByName(masks.select(F.col("hi").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        dl = deg.select(F.col("id").alias("lo"), F.col("d").alias("dlo"))
        dh = deg.select(F.col("id").alias("hi"), F.col("d").alias("dhi"))
        pair_low = (
            masks.join(dl, "lo")
            .join(dh, "hi")
            .select(
                F.when(
                    F.struct(F.col("dlo"), F.col("lo"))
                    < F.struct(F.col("dhi"), F.col("hi")),
                    F.col("lo"),
                )
                .otherwise(F.col("hi"))
                .alias("id")
            )
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("low"))
        )
        stats = (
            deg.join(pair_low, "id", "left")
            .select(
                "d", F.coalesce("low", F.lit(0)).alias("low")
            )
            .select(
                F.sum(F.expr("low * (low - 1) DIV 2")).alias("tt"),
                F.sum(
                    F.expr("low * (low - 1) DIV 2 + low * (d - low)")
                ).alias("rt"),
                F.max(F.expr("low * (low - 1) DIV 2")).alias("mtt"),
                F.max(
                    F.expr("low * (low - 1) DIV 2 + low * (d - low)")
                ).alias("mrt"),
            )
            .first()
        )
        return self.vertices.sparkSession.createDataFrame(
            [(
                int(stats["tt"] or 0),
                int(stats["rt"] or 0),
                int(stats["mtt"] or 0),
                int(stats["mrt"] or 0),
            )],
            "triangle_triplet_count bigint, rectangle_triplet_count bigint,"
            " maximum_triangle_triplets bigint,"
            " maximum_rectangle_triplets bigint",
        )

    def run_checksum_hash_code(self) -> DataFrame:
        """library/metric/ChecksumHashCode.java — one row (record_count,
        checksum): count plus the sum of per-record
        ``hashCode() & 0xffffffffL`` over the vertex and edge sets
        (asm/dataset/ChecksumHashCode.java:73), BIT-EXACT with the
        reference for ``Graph<Long, NullValue, NullValue>`` (the shape
        every reference drill uses): Vertex = Tuple2(id, NullValue) →
        ``31 * Long.hashCode(id) + 53``; Edge = Tuple3(src, tgt,
        NullValue) → ``31 * (31 * Long.hashCode(src) +
        Long.hashCode(tgt)) + 53``; ``Long.hashCode(v) = (int)(v ^
        (v >>> 32))``; ``NullValue.hashCode() = 53``. Java's wrapping
        32-bit arithmetic is emulated in exact BIGINT expressions
        (pmod two's-complement fold), so the checksum matches a JVM run
        value-for-value (tests pin javac-generated ground truth) while
        staying a map-combinable Catalyst aggregate — order-independent,
        one pass, no shuffle beyond the final 1-row reduce."""

        def _i32(c):
            # fold a bigint expression into Java int range (wrap, not throw)
            return F.pmod(c + F.lit(1 << 31), F.lit(1 << 32)) - F.lit(1 << 31)

        def _long_hash(c):
            # java.lang.Long.hashCode
            return _i32(c.bitwiseXOR(F.shiftrightunsigned(c, 32)))

        def _unsigned(c):
            # record.hashCode() & 0xffffffffL
            return F.pmod(c, F.lit(1 << 32))

        idc = F.col("id").cast("bigint")
        vh = self.vertices.select(
            _unsigned(_i32(F.lit(31) * _long_hash(idc) + F.lit(53))).alias("h")
        )
        src = F.col("src").cast("bigint")
        dst = F.col("dst").cast("bigint")
        eh = self.edges.select(
            _unsigned(
                _i32(
                    F.lit(31)
                    * _i32(F.lit(31) * _long_hash(src) + _long_hash(dst))
                    + F.lit(53)
                )
            ).alias("h")
        )
        stats = vh.unionByName(eh).select(
            F.count(F.lit(1)).alias("n"), F.sum("h").alias("s")
        ).first()
        return self.vertices.sparkSession.createDataFrame(
            [(int(stats["n"] or 0), int(stats["s"] or 0))],
            "record_count bigint, checksum bigint",
        )

    def run_gsa(
        self,
        gather: "Callable[[DataFrame], Column]",
        sum_agg: "Callable[[Column], Column]",
        apply: "Callable[[Column, Column], Column]",
        value_col: str = "value",
        max_iterations: int = 10,
    ) -> DataFrame:
        """Gather-sum-apply iteration — the reference's third iteration
        abstraction (flink-gelly/.../gsa/GatherSumApplyIteration.java:59,
        GatherFunction/SumFunction/ApplyFunction). Per superstep, for
        every edge the GATHER function computes a partial value from the
        source vertex's value struct (columns ``value`` and the edge's
        ``weight`` when present — Neighbor.java's (vertex, edge) pair),
        SUM reduces the partials per target vertex, and APPLY combines
        (current_value, summed) into the new value — vertices only update
        when APPLY yields a SMALLER/changed value, mirrored here by
        emitting APPLY's result verbatim (make apply() idempotent, e.g.
        LEAST(cur, new) for min-propagation). Iterates a fixed
        ``max_iterations`` like the reference's setMaxIterations.

        The DataFrame decomposition IS the GSA decomposition: gather =
        the edge-source join projection, sum = a map-combinable groupBy
        aggregate, apply = the update join — which is why the GSA*
        library variants need no separate implementations here.

        ``gather`` receives the joined edge frame (columns src, dst,
        value [, weight]) and returns the partial-value Column; ``sum_agg``
        receives that column and returns an aggregate Column; ``apply``
        receives (current_value, summed_or_null) Columns and returns the
        new value Column."""
        verts = self.vertices.select(
            F.col("id"), F.col(value_col).alias("value")
        )
        edge_cols = ["src", "dst"] + (
            ["weight"] if "weight" in self.edges.columns else []
        )
        edges = self.edges.select(*edge_cols)
        for _ in range(max_iterations):
            joined = edges.join(
                verts.select(F.col("id").alias("src"), "value"), "src"
            )
            partial = joined.select(
                F.col("dst").alias("id"), gather(joined).alias("__m")
            )
            summed = partial.groupBy("id").agg(
                sum_agg(F.col("__m")).alias("__s")
            )
            verts = (
                verts.join(summed, "id", "left")
                .select(
                    "id",
                    apply(F.col("value"), F.col("__s")).alias("value"),
                )
                .localCheckpoint(eager=True)
            )
        return verts

    def run_sssp(self, source, max_iterations: int = 30) -> DataFrame:
        """library/SingleSourceShortestPaths.java — delta-iteration
        relaxation; edges need a ``weight`` column. Unreachable vertices
        are absent from the result (Gelly reports +inf; filter parity)."""
        init = self.vertices.select(F.col("id").alias("node")).filter(
            F.col("node") == source
        ).select("node", F.lit(0.0).alias("dist"))

        edges = self.edges

        def step(solution: DataFrame, workset: DataFrame):
            cand = (
                edges.join(workset.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min(F.col("dist") + F.col("weight")).alias("cand"))
            )
            improved = (
                cand.join(solution, "node", "left")
                .filter(F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
                .select("node", F.col("cand").alias("dist"))
            )
            return improved, improved

        return iterate_delta(init, init, ["node"], step, max_iterations)
