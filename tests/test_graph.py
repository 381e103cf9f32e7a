"""Gelly facade: structure ops (reverse/undirected/subgraph/degrees) and
library algorithms (CC, SSSP) on small known graphs (Graph.java:85)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_12_2_spark.graph import Graph


def _g(spark):
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 2.0), (3, 4, 1.0), (5, 6, 9.0)],
        "src long, dst long, weight double",
    )
    return Graph.from_edges(edges)


def test_from_edges_and_degrees(spark):
    g = _g(spark)
    assert {r["id"] for r in g.vertices.collect()} == {1, 2, 3, 4, 5, 6}
    deg = {r["id"]: r["degree"] for r in g.degrees().collect()}
    assert deg == {1: 1, 2: 2, 3: 2, 4: 1, 5: 1, 6: 1}
    out_deg = {r["id"]: r["degree"] for r in g.out_degrees().collect()}
    assert out_deg == {1: 1, 2: 1, 3: 1, 5: 1}


def test_reverse_and_undirected(spark):
    g = _g(spark)
    rev = {(r["src"], r["dst"]) for r in g.reverse().edges.collect()}
    assert (2, 1) in rev and (6, 5) in rev and len(rev) == 4
    und = g.get_undirected()
    assert und.edges.count() == 8


def test_subgraph_keeps_only_surviving_endpoints(spark):
    g = _g(spark)
    sub = g.subgraph(F.col("id") <= 3, F.lit(True))
    assert {r["id"] for r in sub.vertices.collect()} == {1, 2, 3}
    edges = {(r["src"], r["dst"]) for r in sub.edges.collect()}
    assert edges == {(1, 2), (2, 3)}  # (3,4) dropped: endpoint 4 filtered


def test_connected_components_delta(spark):
    g = _g(spark)
    comp = {r["node"]: r["component"] for r in
            g.run_connected_components().collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5}


def test_sssp_shortest_not_first_path(spark):
    # two routes 1→4: direct weight 10 vs 1→2→3→4 weight 4; relaxation
    # must later IMPROVE an already-settled distance (delta semantics).
    edges = spark.createDataFrame(
        [(1, 4, 10.0), (1, 2, 1.0), (2, 3, 2.0), (3, 4, 1.0)],
        "src long, dst long, weight double",
    )
    g = Graph.from_edges(edges)
    dist = {r["node"]: r["dist"] for r in g.run_sssp(1).collect()}
    assert dist == {1: 0.0, 2: 1.0, 3: 3.0, 4: 4.0}


def test_label_propagation_majority_and_tie(spark):
    # Gelly LabelPropagation.java semantics: most frequent neighbor label;
    # ties go to the GREATER label. Vertex 4's neighbors carry labels
    # {10, 10, 99}: majority 10 beats greater 99. Vertex 5's single
    # neighbor 4 gives it 10 in the same superstep (sync update reads the
    # PREVIOUS labels: 4 was 10 before the step).
    verts = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, 10), (5, 7)], "id long, label long"
    )
    edges = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (4, 5)], "src long, dst long"
    )
    g = Graph(verts, edges)
    out = {r["node"]: r["label"] for r in
           g.run_label_propagation(iterations=1).collect()}
    assert out[4] == 10      # majority beats greater
    assert out[5] == 10      # sync: previous label of 4
    assert out[1] == 10 and out[2] == 10  # their only neighbor was 10
    # tie case: vertex 3's one neighbor... give it two neighbors with
    # distinct labels via a second graph
    verts2 = spark.createDataFrame(
        [(1, 5), (2, 8), (3, 1)], "id long, label long"
    )
    edges2 = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    out2 = {r["node"]: r["label"] for r in
            Graph(verts2, edges2).run_label_propagation(1).collect()}
    assert out2[3] == 8      # 5 vs 8 tie at frequency 1 -> greater label


def test_label_propagation_seed_keeps_current_on_tie(spark):
    # Gelly's UpdateVertexLabel seeds the comparison with the vertex's OWN
    # label at frequency 1 and only a strictly greater (count, label)
    # replaces it: neighbors {5, 8} all tie at 1 against own label 9, and
    # neither exceeds it, so 3 KEEPS 9 (the pre-r10 impl wrongly adopted
    # the top neighbor 8).
    verts = spark.createDataFrame(
        [(1, 5), (2, 8), (3, 9)], "id long, label long"
    )
    edges = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    out = {r["node"]: r["label"] for r in
           Graph(verts, edges).run_label_propagation(1).collect()}
    assert out[3] == 9
    # ...but a strictly more frequent smaller label still wins: {5, 5, 8}
    # against own 9 -> 5 at frequency 2 beats both.
    verts2 = spark.createDataFrame(
        [(1, 5), (2, 5), (4, 8), (3, 9)], "id long, label long"
    )
    edges2 = spark.createDataFrame(
        [(1, 3), (2, 3), (4, 3)], "src long, dst long"
    )
    out2 = {r["node"]: r["label"] for r in
            Graph(verts2, edges2).run_label_propagation(1).collect()}
    assert out2[3] == 5


def test_label_propagation_directed_out_edges_only(spark):
    # The reference scatters along OUT-edges of the input graph as-is
    # (SendNewLabelToNeighbors); it never symmetrizes. 1->2 must move
    # label 7 to vertex 2 (7 > 3) but vertex 1 receives nothing and
    # keeps 7 even though 2's label 3... and the reverse edge is absent.
    verts = spark.createDataFrame([(1, 7), (2, 3)], "id long, label long")
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = {r["node"]: r["label"] for r in
           Graph(verts, edges).run_label_propagation(1).collect()}
    assert out == {1: 7, 2: 7}


def test_label_propagation_isolated_vertex_keeps_label(spark):
    verts = spark.createDataFrame(
        [(1, 3), (2, 4), (9, 42)], "id long, label long"
    )
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    out = {r["node"]: r["label"] for r in
           Graph(verts, edges).run_label_propagation(2).collect()}
    assert out[9] == 42


def test_triangle_enumeration_k4(spark):
    # K4 contains exactly C(4,3) = 4 triangles; each must appear once,
    # sorted ascending, regardless of degree-tie orientation.
    edges = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        "src long, dst long",
    )
    g = Graph.from_edges(edges)
    tris = sorted(
        (r["v1"], r["v2"], r["v3"])
        for r in g.run_triangle_enumeration().collect()
    )
    assert tris == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]


def test_triangle_enumeration_no_false_positive(spark):
    # a 4-cycle has 2-paths but no closing edges -> zero triangles
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    assert Graph.from_edges(edges).run_triangle_enumeration().count() == 0


def test_jaccard_index_counts(spark):
    # path 1-2-3 plus edge 1-3 closing a triangle, plus pendant 4 on 1:
    # N(1)={2,3,4} N(2)={1,3} N(3)={1,2} N(4)={1}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "src long, dst long"
    )
    out = {
        (r["v1"], r["v2"]): (r["shared_count"], r["distinct_count"])
        for r in Graph.from_edges(edges).run_jaccard_index().collect()
    }
    assert out[(2, 3)] == (1, 3)   # share {1}; union {1,2,3}
    assert out[(1, 2)] == (1, 4)   # share {3}; union {1,2,3,4}
    assert out[(1, 3)] == (1, 4)   # share {2}
    assert out[(2, 4)] == (1, 2)   # share {1}; union {1,3}
    assert out[(3, 4)] == (1, 2)
    # N(1)={2,3,4}, N(4)={1}: no shared neighbor -> the pair is absent
    assert (1, 4) not in out


def test_adamic_adar_micronats(spark):
    # pair (1,3) shares only vertex 2 with degree 2:
    # aa_micro = round_half_away(1e6 / ln 2)
    from flink_1_12_2_spark.llm.sampling import (
        _round_half_away_py,
        portable_ln_py,
    )

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    rows = Graph.from_edges(edges).run_adamic_adar().collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["v1"], r["v2"]) == (1, 3)
    assert r["aa_micro"] == _round_half_away_py(1e6 / portable_ln_py(2))


def test_local_clustering_coefficient_k4_and_pendant(spark):
    # K4 plus a pendant vertex 5 on 1: K4 members sit in 3 triangles with
    # degree 4 (pendant inflates 1's degree), pendant has 0.
    edges = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(1, 5)],
        "src long, dst long",
    )
    out = {
        r["id"]: (r["degree"], r["triangle_count"], r["pair_count"])
        for r in Graph.from_edges(edges)
        .run_local_clustering_coefficient()
        .collect()
    }
    assert out[1] == (4, 3, 6)
    assert out[2] == (3, 3, 3)   # coefficient 1: all neighbor pairs close
    assert out[5] == (1, 0, 0)


def test_hits_two_iterations_exact(spark):
    # 1->3, 2->3, 3->4: after 2 iterations the raw integer scores are
    # auth=(0,0,4,1), hub=(4,4,1,0); normalization divides by sqrt of the
    # exact sums of squares (17 and 33) and quantizes to micro-units.
    import math

    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    out = {
        r["id"]: (r["auth_micro"], r["hub_micro"])
        for r in Graph.from_edges(edges).run_hits(iterations=2).collect()
    }

    def q(x):
        return int(math.floor(x + 0.5))

    sa, sh = math.sqrt(17.0), math.sqrt(33.0)
    assert out[3] == (q(4 * 1e6 / sa), q(1 * 1e6 / sh))
    assert out[4] == (q(1 * 1e6 / sa), 0)
    assert out[1] == (0, q(4 * 1e6 / sh))
    assert out[2] == out[1]


def test_summarization_matches_reference_javadoc_example(spark):
    # the exact example from Summarization.java's javadoc: vertices
    # 0,1="A", 2,3="B"; six directed edges; summarized to 2 vertices and
    # 4 edges with counts — representatives pinned to the group MIN id
    # (within the reference's "one of the represented ids" contract).
    verts = spark.createDataFrame(
        [(0, "A"), (1, "A"), (2, "B"), (3, "B")], "id long, value string"
    )
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)],
        "src long, dst long",
    )
    sv, se = Graph(verts, edges).run_summarization()
    assert {(r["id"], r["value"], r["vertex_group_count"])
            for r in sv.collect()} == {(0, "A", 2), (2, "B", 2)}
    assert {(r["src"], r["dst"], r["edge_group_count"])
            for r in se.collect()} == {
        (0, 0, 2), (2, 2, 2), (0, 2, 1), (2, 0, 1),
    }


def test_triadic_census_k4_plus_isolated(spark):
    # K4 plus isolated vertex 5: triads over 5 vertices = C(5,3) = 10.
    # K4: 4 triangles; wedges P2 = 4*C(3,2)=12 -> open wedges 12-12=0;
    # 1-edge triads = 6*(5-2) - 2*12 + 12 = 6; empty = 10-4-0-6 = 0.
    verts = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    edges = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        "src long, dst long",
    )
    r = Graph(verts, edges).run_triadic_census().collect()[0]
    assert (r["count_03"], r["count_12"], r["count_21"], r["count_30"]) \
        == (0, 6, 0, 4)


def test_community_detection_tie_and_attenuation(spark):
    # path 1-2-3, id labels, delta=0.5. Superstep 1: v2's tie between
    # labels {1: 1.0, 3: 1.0} breaks to the SMALLEST label (reference's
    # ascending strict-max); every vertex changes label -> score 0.5.
    # Superstep 2 (penalty 0.25): v1 gets (1,0.5) -> 0.25; v2 gets two
    # (2,0.5) messages (sum 1.0, best single 0.5) -> label 2, 0.25;
    # v3 gets (1,0.5) -> 0.25.
    verts = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "id long, label long"
    )
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    g = Graph(verts, edges)
    r1 = {r["node"]: (r["label"], r["score"])
          for r in g.run_community_detection(iterations=1).collect()}
    assert r1 == {1: (2, 0.5), 2: (1, 0.5), 3: (2, 0.5)}
    r2 = {r["node"]: (r["label"], r["score"])
          for r in g.run_community_detection(iterations=2).collect()}
    assert r2 == {1: (1, 0.25), 2: (2, 0.25), 3: (1, 0.25)}


def test_global_and_average_clustering_coefficient(spark):
    # K4 + pendant 5 on vertex 1 (same graph as the local test):
    # triangles 4; triplets = sum pair_count = 6+3+3+3+0 = 15;
    # local coefficients: 0.5, 1, 1, 1, 0 -> sum_cc_micro 3_500_000 of 5.
    edges = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(1, 5)],
        "src long, dst long",
    )
    g = Graph.from_edges(edges)
    gl = g.run_global_clustering_coefficient().collect()[0]
    assert (gl["triplet_count"], gl["triangle_count"]) == (15, 4)
    av = g.run_average_clustering_coefficient().collect()[0]
    assert (av["vertex_count"], av["sum_cc_micro"]) == (5, 3_500_000)


def test_gsa_expresses_sssp_and_cc(spark):
    # The reference's GSA* library variants are the same algorithms
    # through the gather/sum/apply abstraction — prove run_gsa expresses
    # both: SSSP on the two-route graph (gather = dist + weight, sum =
    # MIN, apply = LEAST) must equal run_sssp; min-id propagation on the
    # undirected graph must equal run_connected_components.
    edges = spark.createDataFrame(
        [(1, 4, 10.0), (1, 2, 1.0), (2, 3, 2.0), (3, 4, 1.0)],
        "src long, dst long, weight double",
    )
    g = Graph.from_edges(edges).get_undirected()
    verts = g.vertices.withColumn(
        "value", F.when(F.col("id") == 1, 0.0).otherwise(F.lit(None))
    )
    out = Graph(verts, g.edges).run_gsa(
        gather=lambda j: F.col("value") + F.col("weight"),
        sum_agg=lambda m: F.min(m),
        apply=lambda cur, s: F.least(cur, s),
        max_iterations=5,
    )
    dist = {r["id"]: r["value"] for r in out.collect()}
    assert dist == {1: 0.0, 2: 1.0, 3: 3.0, 4: 4.0}

    cc_edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "src long, dst long"
    )
    gc = Graph.from_edges(cc_edges).get_undirected()
    cverts = gc.vertices.withColumn("value", F.col("id"))
    comp = {
        r["id"]: r["value"]
        for r in Graph(cverts, gc.edges)
        .run_gsa(
            gather=lambda j: F.col("value"),
            sum_agg=lambda m: F.min(m),
            apply=lambda cur, s: F.least(cur, s),
            max_iterations=4,
        )
        .collect()
    }
    ref = {r["node"]: r["component"]
           for r in gc.run_connected_components().collect()}
    assert comp == ref == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


# ---------------------------------------------------------------------------
# Directed clustering family + metrics (r10: library/clustering/directed/,
# library/metric/) — every algorithm cross-checked against an exhaustive
# brute-force evaluation of the same definitions on a fixed random digraph.
# ---------------------------------------------------------------------------

def _fixed_digraph(spark, n=9, seed=7, p=0.35):
    import random

    rnd = random.Random(seed)
    arcs = [
        (i, j)
        for i in range(n)
        for j in range(n)
        if i != j and rnd.random() < p
    ]
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(arcs, "src long, dst long")
    return Graph(verts, edges), set(arcs), n


def _pair_mask(A):
    return lambda a, b: (2 if (a, b) in A else 0) | (1 if (b, a) in A else 0)


def test_directed_triangle_listing_masks(spark):
    import itertools

    g, A, n = _fixed_digraph(spark)
    m = _pair_mask(A)
    expected = {}
    for a, b, c in itertools.combinations(range(n), 3):
        if m(a, b) and m(a, c) and m(b, c):
            expected[(a, b, c)] = m(a, b) * 16 + m(a, c) * 4 + m(b, c)
    got = {
        (r["v1"], r["v2"], r["v3"]): r["bitmask"]
        for r in g.run_triangle_listing_directed().collect()
    }
    assert got == expected and expected  # non-trivial fixture


def test_directed_local_clustering_coefficient_brute_force(spark):
    import itertools

    g, A, n = _fixed_digraph(spark)
    m = _pair_mask(A)
    out = {
        r["id"]: (r["degree"], r["triangle_count"], r["neighbor_pairs"])
        for r in g.run_local_clustering_coefficient_directed().collect()
    }
    for v in range(n):
        nb = sorted(x for x in range(n) if x != v and m(v, x))
        d = len(nb)
        # arcs between neighbors: mutual pair = 2, one-way = 1
        tc = sum(
            2 if m(a, b) == 3 else 1
            for a, b in itertools.combinations(nb, 2)
            if m(a, b)
        )
        assert out[v] == (d, tc, d * (d - 1)), v


def test_directed_global_and_average_cc(spark):
    import itertools

    g, A, n = _fixed_digraph(spark)
    m = _pair_mask(A)
    deg = {
        v: sum(1 for x in range(n) if x != v and m(v, x)) for v in range(n)
    }
    tris = sum(
        1
        for a, b, c in itertools.combinations(range(n), 3)
        if m(a, b) and m(a, c) and m(b, c)
    )
    gcc = g.run_global_clustering_coefficient_directed().first()
    assert gcc["triplet_count"] == sum(
        d * (d - 1) // 2 for d in deg.values()
    )
    assert gcc["triangle_count"] == 3 * tris

    acc = g.run_average_clustering_coefficient_directed().first()
    assert acc["vertex_count"] == n
    # recompute the micro sum with the same half-away quantizer
    lcc = {
        r["id"]: (r["triangle_count"], r["neighbor_pairs"])
        for r in g.run_local_clustering_coefficient_directed().collect()
    }
    import math

    s = sum(
        math.floor(t * 1_000_000.0 / p + 0.5)
        for t, p in lcc.values()
        if p > 0
    )
    assert acc["sum_cc_micro"] == s


import pytest


@pytest.mark.parametrize("seed,p", [(7, 0.35), (11, 0.15), (13, 0.6)])
def test_directed_triadic_census_brute_force(spark, seed, p):
    # three density regimes: sparse graphs exercise the 012/102/003
    # closed-form arms, dense ones the triangle-classification arm
    import itertools

    g, A, n = _fixed_digraph(spark, seed=seed, p=p)
    m = _pair_mask(A)
    tt = Graph._TRIAD_TYPE_TABLE
    counts = [0] * 16
    for a, b, c in itertools.combinations(range(n), 3):
        counts[tt[m(a, b) * 16 + m(a, c) * 4 + m(b, c)] - 1] += 1
    names = (
        "003 012 102 021d 021u 021c 111d 111u "
        "030t 030c 201 120d 120u 120c 210 300"
    ).split()
    row = g.run_triadic_census_directed().first().asDict()
    got = [row[f"count_{s}"] for s in names]
    assert got == counts
    assert sum(counts) == n * (n - 1) * (n - 2) // 6  # total triads


def test_directed_census_canonical_cycles(spark):
    # a 3-cycle is exactly one 030C; a transitive triple exactly one 030T
    verts = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    cyc = Graph(
        verts, spark.createDataFrame([(0, 1), (1, 2), (2, 0)],
                                     "src long, dst long")
    ).run_triadic_census_directed().first()
    assert cyc["count_030c"] == 1 and cyc["count_030t"] == 0
    tr = Graph(
        verts, spark.createDataFrame([(0, 1), (1, 2), (0, 2)],
                                     "src long, dst long")
    ).run_triadic_census_directed().first()
    assert tr["count_030t"] == 1 and tr["count_030c"] == 0


def test_vertex_and_edge_metrics_brute_force(spark):
    import itertools

    g, A, n = _fixed_digraph(spark)
    m = _pair_mask(A)
    deg = {
        v: sum(1 for x in range(n) if x != v and m(v, x)) for v in range(n)
    }
    uni = sum(
        1 for a, b in itertools.combinations(range(n), 2) if m(a, b) in (1, 2)
    )
    bi = sum(
        1 for a, b in itertools.combinations(range(n), 2) if m(a, b) == 3
    )
    vm = g.run_vertex_metrics_directed().first().asDict()
    assert vm == {
        "vertex_count": n,
        "unidirectional_edge_count": uni,
        "bidirectional_edge_count": bi,
        "triplet_count": sum(d * (d - 1) // 2 for d in deg.values()),
        "maximum_degree": max(deg.values()),
        "maximum_out_degree": max(
            sum(1 for x in range(n) if (v, x) in A) for v in range(n)
        ),
        "maximum_in_degree": max(
            sum(1 for x in range(n) if (x, v) in A) for v in range(n)
        ),
        "maximum_triplets": max(d * (d - 1) // 2 for d in deg.values()),
    }

    low = {
        v: sum(
            1
            for t in range(n)
            if t != v and m(v, t) and (deg[v], v) < (deg[t], t)
        )
        for v in range(n)
    }
    em = g.run_edge_metrics().first().asDict()
    assert em == {
        "triangle_triplet_count": sum(
            lo * (lo - 1) // 2 for lo in low.values()
        ),
        "rectangle_triplet_count": sum(
            low[v] * (low[v] - 1) // 2 + low[v] * (deg[v] - low[v])
            for v in range(n)
        ),
        "maximum_triangle_triplets": max(
            lo * (lo - 1) // 2 for lo in low.values()
        ),
        "maximum_rectangle_triplets": max(
            low[v] * (low[v] - 1) // 2 + low[v] * (deg[v] - low[v])
            for v in range(n)
        ),
    }


def test_vertex_metrics_undirected_matches_support(spark):
    g, A, n = _fixed_digraph(spark)
    m = _pair_mask(A)
    import itertools

    pairs = [
        (a, b) for a, b in itertools.combinations(range(n), 2) if m(a, b)
    ]
    deg = {
        v: sum(1 for x in range(n) if x != v and m(v, x)) for v in range(n)
    }
    vm = g.run_vertex_metrics_undirected().first().asDict()
    assert vm == {
        "vertex_count": n,
        "edge_count": len(pairs),
        "triplet_count": sum(d * (d - 1) // 2 for d in deg.values()),
        "maximum_degree": max(deg.values()),
        "maximum_triplets": max(d * (d - 1) // 2 for d in deg.values()),
    }


def test_checksum_hash_code_stable_and_counting(spark):
    g, A, n = _fixed_digraph(spark)
    r1 = g.run_checksum_hash_code().first()
    r2 = g.run_checksum_hash_code().first()
    assert r1 == r2  # deterministic across runs
    assert r1["record_count"] == n + len(A)
    assert r1["checksum"] >= 0


def test_checksum_hash_code_jvm_parity(spark):
    """Bit-exact ChecksumHashCode parity with the reference JVM
    semantics for Graph<Long, NullValue, NullValue>. Expected values
    generated with javac/java 17 from the reference formula
    (asm/dataset/ChecksumHashCode.java:73 `hashCode() & 0xffffffffL`;
    Tuple2/Tuple3.hashCode 31-chains; NullValue.hashCode() == 53;
    Long.hashCode fold): vertices {1, 2, 5000000000, -7}, edges
    {(1,2), (2,5000000000), (5000000000,-7)} → count 7,
    checksum 3988922564. 5e9 exercises the high-word XOR fold; -7 the
    negative two's-complement path."""
    from flink_1_12_2_spark.graph import Graph

    v = spark.createDataFrame(
        [(1,), (2,), (5_000_000_000,), (-7,)], "id bigint"
    )
    e = spark.createDataFrame(
        [(1, 2), (2, 5_000_000_000), (5_000_000_000, -7)],
        "src bigint, dst bigint",
    )
    r = Graph(v, e).run_checksum_hash_code().first()
    assert (r["record_count"], r["checksum"]) == (7, 3988922564)
