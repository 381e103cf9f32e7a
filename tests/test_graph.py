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
