"""DataSet batch facade: map/flatMap/grouping, physical partitioning,
sortGroup+reduceGroup, joinWithTiny, delta iteration
(flink-java/.../DataSet.java — join :793, iterate :1206, iterateDelta :1234)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_12_2_spark.dataset import DataSet, ExecutionEnvironment


def _nation(spark, sf_dir):
    from flink_1_12_2_spark.registry import load

    return load(spark, sf_dir, "nation")


def test_map_filter_flatmap(spark, sf_dir):
    env = ExecutionEnvironment(spark)
    ds = env.from_dataframe(_nation(spark, sf_dir))
    out = (
        ds.map_expr(k2=F.col("n_nationkey") * 2)
        .filter(F.col("k2") >= 10)
        .flat_map(F.array(F.col("k2"), F.col("k2") + 1), "v")
    )
    rows = out.df.select("n_nationkey", "v").collect()
    base = ds.filter(F.col("n_nationkey") * 2 >= 10).df.count()
    assert len(rows) == 2 * base


def test_grouped_aggregate_and_min_by(spark, sf_dir):
    env = ExecutionEnvironment(spark)
    ds = env.from_dataframe(_nation(spark, sf_dir))
    agg = (
        ds.group_by("n_regionkey")
        .aggregate(F.count(F.lit(1)).alias("cnt"))
        .df.collect()
    )
    assert sum(r["cnt"] for r in agg) == ds.df.count()
    mins = ds.group_by("n_regionkey").min_by("n_nationkey").df.collect()
    expect = {
        r["n_regionkey"]: r["mn"]
        for r in ds.df.groupBy("n_regionkey").agg(
            F.min("n_nationkey").alias("mn")
        ).collect()
    }
    assert {r["n_regionkey"]: r["n_nationkey"] for r in mins} == expect


def test_sort_group_reduce_group(spark, sf_dir):
    env = ExecutionEnvironment(spark)
    ds = env.from_dataframe(
        _nation(spark, sf_dir).select("n_regionkey", "n_nationkey")
    )

    def first_two(pdf):
        return pdf.head(2)

    out = (
        ds.group_by("n_regionkey")
        .sort_group("n_nationkey")
        .reduce_group(first_two, "n_regionkey long, n_nationkey long")
        .df.collect()
    )
    got = {}
    for r in out:
        got.setdefault(r["n_regionkey"], []).append(r["n_nationkey"])
    for rk, keys in got.items():
        expect = sorted(
            r["n_nationkey"]
            for r in ds.filter(F.col("n_regionkey") == rk).df.collect()
        )[:2]
        assert sorted(keys) == expect


def test_partitioning_and_first(spark, sf_dir):
    env = ExecutionEnvironment(spark)
    ds = env.from_dataframe(_nation(spark, sf_dir))
    assert ds.partition_by_hash("n_regionkey").df.count() == ds.df.count()
    ranged = ds.partition_by_range("n_nationkey").sort_partition("n_nationkey")
    assert ranged.df.count() == ds.df.count()
    assert ds.first(3).df.count() == 3


def test_join_with_tiny_broadcasts(spark, sf_dir):
    from flink_1_12_2_spark.registry import load

    env = ExecutionEnvironment(spark)
    cust = env.from_dataframe(load(spark, sf_dir, "customer"))
    nat = env.from_dataframe(
        _nation(spark, sf_dir).select(
            F.col("n_nationkey").alias("c_nationkey"), "n_name"
        )
    )
    joined = cust.join_with_tiny(nat, "c_nationkey")
    plan = joined.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert joined.df.count() == cust.df.count()


def test_iterate_delta_converges_and_truncates_lineage(spark):
    env = ExecutionEnvironment(spark)
    # path graph 0-1-2-3-4: CC needs multiple supersteps, then empty workset
    edges = env.from_collection(
        [(i, i + 1) for i in range(4)] + [(i + 1, i) for i in range(4)],
        "src long, dst long",
    ).df
    verts = env.from_collection(
        [(i, i) for i in range(5)], "node long, component long"
    )

    def step(solution, workset):
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

    out = verts.iterate_delta(verts, ["node"], step, max_iterations=20)
    rows = {r["node"]: r["component"] for r in out.df.collect()}
    assert rows == {i: 0 for i in range(5)}
    # lineage must stay bounded (localCheckpoint leaf, not a 3^N tree)
    assert len(out.df._jdf.queryExecution().logical().toString()) < 2000
