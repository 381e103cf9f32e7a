"""Bucketed co-located join: the plan must contain no hash-partitioning
Exchange on either join input (the bucketing shuffle was paid at write
time) — SURVEY §2.3 scale path / BatchExecExchange reuse parity."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    from flink_1_12_2_spark.registry import load
    from flink_1_12_2_spark.sources.filesystem import write_bucketed

    suffix = uuid.uuid4().hex[:8]
    ot, ct = f"t_ord_{suffix}", f"t_cust_{suffix}"
    write_bucketed(
        load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        ot, 8, ["o_custkey"], sorted_by=["o_custkey"],
    )
    write_bucketed(
        load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("o_custkey"), "c_acctbal"
        ),
        ct, 8, ["o_custkey"], sorted_by=["o_custkey"],
    )
    try:
        joined = (
            spark.table(ot)
            .hint("merge")
            .join(spark.table(ct), "o_custkey")
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("total"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # correctness: same result as the unbucketed join
        expect = (
            load(spark, sf_dir, "orders")
            .join(
                load(spark, sf_dir, "customer").select(
                    F.col("c_custkey").alias("o_custkey")
                ),
                "o_custkey",
            )
            .count()
        )
        assert joined.agg(F.sum("total")).collect() is not None
        assert spark.table(ot).join(spark.table(ct), "o_custkey").count() == expect
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ot}")
        spark.sql(f"DROP TABLE IF EXISTS {ct}")
