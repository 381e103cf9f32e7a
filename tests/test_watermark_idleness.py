"""Watermark idleness (WatermarkStrategy.withIdleness parity): an idle
source must not stall the combined event-time watermark.

Construction: union a live events stream with an EMPTY (idle) stream, both
carrying watermarks, into an append-mode tumbling aggregate. Append mode
only emits windows closed by the combined watermark:

- default policy (min): the idle source pins the combined watermark at its
  unset floor, so NO window ever closes — the stall Flink's idleness API
  exists to prevent;
- ``set_idleness_policy(spark, "max")``: the combined watermark follows the
  live source and closed windows flow out.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_1_12_2_spark.streaming.core import (
    run_to_memory,
    set_idleness_policy,
    stream_events,
)


def _union_agg(spark, sf_dir, tmp_path):
    live = stream_events(spark, sf_dir)
    idle_dir = tmp_path / "idle_src"
    idle_dir.mkdir(exist_ok=True)
    idle = (
        spark.readStream.schema(live.schema)
        .parquet(str(idle_dir))
        .withWatermark("ts", "10 minutes")
    )
    u = live.unionByName(idle)
    return u.groupBy(F.window("ts", "1 hour").alias("win")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


@pytest.mark.parametrize("policy,expect_rows", [("min", False), ("max", True)])
def test_idle_source_watermark_policy(spark, sf_dir, tmp_path, policy, expect_rows):
    set_idleness_policy(spark, policy)
    try:
        out = run_to_memory(_union_agg(spark, sf_dir, tmp_path), output_mode="append")
        n = out.count()
    finally:
        set_idleness_policy(spark, "min")  # restore the strict default
    assert (n > 0) == expect_rows, f"policy={policy} emitted {n} closed windows"
