"""Early/late firing emulation (EventTimeTriggers.java:36-71): the
update-mode harness must emit exactly one record per (window, batch-touch) —
k−1 early firings plus one final for a window touched by k micro-batches —
and the early partials must be monotone prefixes of the final aggregate."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window as W


def _emissions(spark, sf_dir):
    from flink_1_12_2_spark.streaming.core import (
        run_update_batches,
        stream_events_multibatch,
        tag_final_firings,
    )

    ev = stream_events_multibatch(spark, sf_dir, n_files=4)
    agg = ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value")
    )
    return tag_final_firings(run_update_batches(agg), ["win", "event_type"])


def _expected_touches(spark, sf_dir):
    """Replicate the splitter's batch assignment (ntile(4) over (ts_us,
    event_id)) and count, per (window, event_type) group, the distinct
    batches containing its rows — each touch is one update emission."""
    from flink_1_12_2_spark.registry import load

    ev = load(spark, sf_dir, "events")
    ev = ev.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    ev = ev.withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    tiled = ev.withColumn(
        "__file", F.ntile(4).over(W.orderBy("ts_us", "event_id")) - 1
    )
    return tiled.groupBy(
        F.window("ts", "1 hour").alias("win"), "event_type"
    ).agg(F.countDistinct("__file").alias("touches"))


def test_emission_count_is_touches(spark, sf_dir):
    em = _emissions(spark, sf_dir)
    got = em.groupBy("win", "event_type").agg(
        F.count(F.lit(1)).alias("emissions")
    )
    exp = _expected_touches(spark, sf_dir)
    j = got.join(exp, ["win", "event_type"], "full_outer")
    bad = j.filter(
        F.col("emissions").isNull()
        | F.col("touches").isNull()
        | (F.col("emissions") != F.col("touches"))
    ).count()
    assert bad == 0
    # early firings == Σ(touches − 1); at sf0.001 the testdata's hour
    # windows happen to never straddle a chunk boundary (0 == 0 holds);
    # the guaranteed-early case is pinned on the dense fixture below
    early = em.filter(~F.col("is_final")).count()
    exp_early = exp.agg(F.sum(F.col("touches") - 1)).collect()[0][0]
    assert early == exp_early


def test_dense_window_fires_early(spark, tmp_path):
    """A window whose rows span every micro-batch fires k−1 early partials
    and one final, and the final equals the batch aggregate."""
    import pyspark.sql.functions as F2

    from flink_1_12_2_spark.streaming.core import (
        run_update_batches,
        stream_events_multibatch,
        tag_final_firings,
    )

    base = 1_700_000_000_000_000  # µs
    rows = [
        (i, base + i * 60_000_000, "click", float(i))  # 40 events, 1/min
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts_us bigint, event_type string, value double"
    ).select(
        "event_id",
        F2.timestamp_micros(F2.col("ts_us")).cast("timestamp_ntz").alias("ts"),
        F2.lit(7).cast("bigint").alias("user_id"),
        "event_type",
        "value",
    )
    sf_dir = str(tmp_path / "dense")
    df.coalesce(1).write.parquet(sf_dir + "/events.parquet")
    ev = stream_events_multibatch(spark, sf_dir, n_files=4)
    agg = ev.groupBy(F2.window("ts", "1 hour").alias("win"), "event_type").agg(
        F2.count(F2.lit(1)).alias("cnt"), F2.sum("value").alias("total_value")
    )
    em = tag_final_firings(run_update_batches(agg), ["win", "event_type"])
    # 40 one-minute events = 1 full hour window (40 rows) → but ntile
    # splits 4×10: the first hour window spans all 4 batches
    per_win = {
        (r.win, r.event_type): (r.n, r.fin)
        for r in em.groupBy("win", "event_type")
        .agg(
            F2.count(F2.lit(1)).alias("n"),
            F2.sum(F2.col("is_final").cast("int")).alias("fin"),
        )
        .collect()
    }
    assert all(fin == 1 for (_, fin) in per_win.values())
    early_total = em.filter(~F2.col("is_final")).count()
    assert early_total > 0
    final = em.filter(F2.col("is_final"))
    batch = {
        (r.win, r.event_type): (r.cnt, r.total_value)
        for r in df.groupBy(F2.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F2.count(F2.lit(1)).alias("cnt"), F2.sum("value").alias("total_value"))
        .collect()
    }
    got = {
        (r.win, r.event_type): (r.cnt, r.total_value) for r in final.collect()
    }
    assert got == batch


def test_early_partials_are_monotone_prefixes(spark, sf_dir):
    """Each successive firing for a window adds rows: cnt strictly increases
    batch over batch and the final cnt equals the batch-oracle total (the
    final-row hash check lives in the registered query's oracle)."""
    em = _emissions(spark, sf_dir)
    w = W.partitionBy("win", "event_type").orderBy("__batch_id")
    stepped = em.withColumn("prev_cnt", F.lag("cnt").over(w))
    bad = stepped.filter(
        F.col("prev_cnt").isNotNull() & (F.col("cnt") <= F.col("prev_cnt"))
    ).count()
    assert bad == 0
