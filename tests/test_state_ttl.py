"""State TTL (StateTtlConfig / table.exec.state.ttl parity) on the keep-last
dedup operator: a key idle past the TTL is EVICTED from the state store once
the watermark passes (event-time timeout). Emitted rows are provably
unchanged — any row surviving the late-row filter is newer than the expired
state — so the assertion targets the state store's row count, which is the
whole point of a TTL: bounded state on unbounded key spaces.

Three micro-batches (maxFilesPerTrigger=1):
  b1: key 1 @ t0          -> state {1}
  b2: key 2 @ t0+3h       -> watermark advances past t0 + ttl(30min)
  b3: key 3 @ t0+3h+1s    -> timeout fires for key 1 -> state {2, 3}
Without TTL the final state holds all three keys.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F

from flink_1_12_2_spark.streaming.stateful import streaming_dedup_keep_last

T0 = 1_700_000_000_000_000  # µs
H3 = 3 * 3600 * 1_000_000


def _topic(spark):
    d = tempfile.mkdtemp(prefix="ttl_src_")
    rows = [
        [(100, T0, 1, "click", 1.0)],
        [(200, T0 + H3, 2, "click", 2.0)],
        [(300, T0 + H3 + 1_000_000, 3, "click", 3.0)],
    ]
    schema = "event_id long, ts_us long, user_id long, event_type string, value double"
    for i, batch in enumerate(rows):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"b{i}"))
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(d)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("ts", "1 minute")
    )


def _run_and_count_state(spark, sdf, output_mode="update") -> tuple[int, set[int]]:
    name = "ttl_" + uuid.uuid4().hex[:10]
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ttl_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    keys = {r.user_id for r in spark.table(name).collect()}
    return state_rows, keys


def test_ttl_bounds_state_rows(spark):
    out = streaming_dedup_keep_last(_topic(spark), state_ttl_seconds=1800)
    state_rows, keys = _run_and_count_state(spark, out)
    assert keys == {1, 2, 3}  # emissions unchanged by TTL
    assert state_rows == 2  # key 1 evicted when the watermark passed t0+ttl


def test_no_ttl_retains_all_keys(spark):
    out = streaming_dedup_keep_last(_topic(spark))
    state_rows, keys = _run_and_count_state(spark, out)
    assert keys == {1, 2, 3}
    assert state_rows == 3


def test_topn_ttl_bounds_state(spark):
    from flink_1_12_2_spark.streaming.stateful import streaming_topn

    with_ttl = streaming_topn(_topic(spark), n=3, state_ttl_seconds=1800)
    state_rows, keys = _run_and_count_state(spark, with_ttl)
    assert keys == {1, 2, 3}
    assert state_rows == 2  # key 1's rank state evicted

    without = streaming_topn(_topic(spark), n=3)
    state_rows, keys = _run_and_count_state(spark, without)
    assert keys == {1, 2, 3}
    assert state_rows == 3


def test_over_agg_ttl_bounds_state(spark):
    """table.exec.state.ttl on the streaming over-agg
    (AbstractRowTimeUnboundedPrecedingOver cleanup-timer parity): key 1's
    accumulator is evicted once the watermark passes t0+ttl; emissions are
    unchanged on this fixture (each key's rows arrive within its TTL)."""
    from flink_1_12_2_spark.streaming.stateful import streaming_over_agg

    with_ttl = streaming_over_agg(_topic(spark), state_ttl_seconds=1800)
    state_rows, keys = _run_and_count_state(spark, with_ttl, "append")
    assert keys == {1, 2, 3}
    assert state_rows == 2

    without = streaming_over_agg(_topic(spark))
    state_rows, keys = _run_and_count_state(spark, without, "append")
    assert keys == {1, 2, 3}
    assert state_rows == 3


def _tagged_topic(spark):
    """The TTL fixture reshaped for the outer-join operator: every event is
    a left row (no right matches → each emits one +I padding row)."""
    sdf = _topic(spark)
    return sdf.select(
        F.lit("L").alias("side"), "user_id", "event_id", "ts_us", "ts"
    )


def test_outer_join_changelog_ttl_bounds_state(spark):
    """Idle-state retention on the streaming outer join
    (StreamingJoinOperator minRetentionTime parity): key 1's join state is
    evicted after the TTL; the emitted changelog is identical."""
    from flink_1_12_2_spark.streaming.stateful import (
        streaming_outer_join_changelog,
    )

    def run(ttl):
        out = streaming_outer_join_changelog(
            _tagged_topic(spark), state_ttl_seconds=ttl
        )
        return _run_and_count_state(spark, out)

    state_rows, keys = run(1800)
    assert keys == {1, 2, 3}
    assert state_rows == 2

    state_rows, keys = run(None)
    assert keys == {1, 2, 3}
    assert state_rows == 3


# ---- skewed streaming Top-N: local/global split (MiniBatch rank parity) ---


def _skewed_topic(spark, hot_rows=400):
    """One HOT key (1000 rows across 2 batches) + two cold keys."""
    d = tempfile.mkdtemp(prefix="skew_src_")
    schema = "event_id long, ts_us long, user_id long, event_type string, value double"
    for b in range(2):
        rows = [
            (b * 10_000 + i, T0 + b * 60_000_000 + i * 1000, 1, "click",
             float((i * 37 + b * 11) % 997))
            for i in range(hot_rows)
        ] + [
            (90_000 + b * 10 + k, T0 + b * 60_000_000, 2 + k, "click", float(k))
            for k in range(2)
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"b{b}"))
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(d)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .withWatermark("ts", "1 minute")
    )


def test_skewed_topn_pre_aggregate_identical_output(spark):
    """Under a hot key, the local top-n combiner must leave the emitted
    ranking byte-identical while bounding what crosses the shuffle; state
    stays at ≤ n rows per key either way."""
    from flink_1_12_2_spark.streaming.stateful import streaming_topn

    def final_ranking(pre):
        out = streaming_topn(
            _skewed_topic(spark), n=3, state_ttl_seconds=1800,
            pre_aggregate=pre,
        )
        name = "skew_" + uuid.uuid4().hex[:10]
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="skew_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        rows = spark.table(name).collect()
        last_seq = max(r.seq for r in rows)
        final = sorted(
            (r.user_id, r.rn, r.event_id, r.value)
            for r in rows
            if r.seq == last_seq or r.user_id != 1
        )
        return state_rows, final

    s1, plain = final_ranking(False)
    s2, combined = final_ranking(True)
    assert plain == combined
    # bounded state regardless of skew: top-3 per key, 3 keys
    assert s1 == 3 and s2 == 3


def test_local_topn_combiner_bounds_rows(spark):
    """The combiner emits ≤ n rows per key per partition and they are the
    partition-local maxima."""
    from flink_1_12_2_spark.streaming.stateful import local_topn_combiner

    rows = [(i, T0 + i, 1, "click", float(i % 50)) for i in range(200)]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_us long, user_id long, event_type string, value double",
    ).repartition(4)
    out = local_topn_combiner(df, 3).collect()
    assert len(out) <= 3 * 4
    assert max(r.value for r in out) == 49.0
