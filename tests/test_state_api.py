"""State Processor API analogue tests (flink-libraries/
flink-state-processing-api: Savepoint / ExistingSavepoint /
WritableSavepoint / OperatorTransformation) — the library's
read-modify-write example, the three state kinds, keyed-state contract
enforcement, and the point-lookup bucket pruning."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
import pytest

from flink_1_12_2_spark import state_api


def _mkstate(spark, tmp_path, uid="op-a", n=100):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
    )
    path = str(tmp_path / "sp1")
    state_api.create().with_operator(
        uid, df, primary_key=("k",), num_buckets=8
    ).write(path)
    return path


def test_bootstrap_then_read_keyed_state_roundtrip(spark, tmp_path):
    path = _mkstate(spark, tmp_path)
    sp = state_api.load(spark, path)
    assert sp.operators() == ["op-a"]
    got = sp.read_keyed_state("op-a")
    assert sorted(got.columns) == ["k", "v"]
    rows = {r["k"]: r["v"] for r in got.collect()}
    assert len(rows) == 100 and rows[7] == 70


def test_read_modify_write_example(spark, tmp_path):
    """The library's canonical example (state-processor-api docs /
    ExistingSavepoint + WritableSavepoint composition): load, transform
    one operator's state, write a NEW savepoint, resume-read it."""
    path = _mkstate(spark, tmp_path)
    sp = state_api.load(spark, path)
    migrated = sp.read_keyed_state("op-a").withColumn(
        "v", F.col("v") + 1
    )
    out = str(tmp_path / "sp2")
    (
        sp.to_writable()
        .remove_operator("op-a")
        .with_operator("op-a", migrated, primary_key=("k",), num_buckets=8)
        .write(out)
    )
    rows = {
        r["k"]: r["v"]
        for r in state_api.load(spark, out)
        .read_keyed_state("op-a")
        .collect()
    }
    assert rows[7] == 71 and len(rows) == 100


def test_point_lookup_prunes_buckets(spark, tmp_path):
    path = _mkstate(spark, tmp_path, n=1000)
    sp = state_api.load(spark, path)
    keys = [(3,), (500,), (999,)]
    got = sp.read_keyed_state("op-a", keys=keys)
    assert {r["k"] for r in got.collect()} == {3, 500, 999}
    # partition pruning: the physical scan carries a __bucket partition
    # filter (inputFiles() ignores pruning, so assert on the plan)
    want_buckets = {state_api.bucket_of(k, 8) for k in keys}
    plan = got._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__bucket" in m.group(1), plan
    assert all(str(b) in m.group(1) for b in want_buckets), m.group(1)


def test_list_and_broadcast_state(spark, tmp_path):
    lst = spark.range(5).select(F.col("id").alias("e"))
    bc = spark.createDataFrame(
        [("rule1", 10), ("rule2", 20)], ["name", "threshold"]
    )
    path = str(tmp_path / "sp3")
    (
        state_api.create()
        .with_operator("src", lst, kind=state_api.LIST)
        .with_operator("rules", bc, kind=state_api.BROADCAST)
        .write(path)
    )
    sp = state_api.load(spark, path)
    assert sp.read_list_state("src").count() == 5
    assert sp.read_union_state("src").count() == 5  # same stored rows
    assert {
        r["name"]: r["threshold"]
        for r in sp.read_broadcast_state("rules").collect()
    } == {"rule1": 10, "rule2": 20}
    # kind mismatch is an error, like the typed read* families
    with pytest.raises(ValueError, match="holds list state"):
        sp.read_keyed_state("src")
    with pytest.raises(ValueError, match="holds broadcast state"):
        sp.read_list_state("rules")


def test_keyed_state_contract_and_missing_operator(spark, tmp_path):
    dup = spark.createDataFrame([(1, "a"), (1, "b")], ["k", "v"])
    w = state_api.create().with_operator(
        "bad", dup, primary_key=("k",), num_buckets=4
    )
    with pytest.raises(ValueError, match="one row per key"):
        w.write(str(tmp_path / "sp_bad"))
    path = _mkstate(spark, tmp_path)
    sp = state_api.load(spark, path)
    with pytest.raises(ValueError, match="no operator"):
        sp.read_keyed_state("nope")
    with pytest.raises(ValueError, match="needs a primary key"):
        state_api.create().with_operator(
            "k-less", dup, kind=state_api.KEYED
        )


def test_mount_upsert_store_reads_live_sink_state(spark, tmp_path):
    """The 'query a running job's state' half: an upsert sink's backing
    table mounts directly as a single-operator savepoint."""
    from flink_1_12_2_spark.operators.changelog import upsert_foreach_batch

    from flink_1_12_2_spark.operators.changelog import ROW_KIND

    batch = spark.createDataFrame(
        [("+I", 1, 10, 0), ("+I", 2, 20, 0), ("+U", 1, 11, 1),
         ("-D", 2, 0, 2)],
        [ROW_KIND, "k", "v", "seq"],
    )
    state_dir = str(tmp_path / "sink_state")
    upsert_foreach_batch(state_dir, ["k"], ["seq"], num_buckets=4)(batch, 0)
    sp = state_api.mount_upsert_store(
        spark, state_dir, "sink", ["k"], num_buckets=4
    )
    rows = {r["k"]: r["v"] for r in sp.read_keyed_state("sink").collect()}
    assert rows == {1: 11}


def test_bootstrapped_savepoint_resumes_under_upsert_sink(spark, tmp_path):
    """Bootstrap writes the EXACT upsert-store layout, so the engine's
    sink continues from bootstrapped state (the library's 'seed a new
    job' use case)."""
    from flink_1_12_2_spark.operators.changelog import upsert_foreach_batch

    seed = spark.createDataFrame(
        [(1, 10, 0), (2, 20, 0)], ["k", "v", "seq"]
    )
    path = str(tmp_path / "sp_seed")
    state_api.create().with_operator(
        "sink", seed, primary_key=("k",), num_buckets=4
    ).write(path)
    state_dir = f"{path}/sink"
    from flink_1_12_2_spark.operators.changelog import ROW_KIND

    nxt = spark.createDataFrame(
        [("+U", 1, 99, 1), ("+I", 3, 30, 1)], [ROW_KIND, "k", "v", "seq"]
    )
    upsert_foreach_batch(state_dir, ["k"], ["seq"], num_buckets=4)(nxt, 1)
    rows = {
        r["k"]: r["v"]
        for r in state_api.load(spark, path)
        .read_keyed_state("sink")
        .collect()
    }
    assert rows == {1: 99, 2: 20, 3: 30}


def test_point_lookup_with_null_key_component(spark, tmp_path):
    """A key tuple containing None must still find its row: Spark's
    concat_ws SKIPS nulls while the driver-side str(v) would hash
    "None", so bucket pruning is bypassed for null-bearing lookups
    (r11 advice) and the exact filter matches via isNull — `col = NULL`
    is never true under SQL null semantics."""
    df = spark.createDataFrame(
        [(1, "a", 10), (None, "b", 20), (3, None, 30)],
        "k1 int, k2 string, v int",
    )
    path = str(tmp_path / "spn")
    state_api.create().with_operator(
        "op-n", df, primary_key=("k1", "k2"), num_buckets=8
    ).write(path)
    sp = state_api.load(spark, path)
    got = sp.read_keyed_state("op-n", keys=[(None, "b"), (3, None)])
    rows = {r["v"] for r in got.collect()}
    assert rows == {20, 30}
    # no stale bucket filter sneaks in for null-bearing lookups
    plan = got._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is None or "__bucket" not in (m.group(1) or "")
    # pure lookups still prune (unchanged fast path)
    pruned = sp.read_keyed_state("op-n", keys=[(1, "a")])
    assert [r["v"] for r in pruned.collect()] == [10]


def test_bootstrap_then_resume_streaming_topn(spark, tmp_path):
    """The library's 'seed a new job' use case, end to end on the
    streaming top-N: a savepoint bootstrapped with per-user rank state
    is RESUMED by the streaming top-N — the seed state replays as the
    job's first micro-batch (exact for top-N, whose keyed state IS its
    top rows), new events arrive in a second micro-batch, and the rank
    upsert sink keeps writing into the SAME savepoint operator dir the
    bootstrap created. The final savepoint read must rank seed ∪ new."""
    import os

    from flink_1_12_2_spark.operators.changelog import upsert_foreach_batch
    from flink_1_12_2_spark.streaming.stateful import streaming_topn

    sp = str(tmp_path / "sp_topn")
    seed_ranks = spark.createDataFrame(
        [(1, 100, 50.0, 1, 0), (1, 101, 40.0, 2, 0), (2, 200, 5.0, 1, 0)],
        "user_id bigint, event_id bigint, value double, rn bigint, seq bigint",
    )
    state_api.create().with_operator(
        "topn-rank", seed_ranks, primary_key=("user_id", "rn"), num_buckets=4
    ).write(sp)

    # resume: replay the bootstrapped state as micro-batch 1, new events
    # as micro-batch 2 (file mtimes order the stream's batches)
    stream_dir = str(tmp_path / "stream_in")
    seed_events = (
        state_api.load(spark, sp)
        .read_keyed_state("topn-rank")
        .select("user_id", "event_id", "value")
    )
    seed_events.coalesce(1).write.parquet(f"{stream_dir}/b1")
    new_events = spark.createDataFrame(
        [(1, 102, 60.0), (2, 201, 3.0)],
        "user_id bigint, event_id bigint, value double",
    )
    new_events.coalesce(1).write.parquet(f"{stream_dir}/b2")
    for sub, t in (("b1", 1000), ("b2", 2000)):
        d = f"{stream_dir}/{sub}"
        for f in os.listdir(d):
            os.utime(f"{d}/{f}", (t, t))
    ev = (
        spark.readStream.schema(
            "user_id bigint, event_id bigint, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stream_dir)
    )
    q = (
        streaming_topn(ev, n=2)
        .writeStream.foreachBatch(
            upsert_foreach_batch(
                f"{sp}/topn-rank", ["user_id", "rn"], ["seq"], num_buckets=4
            )
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["rn"]): (r["event_id"], r["value"])
        for r in state_api.load(spark, sp)
        .read_keyed_state("topn-rank")
        .collect()
    }
    assert got == {
        (1, 1): (102, 60.0),  # new event takes rank 1...
        (1, 2): (100, 50.0),  # ...seeded rank-1 row slides to rank 2
        (2, 1): (200, 5.0),   # seeded rank survives
        (2, 2): (201, 3.0),   # new event ranks below it
    }
