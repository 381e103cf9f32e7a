"""Bucketed upsert state: a micro-batch must rewrite ONLY the state
buckets containing touched keys (dynamic partition overwrite), leaving
every other bucket's files byte-identical on disk."""

import os
import tempfile

import pyspark.sql.functions as F

from flink_1_12_2_spark.operators.changelog import (
    DELETE,
    INSERT,
    ROW_KIND,
    UPDATE_AFTER,
    upsert_foreach_batch,
)


def _files(state_dir):
    out = {}
    for root, _, files in os.walk(state_dir):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.stat(p).st_mtime_ns
    return out


def test_untouched_buckets_not_rewritten(spark):
    state = tempfile.mkdtemp(prefix="bucket_upsert_") + "/state"
    sink = upsert_foreach_batch(state, ["k"], ["seq"], num_buckets=16)

    def batch(rows):
        return spark.createDataFrame(rows, f"{ROW_KIND} string, k bigint, seq bigint, v string")

    # batch 0: 200 keys spread over all 16 buckets
    sink(batch([(INSERT, k, 0, f"v{k}") for k in range(200)]), 0)
    before = _files(state)
    buckets = {p.split("__bucket=")[1].split("/")[0] for p in before}
    assert len(buckets) == 16

    # batch 1: touch exactly one key → at most one bucket rewritten
    sink(batch([(UPDATE_AFTER, 7, 1, "v7b")]), 1)
    after = _files(state)
    changed = {
        p.split("__bucket=")[1].split("/")[0]
        for p in set(after) ^ set(before)
        | {p for p in set(after) & set(before) if after[p] != before[p]}
    }
    assert len(changed) == 1, changed

    # state correctness: update applied, everything else intact
    got = spark.read.parquet(state)
    assert got.count() == 200
    assert got.filter(F.col("k") == 7).select("v").first()["v"] == "v7b"

    # batch 2: delete evicts the key from its bucket only
    sink(batch([(DELETE, 7, 2, "v7b")]), 2)
    got2 = spark.read.parquet(state)
    assert got2.count() == 199
    assert got2.filter(F.col("k") == 7).count() == 0


def test_bucket_emptied_by_delete_is_dropped(spark):
    """A micro-batch that deletes EVERY key of a bucket (no untouched keys
    in it) must not leave the bucket's old files behind — dynamic
    partition overwrite writes nothing for an empty bucket, so the sink
    drops the directory explicitly."""
    state = tempfile.mkdtemp(prefix="bucket_upsert_del_") + "/state"
    sink = upsert_foreach_batch(state, ["k"], ["seq"], num_buckets=4)

    def batch(rows):
        return spark.createDataFrame(
            rows, f"{ROW_KIND} string, k bigint, seq bigint, v string"
        )

    sink(batch([(INSERT, 7, 0, "v7")]), 0)  # the only key in its bucket
    assert spark.read.parquet(state).count() == 1
    sink(batch([(DELETE, 7, 1, "v7")]), 1)
    import glob

    files = glob.glob(os.path.join(state, "__bucket=*", "*.parquet"))
    assert files == [], files
