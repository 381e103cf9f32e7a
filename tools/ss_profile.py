"""Profile the Structured-Streaming per-query lifecycle of the stateful
bench rows (r13 verdict item 1): wall-clock segments of a bounded
run-to-memory execution plus Spark's own per-micro-batch durationMs
breakdown from StreamingQueryProgress.

Usage: python tools/ss_profile.py [topn|cep|both] [n_runs]

Replicates run_to_memory's exact mechanics (memory sink, availableNow,
scratch-dir checkpoint) but keeps the query handle so recentProgress is
readable; the first run is a discarded warm-up (worker forks, codegen).
Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def build_topn(spark, sf_dir):
    from flink_1_12_2_spark.streaming.core import stream_events
    from flink_1_12_2_spark.streaming.stateful import streaming_topn

    ev = stream_events(spark, sf_dir)
    return streaming_topn(ev, n=3), "update"


def build_cep(spark, sf_dir):
    from flink_1_12_2_spark.streaming.cep import Pattern, cep_pattern_matches
    from flink_1_12_2_spark.streaming.core import stream_events

    ev = stream_events(spark, sf_dir)
    pat = (
        Pattern.begin("mid", lambda r: r["value"] > 50)
        .bound("value > 50")
        .followed_by("high", lambda r: r["value"] > 150)
        .bound("value > 150")
        .within(24 * 3600 * 1_000_000)
    )
    return cep_pattern_matches(ev, pat), "append"


def profiled_run(spark, builder, sf_dir, label):
    from flink_1_12_2_spark.session import scratch_dir

    seg = {}
    t0 = time.perf_counter()
    sdf, mode = builder(spark, sf_dir)
    seg["build"] = time.perf_counter() - t0

    name = "prof_" + uuid.uuid4().hex[:12]
    ckpt = scratch_dir("ssprof_ckpt_")
    t0 = time.perf_counter()
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    seg["start_call"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    finished = q.awaitTermination(300)
    seg["await_term"] = time.perf_counter() - t0
    progress = [json.loads(p.json) for p in q.recentProgress]
    t0 = time.perf_counter()
    if q.isActive:
        q.stop()
    seg["stop"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    spark.table(name).orderBy(spark.table(name).columns[0]).write.format(
        "noop"
    ).mode("overwrite").save()
    seg["readback_write"] = time.perf_counter() - t0
    seg["total"] = sum(seg.values())

    batches = []
    for p in progress:
        batches.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
            }
        )
    return {
        "label": label,
        "finished": finished,
        "segments": {k: round(v, 3) for k, v in seg.items()},
        "batches": batches,
    }


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from flink_1_12_2_spark.registry import load
    from flink_1_12_2_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = json.loads(os.environ.get("SS_PROFILE_EXTRA_CONF", "{}"))
    spark = get_spark(
        app_name="ss_profile", shuffle_partitions=cpus, extra_conf=extra
    )
    spark.sparkContext.setLogLevel("ERROR")
    load(spark, sf_dir, "events").count()

    builders = {"topn": build_topn, "cep": build_cep}
    names = ["topn", "cep"] if which == "both" else [which]
    for nm in names:
        # warm-up run (codegen, worker forks) — discarded
        profiled_run(spark, builders[nm], sf_dir, f"{nm}_warmup")
        for i in range(n_runs):
            r = profiled_run(spark, builders[nm], sf_dir, f"{nm}_{i}")
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
