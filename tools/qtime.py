"""Micro-bench: time individual registered queries bench-style.

Usage: python tools/qtime.py [-n ATTEMPTS] query [query ...]

Replicates bench.py's methodology exactly (same session conf, same warm-up
tables, clearCache between attempts, noop sink, fn()-inside-timing for the
stateful/TIMED_INSIDE_FN rows) so numbers are comparable with BENCH_r*.json
rows, and prints one JSON line with per-attempt times (not just the min) —
the per-attempt spread is the contention discriminator SCALE.md r11/r12
established.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    args = sys.argv[1:]
    attempts = 3
    if args and args[0] == "-n":
        attempts = int(args[1])
        args = args[2:]
    names = args

    import bench
    from flink_1_12_2_spark.registry import QUERIES, load, load_all_query_modules
    from flink_1_12_2_spark.session import get_spark

    load_all_query_modules()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="qtime", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        load(spark, sf_dir, t).count()

    from flink_1_12_2_spark.llm.dedup import is_multisplit

    timed_inside_fn = set(bench.TIMED_INSIDE_FN)
    if is_multisplit(load(spark, sf_dir, "documents")):
        timed_inside_fn.update(bench.EAGER_FILL_QUERIES)

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name].fn
        if name == "bpe_encode_docs":
            fn = bench._bpe_encode_fixture(spark, sf_dir)
        stateful = name in timed_inside_fn
        runs: list[float] = []
        for _ in range(attempts):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            if stateful:
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            else:
                df = fn(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(runs), "runs": runs}
    print(json.dumps({"queries": out, "loadavg": list(os.getloadavg())}))


if __name__ == "__main__":
    main()
