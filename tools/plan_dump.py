"""Dump `.explain("formatted")` for headline (and any named) queries to
plans/<round>/<query>_<suffix>.txt.

Usage: python tools/plan_dump.py <round> <suffix> [query ...]
  round   e.g. r13  -> writes under plans/r13/
  suffix  e.g. before / after
  query   optional explicit list; default = bench headline set (batch rows
          only — streaming rows execute inside fn() and have no static
          batch plan; for those we dump the logical plan of the returned
          batch result instead, which is just the memory-sink table, so
          they are skipped here and profiled separately).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]

    import bench
    from flink_1_12_2_spark.registry import QUERIES, load_all_query_modules
    from flink_1_12_2_spark.session import get_spark

    load_all_query_modules()
    if not names:
        names = [
            n
            for n in bench.HEADLINE + bench.LLM_HEADLINE
            if n in QUERIES and n not in ("bpe_train_merges",)
        ]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="plan_dump", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = Path(_REPO) / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        fn = QUERIES[name].fn
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # streaming rows etc.
            plan = f"<no static batch plan: {type(e).__name__}: {e}>"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
