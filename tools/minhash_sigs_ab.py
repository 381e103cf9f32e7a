"""r13 verdict item 5: is the `sigs` persist in dedup_minhash_lsh
load-bearing (like ngram's docs cache) or removable?

Interleaved A/B, bench-style timed region (clearCache, then build fn and
time the noop write): variant A = current query body (sigs persisted),
variant B = identical body with NO persist on sigs. Rows are compared to
guarantee both variants compute the same answer. Prints one JSON line.

Usage: python tools/minhash_sigs_ab.py [rounds]
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

import pyspark.sql.functions as F  # noqa: E402


def build(spark, sf_dir, persist_sigs: bool):
    from flink_1_12_2_spark.llm import dedup as D
    from flink_1_12_2_spark.queries.llm_dedup import JACCARD_T
    from flink_1_12_2_spark.registry import load

    d = load(spark, sf_dir, "documents")
    sets_ = D.shingle_sets(d, "doc_id", "text")
    sigs = D.minhash_signatures_from_sets(sets_, "doc_id")
    if persist_sigs:
        sigs = sigs.persist()
    cand = D.lsh_candidate_pairs(sigs, "doc_id", eager=D.is_multisplit(d))
    ver = D.jaccard_verify(cand, d, "doc_id", "text", sets_df=sets_)
    return (
        ver.filter(F.col("jaccard") >= JACCARD_T)
        .select("id_1", "id_2", F.round("jaccard", 6).alias("jaccard"))
        .persist()
        .orderBy("id_1", "id_2")
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from flink_1_12_2_spark.registry import load
    from flink_1_12_2_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="sigs_ab", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("documents",):
        load(spark, sf_dir, t).count()

    # warm-up both variants once (codegen), then row-count equality check
    ra = build(spark, sf_dir, True)
    na = ra.count()
    spark.catalog.clearCache()
    rb = build(spark, sf_dir, False)
    nb = rb.count()
    assert na == nb, (na, nb)
    spark.catalog.clearCache()

    out = {"A_persist": [], "B_noPersist": []}
    for _ in range(rounds):
        for label, flag in (("A_persist", True), ("B_noPersist", False)):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"sigs_ab:{label}")
            df = build(spark, sf_dir, flag)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out[label].append(round(time.perf_counter() - t0, 3))
    res = {
        k: {"runs": v, "min": min(v), "med": sorted(v)[len(v) // 2]}
        for k, v in out.items()
    }
    res["rows"] = na
    res["loadavg"] = list(os.getloadavg())
    print(json.dumps(res))


if __name__ == "__main__":
    main()
