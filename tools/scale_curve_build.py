"""Build the r14 scaling-curve corpus: every bench input scaled ~10× so
the headline set can demonstrate core-scaling (r13 verdict item 2 — at
sf0.1 all 23 low/high-core ratios are ≈1 because fixed machinery
dominates; this corpus makes data work dominate instead).

Unlike tools/scale_probe.py (which scales only documents+events and
symlinks the rest), this scales:

- documents  : N copies, copy-salted vocabulary (no cross-copy near-dups)
- events     : N copies, per-copy key/id shifts (keyed state replicates)
- lineitem   : N copies, per-copy l_orderkey shift (q1/smj/sort/rollup...)
- orders     : N copies, per-copy o_orderkey + o_custkey-preserving shift
- embeddings : N copies, per-copy vec_id shift + tiny per-copy value
               perturbation (keeps cross-copy vectors from being exact
               duplicates, which would inflate near-dup candidate counts
               superlinearly — an artifact of replication, not of the
               algorithm under test)

Dimensions (region/nation/customer/supplier/part) stay at base size —
the realistic shape: facts grow, dims don't.

The output dir name ends in ``sf1`` so bench.py's SF label parses.
Usage: python tools/scale_curve_build.py [base_sf_dir] [copies] [out_dir]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

DIM_TABLES = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_dir = (
        sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale_curve_sf1"
    )
    done_marker = os.path.join(out_dir, "_BUILT")
    if os.path.exists(done_marker):
        print(out_dir)
        return

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    def write(df, name):
        df.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )

    def union_copies(make_copy):
        parts = [make_copy(c) for c in range(copies)]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    # documents: salted vocabulary per copy (see scale_probe.py rationale)
    d = spark.read.parquet(os.path.join(base, "documents.parquet"))

    def doc_copy(c):
        p = d.withColumn("doc_id", F.col("doc_id") + F.lit(c * 10_000_000))
        if c:
            suf = F.lit(f"_{c}")
            p = p.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, suf),
                    ),
                    " ",
                ),
            )
        return p

    write(union_copies(doc_copy), "documents")

    # events: shift keys + ids per copy (timestamps unchanged)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(os.path.join(base, "events.parquet"))

    def ev_copy(c):
        return ev.withColumn(
            "event_id", F.col("event_id") + F.lit(c * 100_000_000)
        ).withColumn("user_id", F.col("user_id") + F.lit(c * 10_000_000))

    write(union_copies(ev_copy), "events")

    # lineitem / orders: shift order keys per copy; customer keys stay in
    # the base range so dim joins (star) keep their selectivity
    li = spark.read.parquet(os.path.join(base, "lineitem.parquet"))

    def li_copy(c):
        return li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(c * 100_000_000)
        )

    write(union_copies(li_copy), "lineitem")

    o = spark.read.parquet(os.path.join(base, "orders.parquet"))

    def o_copy(c):
        return o.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(c * 100_000_000)
        )

    write(union_copies(o_copy), "orders")

    # embeddings: shift ids, perturb values slightly per copy (deterministic)
    e = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    emb_type = dict(e.dtypes)["embedding"]
    elem = "double" if "double" in emb_type else "float"

    def e_copy(c):
        p = e.withColumn("vec_id", F.col("vec_id") + F.lit(c * 10_000_000))
        if c:
            eps = F.lit(float(c) * 1e-3)
            p = p.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, i: (
                        x
                        + eps
                        * F.when(i % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
                    ).cast(elem),
                ),
            )
        return p

    write(union_copies(e_copy), "embeddings")

    for t in DIM_TABLES:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)

    spark.stop()
    Path(done_marker).touch()
    print(out_dir)


if __name__ == "__main__":
    main()
