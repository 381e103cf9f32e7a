"""Replay the driver's 50-slot correctness gate under a VANILLA SparkSession.

The round driver does not use ``flink_1_12_2_spark.session.get_spark`` (no
AQE confs, no UTC session timezone, no Arrow flags) — this replica catches
any query that silently depends on the engine's session defaults.

Usage: python tools/vanilla_gate.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from tools.oracle_check import TABLES, canonical_rows

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    fails: list[tuple] = []
    for name in list(qs)[:n]:
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(osql[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            sc = canonical_rows(sdf.columns, srows)
            dc = canonical_rows(dcols, drows)
            ok = (
                len(srows) == len(drows)
                and sorted(sdf.columns) == sorted(dcols)
                and sc == dc
            )
            print(("PASS " if ok else "FAIL ") + name, flush=True)
            if not ok:
                fails.append((name, len(srows), len(drows)))
                # pinpoint the divergence: sorted column order + the first
                # differing canonical rows, so a red driver artifact can be
                # traced to specific values, not just a hash
                print(f"  cols(sorted): {sorted(sdf.columns)}")
                if sorted(sdf.columns) != sorted(dcols):
                    print(f"  oracle cols : {sorted(dcols)}")
                shown = 0
                for i in range(max(len(sc), len(dc))):
                    a = sc[i] if i < len(sc) else "<missing>"
                    b = dc[i] if i < len(dc) else "<missing>"
                    if a != b:
                        print(f"  row[{i}] spark ={a}\n  row[{i}] oracle={b}")
                        shown += 1
                        if shown >= 5:
                            break
            spark.catalog.clearCache()
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            print(f"ERR  {name}: {str(e)[:160]}", flush=True)
            fails.append((name, "ERR"))
    print(
        f"\n{n - len(fails)} pass, {len(fails)} fail (vanilla session)"
    )
    if fails:
        print("failed:", ", ".join(str(f[0]) for f in fails))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
