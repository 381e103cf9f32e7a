"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This mirrors the driver's t2 correctness gate (CORRECTNESS_r{N}.json) so a
regression is caught locally before the round boundary.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

from flink_1_12_2_spark.registry import QUERIES, load_all_query_modules
from tools.oracle_check import TABLES, canonical_rows

load_all_query_modules()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    # the 160-query sweep shares one JVM: drop the previous query's persisted
    # frames so cached partitions can't accumulate into a heap OOM
    spark.catalog.clearCache()
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only check: must at least execute
        return
    res = duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} != {len(drows)}"
    assert sorted(sdf.columns) == sorted(dcols)
    assert canonical_rows(sdf.columns, srows) == canonical_rows(dcols, drows)


def test_session_gap_boundary_row_merges(spark):
    """SESSION boundary semantics: a row arriving EXACTLY at the previous
    session's end (prev_ts + gap) MERGES into it — Spark's session_window
    and Flink's SessionWindowAssigner.java:36 / TimeWindow.intersects (<=,
    touching windows merge) agree; the gaps-and-islands oracles therefore
    use `ts > prev_end` (strict) as the new-session rule. One microsecond
    later starts a new session."""
    import pyspark.sql.functions as F

    gap_us = 10_000_000  # 10 s

    def sessions(ts_list):
        df = spark.createDataFrame(
            [(1, t) for t in ts_list], "user_id long, ts_us long"
        ).withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        return sorted(
            (r.w.start, r.w.end, r.n)
            for r in df.groupBy(
                F.session_window("ts", "10 seconds").alias("w"), "user_id"
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    # touching: row at exactly t0+gap -> ONE merged session, end extends
    merged = sessions([0, gap_us])
    assert len(merged) == 1 and merged[0][2] == 2
    # one microsecond past the boundary -> TWO sessions
    split = sessions([0, gap_us + 1])
    assert len(split) == 2 and [s[2] for s in split] == [1, 1]
