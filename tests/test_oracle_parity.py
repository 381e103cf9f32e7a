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
