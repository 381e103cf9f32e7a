"""The literal TPC-H texts (the reference's modified-query files) run
UNMODIFIED: byte-equality against the checkout plus end-to-end sanity;
value correctness is the DuckDB oracle's job."""

from __future__ import annotations

import os

import pytest

_REF = "/root/reference/flink-end-to-end-tests/test-scripts/test-data/tpch/modified-query"


@pytest.mark.parametrize("n", [6, 11, 15, 20])
def test_embedded_text_matches_reference_file(n):
    import flink_1_12_2_spark.queries.tpch_literal as M

    path = os.path.join(_REF, f"q{n}.sql")
    if not os.path.exists(path):
        pytest.skip("reference checkout not present")
    with open(path) as f:
        assert getattr(M, f"QUERY{n}_SQL") == f.read()


@pytest.mark.parametrize(
    "name", ["tpch_literal_q6", "tpch_literal_q11", "tpch_literal_q15",
             "tpch_literal_q20"]
)
def test_literal_query_runs(spark, sf_dir, name):
    from flink_1_12_2_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()
    rows = QUERIES[name].fn(spark, sf_dir).collect()
    assert rows is not None  # q20/q15 can be tiny at sf0.001; parse+run is the point


def test_revenue_sums_are_exact_sixteenths(spark, sf_dir):
    """The de-flaking invariant behind q15's float equality: every
    adapter-view revenue term is an exact multiple of 1/16, so sums are
    order-free."""
    import flink_1_12_2_spark.queries.tpch_literal as M

    M._register_views(spark, sf_dir)
    rows = spark.sql(
        "SELECT l_extendedprice * (1 - l_discount) AS r FROM lineitem"
    ).collect()
    assert rows and all((r["r"] * 16) == int(r["r"] * 16) for r in rows)
