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
    if name == "tpch_literal_q6":
        assert len(rows) == 1 and rows[0]["revenue"] > 0
    elif name == "tpch_literal_q15":
        assert len(rows) >= 1 and rows[0]["total_revenue"] > 0
    # q11/q20 can legitimately be empty at sf0.001 (nation-key draw);
    # their non-empty value check runs at sf0.01 below and in the gate


def test_q11_nonempty_at_sf001():
    """q11 must produce real rows where the gate runs (sf0.01) — guards
    against a silently-empty GERMANY join going unnoticed."""
    import os

    import pytest

    sf01 = "/root/testdata/sf0.01"
    if not os.path.isdir(sf01):
        pytest.skip("sf0.01 fixtures not present")
    from flink_1_12_2_spark.registry import QUERIES, load_all_query_modules
    from flink_1_12_2_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark(shuffle_partitions=8)
    rows = QUERIES["tpch_literal_q11"].fn(spark, sf01).collect()
    assert len(rows) > 0
    assert all(r["value"] > 0 for r in rows)


def test_partsupp_view_does_not_leak(spark, sf_dir):
    """The synthetic partsupp must not outlive the literal query build."""
    from flink_1_12_2_spark.registry import QUERIES, load_all_query_modules

    load_all_query_modules()
    QUERIES["tpch_literal_q11"].fn(spark, sf_dir)
    assert not any(t.name == "partsupp" for t in spark.catalog.listTables())


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
