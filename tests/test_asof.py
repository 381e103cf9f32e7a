"""Unit tests for the as-of join operator on tiny hand-checkable data
(mirrors the reference's TemporalJoinITCase fixture style)."""

from __future__ import annotations

import datetime as dt

from flink_1_12_2_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (1, _ts("2024-01-01 12:00:00"), "b"),
            (2, _ts("2024-01-01 11:00:00"), "c"),
            (3, _ts("2024-01-01 11:00:00"), "d"),  # key with no right rows
        ],
        "k int, t timestamp, payload string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 100.0),
            (1, _ts("2024-01-01 11:00:00"), 200.0),
            (2, _ts("2024-01-01 11:00:00"), 300.0),  # same instant
            (2, _ts("2024-01-01 12:00:00"), 400.0),
        ],
        "rk int, rt timestamp, price double",
    )
    out = asof_join(left, right, "k", "rk", "t", "rt")
    got = {(r.k, r.payload): (r.rt, r.price) for r in out.collect()}
    assert got[(1, "a")] == (_ts("2024-01-01 09:00:00"), 100.0)
    assert got[(1, "b")] == (_ts("2024-01-01 11:00:00"), 200.0)
    # <= semantics: same-instant right row matches
    assert got[(2, "c")] == (_ts("2024-01-01 11:00:00"), 300.0)
    assert got[(3, "d")] == (None, None)


def test_asof_strict(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 11:00:00"), "x")], "k int, t timestamp, payload string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 1.0),
            (1, _ts("2024-01-01 11:00:00"), 2.0),
        ],
        "rk int, rt timestamp, price double",
    )
    out = asof_join(left, right, "k", "rk", "t", "rt", strict=True).collect()
    assert out[0].price == 1.0  # strict: same-instant row excluded
