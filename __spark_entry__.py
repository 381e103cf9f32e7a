"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``    — flagship query (TPC-H Q1-style pricing summary) at sf0.001.
``queries()``       — every implemented operator from SURVEY.md §2, via the
                      engine's central registry (flink_1_12_2_spark.registry).
``oracle_sql()``    — DuckDB-equivalent SQL per query (omitted only for
                      genuinely non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from flink_1_12_2_spark.registry import (  # noqa: E402
    QUERIES,
    load_all_query_modules,
    ordered_queries,
)

load_all_query_modules()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in gate order:
    the first 50 entries cover every operator class (registry.GATE_ORDER)."""
    return {name: spec.fn for name, spec in ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in ordered_queries().items()
        if spec.oracle is not None
    }
