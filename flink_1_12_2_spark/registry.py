"""Central query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here as a named query:
a builder ``fn(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an
equivalent DuckDB oracle SQL string. The driver's correctness gate runs both
sides at sf0.01 and hash-compares; this registry is the engine's single source
of truth for "what is implemented and proven".
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → rows-only check (non-SQL-expressible)
    tags: tuple[str, ...] = ()
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def register_oracle(name: str, sql: str) -> None:
    """Attach/replace the oracle SQL for an already-registered query."""
    QUERIES[name].oracle = sql


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver-generated table; parquet scan → full V2 pushdown.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark cannot represent
    (TimestampType is microseconds). We read nanos as long and truncate to
    microseconds — every oracle SQL applies the same ``CAST(ts AS TIMESTAMP)``
    truncation on DuckDB's side (see EVENTS_US_CTE) so both engines agree.
    """
    path = os.path.join(sf_dir, f"{table}.parquet")
    if table == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # NTZ, built by microsecond offset from epoch — identical wall-clock
            # values to DuckDB's naive TIMESTAMP regardless of session timezone.
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(path)


# DuckDB-side twin of the events nanos→micros truncation in ``load``. Oracle
# SQL referencing events should select FROM this CTE body instead of the raw
# view so both engines see identical microsecond timestamps.
EVENTS_US_CTE = (
    "WITH ev AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"
)


def load_all_query_modules() -> None:
    """Import every query-defining module (registration side effects)."""
    import flink_1_12_2_spark.queries.relational  # noqa: F401
    import flink_1_12_2_spark.queries.functions_gauntlet  # noqa: F401
    import flink_1_12_2_spark.queries.windows  # noqa: F401
    import flink_1_12_2_spark.queries.llm_text  # noqa: F401
    import flink_1_12_2_spark.queries.llm_dedup  # noqa: F401
    import flink_1_12_2_spark.queries.llm_similarity  # noqa: F401
    import flink_1_12_2_spark.queries.streaming_emu  # noqa: F401
    import flink_1_12_2_spark.queries.multimodal_lookup  # noqa: F401
    import flink_1_12_2_spark.queries.relational2  # noqa: F401
    import flink_1_12_2_spark.queries.advanced_ops  # noqa: F401
    import flink_1_12_2_spark.queries.sources_sinks  # noqa: F401
    import flink_1_12_2_spark.queries.tpch_like  # noqa: F401
    import flink_1_12_2_spark.queries.tpch_like2  # noqa: F401
    import flink_1_12_2_spark.queries.tpch_like3  # noqa: F401
    import flink_1_12_2_spark.queries.tpcds_like  # noqa: F401
    import flink_1_12_2_spark.queries.dataset_api  # noqa: F401
    import flink_1_12_2_spark.queries.graph_ops  # noqa: F401
