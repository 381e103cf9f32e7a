"""flink_1_12_2_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Flink 1.12.2 (reference: BoYiZhang/flink-1.12.2).

This is NOT a port of Flink's runtime. The reference defines WHAT to compute
(operator semantics, SQL surface, streaming behavior); the implementation here is
idiomatic Spark: DataFrame / Spark SQL / Catalyst / Structured Streaming. Batch
physical execution (codegen, spill, shuffle, join selection) is delegated entirely
to Catalyst + Tungsten; the library code in this package is the *semantic* layer:

- ``session``     — engine session: SparkSession factory + table registry carrying
                    event-time/watermark metadata (the Spark analogue of Flink's
                    ``WATERMARK FOR`` DDL clause).
- ``functions``   — the Flink scalar/aggregate function surface mapped onto
                    ``pyspark.sql.functions`` (1:1 where native, shims otherwise).
- ``operators``   — relational operators Spark lacks as single calls: interval join,
                    temporal/as-of join, lookup join, top-N, deduplication,
                    group-window (tumble/hop/session/cumulate) helpers, over-windows.
- ``sql``         — the SQL front door: light rewrite pass translating Flink SQL
                    idioms (TUMBLE/HOP/SESSION, LISTAGG, SPLIT_INDEX, PROCTIME, ...)
                    into Spark SQL, then ``spark.sql``.
- ``streaming``   — Structured-Streaming-native versions of Flink's stateful
                    operators (streaming top-N, keep-last dedup, changelog
                    normalize, CEP/MATCH_RECOGNIZE subset) via
                    ``applyInPandasWithState`` / ``foreachBatch``.
- ``llm``         — large-scale training-data pipeline operators (dedup families,
                    similarity search, text analysis, multimodal column plumbing).
"""

__version__ = "0.1.0"

from flink_1_12_2_spark.session import EngineSession, get_spark  # noqa: F401
