"""File-backed Elasticsearch index emulation — the ``connector=elasticsearch-7``
front door without a cluster.

Flink parity: flink-connectors/flink-connector-elasticsearch7
(table/Elasticsearch7DynamicSink.java) with the base module's changelog
contract (elasticsearch-base/table/RowElasticsearchSinkFunction.java:76):

- ``+I`` / ``+U`` rows become UPSERTS of the document at the primary-key
  derived ``_id`` (processUpsert → UpdateRequest with doc_as_upsert);
- ``-D`` rows DELETE that document (processDelete → DeleteRequest);
- ``-U`` rows are dropped upstream (Flink plans an upsert sink behind
  DropUpdateBefore — mirrored here via changelog.drop_update_before);
- with NO primary key the sink is APPEND-ONLY (processUpsert issues
  auto-id IndexRequests) — emulated as plain parquet appends.

The ``_id`` derivation is KeyExtractor.java:40 parity: the PK fields
formatted and joined with ``key-delimiter`` (default ``_``, the
ElasticsearchOptions KEY_DELIMITER_OPTION default). TIMESTAMP PK fields
format as ISO ``LocalDateTime.toString()`` (``2000-03-01T12:34:56``),
DATE as ``LocalDate.toString()`` — matching the reference's
``(Function<RowData,String>)`` formatters for the common key types.

No cluster exists in this environment, so an INDEX is a bucketed parquet
document store maintained by the same keyed-merge machinery as the
generic upsert sink (operators/changelog.upsert_foreach_batch — bucketed
state, per-batch I/O proportional to touched buckets, not index size).
Swapping in a real cluster changes only the write target (bulk REST
actions instead of parquet buckets); the changelog → action mapping and
the ``_id`` scheme are identical, which is the connector's semantic
surface. 100 TB: document stores shard by ``_id`` hash exactly like the
``__bucket`` column here; per-batch bulk volume is the changelog delta,
never the index size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_12_2_spark.operators.changelog import (
    ROW_KIND,
    upsert_foreach_batch,
)

#: ElasticsearchOptions KEY_DELIMITER_OPTION default.
DEFAULT_KEY_DELIMITER = "_"
DOC_ID = "_id"


def doc_id_expr(
    df: DataFrame, pk_cols: list[str], key_delimiter: str = DEFAULT_KEY_DELIMITER
):
    """KeyExtractor.java:40 parity: PK fields formatted per type and
    joined with the key delimiter. concat_ws never yields NULL, matching
    the reference (a NULL key field formats as the empty string there
    only for STRING; Flink actually forbids nullable PK fields — callers
    should too)."""
    parts = []
    dtypes = dict(df.dtypes)
    for c in pk_cols:
        t = dtypes.get(c, "string")
        col = F.col(c)
        if t.startswith("timestamp"):
            # LocalDateTime.toString() parity (the reference formats
            # TIMESTAMP keys via TimestampData.toString()): always
            # yyyy-MM-ddTHH:mm; seconds only when the tail is non-zero;
            # fractional seconds in 3- or 6-digit groups, never trailing
            # zeros. Full precision is load-bearing — a fixed ss pattern
            # truncated sub-second digits and collided distinct keys into
            # one _id (r10 ADVICE).
            frac6 = F.date_format(col, "SSSSSS")
            sec2 = F.date_format(col, "ss")
            frac = (
                F.when(frac6 == "000000", F.lit(""))
                .when(
                    F.substring(frac6, 4, 3) == "000",
                    F.concat(F.lit("."), F.substring(frac6, 1, 3)),
                )
                .otherwise(F.concat(F.lit("."), frac6))
            )
            tail = F.when(
                (frac == "") & (sec2 == "00"), F.lit("")
            ).otherwise(F.concat(F.lit(":"), sec2, frac))
            parts.append(
                F.concat(F.date_format(col, "yyyy-MM-dd'T'HH:mm"), tail)
            )
        elif t == "date":
            parts.append(F.date_format(col, "yyyy-MM-dd"))
        else:
            parts.append(col.cast("string"))
    return F.concat_ws(key_delimiter, *parts)


def es_upsert_batch(
    changelog: DataFrame,
    index_dir: str,
    pk_cols: list[str],
    order_cols: list[str],
    key_delimiter: str = DEFAULT_KEY_DELIMITER,
    num_buckets: int = 16,
) -> None:
    """Apply one changelog batch to the index store (bulk-request
    analogue). ``order_cols`` sequence concurrent changes to the same
    key, exactly like the generic upsert sink (Flink relies on kafka
    partition order; a file emulation needs an explicit sequence)."""
    doc = changelog.withColumn(DOC_ID, doc_id_expr(changelog, pk_cols, key_delimiter))
    apply = upsert_foreach_batch(
        index_dir, [DOC_ID], order_cols, num_buckets=num_buckets
    )
    apply(doc, 0)


def es_sink_stream(
    changelog_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    pk_cols: list[str],
    order_cols: list[str],
    key_delimiter: str = DEFAULT_KEY_DELIMITER,
    num_buckets: int = 16,
):
    """Streaming flavor: every micro-batch is one bulk request —
    ``foreachBatch`` over the same keyed merge. Returns the started query
    (AvailableNow trigger; caller awaits termination)."""
    merge = upsert_foreach_batch(index_dir, [DOC_ID], order_cols, num_buckets=num_buckets)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        merge(
            batch_df.withColumn(
                DOC_ID, doc_id_expr(batch_df, pk_cols, key_delimiter)
            ),
            batch_id,
        )

    return (
        changelog_stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def es_append_batch(rows: DataFrame, index_dir: str) -> None:
    """No-PK mode: append-only IndexRequests with auto ids — plain
    appends, no merge (RowElasticsearchSinkFunction.processUpsert's
    ``createIndexRequest`` branch)."""
    if ROW_KIND in rows.columns:
        rows = rows.filter(F.col(ROW_KIND).isin("+I", "+U")).drop(ROW_KIND)
    rows.write.mode("append").parquet(index_dir)


def es_scan(spark: SparkSession, index_dir: str) -> DataFrame:
    """Read the index back (search-scan analogue). Drops the emulation's
    bucketing column; ``_id`` stays visible like a real ES hit."""
    df = spark.read.parquet(index_dir)
    return df.drop("__bucket") if "__bucket" in df.columns else df
