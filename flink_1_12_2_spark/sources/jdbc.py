"""JDBC connector — Flink's ``jdbc`` table factory on Spark.

Flink parity: flink-connectors/flink-connector-jdbc
(table/JdbcDynamicTableFactory.java — IDENTIFIER "jdbc"; scan partitioning
options ``scan.partition.column/num/lower-bound/upper-bound`` in
JdbcDynamicTableSource). Spark's JDBC source maps those 1:1 to
``partitionColumn`` / ``numPartitions`` / ``lowerBound`` / ``upperBound``,
adds filter pushdown (WHERE clauses compiled into the remote query) and
column pruning for free, and the sink covers append/overwrite.

The embedded Derby engine on Spark's classpath backs live round-trip tests
without an external database; any server-grade driver (postgres, mysql)
drops in through the same two functions — only ``url``/``driver`` change.

Scale notes (1000-executor): a partitioned read issues ``numPartitions``
range-disjoint remote queries in parallel — size them to the remote store's
connection budget, not the cluster's core count; an unpartitioned read is a
single remote cursor (one task) regardless of cluster size. Writes open one
connection per partition — ``coalesce`` the frame to the store's write
concurrency first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(path: str) -> str:
    """Embedded-Derby URL for a database directory (created on demand)."""
    return f"jdbc:derby:{path};create=true"


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
) -> None:
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.mode(mode).save()


def jdbc_read(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "jdbc_read: partition_column requires both lower_bound and "
                "upper_bound (Spark's JDBC source needs the stride range; "
                "derive them with a MIN/MAX query if unknown)"
            )
        r = (
            r.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions or 4))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.load()
