"""HBase wide-column table emulation — the ``connector=hbase-2.2`` data
model without a region server.

Flink parity: flink-connectors/flink-connector-hbase-base
(util/HBaseTableSchema.java:48 — a table is a ROWKEY column plus named
COLUMN FAMILIES, each family a map of qualifier → typed column; the SQL
surface declares each family as a ROW/STRUCT column) and the scan source
(HBaseRowDataInputFormat: a scan returns, per rowkey, the LATEST cell
version for every (family, qualifier)).

The emulation's physical layout is the HFile cell grain: a DataFrame (or
parquet path) of ``(rowkey, family, qualifier, value STRING, version_ts
BIGINT)`` rows, possibly many versions per cell. ``hbase_scan`` performs
the connector's defining transform: latest-version-wins per cell, then
pivot into ``rowkey + one STRUCT per family`` with qualifiers as typed
fields (HBaseTableSchema.addColumn types applied via CAST).

Plan shape / 100-TB story: one map-combinable ``max_by`` aggregation at
(rowkey, family, qualifier) grain resolves versions, then one aggregation
at rowkey grain assembles the structs — both partial-aggregated, both
keyed by prefixes of the rowkey, so a rowkey-range-partitioned cell store
(exactly how HBase regions ship data) makes the second exchange a no-op
under AQE same-key reuse. Nothing is ever collected; lookup-join access
(the connector's other read path) goes through the existing
operators/lookup machinery keyed on rowkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: family -> {qualifier -> spark sql type string} (HBaseTableSchema.familyMap)
FamilyMap = dict[str, dict[str, str]]


def hbase_scan(
    cells: DataFrame,
    families: FamilyMap,
    rowkey_col: str = "rowkey",
) -> DataFrame:
    """Scan the cell store into the declared table schema.

    ``cells`` columns: ``rowkey`` (any orderable type), ``family`` STRING,
    ``qualifier`` STRING, ``value`` STRING (HBase bytes — the declared
    qualifier type is applied by CAST, HBaseTypeUtils parity),
    ``version_ts`` BIGINT (cell timestamp; the scan returns the max —
    HBase's VERSIONS=1 read semantics). Qualifiers declared but absent
    for a rowkey come back NULL, like a sparse HBase row."""
    latest = (
        cells.groupBy(rowkey_col, "family", "qualifier")
        .agg(F.max_by("value", "version_ts").alias("value"))
    )
    fam_structs = []
    for fam, quals in families.items():
        fields = [
            F.max(
                F.when(
                    (F.col("family") == fam) & (F.col("qualifier") == q),
                    F.col("value"),
                )
            )
            .cast(t)
            .alias(q)
            for q, t in quals.items()
        ]
        fam_structs.append((fam, fields))
    return latest.groupBy(rowkey_col).agg(
        *[
            F.struct(*fields).alias(fam)  # type: ignore[arg-type]
            for fam, fields in fam_structs
        ]
    )


def _flatten(df: DataFrame, families: FamilyMap, rowkey_col: str = "rowkey") -> DataFrame:
    """Flatten family structs to ``family_qualifier`` columns (test and
    oracle-compare convenience; real consumers keep the ROW columns, the
    Flink SQL shape)."""
    cols = [F.col(rowkey_col)]
    for fam, quals in families.items():
        for q in quals:
            cols.append(F.col(f"{fam}.{q}").alias(f"{fam}_{q}"))
    return df.select(*cols)
