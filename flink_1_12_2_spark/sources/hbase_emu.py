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
    for a rowkey come back NULL, like a sparse HBase row. Row tombstones
    written by :func:`hbase_write` deletes are resolved first
    (:func:`mask_tombstones`) — a fully-masked rowkey vanishes."""
    latest = (
        mask_tombstones(cells, rowkey_col)
        .groupBy(rowkey_col, "family", "qualifier")
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


# ---------------------------------------------------------------------------
# Sink half (HBaseDynamicTableSink → sink/RowDataToMutationConverter.java:51):
# +I/+U rows become a PUT of every declared cell, -U/-D rows a row DELETE.
# The emulation keeps HBase's own delete model: a delete writes a ROW
# TOMBSTONE cell (family '__del__') whose timestamp MASKS all strictly
# older cells of that rowkey — scans resolve masking at read time, exactly
# a region's read path before compaction. Within one write batch, deletes
# stamp ``version_ts`` and puts ``version_ts + 1``, so a -U/+U pair that
# re-keys a row deletes the old rowkey and lands the new one, while a
# same-rowkey pair resolves to the put — the order the reference's
# sequential mutation stream produces.

_TOMBSTONE_FAMILY = "__del__"


def rows_to_cells(
    df: DataFrame,
    families: FamilyMap,
    rowkey_col: str = "rowkey",
    row_kind_col: str | None = None,
    version_ts: int = 0,
) -> DataFrame:
    """Convert declared-shape rows (rowkey + one STRUCT per family) into
    cell-grain mutations: live cells for upserts, one tombstone cell per
    delete. Columns match the cell store (rowkey, family, qualifier,
    value, version_ts)."""
    if row_kind_col is not None:
        is_del = F.col(row_kind_col).isin("-U", "-D")
    else:
        is_del = F.lit(False)
    pairs = [
        F.struct(
            F.lit(fam).alias("family"),
            F.lit(q).alias("qualifier"),
            F.col(f"{fam}.{q}").cast("string").alias("value"),
        )
        for fam, quals in families.items()
        for q in quals
    ]
    puts = (
        df.filter(~is_del)
        .select(
            F.col(rowkey_col).alias("rowkey"),
            F.explode(F.array(*pairs)).alias("c"),
        )
        .select(
            "rowkey",
            "c.family",
            "c.qualifier",
            "c.value",
            F.lit(version_ts + 1).cast("bigint").alias("version_ts"),
        )
    )
    if row_kind_col is None:
        return puts
    dels = df.filter(is_del).select(
        F.col(rowkey_col).alias("rowkey"),
        F.lit(_TOMBSTONE_FAMILY).alias("family"),
        F.lit("__row__").alias("qualifier"),
        F.lit(None).cast("string").alias("value"),
        F.lit(version_ts).cast("bigint").alias("version_ts"),
    )
    return puts.unionByName(dels)


def hbase_write(
    df: DataFrame,
    store_path: str,
    families: FamilyMap,
    rowkey_col: str = "rowkey",
    row_kind_col: str | None = None,
    version_ts: int | None = None,
) -> None:
    """Append one mutation batch to a parquet-backed cell store; the
    version stamp defaults to one past the store's current max (a region
    server's cell timestamp)."""
    spark = df.sparkSession
    if version_ts is None:
        try:
            version_ts = int(
                spark.read.parquet(store_path)
                .agg(F.max("version_ts"))
                .collect()[0][0]
                or 0
            ) + 1
        except Exception:  # noqa: BLE001 — first write creates the store
            version_ts = 1
    rows_to_cells(
        df, families, rowkey_col, row_kind_col, version_ts
    ).write.mode("append").parquet(store_path)


def mask_tombstones(cells: DataFrame, rowkey_col: str = "rowkey") -> DataFrame:
    """Apply HBase delete semantics to a raw cell frame: drop every cell
    at or below its rowkey's newest row tombstone, then drop the
    tombstones themselves. A rowkey whose cells are all masked vanishes
    from the scan — a deleted HBase row."""
    tombs = (
        cells.filter(F.col("family") == _TOMBSTONE_FAMILY)
        .groupBy(rowkey_col)
        .agg(F.max("version_ts").alias("__tomb_ts"))
    )
    return (
        cells.filter(F.col("family") != _TOMBSTONE_FAMILY)
        .join(tombs, on=rowkey_col, how="left")
        .filter(
            F.col("__tomb_ts").isNull()
            | (F.col("version_ts") > F.col("__tomb_ts"))
        )
        .drop("__tomb_ts")
    )
