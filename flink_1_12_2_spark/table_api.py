"""Table API facade — Flink's fluent relational surface.

Flink parity: TableImpl (flink-table/flink-table-api-java/.../internal/
TableImpl.java:120,189 — select/filter/group_by/join/order_by building a
QueryOperation tree) and pyflink.table.Table. Every call lowers immediately
to DataFrame operations (Catalyst's logical plan IS the QueryOperation tree),
so the facade is zero-cost.

    t = Table(df)
    (t.filter(col("value") > 10)
      .group_by("event_type")
      .select(col("event_type"), col("value").sum.alias("total")))

Column expressions are plain ``pyspark.sql.Column`` — pyflink 1.12's
expression DSL maps 1:1 (col/lit, arithmetic, ``.alias``); the handful of
property-style aggregates (``.sum``/``.max``…) exist on pyflink expressions
and are provided here via the ``agg`` helpers in
:mod:`flink_1_12_2_spark.functions.registry`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


class GroupedTable:
    def __init__(self, df: DataFrame, keys: list):
        self._df = df
        self._keys = keys

    def select(self, *exprs: Column) -> "Table":
        """Aggregate select: non-key expressions must be aggregates."""
        return Table(self._df.groupBy(*self._keys).agg(*exprs))

    def aggregate(self, *aggs: Column) -> "Table":
        return self.select(*aggs)

    def flat_aggregate(self, fn, output_schema: str) -> "Table":
        """Table aggregate (emits multiple rows per group). Grouping pinned
        to full shuffle parallelism (session.keyed_python_groups)."""
        from flink_1_12_2_spark.session import keyed_python_groups

        keys = [c if isinstance(c, str) else c._jc.toString() for c in self._keys]
        return Table(
            keyed_python_groups(self._df, *keys).applyInPandas(fn, output_schema)
        )


class WindowedTable:
    def __init__(self, df: DataFrame, window_col: Column, keys: list):
        self._df = df
        self._win = window_col
        self._keys = keys

    def select(self, *aggs: Column) -> "Table":
        out = self._df.groupBy(self._win.alias("w"), *self._keys).agg(*aggs)
        return Table(
            out.withColumn("window_start", F.col("w.start"))
            .withColumn("window_end", F.col("w.end"))
            .drop("w")
        )


class OverWindowedTable:
    """Result of :meth:`Table.over_window` — aggregates applied over the
    frame, one output row per input row (Flink over-window semantics)."""

    def __init__(self, df: DataFrame, spec):
        self._df = df
        self._spec = spec

    def select(self, **exprs: Column) -> "Table":
        out = self._df
        for name, col in exprs.items():
            out = out.withColumn(name, col.over(self._spec))
        return Table(out)


class Table:
    """Fluent relational table (Flink Table / pyflink.table.Table parity)."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- projection / filtering --------------------------------------------
    def select(self, *exprs) -> "Table":
        return Table(self._df.select(*exprs))

    def filter(self, predicate: Column) -> "Table":
        return Table(self._df.filter(predicate))

    where = filter

    def add_columns(self, **exprs: Column) -> "Table":
        out = self._df
        for name, c in exprs.items():
            out = out.withColumn(name, c)
        return Table(out)

    def add_or_replace_columns(self, **exprs: Column) -> "Table":
        """Flink addOrReplaceColumns — withColumn already replaces on name
        collision, so the distinction from add_columns is contractual: Flink
        raises on collision in addColumns, replaces here."""
        return self.add_columns(**exprs)

    def rename_columns(self, **renames: str) -> "Table":
        out = self._df
        for old, new in renames.items():
            out = out.withColumnRenamed(old, new)
        return Table(out)

    def drop_columns(self, *cols: str) -> "Table":
        return Table(self._df.drop(*cols))

    def alias(self, *names: str) -> "Table":
        """Flink ``as("a, b, c")`` — positional column renaming."""
        return Table(self._df.toDF(*names))

    def map(self, fn, output_schema: str) -> "Table":
        """Flink Table.map(ScalarFunction): one row in → one row out, Arrow-
        batched (mapInPandas with a row-wise contract)."""
        return Table(self._df.mapInPandas(fn, output_schema))

    def flat_map(self, fn, output_schema: str) -> "Table":
        """Flink Table.flatMap(TableFunction): one row in → N rows out; the
        pandas iterator contract is naturally one-to-many."""
        return Table(self._df.mapInPandas(fn, output_schema))

    # -- grouping / windows --------------------------------------------------
    def group_by(self, *keys) -> GroupedTable:
        return GroupedTable(self._df, list(keys))

    def window_tumble(self, time_col: str, size: str, *keys) -> WindowedTable:
        return WindowedTable(self._df, F.window(time_col, size), list(keys))

    def window_hop(
        self, time_col: str, slide: str, size: str, *keys
    ) -> WindowedTable:
        return WindowedTable(self._df, F.window(time_col, size, slide), list(keys))

    def window_session(self, time_col: str, gap: str, *keys) -> WindowedTable:
        return WindowedTable(self._df, F.session_window(time_col, gap), list(keys))

    def over_window(
        self,
        partition_by: list,
        order_by: list,
        preceding: int | str = "unbounded",
        following: int | str = 0,
        rows: bool = True,
    ) -> "OverWindowedTable":
        """Over (analytic) window — Table API ``Over.partitionBy(...)
        .orderBy(...).preceding(...)`` (flink-table-api ``OverWindow``;
        BatchExecOverAggregate / Stream over-agg frames). ``preceding``/
        ``following``: row- or range-offset ints, or "unbounded"."""
        from pyspark.sql import Window as W

        lo = (
            W.unboundedPreceding
            if preceding == "unbounded"
            else -int(preceding)
        )
        hi = (
            W.unboundedFollowing
            if following == "unbounded"
            else int(following)
        )
        spec = W.partitionBy(*partition_by).orderBy(*order_by)
        spec = spec.rowsBetween(lo, hi) if rows else spec.rangeBetween(lo, hi)
        return OverWindowedTable(self._df, spec)

    # -- joins / set ops -----------------------------------------------------
    def join(self, other: "Table", on: Column, how: str = "inner") -> "Table":
        return Table(self._df.join(other._df, on, how))

    def left_outer_join(self, other: "Table", on: Column) -> "Table":
        return self.join(other, on, "left")

    def right_outer_join(self, other: "Table", on: Column) -> "Table":
        return self.join(other, on, "right")

    def full_outer_join(self, other: "Table", on: Column) -> "Table":
        return self.join(other, on, "full")

    def join_lateral(self, udtf_col: Column, *out_names: str) -> "Table":
        """Flink joinLateral(TableFunction): correlate each row with the rows
        its table function yields (Correlate / CROSS APPLY). ``udtf_col`` is
        an array(-of-struct) column (functions.udf.udtf output); exploded
        fields surface under ``out_names``."""
        out = self._df.withColumn("__lat", F.explode(udtf_col))
        if out_names:
            for n in out_names:
                out = out.withColumn(n, F.col(f"__lat.{n}"))
            out = out.drop("__lat")
        return Table(out)

    def left_outer_join_lateral(self, udtf_col: Column, *out_names: str) -> "Table":
        """Flink leftOuterJoinLateral: rows whose table function yields no
        rows survive with NULLs (explode_outer)."""
        out = self._df.withColumn("__lat", F.explode_outer(udtf_col))
        if out_names:
            for n in out_names:
                out = out.withColumn(n, F.col(f"__lat.{n}"))
            out = out.drop("__lat")
        return Table(out)

    def union(self, other: "Table") -> "Table":
        return Table(self._df.union(other._df).distinct())

    def union_all(self, other: "Table") -> "Table":
        return Table(self._df.union(other._df))

    def intersect(self, other: "Table") -> "Table":
        return Table(self._df.intersect(other._df))

    def intersect_all(self, other: "Table") -> "Table":
        return Table(self._df.intersectAll(other._df))

    def minus(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df).distinct())

    def minus_all(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df))

    # -- ordering / limits ---------------------------------------------------
    def order_by(self, *cols) -> "Table":
        return Table(self._df.orderBy(*cols))

    def offset(self, n: int) -> "Table":
        """Flink orderBy().offset(n): skip the first n rows of the sorted
        result; like Flink, only meaningful after order_by."""
        return Table(self._df.offset(n))

    def fetch(self, n: int) -> "Table":
        return Table(self._df.limit(n))

    limit = fetch

    def distinct(self) -> "Table":
        return Table(self._df.distinct())

    # -- temporal table function (Table.java:115) ------------------------
    def create_temporal_table_function(
        self, time_attr: str, primary_key: str
    ) -> "TemporalTableFunction":
        """Table.createTemporalTableFunction(timeAttribute, primaryKey):
        package THIS table as a history for a temporal table function —
        register the result with
        ``EngineSession.create_temporal_table_function(name, ttf)`` and
        join it via ``LATERAL TABLE (name(f.ts))``."""
        return TemporalTableFunction(self._df, time_attr, primary_key)

    # -- execution (TableImpl.executeInsert / explain) --------------------
    def execute_insert(
        self, engine, sink: str, overwrite: bool = False
    ) -> DataFrame:
        """Table.executeInsert(tablePath): write this table into a
        registered sink through the engine's INSERT machinery (the
        1-element StatementSet, like executeSql's INSERT route)."""
        return (
            engine.create_statement_set()
            .add_insert(sink, self._df, overwrite=overwrite)
            .execute()
        )

    def explain(self, *details: str, engine=None) -> str:
        """Table.explain(ExplainDetail...): the plan string (logical +
        physical — Spark's queryExecution dump stands in for Flink's
        AST/optimized/physical sections). ``details`` accepts
        ``"CHANGELOG_MODE"`` / ``"ESTIMATED_COST"`` (ExplainDetail.java:
        30,36); pass ``engine`` so source changelog modes resolve from
        the session's table registry."""
        out = self._df._jdf.queryExecution().toString()
        wanted = {d.upper() for d in details}
        if "CHANGELOG_MODE" in wanted:
            from flink_1_12_2_spark.sql.explain_details import (
                changelog_mode_section,
            )

            out += "\n\n== Changelog Mode ==\n" + changelog_mode_section(
                engine, self._df
            )
        if "ESTIMATED_COST" in wanted:
            from flink_1_12_2_spark.sql.explain_details import (
                estimated_cost_section,
            )

            out += "\n\n== Estimated Cost ==\n" + estimated_cost_section(
                self._df
            )
        return out

    # -- sink ----------------------------------------------------------------
    def to_data_frame(self) -> DataFrame:
        return self._df


class TemporalTableFunction:
    """The registrable product of
    :meth:`Table.create_temporal_table_function`
    (functions/TemporalTableFunctionImpl.java): a history frame plus its
    time attribute and primary key."""

    def __init__(self, history: DataFrame, time_attr: str, primary_key: str):
        self.history = history
        self.time_attr = time_attr
        self.primary_key = primary_key
