"""DataSet-style fluent API — the reference's legacy batch user surface.

Flink parity: ExecutionEnvironment / DataSet / Grouping
(flink-java/src/main/java/org/apache/flink/api/java/DataSet.java — map,
flatMap, filter, reduce, reduceGroup, aggregate, distinct, join :793,
coGroup, cross, union, partitionByHash/partitionByRange/rebalance,
sortPartition, first, iterate :1206, iterateDelta :1234;
ExecutionEnvironment at flink-java/.../ExecutionEnvironment.java).

Every call lowers immediately to a lazy DataFrame operation, so the facade
is zero-cost: Catalyst sees exactly the plan a native DataFrame user would
have written (SURVEY §1.1 — DataSet rows are subsumed by DataFrame).
Row-level lambdas go through mapInPandas/applyInPandas (Arrow-batched, the
fast Python path); prefer the expression-based methods (``map_expr``,
``filter``, ``aggregate``) which stay entirely JVM-side.

Delta iteration (DataSet.iterateDelta — the workset/solution-set iteration
that powers Flink's ConnectedComponents example) is a driver-side loop:
per superstep the step function maps (solution, workset) → (delta,
next_workset); the delta is key-merged into the solution and the loop
terminates when the workset is empty. The workset count doubles as the
required materialization barrier, so each superstep costs exactly one job.
At 100 TB scale: the solution set is the big side and is re-cached per
round only when a delta touched it; worksets shrink monotonically so later
supersteps are cheap (this is the whole point of delta iterations vs bulk).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window


class ExecutionEnvironment:
    """Batch entry point (ExecutionEnvironment parity)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def from_collection(self, data, schema) -> "DataSet":
        return DataSet(self.spark.createDataFrame(data, schema))

    def from_dataframe(self, df: DataFrame) -> "DataSet":
        return DataSet(df)

    def read_text(self, path: str) -> "DataSet":
        """readTextFile parity — one `value` column per line."""
        return DataSet(self.spark.read.text(path))


class DataSet:
    def __init__(self, df: DataFrame):
        self.df = df

    # -- row-level ----------------------------------------------------------
    def map_expr(self, **exprs: Column) -> "DataSet":
        """Expression-based map (JVM-side; preferred over ``map``)."""
        out = self.df
        for name, col in exprs.items():
            out = out.withColumn(name, col)
        return DataSet(out)

    def select(self, *cols) -> "DataSet":
        return DataSet(self.df.select(*cols))

    def map(self, fn: Callable, schema) -> "DataSet":
        """Arrow-batched map: ``fn(pandas.DataFrame) -> pandas.DataFrame``.

        The slow path (Python); use only for logic Columns can't express.
        """
        return DataSet(self.df.mapInPandas(lambda it: map(fn, it), schema))

    def flat_map(self, col: Column, alias: str) -> "DataSet":
        """Explode an array expression (flatMap parity, JVM-side)."""
        return DataSet(self.df.select("*", F.explode(col).alias(alias)))

    def filter(self, cond) -> "DataSet":
        return DataSet(self.df.filter(cond))

    # -- grouping / aggregation --------------------------------------------
    def group_by(self, *keys: str) -> "GroupedDataSet":
        return GroupedDataSet(self.df, list(keys))

    def aggregate(self, *aggs: Column) -> "DataSet":
        """Global aggregate (DataSet.aggregate / AllReduceDriver parity)."""
        return DataSet(self.df.agg(*aggs))

    def distinct(self, *cols: str) -> "DataSet":
        return DataSet(self.df.select(*cols).distinct() if cols else self.df.distinct())

    # -- binary ops ---------------------------------------------------------
    def join(self, other: "DataSet", on, how: str = "inner") -> "DataSet":
        return DataSet(self.df.join(other.df, on, how))

    def join_with_tiny(self, other: "DataSet", on, how: str = "inner") -> "DataSet":
        """joinWithTiny/joinWithHuge parity — explicit broadcast hint."""
        return DataSet(self.df.join(F.broadcast(other.df), on, how))

    def co_group(
        self, other: "DataSet", left_keys: list[str], right_keys: list[str],
        fn: Callable, schema,
    ) -> "DataSet":
        from flink_1_12_2_spark.session import keyed_python_groups

        return DataSet(
            keyed_python_groups(self.df, *left_keys)
            .cogroup(keyed_python_groups(other.df, *right_keys))
            .applyInPandas(fn, schema)
        )

    def cross(self, other: "DataSet") -> "DataSet":
        return DataSet(self.df.crossJoin(other.df))

    def union(self, *others: "DataSet") -> "DataSet":
        out = self.df
        for o in others:
            out = out.unionByName(o.df)
        return DataSet(out)

    # -- physical -----------------------------------------------------------
    def partition_by_hash(self, *cols: str) -> "DataSet":
        return DataSet(self.df.repartition(*[F.col(c) for c in cols]))

    def partition_by_range(self, *cols: str) -> "DataSet":
        return DataSet(self.df.repartitionByRange(*[F.col(c) for c in cols]))

    def rebalance(self, n: int | None = None) -> "DataSet":
        return DataSet(self.df.repartition(n) if n else self.df.repartition())

    def sort_partition(self, *cols) -> "DataSet":
        return DataSet(self.df.sortWithinPartitions(*cols))

    def first(self, n: int) -> "DataSet":
        return DataSet(self.df.limit(n))

    # -- iterations ---------------------------------------------------------
    def iterate(
        self,
        step: Callable[[DataFrame], DataFrame],
        max_iterations: int = 20,
        converged: Callable[[DataFrame, DataFrame], bool] | None = None,
    ) -> "DataSet":
        """Bulk iteration (DataSet.iterate :1206)."""
        from flink_1_12_2_spark.operators.advanced import iterate

        return DataSet(iterate(self.df, step, max_iterations, converged))

    def iterate_delta(
        self,
        workset: "DataSet",
        key_cols: list[str],
        step: Callable[[DataFrame, DataFrame], tuple[DataFrame, DataFrame]],
        max_iterations: int = 50,
    ) -> "DataSet":
        """Delta iteration (DataSet.iterateDelta :1234)."""
        from flink_1_12_2_spark.operators.advanced import iterate_delta

        return DataSet(
            iterate_delta(self.df, workset.df, key_cols, step, max_iterations)
        )

    def collect(self):
        return self.df.collect()


class GroupedDataSet:
    def __init__(self, df: DataFrame, keys: list[str], sort_cols: list | None = None):
        self.df = df
        self.keys = keys
        self._sort_cols = sort_cols or []

    def aggregate(self, *aggs: Column) -> DataSet:
        return DataSet(self.df.groupBy(*self.keys).agg(*aggs))

    def reduce_group(self, fn: Callable, schema) -> DataSet:
        """GroupReduceDriver parity — one pandas frame per group in, many
        rows out (``fn(pandas.DataFrame) -> pandas.DataFrame``). If
        ``sort_group`` was called, each frame is sorted before ``fn``."""
        sort_cols = list(self._sort_cols)
        if sort_cols:
            inner = fn

            def fn(pdf):  # noqa: F811 — sorted-view wrapper
                return inner(pdf.sort_values(sort_cols, kind="stable"))

        from flink_1_12_2_spark.session import keyed_python_groups

        # pinned-parallelism grouping (byte-based AQE coalescing would
        # starve the pandas stage — session.keyed_python_groups)
        return DataSet(
            keyed_python_groups(self.df, *self.keys).applyInPandas(fn, schema)
        )

    def min_by(self, *order_cols: str) -> DataSet:
        """minBy parity; extra columns are deterministic tie-breaks
        (Flink's minBy returns an arbitrary row on ties)."""
        return self._by(order_cols, asc=True)

    def max_by(self, *order_cols: str) -> DataSet:
        return self._by(order_cols, asc=False)

    def _by(self, order_cols, asc: bool) -> DataSet:
        ordering = [
            F.col(c).asc() if asc else F.col(c).desc() for c in order_cols
        ]
        w = Window.partitionBy(*self.keys).orderBy(*ordering)
        return DataSet(
            self.df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def sort_group(self, *cols: str) -> "GroupedDataSet":
        """sortGroup parity — ``reduce_group``'s frames arrive sorted by
        ``cols`` (applyInPandas gives no intra-group order guarantee, so
        the sort happens pandas-side inside each Arrow batch)."""
        return GroupedDataSet(self.df, self.keys, list(cols))
