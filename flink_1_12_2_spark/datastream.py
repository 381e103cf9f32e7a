"""DataStream-style fluent API — the reference's third user surface.

Flink parity: DataStream / KeyedStream / WindowedStream
(flink-streaming-java/.../datastream/DataStream.java — map :666, keyBy :318,
union, filter; KeyedStream.window :725; WindowedStream.aggregate). A user of
the reference's DataStream API can express the same pipelines fluently; every
call lowers to DataFrame operations immediately (lazy, Catalyst-planned), so
this surface costs nothing at runtime.

Works identically over batch DataFrames and streaming DataFrames (the
stream⇄table duality that Flink 1.12 was converging toward).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


class Tumble:
    def __init__(self, size: str):
        self.size = size


class Slide:
    def __init__(self, size: str, slide: str):
        self.size = size
        self.slide = slide


class Session:
    def __init__(self, gap: str):
        self.gap = gap


class StreamExecutionEnvironment:
    """Entry point (StreamExecutionEnvironment parity)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def from_table(self, df: DataFrame) -> "DataStream":
        return DataStream(df)

    def from_collection(self, data, schema) -> "DataStream":
        return DataStream(self.spark.createDataFrame(data, schema))


class DataStream:
    def __init__(self, df: DataFrame):
        self.df = df

    # -- row-level ----------------------------------------------------------
    def map(self, **exprs: Column) -> "DataStream":
        """``.map(total=col('a')+col('b'))`` — add/replace columns."""
        out = self.df
        for name, col in exprs.items():
            out = out.withColumn(name, col)
        return DataStream(out)

    def select(self, *cols) -> "DataStream":
        return DataStream(self.df.select(*cols))

    def filter(self, cond: Column) -> "DataStream":
        return DataStream(self.df.filter(cond))

    def flat_map(self, col: Column, alias: str) -> "DataStream":
        """Explode an array expression (DataStream.flatMap parity)."""
        return DataStream(self.df.select("*", F.explode(col).alias(alias)))

    def union(self, *others: "DataStream") -> "DataStream":
        out = self.df
        for o in others:
            out = out.unionByName(o.df)
        return DataStream(out)

    # -- keying -------------------------------------------------------------
    def key_by(self, *keys: str) -> "KeyedStream":
        return KeyedStream(self.df, list(keys))

    def assign_timestamps_and_watermarks(
        self, ts_col: str, delay: str
    ) -> "DataStream":
        return DataStream(self.df.withWatermark(ts_col, delay))

    # -- sinks / escape hatch ----------------------------------------------
    def to_table(self) -> DataFrame:
        return self.df


class KeyedStream:
    def __init__(self, df: DataFrame, keys: list[str]):
        self.df = df
        self.keys = keys

    def window(self, assigner, time_col: str = "ts") -> "WindowedStream":
        return WindowedStream(self.df, self.keys, assigner, time_col)

    def aggregate(self, **aggs: Column) -> DataStream:
        """``.aggregate(total=F.sum('value'))`` — keyed global aggregate."""
        return DataStream(
            self.df.groupBy(*self.keys).agg(
                *[c.alias(n) for n, c in aggs.items()]
            )
        )

    def reduce(self, col_name: str, fn: str) -> DataStream:
        """Keyed reduce with a named builtin ('sum'/'min'/'max') —
        DataStream.reduce restricted to associative builtins (arbitrary
        Python reduce would be the slow path; use process() instead)."""
        agg = getattr(F, fn)(col_name).alias(col_name)
        return DataStream(self.df.groupBy(*self.keys).agg(agg))

    def process(
        self, fn: Callable, output_schema: str, state_schema, output_mode="update"
    ) -> DataStream:
        """Keyed process function with state (KeyedProcessOperator parity) —
        lowers to applyInPandasWithState."""
        from pyspark.sql.streaming.state import GroupStateTimeout

        return DataStream(
            self.df.groupBy(*self.keys).applyInPandasWithState(
                fn,
                outputStructType=output_schema,
                stateStructType=state_schema,
                outputMode=output_mode,
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )


class WindowedStream:
    def __init__(self, df: DataFrame, keys: list[str], assigner, time_col: str):
        self.df = df
        self.keys = keys
        self.assigner = assigner
        self.time_col = time_col

    def _window_col(self) -> Column:
        a = self.assigner
        if isinstance(a, Tumble):
            return F.window(self.time_col, a.size)
        if isinstance(a, Slide):
            return F.window(self.time_col, a.size, a.slide)
        if isinstance(a, Session):
            return F.session_window(self.time_col, a.gap)
        raise TypeError(f"unknown window assigner: {a!r}")

    def aggregate(self, **aggs: Column) -> DataStream:
        out = (
            self.df.groupBy(self._window_col().alias("win"), *self.keys)
            .agg(*[c.alias(n) for n, c in aggs.items()])
            .withColumn("win_start", F.col("win.start"))
            .withColumn("win_end", F.col("win.end"))
            .drop("win")
        )
        return DataStream(out)
