"""Filesystem connector — Flink's ``filesystem`` table factory on Spark.

Flink parity: FileSystemTableFactory.java:57 (IDENTIFIER="filesystem") with
FileSystemTableSource/Sink — formats csv/json/avro/parquet/orc, PARTITIONED
BY, overwrite (SupportsOverwrite), and the streaming file sink with rolling
files + checkpoint-commit. Spark equivalents are all first-class:

- batch read/write    → ``spark.read/write.format(fmt)`` (predicate pushdown,
  partition pruning, column pruning from DataSource V2 for free)
- PARTITIONED BY      → ``.partitionBy(cols)`` (hive-style dirs, pruned scans)
- INSERT OVERWRITE    → ``.mode("overwrite")`` (+ dynamic partition overwrite
  via ``spark.sql.sources.partitionOverwriteMode=dynamic``)
- streaming sink      → ``writeStream.format("parquet")`` with checkpoint
  (exactly-once commit = Flink's StreamingFileSink rolling+commit protocol)
- dev connectors      → datagen → ``spark.range`` / ``format("rate")``;
  print → ``format("console")``; blackhole → ``format("noop")``
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPPORTED_FORMATS = ("parquet", "csv", "json", "orc")
# avro (flink-formats/flink-avro) maps to Spark's external spark-avro module
# (org.apache.spark:spark-avro): format("avro") works whenever that jar is on
# the classpath, so availability is a runtime capability check, not a static
# gate. sequencefile has no DataFrame source in any deployment.
_GATED_FORMATS = {
    "avro": "add org.apache.spark:spark-avro to spark.jars.packages",
    "sequencefile": "use read_sequencefile/write_sequencefile (RDD-backed)",
}

_AVRO_AVAILABLE: bool | None = None


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro module is on the JVM classpath (cached)."""
    global _AVRO_AVAILABLE
    if _AVRO_AVAILABLE is None:
        try:
            # the same resolution the reader/writer performs — merely having
            # avro classes on the classpath is not enough (Spark ships some
            # without registering the source)
            spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
                "avro", spark._jsparkSession.sessionState().conf()
            )
            _AVRO_AVAILABLE = True
        except Exception:
            _AVRO_AVAILABLE = False
    return _AVRO_AVAILABLE


def _check_format(fmt: str, spark: SparkSession | None = None) -> None:
    if fmt == "avro" and spark is not None and avro_available(spark):
        return
    if fmt in _GATED_FORMATS:
        raise NotImplementedError(
            f"format {fmt!r} needs extra deployment in this environment: "
            f"{_GATED_FORMATS[fmt]}"
        )


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    overwrite: bool = True,
    options: dict[str, str] | None = None,
) -> None:
    if fmt == "avro" and not avro_available(df.sparkSession):
        # pure-Python container fallback (sources/avro_py.py) keeps the
        # format usable without the spark-avro jar; PARTITIONED BY is a
        # jar-path feature (raise rather than silently flatten)
        if partition_by:
            raise NotImplementedError(
                "avro + partitionBy needs spark-avro on the classpath"
            )
        from flink_1_12_2_spark.sources.avro_py import write_avro_py

        write_avro_py(df, path, codec=(options or {}).get("codec", "null"))
        return
    _check_format(fmt, df.sparkSession)
    writer = df.write.format(fmt)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.mode("overwrite" if overwrite else "append").save(path)


def write_sequencefile(
    df: DataFrame, path: str, key_col: str, value_col: str
) -> None:
    """Hadoop SequenceFile sink (flink-formats/flink-sequence-file
    SequenceFileWriterFactory parity): (key, value) Writable pairs.

    Spark has no DataFrame-level SequenceFile source/sink, so this is the
    one honest RDD drop-down in the connector layer (SURVEY §2.1) — the
    key/value projection happens in the DataFrame world first, the RDD hop
    only serializes pairs. Partitioning is preserved (one output file per
    partition, same as any other filesystem sink)."""
    df.select(key_col, value_col).rdd.map(tuple).saveAsSequenceFile(path)


def read_sequencefile(
    spark: SparkSession, path: str, key_name: str = "key", value_name: str = "value"
) -> DataFrame:
    """Hadoop SequenceFile source → two-column DataFrame (Writables are
    auto-converted by the RDD API; schema is inferred from the pairs)."""
    return spark.sparkContext.sequenceFile(path).toDF([key_name, value_name])


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    key_cols: list[str],
    sorted_by: list[str] | None = None,
) -> None:
    """Bucketed managed table (hash-partitioned files + metastore metadata).

    The 100 TB co-location path: two tables bucketed the same way on the
    join key sort-merge-join with ZERO Exchange on either side — the
    shuffle is paid once at write time and amortized over every later
    join/aggregate on that key. Flink's equivalent knob is the planner
    reusing an existing hash distribution across stages (Exchange reuse);
    Spark persists the distribution in the table itself.
    """
    writer = df.write.format("parquet").bucketBy(buckets, *key_cols)
    if sorted_by:
        writer = writer.sortBy(*sorted_by)
    writer.mode("overwrite").saveAsTable(table)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    if fmt == "avro" and not avro_available(spark):
        from flink_1_12_2_spark.sources.avro_py import read_avro_py

        return read_avro_py(spark, path)
    _check_format(fmt, spark)
    reader = spark.read.format(fmt)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def datagen(
    spark: SparkSession, n_rows: int, partitions: int | None = None
) -> DataFrame:
    """Deterministic datagen source (DataGenTableSourceFactory.java:48 parity,
    with sequence semantics rather than random so results are verifiable)."""
    rng = (
        spark.range(0, n_rows, 1, partitions)
        if partitions
        else spark.range(n_rows)
    )
    return rng.select(
        F.col("id"),
        (F.col("id") * 37 % 1000).alias("num"),
        F.concat(F.lit("user_"), (F.col("id") % 100).cast("string")).alias("name"),
    )


def blackhole(df: DataFrame) -> None:
    """Blackhole sink (BlackHoleTableSinkFactory parity) — full materialization,
    zero output; what bench.py uses for timing."""
    df.write.format("noop").mode("overwrite").save()


def _parse_memory_size(v: str) -> int:
    """Flink MemorySize literal ('128MB', '64 kb', '1g', bare bytes)."""
    import re as _re

    m = _re.match(
        r"(?i)^\s*(\d+(?:\.\d+)?)\s*(b|kb|k|mb|m|gb|g|tb|t)?\s*$", str(v)
    )
    if not m:
        raise ValueError(f"cannot parse memory size {v!r}")
    mult = {
        None: 1, "b": 1, "k": 1024, "kb": 1024,
        "m": 1024**2, "mb": 1024**2, "g": 1024**3, "gb": 1024**3,
        "t": 1024**4, "tb": 1024**4,
    }[m.group(2).lower() if m.group(2) else None]
    return int(float(m.group(1)) * mult)


def _dir_bytes(path: str) -> int:
    import os as _os

    total = 0
    for root, _dirs, files in _os.walk(path):
        for f in files:
            if not f.startswith((".", "_")):
                total += _os.path.getsize(_os.path.join(root, f))
    return total


def compacted_write(
    df,
    path: str,
    fmt: str = "parquet",
    target_file_size: str | int = "128MB",
    partition_cols: tuple = (),
    options: dict | None = None,
) -> None:
    """Auto-compacting file sink — ``'auto-compaction'='true'`` (NEW in
    Flink 1.12: FileSystemOptions.java:223 + the stream/compact operator
    family — CompactCoordinator groups one checkpoint's temporary files
    into units of ``compaction.file-size``, CompactOperator rewrites
    them, and only the compacted files are committed).

    Spark-first translation of exactly that protocol, per write (a batch
    INSERT, or one micro-batch in foreachBatch — the checkpoint-grain
    unit): stage the data under a dot-prefixed directory (invisible to
    every reader, like the reference's temporary files), measure the
    staged bytes, re-write coalesced to ``ceil(bytes / target)`` files,
    and drop the staging dir — the append into the visible namespace IS
    the commit.

    Scale note: the extra read-back is of the just-written batch only
    (never the table), and coalesce avoids a shuffle — each output file
    is a concatenation of staged splits. Small-file pressure is the #1
    operational failure of streaming file sinks at 100 TB; this is the
    operator that bounds file count by data volume instead of by
    (partitions × triggers)."""
    import math
    import shutil
    import uuid as _uuid

    spark = df.sparkSession
    staging = os.path.join(path, f".compact_{_uuid.uuid4().hex[:8]}")
    w = df.write.format(fmt).mode("overwrite")
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.save(staging)
    size = _dir_bytes(staging)
    target = (
        target_file_size
        if isinstance(target_file_size, int)
        else _parse_memory_size(target_file_size)
    )
    n = max(1, math.ceil(size / max(1, target)))
    # the staged read-back MUST see the writer's options (a ';' csv
    # written with sep=';' mis-splits on the default comma) and the
    # batch's declared schema (text formats would re-infer; an empty
    # batch cannot infer at all)
    r = spark.read.format(fmt).schema(df.schema)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    staged = r.load(staging)
    out = staged.coalesce(n).write.format(fmt).mode("append")
    if partition_cols:
        out = out.partitionBy(*partition_cols)
    for k, v in (options or {}).items():
        out = out.option(k, v)
    out.save(path)
    shutil.rmtree(staging, ignore_errors=True)


def compacted_stream_sink(
    sdf,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    target_file_size: str | int = "128MB",
):
    """Streaming twin: each micro-batch (= checkpoint grain) compacts
    before commit via foreachBatch. Returns the StreamingQuery."""
    return (
        sdf.writeStream.foreachBatch(
            lambda bdf, bid: compacted_write(
                bdf, path, fmt, target_file_size
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _partition_time(pattern: str | None, part_cols, values) -> "object":
    """DefaultPartTimeExtractor: substitute $col placeholders in
    ``partition.time-extractor.timestamp-pattern`` with the partition's
    values and parse the result; with no pattern, the single partition
    value parses directly ('yyyy-MM-dd[ HH:mm:ss]')."""
    import pandas as pd

    if pattern:
        text = pattern
        for c, v in zip(part_cols, values):
            text = text.replace(f"${c}", str(v))
    else:
        text = str(values[0])
    return pd.to_datetime(text)


def partitioned_stream_sink(
    sdf,
    path: str,
    partition_cols: list[str],
    checkpoint: str,
    watermark_col: str,
    watermark_delay: str = "10 minutes",
    commit_delay: str = "0 seconds",
    timestamp_pattern: str | None = None,
    fmt: str = "parquet",
    success_file: str = "_SUCCESS",
    trigger: str = "partition-time",
):
    """Streaming partitioned file sink with the PARTITION-TIME commit
    trigger (new in Flink 1.12 — stream/PartitionTimeCommitTrigger.java:
    a partition commits when ``watermark > partition-time + delay``;
    PartitionCommitter then runs the success-file policy).

    Spark-first translation over foreachBatch (the checkpoint grain):
    each micro-batch appends its hive-style partitions, advances the
    tracked watermark (max event time seen − the declared bounded
    out-of-orderness, exactly WatermarkAssigner's arithmetic), and drops
    the success-file marker into every PENDING partition whose extracted
    time + delay the watermark has passed. Unready partitions stay
    visible but uncommitted — downstream consumers that honor the marker
    (the reference's contract) read only complete partitions.

    Scale note: the trigger state is (pending partitions, one watermark)
    — partition-count-bounded; per batch it costs one max() and one
    distinct() over the batch, both map-combinable."""
    import pandas as pd
    from pyspark.sql import functions as _F

    if trigger not in ("partition-time", "process-time"):
        raise ValueError(
            "sink.partition-commit.trigger must be partition-time or "
            f"process-time, got {trigger!r}"
        )
    import json as _json

    wm_delay = pd.Timedelta(watermark_delay)
    c_delay = pd.Timedelta(commit_delay)
    # the trigger's state (pending partitions + watermark) persists
    # BESIDE the checkpoint, like PartitionTimeCommitTrigger's operator
    # state — a restart resumes pending commits instead of orphaning
    # partitions written before the stop
    os.makedirs(checkpoint, exist_ok=True)
    state_path = os.path.join(checkpoint, "partition_commit_state.json")
    state = {"wm": None, "pending": set()}
    if os.path.exists(state_path):
        with open(state_path) as f:
            saved = _json.load(f)
        state["wm"] = (
            pd.Timestamp(saved["wm"]) if saved.get("wm") else None
        )
        state["pending"] = {tuple(v) for v in saved.get("pending", [])}

    def _save_state() -> None:
        with open(state_path, "w") as f:
            _json.dump(
                {
                    "wm": str(state["wm"]) if state["wm"] is not None else None,
                    "pending": sorted(list(v) for v in state["pending"]),
                },
                f,
            )

    def _commit(values) -> None:
        d = find_partition_dir(path, partition_cols, values)
        if d is not None:
            open(os.path.join(d, success_file), "a").close()

    def fb(bdf, bid: int) -> None:
        bdf.persist()
        try:
            (
                bdf.write.mode("append")
                .format(fmt)
                .partitionBy(*partition_cols)
                .save(path)
            )
            if trigger == "partition-time":
                mx = bdf.agg(_F.max(watermark_col)).collect()[0][0]
            for row in bdf.select(*partition_cols).distinct().collect():
                # store str() forms: find_partition_dir and
                # _partition_time both compare on str(value), and a
                # DATE/TIMESTAMP partition value would crash json.dump
                # in _save_state (and come back as a different type on
                # restart) if kept as a native object
                state["pending"].add(
                    tuple(str(row[c]) for c in partition_cols)
                )
        finally:
            bdf.unpersist()
        if trigger == "process-time":
            # ProcTimeCommitTrigger: commit once the checkpoint that
            # wrote the partition completes (+ delay of processing time;
            # the availableNow emulation's batch end IS that point —
            # Flink docs call this mode out as "may commit early/partial
            # data", which holds here identically)
            for values in sorted(state["pending"]):
                _commit(values)
            state["pending"].clear()
            _save_state()
            return
        if mx is not None:
            wm = pd.Timestamp(mx) - wm_delay
            state["wm"] = wm if state["wm"] is None else max(state["wm"], wm)
        if state["wm"] is not None:
            done = set()
            for values in state["pending"]:
                pt = _partition_time(
                    timestamp_pattern, partition_cols, values
                )
                if state["wm"] > pt + c_delay:
                    _commit(values)
                    done.add(values)
            state["pending"] -= done
        _save_state()

    return (
        sdf.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def find_partition_dir(base: str, part_cols, values) -> str | None:
    """Resolve a partition's directory under ``base``, honoring Spark's
    partition-path ESCAPING (PartitioningUtils.escapePathName percent-
    encodes ':', control chars, etc. — a raw f"{col}={value}" join
    misses such directories): each level's entries are %-unescaped and
    compared by value."""
    from urllib.parse import unquote

    cur = base
    for col, val in zip(part_cols, values):
        want = f"{col}={val}"
        nxt = None
        try:
            for d in os.listdir(cur):
                if unquote(d) == want:
                    nxt = os.path.join(cur, d)
                    break
        except OSError:
            return None
        if nxt is None:
            return None
        cur = nxt
    return cur
