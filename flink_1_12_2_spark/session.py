"""Engine session: SparkSession factory + table registry with time metadata.

Flink parity: ``TableEnvironment`` (reference:
flink-table/flink-table-api-java/src/main/java/org/apache/flink/table/api/internal/TableEnvironmentImpl.java:639)
— create tables, register watermarks (``WATERMARK FOR c AS c - INTERVAL ...``,
reference: flink-table/flink-sql-parser/.../ddl/SqlWatermark.java), run SQL.

Spark-first design notes (100 TB scale):
- AQE on by default: runtime join-strategy switch, skew-join splitting, and
  partition coalescing replace Flink's static broadcast-threshold + two-stage
  agg rules.
- ``spark.sql.shuffle.partitions`` is a session-level knob; on a real cluster
  AQE coalescing makes the initial value mostly a ceiling.
- Tables are registered as temp views over ``spark.read.parquet`` so every
  query gets DataSource V2 predicate pushdown + column pruning + partition
  pruning for free (Flink's SupportsFilterPushDown/SupportsProjectionPushDown
  contracts, reference: flink-table/flink-table-common/.../connector/source/abilities/).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_DEFAULT_CONF = {
    # AQE: runtime re-planning (replaces Flink's static join-strategy rules,
    # SplitAggregateRule skew handling, and broadcast-threshold tuning).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas UDF / applyInPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics for the duckdb oracle comparisons.
    "spark.sql.session.timeZone": "UTC",
    # Broadcast threshold — Flink's table.optimizer.join.broadcast-threshold
    # (reference: flink-table/flink-table-api-java/.../config/OptimizerConfigOptions.java:53).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # FileContext access to local file:// without Hadoop's client-side
    # checksum layer. The streaming checkpoint machinery (offset/commit
    # WAL, state-store deltas) goes through CheckpointFileManager's
    # FileContext path, where the checksum wrapper doubles every
    # metadata-log file op (.crc siblings) for no integrity gain on
    # node-local transient scratch. r14 fresh-JVM A/B on stream_topn:
    # walCommit 48-75 → 26-40 ms, commitOffsets 39-63 → 23-27 ms,
    # latestOffset 44-72 → 25-43 ms per micro-batch. Durable production
    # checkpoints live on hdfs://-or-s3:// — untouched by the file://
    # scheme override (guide §6). Deliberately NOT overriding the
    # FileSystem-API twin `fs.file.impl`: RawLocalFileSystem breaks
    # SequenceFile readers that hard-cast FileSystem.getLocal() to
    # LocalFileSystem (caught by the sequencefile sink-roundtrip test).
    "spark.hadoop.fs.AbstractFileSystem.file.impl": (
        "org.apache.hadoop.fs.local.RawLocalFs"
    ),
}


# tmpfs headroom the fast-local-dir default requires before it will put
# shuffle/spill/scratch files on /dev/shm. tmpfs is RAM: spill-to-disk
# fires exactly when memory is short, so landing spill on a nearly-full
# shm inverts §5's safety valve (ENOSPC / OS memory pressure — r13
# verdict item 1). 8 GiB is conservative vs the sandbox's <1 MB bench
# shuffles and still trips the fallback on small-RAM hosts; override
# with SPARK_GRAFT_SHM_MIN_FREE (bytes).
SHM_MIN_FREE_BYTES = 8 << 30


def _fast_local_dir(path: str = "/dev/shm") -> str | None:
    """``path`` when it exists AND has tmpfs headroom, else ``None``
    (callers fall back to the system temp / Spark default)."""
    if not os.path.isdir(path):
        return None
    try:
        st = os.statvfs(path)
        free = st.f_bavail * st.f_frsize
    except OSError:
        return None
    try:
        min_free = int(
            os.environ.get("SPARK_GRAFT_SHM_MIN_FREE", SHM_MIN_FREE_BYTES)
        )
    except ValueError:
        min_free = SHM_MIN_FREE_BYTES
    return path if free >= min_free else None


def _default_driver_memory(mem_total_bytes: int | None) -> str:
    """Local-mode driver heap default: 6g, clamped to half of physical RAM
    on smaller hosts (ADVICE r13: a fixed 6g can fail JVM startup or push
    a small machine into swap). Pure so tests can probe the clamp."""
    six_g_mb = 6 * 1024
    if not mem_total_bytes:
        return "6g"
    half_mb = int(mem_total_bytes / 2 // (1024 * 1024))
    mb = max(min(six_g_mb, half_mb), 512)
    return "6g" if mb == six_g_mb else f"{mb}m"


def _mem_total_bytes() -> int | None:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) * 1024
    except (OSError, ValueError, IndexError):
        pass
    return None


def get_spark(
    app_name: str = "flink_1_12_2_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    hive: bool = False,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    ``hive=True`` enables Hive support (HiveSessionStateBuilder), which is
    what lets ``CREATE FUNCTION ... AS '<class>' LANGUAGE JAVA`` wrap Hive
    UDF/GenericUDF/UDAF classes — Flink's flink-connector-hive function
    parity (HiveModule.java / HiveFunctionDefinitionFactory). A static
    conf: it only takes effect on the FIRST session of the JVM.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = SparkSession.builder.appName(app_name).master(master)
    # Driver heap: in local mode the driver JVM hosts every task slot and
    # every cache, yet Spark's default is 1 GiB — measured GC starvation
    # with tens of concurrent tasks (r13 interleaved bench A/B, 1g → 6g:
    # core −12%, broad-based across the cache/Python-heavy rows; 3g
    # recovers almost none of it). Sized to the workload, not the core
    # count; SPARK_GRAFT_DRIVER_MEMORY overrides (production twin: the
    # explicit spark.driver.memory/spark.executor.memory every cluster
    # deployment sets — guide §5). Static conf: first session of the JVM
    # only; ignored when attaching to an already-running JVM.
    builder = builder.config(
        "spark.driver.memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEMORY")
        or _default_driver_memory(_mem_total_bytes()),
    )
    # Shuffle/spill files on the fastest local storage available. A local
    # shuffle map task pays a fixed per-block file cost (M×R block files);
    # on the sandbox's /tmp (spinning-ish virtio disk) that machinery cost
    # 0.2-0.3 s PER TASK on tiny exchanges (r13 stage metrics: 6.6-8.5 s
    # cumulative shuffle-write time moving <1 MB). Production twin: point
    # spark.local.dir at node-local NVMe (the standard deployment rule);
    # SPARK_GRAFT_LOCAL_DIR overrides, default prefers /dev/shm when
    # present AND it has ≥ SHM_MIN_FREE_BYTES headroom (tmpfs is RAM —
    # see _fast_local_dir). Static conf — first session of the JVM only.
    shm = _fast_local_dir()
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR") or (
        (shm + "/spark-graft-local") if shm else None
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    # Pre-fork numpy/pandas/pyarrow in the worker daemon (see
    # daemon_preload.py): stateful pandas tasks never return their worker
    # to the reuse pool, so stock Spark re-imports the scientific stack in
    # every forked worker (~1.9 s/task of start+init on the stateful bench
    # rows). The daemon subprocess must be able to import this package —
    # export the repo root on PYTHONPATH before the JVM launches (static:
    # first session of the JVM only; harmless if already importable).
    if os.environ.get("SPARK_GRAFT_DAEMON_PRELOAD", "1") != "0":
        _repo_root = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        _pp = os.environ.get("PYTHONPATH", "")
        if _repo_root not in _pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                _repo_root + ((os.pathsep + _pp) if _pp else "")
            )
        builder = builder.config(
            "spark.python.daemon.module", "flink_1_12_2_spark.daemon_preload"
        )
    if hive:
        builder = builder.enableHiveSupport()
    conf = dict(_DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def scratch_dir(prefix: str) -> str:
    """Fresh scratch directory for engine-internal transient state
    (Structured-Streaming checkpoints of bounded verification runs,
    micro-batch staging) on the fastest local storage available — same
    policy as ``spark.local.dir`` above: ``$SPARK_GRAFT_SCRATCH``
    overrides, ``/dev/shm`` preferred when present, else the system
    default temp dir. The HDFS-backed state store fsyncs per-partition
    delta files each commit; on the sandbox's disk-backed /tmp that I/O
    dominated the stateful bench rows' machinery (r13). Durable
    production checkpoints belong on HDFS/S3 — callers that persist state
    across restarts pass their own explicit location instead."""
    import tempfile

    shm = _fast_local_dir()
    base = os.environ.get("SPARK_GRAFT_SCRATCH") or (
        (shm + "/spark-graft-scratch") if shm else None
    )
    if base:
        os.makedirs(base, exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def pinned_repartition(df: DataFrame, *keys: str) -> DataFrame:
    """Hash-repartition by ``keys`` at FULL shuffle parallelism, pinned
    against AQE coalescing.

    AQE's post-shuffle coalescing is byte-based (64 MB advisory / 1 MB
    min); that's right for JVM operators but wrong for per-ROW-cost
    stages (pandas UDF stages, Python NFA, and the windows feeding them):
    a few-MB shuffle gets folded into 1-3 partitions and the expensive
    stage runs on 1-3 cores (measured 3.5-6x slowdown on the CEP bench
    queries). An explicit ``repartition(N, keys)`` is user-specified, so
    AQE leaves it alone, and HashPartitioning(keys, N) satisfies the
    clustering requirement of downstream groupBy / window over the same
    keys — no second exchange appears. At cluster scale the pin keeps
    such stages scaling with executors instead of with shuffle bytes."""
    try:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # e.g. "auto"
        n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *keys)


def rebalance_scan(df: DataFrame) -> DataFrame:
    """Round-robin widen a NARROW scan feeding a row-cost-heavy
    projection stage (shingle/pair explodes, regex replace chains).

    Spark sizes scan splits by bytes (``files.maxPartitionBytes``), which
    is right for columnar scans but starves per-row-expensive stages when
    the source is a single small file: one split = one core for the whole
    explode/replace pipeline (measured 1.44 s → 0.83 s on the sf0.1 BPE
    vocabulary build, and the entire encode chain single-threaded). At
    cluster scale inputs arrive as many splits and this is a NO-OP — the
    repartition (a full shuffle of the input) only fires when the split
    count is under half the session's parallelism, the local-small-file
    case where the shuffled bytes are trivially small by construction.

    The split count comes from the scan's file index (``inputFiles()`` +
    driver stat) when the frame reads files, not ``df.rdd`` —
    instantiating the RDD conversion adds planning overhead, throws on
    streaming frames, and under AQE can execute upstream stages of a
    post-shuffle input (r10 verdict #3). Frames with no file scan
    (in-memory test data) keep the old RDD partition probe, which is
    cheap and side-effect-free for them."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    n = _scan_splits(df)
    if n >= (1 << 30):  # no file scan behind this frame
        if df.isStreaming:
            return df
        n = df.rdd.getNumPartitions()
    if n < target:
        return df.repartition(target)
    return df


def _conf_bytes(raw: str) -> int:
    """Parse a Spark size conf value (plain digits, optional b/k/m/g
    suffix as Spark's JavaUtils.byteStringAsBytes accepts)."""
    s = raw.strip().lower()
    mult = 1
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                   ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("b", 1)):
        if s.endswith(suf):
            s, mult = s[: -len(suf)], m
            break
    return int(s) * mult


def _scan_splits(df: DataFrame) -> int:
    """Estimate the scan split count the planner would produce:
    max(file count, total bytes / files.maxPartitionBytes). Frames with
    no file scan report a huge count (treat as already-wide: widening an
    in-memory/derived frame is the caller's explicit decision)."""
    try:
        files = df.inputFiles()
    except Exception:
        return 1 << 30
    if not files:
        return 1 << 30
    try:
        raw = df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", "128m"
        )
        max_part = max(_conf_bytes(raw), 1)
        total = 0
        for f in files:
            p = f[7:] if f.startswith("file://") else (
                f[5:] if f.startswith("file:") else f
            )
            total += os.stat(p).st_size
        return max(len(files), int(total // max_part) + 1)
    except OSError:
        return len(files)


def keyed_python_groups(df: DataFrame, *keys: str):
    """``df.groupBy(*keys)`` pinned to full shuffle parallelism for a
    Python (pandas) stage — see :func:`pinned_repartition` for why AQE's
    byte-based coalescing must not size these stages."""
    return pinned_repartition(df, *keys).groupBy(*keys)


@dataclass
class TableMeta:
    """Registry metadata for one table.

    ``event_time_col``/``watermark_delay`` mirror Flink's WATERMARK DDL clause;
    the engine applies ``df.withWatermark(event_time_col, watermark_delay)``
    when the table is read as a stream (Flink applies WatermarkAssignerOperator,
    reference: flink-table/flink-table-runtime-blink/.../wmassigners/WatermarkAssignerOperator.java:41).
    ``primary_key`` drives changelog-normalize / upsert sink semantics.
    """

    path: str
    fmt: str = "parquet"
    #: 'filesystem' (path = file/dir) or 'kafka' (path = emulated topic
    #: dir — sources/kafka_emu.py; fmt is then the VALUE format:
    #: json/raw/debezium-json/canal-json/maxwell-json/avro-confluent)
    connector: str = "filesystem"
    event_time_col: str | None = None
    watermark_delay: str | None = None  # e.g. "10 minutes"
    primary_key: tuple[str, ...] = ()
    options: dict[str, str] = field(default_factory=dict)
    # declared physical column names (INSERT maps positionally to these)
    columns: tuple[str, ...] = ()
    # declared schema as a Spark DDL string ("k bigint, v string") — the
    # kafka connector needs it to decode json/CDC payloads
    schema_ddl: str | None = None
    # FLIP-107 metadata columns (SqlTableColumn.SqlMetadataColumn, new in
    # Flink 1.12): (column name, spark type, metadata key) triples; read
    # from the connector, never part of the value payload or of INSERT's
    # positional mapping
    metadata_cols: tuple[tuple[str, str, str], ...] = ()
    # every declared column name in DDL order (physical + computed +
    # metadata) — SELECT * must present this order like Flink's schema
    declared_columns: tuple[str, ...] = ()
    # PARTITIONED BY columns (FileSystemTableSink partition keys):
    # INSERT writes hive-style partition directories on these
    partition_cols: tuple[str, ...] = ()
    # computed columns ((name, flink expression) pairs, SqlTableColumn
    # computed) — re-applied on any re-resolution of the scan (kafka
    # refresh, OPTIONS-hint views) for EVERY connector
    computed_cols: tuple[tuple[str, str], ...] = ()


class EngineSession:
    """SparkSession wrapper + table registry (the engine's TableEnvironment)."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        self._tables: dict[str, TableMeta] = {}
        # DDL-registered user functions: name -> dotted import path
        # (CREATE FUNCTION front door, sql/ddl.py — SqlCreateFunction parity)
        self._functions: dict[str, str] = {}
        # CREATE CATALOG front door (SqlCreateCatalog / GenericInMemoryCatalog
        # parity): catalog -> set of table names registered while current.
        # Metadata-level namespacing — Spark keeps one temp-view namespace,
        # so same-named tables in two catalogs share the physical view slot
        # (documented; Flink's in-memory catalog is likewise just a map).
        self._catalogs: dict[str, set[str]] = {"default_catalog": set()}
        self._current_catalog: str = "default_catalog"
        # catalog name -> type ('generic_in_memory' | 'hive'). A 'hive'
        # catalog (CREATE CATALOG h WITH ('type'='hive') — HiveCatalog.java
        # parity) maps onto a PERSISTENT Spark-session-catalog database:
        # its tables are metastore tables (USING <fmt> LOCATION <path>),
        # not temp views, so they survive EngineSession re-creation and —
        # on a deployment with a real metastore — process restarts.
        self._catalog_types: dict[str, str] = {
            "default_catalog": "generic_in_memory"
        }
        # ALTER DATABASE/VIEW ... SET property bags (SqlAlterDatabase /
        # SqlAlterViewProperties — GenericInMemoryCatalog stores these in
        # a map; so do we)
        self._db_props: dict[str, dict[str, str]] = {}
        self._view_props: dict[str, dict[str, str]] = {}
        # TableConfig (TableConfigOptions.java) + sql-client SET/RESET:
        # string config consulted by the SQL front door — e.g.
        # table.dynamic-table-options.enabled gates OPTIONS hints exactly
        # like the 1.12 planner (default FALSE), and
        # table.exec.resource.default-parallelism maps live onto
        # spark.sql.shuffle.partitions.
        self._config: dict[str, str] = {}
        # Temporal table functions (Table.createTemporalTableFunction —
        # flink-table-api-java/.../api/Table.java:115): name →
        # (history table name or DataFrame, time attribute, primary key).
        # Joined via the comma + LATERAL TABLE (fn(ts)) SQL form
        # (sql/temporal.temporal_fn_join_sql).
        self._temporal_fns: dict[str, tuple] = {}
        # kafka-backed temp views pin their file index at registration;
        # Flink's scan resolves at QUERY time, so `sql()`/`table()`
        # re-register any view whose topic directory changed since —
        # detected by a cheap top-level-listing fingerprint (each
        # producer batch is one new directory entry). Computed columns
        # re-apply from TableMeta.computed_cols on refresh.
        self._kafka_fps: dict[str, tuple[str, ...]] = {}
        # Flink-only SQL function names (SPLIT_INDEX, IS_DECIMAL, …) are part
        # of the front-door dialect — register once per session (idempotent,
        # Catalyst inlines the SQL-UDF bodies so they cost nothing at run
        # time). TableEnvironment does the same via its function catalog.
        from flink_1_12_2_spark.functions.registry import (
            register_flink_sql_functions,
        )

        register_flink_sql_functions(self.spark)
        # Module system (ModuleManager.java): CoreModule loaded first by
        # default; loadModule/useModules change function-resolution order
        from flink_1_12_2_spark.modules import ModuleManager

        self.modules = ModuleManager()

    # -- module system (TableEnvironment.java:384-392,725) ----------------
    def load_module(self, name: str, module) -> None:
        self.modules.load_module(name, module)

    def unload_module(self, name: str) -> None:
        self.modules.unload_module(name)

    def list_modules(self) -> list[str]:
        return self.modules.list_modules()

    def use_modules(self, *names: str) -> None:
        self.modules.use_modules(*names)

    def call_function(self, name: str, *args):
        """Build a Column for ``name`` resolved through the module chain
        (first used module listing the name wins — ModuleManager
        .getFunctionDefinition). Raises if no module provides it."""
        fn = self.modules.get_function_definition(name)
        if fn is None:
            raise ValueError(
                f"No match found for function signature {name}"
            )
        return fn(*args)

    def create_temporal_table_function(
        self,
        name: str,
        history,
        time_attr: str | None = None,
        primary_key: str | None = None,
    ) -> None:
        """Register a temporal table function over a history table
        (Table.createTemporalTableFunction(timeAttribute, primaryKey) +
        createTemporarySystemFunction). ``history`` is a registered table
        name, a DataFrame, or a ``table_api.TemporalTableFunction``
        (the Table API product — time attribute and key travel inside).
        Use in SQL as ``FROM fact f, LATERAL TABLE (name(f.ts)) r WHERE
        f.k = r.k`` — each fact row joins the history version current at
        its time."""
        from flink_1_12_2_spark.table_api import TemporalTableFunction

        if isinstance(history, TemporalTableFunction):
            time_attr = history.time_attr
            primary_key = history.primary_key
            history = history.history
        if time_attr is None or primary_key is None:
            raise ValueError(
                "time_attr and primary_key are required unless a "
                "TemporalTableFunction is passed"
            )
        if isinstance(history, str):
            self.spark.table(history)  # fail fast on typos
        self._temporal_fns[name] = (history, time_attr, primary_key)

    # -- registry -----------------------------------------------------------
    def register_table(self, name: str, meta: TableMeta) -> None:
        self._tables[name] = meta
        self._catalogs.setdefault(self._current_catalog, set()).add(name)
        if meta.connector == "jdbc":
            from flink_1_12_2_spark.sql.ddl import _jdbc_frame

            _jdbc_frame(self.spark, meta).createOrReplaceTempView(name)
            return
        if meta.connector in ("kafka", "upsert-kafka"):
            if meta.connector == "upsert-kafka":
                from flink_1_12_2_spark.sources.kafka_emu import (
                    read_upsert_topic_batch,
                )

                df = read_upsert_topic_batch(
                    self.spark, meta.path, meta.schema_ddl or "",
                    list(meta.primary_key),
                    value_format=meta.fmt, options=meta.options,
                )
            else:
                from flink_1_12_2_spark.sources.kafka_emu import topic_table

                df = topic_table(
                    self.spark, meta.path, meta.fmt,
                    payload_schema=meta.schema_ddl or "",
                    options=meta.options,
                    metadata_cols=meta.metadata_cols,
                )
            for cname, cexpr in meta.computed_cols:
                from flink_1_12_2_spark.sql.rewriter import rewrite_expr

                df = df.withColumn(cname, F.expr(rewrite_expr(cexpr)))
            if meta.declared_columns and set(meta.declared_columns) == set(
                df.columns
            ):
                # SELECT * presents the DDL's declared column order
                # (Flink keeps metadata/computed columns in declared
                # position, not appended)
                df = df.select(*meta.declared_columns)
            df.createOrReplaceTempView(name)
            self._kafka_fps[name] = self._topic_fingerprint(meta.path)
            return
        reader = self.spark.read.format(meta.fmt)
        for k, v in meta.options.items():
            reader = reader.option(k, v)
        reader.load(meta.path).createOrReplaceTempView(name)

    @staticmethod
    def _topic_fingerprint(path: str) -> tuple[str, ...]:
        """Top-level listing of an emulated topic spec — one entry per
        producer batch / committed transaction, so it changes iff new
        data became consumer-visible. Topic lists ('a;b') and
        topic-pattern globs fingerprint the union of matched dirs."""
        from flink_1_12_2_spark.sources.kafka_emu import _topic_paths

        out: list[str] = []
        for root in _topic_paths(path):
            try:
                out.extend(
                    os.path.join(os.path.basename(root), e)
                    for e in os.listdir(root)
                )
            except OSError:
                continue
        return tuple(sorted(out))

    def set_config(self, key: str, value: str) -> DataFrame:
        """SET one TableConfig entry; a few keys are wired live onto the
        Spark session, the rest are consulted where they apply (e.g. the
        OPTIONS-hint gate)."""
        self._config[key] = value
        if key == "table.exec.resource.default-parallelism":
            # ExecutionConfigOptions: operator default parallelism — the
            # Spark analogue is the shuffle partition count
            self.spark.conf.set("spark.sql.shuffle.partitions", value)
        elif key == "pipeline.name":
            self.spark.sparkContext.setJobDescription(value)
        return self.spark.createDataFrame([("OK",)], "result string")

    def _apply_options_hints(self, q: str) -> str:
        """Dynamic table options (new in 1.12 — FlinkHints.java OPTIONS
        hint): ``t /*+ OPTIONS('k'='v') */`` re-scans registry table t
        with the hinted options merged over its DDL options, gated on
        table.dynamic-table-options.enabled exactly like the planner
        (TableConfigOptions.java:38, default false)."""
        import dataclasses

        hint_re = re.compile(
            r"(\w+)\s*/\*\+\s*OPTIONS\s*\(([^)]*)\)\s*\*/", re.I | re.S
        )
        if not hint_re.search(q):
            return q
        if self._config.get(
            "table.dynamic-table-options.enabled", "false"
        ).lower() != "true":
            raise ValueError(
                "OPTIONS hint is allowed only when "
                "table.dynamic-table-options.enabled is set to true"
            )
        from flink_1_12_2_spark.sql.ddl import scan_frame

        def repl(m: "re.Match") -> str:
            name, optstr = m.group(1), m.group(2)
            meta = self._tables.get(name)
            if meta is None:
                raise ValueError(
                    f"OPTIONS hint on {name!r}: not a registered "
                    "connector table (dynamic table options attach to "
                    "table scans)"
                )
            overrides = dict(
                re.findall(r"'([^']+)'\s*=\s*'([^']*)'", optstr)
            )
            merged = {**meta.options, **overrides}
            if any(k.startswith("scan.startup") for k in overrides):
                # a hinted startup position must resolve FRESH: the
                # registry bag may carry the DDL-time materialized
                # exclusion snapshot ('scan.startup.__excluded'), which
                # _startup_excluded would otherwise honor over the hint
                merged.pop("scan.startup.__excluded", None)
            hinted = dataclasses.replace(meta, options=merged)
            view = f"__hint_{name}_{abs(hash(frozenset(overrides.items()))) % 10**8}"
            df = scan_frame(self, hinted)
            for cname, cexpr in meta.computed_cols:
                # the hinted scan exposes the SAME declared schema as
                # the plain one — computed columns included, for every
                # connector (computed_cols rides TableMeta)
                from flink_1_12_2_spark.sql.rewriter import rewrite_expr

                df = df.withColumn(cname, F.expr(rewrite_expr(cexpr)))
            if meta.declared_columns and set(meta.declared_columns) == set(
                df.columns
            ):
                # SELECT * through the hint presents DDL-declared column
                # order, like register_table's plain view. EQUALITY, not
                # subset: a CDC scan carries engine columns beyond the
                # declared ones (_row_kind, ts_ms) that a subset-select
                # would silently drop, corrupting the changelog
                df = df.select(*meta.declared_columns)
            df.createOrReplaceTempView(view)
            return view

        return hint_re.sub(repl, q)

    def _refresh_stale_kafka_views(self) -> None:
        """Re-resolve kafka-backed views whose topic changed since their
        registration (Flink's scan resolves at query time; the emulated
        view pins its file index when built — r11 advice). The check is
        one os.listdir per kafka table; a refresh re-runs the topic read
        only for topics that actually changed."""
        for name, meta in list(self._tables.items()):
            if meta.connector not in ("kafka", "upsert-kafka"):
                continue
            fp = self._topic_fingerprint(meta.path)
            if fp and fp != self._kafka_fps.get(name):
                self.register_table(name, meta)

    def register_view_meta(self, name: str, meta: TableMeta) -> None:
        """Attach registry metadata (event time / watermark / PK) to an
        already-registered temp view without re-reading any path — e.g. a
        versioned view used as the dim side of FOR SYSTEM_TIME AS OF."""
        self._tables[name] = meta

    def register_testdata(self, sf_dir: str) -> None:
        """Register the driver's synthetic tables (TESTDATA.md) as temp views."""
        for t in TESTDATA_TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                meta = TableMeta(path=path)
                if t == "events":
                    meta.event_time_col = "ts"
                    meta.watermark_delay = "10 minutes"
                    meta.primary_key = ("event_id",)
                self.register_table(t, meta)

    def register_sink(self, name: str, meta: TableMeta) -> None:
        """Register a path-backed sink table without reading it (the path may
        not exist yet — Flink's CREATE TABLE for a filesystem sink)."""
        self._tables[name] = meta
        self._catalogs.setdefault(self._current_catalog, set()).add(name)

    def create_statement_set(self):
        """Flink TableEnvironment.createStatementSet() — buffer N INSERTs,
        execute as one unit with shared-view reuse (sql/statement_set.py)."""
        from flink_1_12_2_spark.sql.statement_set import StatementSet

        return StatementSet(self)

    def table(self, name: str) -> DataFrame:
        meta = self._tables.get(name)
        if meta is not None and meta.connector in ("kafka", "upsert-kafka"):
            fp = self._topic_fingerprint(meta.path)
            if fp and fp != self._kafka_fps.get(name):
                self.register_table(name, meta)
        return self.spark.table(name)

    def meta(self, name: str) -> TableMeta | None:
        return self._tables.get(name)

    # -- streaming scan with watermark from registry metadata ---------------
    def stream_table(self, name: str) -> DataFrame:
        """Read a registered table as a stream, applying its watermark.

        Flink parity: StreamExecTableSourceScan + WatermarkAssigner
        (reference: flink-table/flink-table-planner-blink/.../physical/stream/StreamExecTableSourceScan.scala).
        """
        meta = self._tables[name]
        if meta.connector == "jdbc":
            raise ValueError(
                "jdbc tables are bounded scans (+ lookup joins) — Flink's "
                "jdbc source has no unbounded mode either"
            )
        if meta.connector in ("print", "blackhole"):
            raise ValueError(
                f"{meta.connector!r} is a sink-only connector"
            )
        if meta.connector == "datagen":
            from flink_1_12_2_spark.sources.devgen import datagen_stream

            df = datagen_stream(
                self.spark, meta.schema_ddl or "", meta.options
            )
            if meta.event_time_col and meta.watermark_delay:
                df = df.withWatermark(
                    meta.event_time_col, meta.watermark_delay
                )
            return df
        if meta.connector == "upsert-kafka":
            from flink_1_12_2_spark.sources.kafka_emu import (
                read_upsert_topic_changelog_stream,
            )

            df = read_upsert_topic_changelog_stream(
                self.spark, meta.path, meta.schema_ddl or "",
                list(meta.primary_key),
                value_format=meta.fmt, options=meta.options,
            )
        elif meta.connector == "kafka":
            from flink_1_12_2_spark.sources.kafka_emu import (
                topic_table_stream,
            )

            df = topic_table_stream(
                self.spark, meta.path, meta.fmt,
                payload_schema=meta.schema_ddl or "",
                options=meta.options,
                metadata_cols=meta.metadata_cols,
            )
        else:
            from flink_1_12_2_spark.sql.ddl import _format_scan_options

            # the PHYSICAL schema (declared columns only): the batch
            # view's schema includes computed columns the files don't
            # carry, which would make every csv/json record malformed —
            # computed columns re-apply AFTER the load, like the batch
            # scan path
            physical = meta.schema_ddl or self.spark.table(name).schema
            r = self.spark.readStream.format(meta.fmt).schema(physical)
            # same Flink→Spark format-option mapping as the batch scan
            # (csv.field-delimiter → sep, ignore-parse-errors → mode, …)
            for k, v in _format_scan_options(meta.fmt, meta.options).items():
                r = r.option(k, v)
            if meta.fmt == "csv":
                r = r.option("header", "true")
            df = r.load(meta.path)
            if meta.computed_cols:
                from flink_1_12_2_spark.sql.rewriter import rewrite_expr

                for cname, cexpr in meta.computed_cols:
                    df = df.withColumn(cname, F.expr(rewrite_expr(cexpr)))
        if meta.event_time_col and meta.watermark_delay:
            df = df.withWatermark(meta.event_time_col, meta.watermark_delay)
        return df

    # -- SQL front door ------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Run SQL after the Flink→Spark rewrite pass (see sql/rewriter.py).

        MATCH_RECOGNIZE statements route to the CEP NFA
        (sql/match_recognize.py) — Spark SQL has no MATCH_RECOGNIZE."""
        import re

        m_set = re.match(
            r"(?is)^\s*SET\s+'?([\w.\-]+)'?\s*=\s*'?([^';]*?)'?\s*;?\s*$",
            query,
        )
        if m_set:
            # sql-client SetOperation: SET key=value (quotes optional)
            return self.set_config(m_set.group(1), m_set.group(2))
        if re.match(r"(?is)^\s*SET\s*;?\s*$", query):
            return self.spark.createDataFrame(
                sorted(self._config.items()) or [("", "")],
                "key string, value string",
            ).filter("key <> ''")
        m_reset = re.match(
            r"(?is)^\s*RESET\s+'?([\w.\-]+)'?\s*;?\s*$", query
        )
        if m_reset:
            self._config.pop(m_reset.group(1), None)
            return self.spark.createDataFrame([("OK",)], "result string")
        if re.match(r"(?is)\s*CREATE\s+TABLE\b", query):
            from flink_1_12_2_spark.sql.ddl import execute_ddl

            return execute_ddl(self, query)
        if "/*+" in query:
            query = self._apply_options_hints(query)
        # kafka scans resolve at query time (Flink parity): pick up any
        # topic batches published since the views were built
        self._refresh_stale_kafka_views()
        if re.match(
            r"(?is)\s*(SHOW\s+\w+|DESCRIBE|DROP\s+(TABLE|VIEW|DATABASE|CATALOG)|"
            r"ALTER\s+(TABLE|VIEW)|CREATE\s+(TEMPORARY\s+)?VIEW|"
            r"CREATE\s+(DATABASE|CATALOG)|USE\s+\w+|USE\s+CATALOG|"
            r"(LOAD|UNLOAD)\s+MODULE|"
            r"(CREATE|DROP|ALTER)\s+(TEMPORARY\s+)?(SYSTEM\s+)?FUNCTION)\s*",
            query,
        ):
            from flink_1_12_2_spark.sql.ddl import execute_statement

            out = execute_statement(self, query)
            if out is not None:
                return out
        if re.match(r"(?is)\s*INSERT\s+(INTO|OVERWRITE)\b", query):
            m = re.match(
                r"(?is)\s*INSERT\s+(?:INTO|OVERWRITE)\s+([\w.]+)", query
            )
            sink = m.group(1) if m else ""
            if sink not in self._tables and self.spark.catalog.tableExists(
                sink
            ):
                # hive-catalog (metastore) table: Spark executes the
                # INSERT natively — no registry sink needed
                return self.spark.sql(query)
            # single-statement INSERT (Flink executeSql) = 1-element StatementSet
            return self.create_statement_set().add_insert_sql(query).execute()
        if re.match(r"(?is)\s*EXPLAIN\b", query):
            rest = re.sub(r"(?is)^\s*EXPLAIN\s+", "", query)
            # ExplainDetail list (ExplainDetail.java:30,36 — the 1.12
            # enum has exactly ESTIMATED_COST and CHANGELOG_MODE):
            # EXPLAIN CHANGELOG_MODE[, ESTIMATED_COST] <statement>
            dm = re.match(
                r"(?is)^((?:CHANGELOG_MODE|ESTIMATED_COST)"
                r"(?:\s*,\s*(?:CHANGELOG_MODE|ESTIMATED_COST))*)\s+",
                rest,
            )
            details: tuple[str, ...] = ()
            if dm:
                details = tuple(
                    d.strip().upper() for d in dm.group(1).split(",")
                )
                rest = rest[dm.end():]
            rest = re.sub(r"(?is)^\s*PLAN\s+FOR\s+", "", rest)
            return self.explain_sql(rest, details=details)
        if re.search(r"(?i)\bFOR\s+SYSTEM_TIME\s+AS\s+OF\b", query):
            from flink_1_12_2_spark.sql.temporal import temporal_join_sql

            return temporal_join_sql(self, query)
        from flink_1_12_2_spark.sql.temporal import is_temporal_fn_query

        if is_temporal_fn_query(self, query):
            from flink_1_12_2_spark.sql.temporal import temporal_fn_join_sql

            return temporal_fn_join_sql(self, query)
        if re.search(r"(?i)\bMATCH_RECOGNIZE\b", query):
            from flink_1_12_2_spark.sql.match_recognize import match_recognize

            m = re.search(r"(?is)FROM\s+(\w+)\s+MATCH_RECOGNIZE", query)
            if not m:
                raise ValueError("MATCH_RECOGNIZE requires 'FROM <table>'")
            return match_recognize(self.spark.table(m.group(1)), query)
        from flink_1_12_2_spark.sql.rewriter import rewrite

        try:
            return self.spark.sql(rewrite(query))
        except Exception as e:
            # a table can be REGISTERED (CREATE TABLE succeeded) yet have
            # no scan view — a sink awaiting its first INSERT, or an
            # unbounded datagen. Spark then says "not found", which reads
            # as a typo; name the real state instead.
            msg = str(e)
            if "TABLE_OR_VIEW_NOT_FOUND" in msg:
                m = re.search(r"`(\w+)`", msg)
                meta = self._tables.get(m.group(1)) if m else None
                if meta is not None and meta.connector == "datagen":
                    raise ValueError(
                        f"table {m.group(1)!r} is an UNBOUNDED datagen "
                        "source — a batch scan needs 'number-of-rows' or "
                        "a sequence field; read it with stream_table()"
                    ) from e
                if meta is not None:
                    raise ValueError(
                        f"table {m.group(1)!r} is registered as a sink "
                        "with no data yet — INSERT INTO it first"
                    ) from e
            raise

    def explain_sql(
        self, query: str, details: tuple[str, ...] = ()
    ) -> DataFrame:
        """EXPLAIN [detail[, detail]] [PLAN FOR] — TableEnvironment
        .explainSql parity (TableEnvironmentImpl.java; Flink returns one
        row holding the abstract-syntax + optimized + physical plan
        text). We return the Catalyst parsed/analyzed/optimized/physical
        rendering, which is the same three-section story; ``details``
        appends the ExplainDetail sections (CHANGELOG_MODE via the
        changelog_plan inference rules, ESTIMATED_COST via Catalyst's
        Statistics)."""
        from flink_1_12_2_spark.sql.rewriter import rewrite

        if "/*+" in query:
            # OPTIONS hints must resolve before Spark parses (same gate
            # and merge as the execution path)
            query = self._apply_options_hints(query)
        sink = None
        im = re.match(
            r"(?is)\s*INSERT\s+(?:INTO|OVERWRITE)\s+([\w.]+)\s+(.*)$",
            query,
            re.S,
        )
        if im is not None:
            # EXPLAIN over an INSERT: plan the SELECT part (never
            # execute the write) and wrap the changelog tree with the
            # terminal sink rules (append sink rejects updates exactly
            # like the planner; PK sink gets DropUpdateBefore)
            target, query = im.group(1), im.group(2)
            meta = self._tables.get(target)
            if meta is not None and meta.connector in ("print", "blackhole"):
                kind = "retract"  # these sinks accept every change kind
            elif meta is not None and meta.primary_key:
                kind = "upsert"
            else:
                kind = "append"
            sink = (target, kind)
        df = self.spark.sql(rewrite(query))
        plan = df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "extended"
            )
        )
        sections = [plan]
        if any(d.upper() == "CHANGELOG_MODE" for d in details):
            from flink_1_12_2_spark.sql.explain_details import (
                changelog_mode_section,
            )

            sections.append(
                "== Changelog Mode ==\n"
                + changelog_mode_section(self, df, sink)
            )
        if any(d.upper() == "ESTIMATED_COST" for d in details):
            from flink_1_12_2_spark.sql.explain_details import (
                estimated_cost_section,
            )

            sections.append(
                "== Estimated Cost ==\n" + estimated_cost_section(df)
            )
        plan = "\n\n".join(sections)
        return self.spark.createDataFrame([(plan,)], "plan string")
