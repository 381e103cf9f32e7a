"""Advanced relational/stream operators: coGroup, table aggregate
(flatAggregate), cumulative windows, iterations.

Flink parity:
- coGroup            → CoGroupedStreams.java / DataSet.coGroup — Spark:
  ``df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas`` (one Arrow batch
  per key-pair, both sides grouped — never a join explosion).
- flatAggregate      → GroupTableAggFunction.java (155 J): aggregate emitting
  MULTIPLE rows per group — Spark: ``applyInPandas`` one-to-many.
- CUMULATE window    → CumulativeWindowAssigner.java:37 — no Spark primitive
  (SURVEY §2.5): each row lands in every window [start, start+step·i) that
  contains it → expressed as explode over the window-end sequence, then a
  plain groupBy. One shuffle, no state.
- iterations         → DataSet.iterate/iterateDelta (DataSet.java:1234) —
  driver-side loop over cached DataFrames with a convergence check
  (Spark's idiomatic replacement for Flink's iteration operator).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def cogroup_apply(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    fn: Callable,
    output_schema: str,
) -> DataFrame:
    """coGroup: ``fn(key, left_pdf, right_pdf) -> pdf`` per key pair.
    Both sides pinned to the same full-parallelism hash partitioning
    (session.keyed_python_groups) — co-partitioned, no second exchange,
    and byte-based AQE coalescing can't starve the pandas stage."""
    from flink_1_12_2_spark.session import keyed_python_groups

    return (
        keyed_python_groups(left, *left_keys)
        .cogroup(keyed_python_groups(right, *right_keys))
        .applyInPandas(fn, output_schema)
    )


def flat_aggregate(
    df: DataFrame, keys: list[str], fn: Callable, output_schema: str
) -> DataFrame:
    """Table aggregate: one group in → many rows out (flatAggregate).
    Grouping pinned to full shuffle parallelism — byte-based AQE
    coalescing would starve the pandas stage (session.keyed_python_groups)."""
    from flink_1_12_2_spark.session import keyed_python_groups

    return keyed_python_groups(df, *keys).applyInPandas(fn, output_schema)


def cumulate_window(
    df: DataFrame,
    time_col: str,
    step_seconds: int,
    size_seconds: int,
) -> DataFrame:
    """CUMULATE window assignment (Flink CumulativeWindowAssigner.java:37).

    Emits one row per (row, window) pair with ``win_start``/``win_end``
    columns: windows share a start aligned to ``max_size`` and grow by
    ``step`` until ``max_size``. Downstream: plain ``groupBy(win_start,
    win_end, ...)`` — so the whole operator is explode + hash agg, one
    shuffle, no custom state (vs. Flink's stateful assigner).
    """
    # epoch-seconds via NTZ diff — independent of the session timezone
    epoch_ntz = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    step_s = F.lit(step_seconds).cast("bigint")
    size_s = F.lit(size_seconds).cast("bigint")
    ts_s = F.timestamp_diff(
        "SECOND", epoch_ntz, F.col(time_col).cast("timestamp_ntz")
    )
    win_start_s = (ts_s - (ts_s % size_s)).cast("bigint")
    # window ends: start+step, start+2*step, ..., start+size — row belongs to
    # every window whose end is strictly after its timestamp
    ends = F.sequence(win_start_s + step_s, win_start_s + size_s, step_s)
    valid_ends = F.filter(ends, lambda e: e > ts_s)
    out = df.withColumn("__ws", win_start_s).withColumn("__we", F.explode(valid_ends))
    to_ntz = lambda c: F.timestamp_add("SECOND", c, epoch_ntz)  # noqa: E731
    return (
        out.withColumn("win_start", to_ntz(F.col("__ws")))
        .withColumn("win_end", to_ntz(F.col("__we")))
        .drop("__ws", "__we")
    )


def count_window(
    df: DataFrame, key_cols: list[str], order_cols: list[str], size: int
) -> DataFrame:
    """Tumbling COUNT window (Flink DataStream countWindow /
    PurgingTrigger(CountTrigger) — SURVEY §2.5 'no SS equivalent' row).

    Deterministic form: windows are assigned in ``order_cols`` order (Flink
    assigns by arrival; a replayable order column models that). Adds
    ``win_id`` (0-based per key) and ``pos_in_win``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    rn = F.row_number().over(w) - 1
    return df.withColumn("win_id", (rn - rn % size) / size).withColumn(
        "win_id", F.col("win_id").cast("bigint")
    ).withColumn("pos_in_win", (rn % size).cast("int"))


def tag_late_rows(
    df: DataFrame,
    ts_col: str,
    arrival_col: str,
    delay_seconds: int,
) -> DataFrame:
    """Late-data side output (WindowedStream.sideOutputLateData,
    WindowedStream.java:124 — SS silently drops late rows, SURVEY §2.5 gap).

    Deterministic replay model: the watermark is the running max of event
    time in ``arrival_col`` order minus ``delay_seconds``; a row is late iff
    its event time is below the watermark established *before* it arrived.
    Adds a boolean ``is_late`` — filter on it for the main/side outputs.

    Scale: the running max is NOT a global ``Window.orderBy`` (which would
    sort the whole stream through one task). Instead:
    ``repartitionByRange(arrival_col)`` gives non-overlapping ascending
    arrival ranges per partition; a per-partition running max runs fully
    parallel; the cross-partition carry-in is the prefix max of the
    per-partition maxima — one tiny row per partition, collected and
    broadcast back as a literal CASE. Exact same semantics as the global
    window at any scale (same template as ``streaming/core._tag_ntile_chunks``).
    The intermediate is ``localCheckpoint``ed so the offsets job and the
    output see identical range boundaries (range sampling is not re-run).
    """
    from pyspark.sql import Window

    epoch_ntz = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = (
        df.repartitionByRange(n_parts, arrival_col)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__ts_s",
            F.timestamp_diff(
                "SECOND", epoch_ntz, F.col(ts_col).cast("timestamp_ntz")
            ),
        )
        .localCheckpoint(eager=True)
    )
    # tiny: one row per partition — prefix maxima of earlier partitions
    part_max = {
        r["__pid"]: r["m"]
        for r in ranged.groupBy("__pid").agg(F.max("__ts_s").alias("m")).collect()
    }
    carry_in, running = {}, None
    for pid in sorted(part_max):
        carry_in[pid] = running
        m = part_max[pid]
        if m is not None and (running is None or m > running):
            running = m
    pre_expr = F.lit(None).cast("bigint")
    for pid, pm in carry_in.items():
        if pm is not None:
            pre_expr = F.when(F.col("__pid") == pid, F.lit(pm)).otherwise(pre_expr)
    w = Window.partitionBy("__pid").orderBy(arrival_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_max = F.greatest(F.max("__ts_s").over(w), pre_expr)
    return ranged.withColumn(
        "is_late",
        F.coalesce(
            F.col("__ts_s") < prev_max - F.lit(delay_seconds), F.lit(False)
        ),
    ).drop("__pid", "__ts_s")


def iterate(
    initial: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 20,
    converged: Callable[[DataFrame, DataFrame], bool] | None = None,
) -> DataFrame:
    """Bulk iteration: apply ``step`` until convergence or max_iterations.

    Each iterate is ``localCheckpoint(eager=True)``-materialized: unlike
    ``cache()`` this TRUNCATES the logical plan to a leaf, so the driver
    never holds an O(iterations)-deep lineage (r7 postmortem: the
    cache-only version's unrolled PageRank plan OOM'd a default-1-GiB
    driver heap at ``collectToPython`` — the executors were fine, the
    *plan* wasn't). Retired generations' checkpoint blocks are freed
    explicitly via ``rdd.unpersist()`` (DataFrame.unpersist does not
    release localCheckpoint blocks; the ContextCleaner only reclaims them
    lazily on GC) with a 2-generation lag so the frame a step/convergence
    check may still reference stays live. ``converged`` receives
    (previous, current); default stops only at max_iterations. On a real
    cluster swap localCheckpoint for reliable ``checkpoint`` if executor
    loss matters mid-iteration."""
    current = initial.localCheckpoint(eager=True)
    retired: list = []
    for _ in range(max_iterations):
        nxt = step(current).localCheckpoint(eager=True)
        done = converged is not None and converged(current, nxt)
        retired.append(current)
        if len(retired) > 2:
            retired.pop(0).rdd.unpersist()
        current = nxt
        if done:
            break
    return current


def iterate_delta(
    solution: DataFrame,
    workset: DataFrame,
    key_cols: list[str],
    step: Callable[[DataFrame, DataFrame], tuple[DataFrame, DataFrame]],
    max_iterations: int = 50,
) -> DataFrame:
    """Delta iteration (DataSet.iterateDelta — DataSet.java:1234): the
    workset/solution-set iteration behind Flink's ConnectedComponents
    example (flink-examples-batch .../graph/ConnectedComponents.java).

    Per superstep ``step(solution, workset) -> (delta, next_workset)``;
    ``delta`` is key-merged into the solution (delta rows replace same-key
    solution rows) and the loop ends when the workset is empty. The
    ``next_workset.count()`` doubles as the materialization barrier, so a
    superstep is one Spark job.

    Scale notes: every superstep ``localCheckpoint``s its outputs — unlike
    ``cache()`` this truncates the *logical plan* to a leaf, which is
    mandatory here: the solution merge references the previous solution on
    three paths, so an un-truncated plan grows ~3^N and the driver OOMs
    just printing it around superstep 8. The merge is an anti-join on the
    key (one shuffle, key-partitioned both sides so AQE can pick a
    shuffled hash join). Worksets shrink monotonically, so late supersteps
    cost ~nothing — the delta-iteration advantage over bulk ``iterate``.
    On a real cluster swap ``localCheckpoint`` for reliable ``checkpoint``
    if executor loss matters mid-iteration.
    """
    sol = solution.localCheckpoint(eager=True)
    ws = workset.localCheckpoint(eager=True)
    n_ws = ws.count()
    for _ in range(max_iterations):
        if n_ws == 0:
            break
        delta, nxt_ws = step(sol, ws)
        delta = delta.localCheckpoint(eager=True)
        nxt_ws = nxt_ws.localCheckpoint(eager=True)
        n_ws = nxt_ws.count()
        if delta.count() > 0:
            sol = (
                sol.join(delta.select(*key_cols), key_cols, "left_anti")
                .unionByName(delta)
                .localCheckpoint(eager=True)
            )
        ws = nxt_ws
    return sol


def pagerank(
    edges: DataFrame,
    num_iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over (src, dst) edges via bulk iteration (Gelly
    PageRank / DataSet.iterate parity — reference:
    flink-libraries/flink-gelly/.../Graph.java:85, DataSet.java `iterate`).

    Pregel-on-DataFrames: each superstep is contributions = edges ⋈ ranks
    (shuffle on src) → groupBy(dst) sum (shuffle on dst); ranks re-derived
    from the node set with the damping term. Dangling nodes (out-degree 0)
    leak mass — the simple textbook variant; the oracle replicates exactly.
    :func:`iterate` caches + materializes each superstep so lineage stays
    bounded (at 100 TB: same plan, edges cached once and reused N times;
    localCheckpoint instead of cache if executor memory is tight).
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()
    e = edges.cache()
    base = (1.0 - damping) / n
    ranks0 = nodes.select("node", F.lit(1.0 / n).alias("rank"))

    def step(ranks: DataFrame) -> DataFrame:
        contribs = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        return nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )

    return iterate(ranks0, step, max_iterations=num_iterations)
