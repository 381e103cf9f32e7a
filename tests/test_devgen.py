"""datagen / print / blackhole dev connectors (DataGenTableSourceFactory,
PrintTableSinkFactory, BlackHoleTableSinkFactory parity)."""

from __future__ import annotations

import pytest


def test_datagen_sequence_is_deterministic(spark):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    eng.sql(
        """CREATE TABLE gen_seq (id BIGINT, tag STRING) WITH (
            'connector'='datagen',
            'fields.id.kind'='sequence',
            'fields.id.start'='10', 'fields.id.end'='14',
            'fields.tag.kind'='sequence',
            'fields.tag.start'='100', 'fields.tag.end'='999')"""
    )
    rows = eng.sql("SELECT * FROM gen_seq ORDER BY id").collect()
    # bounded by the SMALLEST sequence span (id: 5 values)
    assert [(r["id"], r["tag"]) for r in rows] == [
        (10, "100"), (11, "101"), (12, "102"), (13, "103"), (14, "104"),
    ]


def test_datagen_random_bounds_and_length(spark):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    eng.sql(
        """CREATE TABLE gen_rnd (v INT, f DOUBLE, s STRING, b BOOLEAN)
        WITH ('connector'='datagen', 'number-of-rows'='200',
              'fields.v.min'='5', 'fields.v.max'='7',
              'fields.f.min'='0.5', 'fields.f.max'='0.75',
              'fields.s.length'='10')"""
    )
    rows = spark.table("gen_rnd").collect()
    assert len(rows) == 200
    vs = {r["v"] for r in rows}
    assert vs <= {5, 6, 7} and len(vs) > 1  # in-bounds and actually random
    assert all(0.5 <= r["f"] <= 0.75 for r in rows)
    assert all(len(r["s"]) == 10 for r in rows)
    assert {r["b"] for r in rows} == {True, False}


def test_datagen_default_bigint_full_range(spark):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    eng.sql(
        """CREATE TABLE gen_big (x BIGINT) WITH (
            'connector'='datagen', 'number-of-rows'='500')"""
    )
    rows = [r["x"] for r in spark.table("gen_big").collect()]
    assert len(rows) == 500 and all(r is not None for r in rows)
    # full-range: both signs show up in 500 uniform 64-bit draws
    assert any(r < 0 for r in rows) and any(r > 0 for r in rows)


def test_datagen_unbounded_batch_scan_rejected(spark):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    eng.sql(
        "CREATE TABLE gen_unb (x BIGINT) WITH ('connector'='datagen')"
    )
    with pytest.raises(Exception, match="UNBOUNDED"):
        eng.sql("SELECT * FROM gen_unb").collect()
    # the streaming twin works and is bound-free
    st = eng.stream_table("gen_unb")
    assert st.isStreaming and st.columns == ["x"]


def test_print_sink_row_format(spark, capsys):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    eng.sql(
        """CREATE TABLE out_p (k BIGINT, v STRING) WITH (
            'connector'='print', 'print-identifier'='dbg')"""
    )
    eng.sql("INSERT INTO out_p VALUES (1, 'a'), (2, CAST(NULL AS STRING))")
    cap = capsys.readouterr().out
    assert "dbg> +I[1, a]" in cap
    assert "dbg> +I[2, null]" in cap


def test_blackhole_sink_accepts_inserts(spark):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    eng.sql(
        "CREATE TABLE out_b (k BIGINT) WITH ('connector'='blackhole')"
    )
    res = eng.sql("INSERT INTO out_b VALUES (1), (2), (3)").collect()
    assert res[0][1] == 3  # rows written


def test_datagen_unknown_kind_rejected(spark):
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    with pytest.raises(ValueError, match="random or sequence"):
        eng.sql(
            """CREATE TABLE gen_bad (x INT) WITH (
                'connector'='datagen', 'number-of-rows'='5',
                'fields.x.kind'='gaussian')"""
        )


def test_csv_format_options_and_sink_parallelism(spark, tmp_path):
    """Flink csv.* format options map onto the Spark reader/writer
    (field-delimiter → sep, null-literal → nullValue), and FLIP-95
    sink.parallelism drives the written partition count."""
    import os

    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    path = str(tmp_path / "csv_out")
    eng.sql(
        f"""CREATE TABLE csv_t (k BIGINT, v STRING) WITH (
            'connector'='filesystem', 'path'='{path}', 'format'='csv',
            'csv.field-delimiter'='|', 'csv.null-literal'='NULLISH',
            'sink.parallelism'='2')"""
    )
    eng.sql(
        "INSERT INTO csv_t VALUES (1, 'a'), (2, CAST(NULL AS STRING)), "
        "(3, 'c'), (4, 'd')"
    )
    files = [
        f for f in os.listdir(path)
        if f.startswith("part-") and f.endswith(".csv")
    ]
    assert len(files) == 2  # sink.parallelism honored
    body = "".join(open(os.path.join(path, f)).read() for f in files)
    assert "|" in body and "NULLISH" in body  # delimiter + null literal
    got = {r["k"]: r["v"] for r in spark.table("csv_t").collect()}
    assert got == {1: "a", 2: None, 3: "c", 4: "d"}


def test_json_ignore_parse_errors(spark, tmp_path):
    """json.ignore-parse-errors=true drops malformed records like
    Flink's JsonOptions; default fails fast."""
    import pytest

    from flink_1_12_2_spark.session import EngineSession

    d = tmp_path / "j"
    d.mkdir()
    (d / "a.json").write_text('{"k": 1, "v": "ok"}\nTHIS IS NOT JSON\n')
    eng = EngineSession(spark)
    eng.sql(
        f"""CREATE TABLE j_ok (k BIGINT, v STRING) WITH (
            'connector'='filesystem', 'path'='{d}', 'format'='json',
            'json.ignore-parse-errors'='true')"""
    )
    assert [(r["k"], r["v"]) for r in spark.table("j_ok").collect()] == [
        (1, "ok")
    ]
    eng.sql(
        f"""CREATE TABLE j_strict (k BIGINT, v STRING) WITH (
            'connector'='filesystem', 'path'='{d}', 'format'='json')"""
    )
    with pytest.raises(Exception):
        spark.table("j_strict").collect()


def test_insert_static_partition_and_success_file(spark, tmp_path):
    """INSERT INTO t PARTITION (dt='...') static spec writes hive-style
    partition dirs; the success-file commit policy drops the marker into
    each written partition."""
    import os

    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    path = str(tmp_path / "pt")
    eng.sql(
        f"""CREATE TABLE pt (k BIGINT, v STRING, dt STRING)
        PARTITIONED BY (dt) WITH (
            'connector'='filesystem', 'path'='{path}', 'format'='parquet',
            'sink.partition-commit.policy.kind'='success-file')"""
    )
    eng.sql(
        "INSERT INTO pt PARTITION (dt='2020-01-01') "
        "VALUES (1, 'a'), (2, 'b')"
    )
    eng.sql("INSERT INTO pt PARTITION (dt='2020-01-02') VALUES (3, 'c')")
    assert os.path.isfile(os.path.join(path, "dt=2020-01-01", "_SUCCESS"))
    assert os.path.isfile(os.path.join(path, "dt=2020-01-02", "_SUCCESS"))
    got = {
        r["k"]: (r["v"], r["dt"]) for r in spark.table("pt").collect()
    }
    assert got == {
        1: ("a", "2020-01-01"), 2: ("b", "2020-01-01"),
        3: ("c", "2020-01-02"),
    }
    # partition pruning reaches the scan
    plan = (
        spark.table("pt").filter("dt = '2020-01-01'")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan


def test_insert_dynamic_partition_write(spark, tmp_path):
    """Without a static spec, PARTITIONED BY columns write dynamic
    hive-style directories from the data."""
    import os

    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    path = str(tmp_path / "dynp")
    eng.sql(
        f"""CREATE TABLE dynp (k BIGINT, region STRING)
        PARTITIONED BY (region) WITH (
            'connector'='filesystem', 'path'='{path}',
            'format'='parquet')"""
    )
    eng.sql(
        "INSERT INTO dynp VALUES (1, 'eu'), (2, 'us'), (3, 'eu')"
    )
    assert os.path.isdir(os.path.join(path, "region=eu"))
    assert os.path.isdir(os.path.join(path, "region=us"))
    assert spark.table("dynp").count() == 3


def test_insert_static_partition_wrong_key_rejected(spark, tmp_path):
    import pytest

    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    path = str(tmp_path / "ptbad")
    eng.sql(
        f"""CREATE TABLE ptbad (k BIGINT, dt STRING)
        PARTITIONED BY (dt) WITH (
            'connector'='filesystem', 'path'='{path}',
            'format'='parquet')"""
    )
    with pytest.raises(ValueError, match="not a partition column"):
        eng.sql("INSERT INTO ptbad PARTITION (k='1') VALUES ('x')")


def test_create_table_like_carries_and_excludes_partitions(spark, tmp_path):
    """LIKE clones PARTITIONED BY keys (dataclasses.replace carries the
    r12 field); EXCLUDING PARTITIONS drops them (SqlTableLike
    FeatureOption.PARTITIONS)."""
    import os

    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    base = str(tmp_path / "likebase")
    eng.sql(
        f"""CREATE TABLE plike (k BIGINT, region STRING)
        PARTITIONED BY (region) WITH (
            'connector'='filesystem', 'path'='{base}',
            'format'='parquet')"""
    )
    p2, p3 = str(tmp_path / "clone1"), str(tmp_path / "clone2")
    eng.sql(
        f"CREATE TABLE plike2 WITH ('path'='{p2}') LIKE plike"
    )
    eng.sql(
        f"CREATE TABLE plike3 WITH ('path'='{p3}') LIKE plike "
        f"(EXCLUDING PARTITIONS)"
    )
    eng.sql("INSERT INTO plike2 VALUES (1, 'eu')")
    eng.sql("INSERT INTO plike3 VALUES (1, 'eu')")
    assert os.path.isdir(os.path.join(p2, "region=eu"))   # partitioned
    assert not os.path.isdir(os.path.join(p3, "region=eu"))  # flat
    assert spark.table("plike3").count() == 1


def test_insert_overwrite_partition_replaces_only_that_partition(
    spark, tmp_path
):
    """INSERT OVERWRITE with a static PARTITION spec replaces ONLY the
    written partition (FileSystemTableSink overwrite semantics) — other
    partitions survive."""
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    path = str(tmp_path / "ow")
    eng.sql(
        f"""CREATE TABLE owp (k BIGINT, dt STRING)
        PARTITIONED BY (dt) WITH (
            'connector'='filesystem', 'path'='{path}',
            'format'='parquet')"""
    )
    eng.sql("INSERT INTO owp PARTITION (dt='a') VALUES (1), (2)")
    eng.sql("INSERT INTO owp PARTITION (dt='b') VALUES (3)")
    eng.sql("INSERT OVERWRITE owp PARTITION (dt='a') VALUES (9)")
    got = sorted(
        (r["k"], r["dt"]) for r in spark.table("owp").collect()
    )
    assert got == [(3, "b"), (9, "a")]


def test_auto_compaction_bounds_file_count(spark, tmp_path):
    """'auto-compaction'='true' (FileSystemOptions.java:223): a batch
    written at high sink parallelism commits as ceil(bytes/target)
    compacted files, not one file per writer task."""
    import os

    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    plain, compact = str(tmp_path / "plain"), str(tmp_path / "compact")
    for path, extra in (
        (plain, ""),
        (compact, ", 'auto-compaction'='true', "
                  "'compaction.file-size'='64MB'"),
    ):
        eng.sql(
            f"""CREATE TABLE t_{os.path.basename(path)} (k BIGINT)
            WITH ('connector'='filesystem', 'path'='{path}',
                  'format'='parquet', 'sink.parallelism'='8'{extra})"""
        )
    spark.range(1000).createOrReplaceTempView("src1k")
    eng.sql("INSERT INTO t_plain SELECT id FROM src1k")
    eng.sql("INSERT INTO t_compact SELECT id FROM src1k")

    def nfiles(p):
        return len(
            [f for f in os.listdir(p)
             if f.startswith("part-") and not f.endswith(".crc")]
        )

    assert nfiles(plain) == 8          # one file per writer task
    assert nfiles(compact) == 1        # tiny batch ≪ 64MB → one file
    # no staging leftovers, rows intact
    assert not [d for d in os.listdir(compact) if d.startswith(".compact_")]
    assert spark.table("t_compact").count() == 1000
    # append again: compaction is per-INSERT (checkpoint grain)
    eng.sql("INSERT INTO t_compact SELECT id FROM src1k")
    assert nfiles(compact) == 2 and spark.table("t_compact").count() == 2000


def test_auto_compaction_streaming_sink(spark, tmp_path, sf_dir):
    """The streaming twin: each micro-batch compacts before commit, so a
    4-batch run of a small stream lands 4 files (one per checkpoint),
    not 4 × input-partitions."""
    import os

    from flink_1_12_2_spark.sources.filesystem import compacted_stream_sink
    from flink_1_12_2_spark.streaming.core import stream_events_multibatch

    ev = stream_events_multibatch(spark, sf_dir, n_files=4).select(
        "event_id", "user_id", "value"
    )
    out = str(tmp_path / "cs_out")
    ckpt = str(tmp_path / "cs_ckpt")
    q = compacted_stream_sink(ev, out, ckpt, target_file_size="64MB")
    q.awaitTermination(300)
    files = [
        f for f in os.listdir(out)
        if f.startswith("part-") and not f.endswith(".crc")
    ]
    assert len(files) == 4  # one compacted file per micro-batch
    from flink_1_12_2_spark.registry import load

    assert (
        spark.read.parquet(out).count()
        == load(spark, sf_dir, "events").count()
    )


def test_partition_time_commit_trigger(spark, tmp_path, sf_dir):
    """PartitionTimeCommitTrigger parity: a day-partition commits (gets
    its success file) once watermark > partition-time + delay; the final
    day stays pending — visible but uncommitted."""
    import os

    import pyspark.sql.functions as F

    from flink_1_12_2_spark.sources.filesystem import partitioned_stream_sink
    from flink_1_12_2_spark.streaming.core import stream_events_multibatch

    ev = stream_events_multibatch(spark, sf_dir, n_files=4).select(
        "event_id", "ts", F.date_format("ts", "yyyy-MM-dd").alias("dt")
    )
    out = str(tmp_path / "pt_out")
    q = partitioned_stream_sink(
        ev, out, ["dt"], str(tmp_path / "pt_ckpt"),
        watermark_col="ts", watermark_delay="10 minutes",
        commit_delay="1 day",
    )
    q.awaitTermination(300)
    days = sorted(d for d in os.listdir(out) if d.startswith("dt="))
    assert len(days) >= 25  # january's days all wrote
    committed = [
        d for d in days if os.path.isfile(os.path.join(out, d, "_SUCCESS"))
    ]
    uncommitted = [d for d in days if d not in committed]
    # events end Jan 30 23:26 → wm ≈ 23:16; with a 1-day delay the last
    # day cannot have committed, every earlier day has
    assert uncommitted == ["dt=2024-01-30"]
    assert committed == days[:-1]


def test_process_time_commit_trigger(spark, tmp_path, sf_dir):
    """ProcTimeCommitTrigger: every partition a checkpoint wrote commits
    at that checkpoint's end — including the newest (the mode Flink
    documents as possibly committing 'early' relative to event time)."""
    import os

    import pyspark.sql.functions as F

    from flink_1_12_2_spark.sources.filesystem import partitioned_stream_sink
    from flink_1_12_2_spark.streaming.core import stream_events_multibatch

    ev = stream_events_multibatch(spark, sf_dir, n_files=2).select(
        "event_id", "ts", F.date_format("ts", "yyyy-MM-dd").alias("dt")
    )
    out = str(tmp_path / "proc_out")
    q = partitioned_stream_sink(
        ev, out, ["dt"], str(tmp_path / "proc_ckpt"),
        watermark_col="ts", trigger="process-time",
    )
    q.awaitTermination(300)
    days = [d for d in os.listdir(out) if d.startswith("dt=")]
    assert days and all(
        os.path.isfile(os.path.join(out, d, "_SUCCESS")) for d in days
    )


def test_auto_compaction_csv_keeps_options_and_schema(spark, tmp_path):
    """The compaction read-back must honor the writer's format options
    and the declared schema — a ';' csv previously re-read with the
    default comma delimiter and committed garbage."""
    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    path = str(tmp_path / "csvc")
    eng.sql(
        f"""CREATE TABLE csvc (k BIGINT, v STRING) WITH (
            'connector'='filesystem', 'path'='{path}', 'format'='csv',
            'csv.field-delimiter'=';', 'sink.parallelism'='4',
            'auto-compaction'='true', 'compaction.file-size'='64MB')"""
    )
    eng.sql("INSERT INTO csvc VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    got = {r["k"]: r["v"] for r in spark.table("csvc").collect()}
    assert got == {1: "a", 2: "b", 3: "c"}


def test_partition_commit_with_escaped_partition_values(spark, tmp_path):
    """Partition values Spark percent-escapes in directory names (':' in
    timestamps) must still receive their success-file markers."""
    import os

    from flink_1_12_2_spark.session import EngineSession

    eng = EngineSession(spark)
    path = str(tmp_path / "esc")
    eng.sql(
        f"""CREATE TABLE escp (k BIGINT, ht STRING)
        PARTITIONED BY (ht) WITH (
            'connector'='filesystem', 'path'='{path}', 'format'='parquet',
            'sink.partition-commit.policy.kind'='success-file')"""
    )
    eng.sql(
        "INSERT INTO escp PARTITION (ht='2024-01-01 00:00:00') VALUES (1)"
    )
    dirs = [d for d in os.listdir(path) if d.startswith("ht=")]
    assert len(dirs) == 1 and "%3A" in dirs[0]  # Spark escaped the ':'
    assert os.path.isfile(os.path.join(path, dirs[0], "_SUCCESS"))


def test_partition_commit_date_typed_partition_column(spark, tmp_path, sf_dir):
    """A DATE-typed partition column must survive the trigger's JSON
    state save (advisor r12: datetime.date crashed json.dump on the
    first micro-batch) and still resolve directories / partition-times
    after a restart reload."""
    import os

    import pyspark.sql.functions as F

    from flink_1_12_2_spark.sources.filesystem import partitioned_stream_sink
    from flink_1_12_2_spark.streaming.core import stream_events_multibatch

    ev = stream_events_multibatch(spark, sf_dir, n_files=2).select(
        "event_id", "ts", F.to_date("ts").alias("dt")  # DATE, not string
    )
    out = str(tmp_path / "dt_out")
    ckpt = str(tmp_path / "dt_ckpt")
    q = partitioned_stream_sink(
        ev, out, ["dt"], ckpt,
        watermark_col="ts", watermark_delay="10 minutes",
        commit_delay="1 day",
    )
    q.awaitTermination(300)
    days = sorted(d for d in os.listdir(out) if d.startswith("dt="))
    assert days, "date-partitioned write produced no partitions"
    committed = [
        d for d in days if os.path.isfile(os.path.join(out, d, "_SUCCESS"))
    ]
    assert committed == days[:-1]
    # the persisted state is plain-JSON (str forms) and reloads cleanly
    import json

    with open(os.path.join(ckpt, "partition_commit_state.json")) as f:
        saved = json.load(f)
    assert all(
        isinstance(v, str) for t in saved["pending"] for v in t
    )


def test_print_sink_never_collects_whole_frame(spark, capsys, monkeypatch):
    """The print sink streams partitions to the driver (toLocalIterator)
    instead of collect() — a huge frame must not be materialized whole.
    Pinned by poisoning DataFrame.collect for the duration."""
    from pyspark.sql import DataFrame

    from flink_1_12_2_spark.sources.devgen import print_sink

    def _no_collect(self):
        raise AssertionError("print_sink must not collect() the frame")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    df = spark.range(0, 100, 1, 8).selectExpr("id AS k")
    n = print_sink(df, {"print-identifier": "big"})
    assert n == 100
    cap = capsys.readouterr().out
    assert "big> +I[0]" in cap and "big> +I[99]" in cap
