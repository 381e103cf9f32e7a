"""Exactly-once transactional producer on the kafka emulation —
FlinkKafkaProducer Semantic.EXACTLY_ONCE / TwoPhaseCommitSinkFunction
parity: staged records are invisible until the atomic commit; aborted
transactions vanish; committed ones appear whole."""

from __future__ import annotations


def _vals(spark, *texts):
    return spark.createDataFrame([(t,) for t in texts], "value string")


def test_uncommitted_transaction_invisible(spark, tmp_path):
    from flink_1_12_2_spark.sources.kafka_emu import (
        begin_transaction,
        publish,
        publish_transactional,
        read_topic_batch,
    )

    topic = (tmp_path / "t2pc").as_posix()
    publish(_vals(spark, '{"k": 1}'), topic)
    txn = begin_transaction(topic)
    publish_transactional(_vals(spark, '{"k": 2}', '{"k": 3}'), topic, txn)
    got = {r["k"] for r in
           read_topic_batch(spark, topic, "json", "k int").collect()}
    assert got == {1}  # in-flight transaction must not leak


def test_commit_is_atomic_and_complete(spark, tmp_path):
    from flink_1_12_2_spark.sources.kafka_emu import (
        begin_transaction,
        commit_transaction,
        publish_transactional,
        read_topic_batch,
    )

    topic = (tmp_path / "t2pc").as_posix()
    txn = begin_transaction(topic)
    publish_transactional(_vals(spark, '{"k": 2}'), topic, txn)
    publish_transactional(_vals(spark, '{"k": 3}'), topic, txn)
    commit_transaction(topic, txn)
    got = {r["k"] for r in
           read_topic_batch(spark, topic, "json", "k int").collect()}
    assert got == {2, 3}  # both pre-commit flushes appear together


def test_abort_discards_and_txn_cannot_reuse(spark, tmp_path):
    import pytest

    from flink_1_12_2_spark.sources.kafka_emu import (
        abort_transaction,
        begin_transaction,
        commit_transaction,
        publish_transactional,
        read_topic_batch,
    )

    topic = (tmp_path / "t2pc").as_posix()
    txn = begin_transaction(topic)
    publish_transactional(_vals(spark, '{"k": 9}'), topic, txn)
    abort_transaction(topic, txn)
    assert read_topic_batch(spark, topic, "json", "k int").count() == 0
    with pytest.raises(ValueError, match="not open"):
        commit_transaction(topic, txn)


def test_streaming_consumer_sees_only_committed(spark, tmp_path):
    from flink_1_12_2_spark.sources.kafka_emu import (
        begin_transaction,
        commit_transaction,
        publish_transactional,
        read_topic_stream,
    )

    topic = (tmp_path / "t2pc").as_posix()
    t1 = begin_transaction(topic)
    publish_transactional(_vals(spark, '{"k": 1}'), topic, t1)
    commit_transaction(topic, t1)
    t2 = begin_transaction(topic)
    publish_transactional(_vals(spark, '{"k": 2}'), topic, t2)  # in flight

    stream = read_topic_stream(spark, topic, "json", "k int")
    q = (
        stream.writeStream.format("memory")
        .queryName("t2pc_read_committed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["k"] for r in spark.sql(
        "SELECT * FROM t2pc_read_committed").collect()}
    assert got == {1}  # read-committed semantics


def test_sink_semantic_exactly_once_through_sql(spark, tmp_path):
    """'sink.semantic' = 'exactly-once' (FlinkKafkaProducer
    Semantic.EXACTLY_ONCE via the table factory's option): the SQL
    INSERT routes through the 2PC producer — the batch lands as one
    atomically-renamed txnbatch dir, a concurrently OPEN transaction
    stays invisible, and a bogus semantic fails descriptively."""
    import os

    import pytest as _pytest

    from flink_1_12_2_spark.session import EngineSession
    from flink_1_12_2_spark.sources.kafka_emu import begin_transaction

    eng = EngineSession(spark)
    topic = str(tmp_path / "eo_topic")
    eng.sql(
        f"""CREATE TABLE eo (k BIGINT, v STRING) WITH (
              'connector' = 'kafka', 'topic' = '{topic}',
              'format' = 'json', 'sink.semantic' = 'exactly-once')"""
    )
    eng.sql("INSERT INTO eo VALUES (1, 'a'), (2, 'b')")
    dirs = os.listdir(topic)
    assert any(d.startswith("txnbatch_") for d in dirs), dirs
    assert not any(d.startswith(".txn_") for d in dirs), dirs
    # an OPEN (uncommitted) transaction from another producer is
    # invisible to the table's scans
    begin_transaction(topic)
    got = {r["k"] for r in eng.sql("SELECT * FROM eo").collect()}
    assert got == {1, 2}

    with _pytest.raises(ValueError, match="sink.semantic"):
        eng2 = EngineSession(spark)
        eng2.sql(
            f"""CREATE TABLE eo_bad (k BIGINT) WITH (
                  'connector' = 'kafka', 'topic' = '{tmp_path}/t2',
                  'format' = 'json', 'sink.semantic' = 'maybe')"""
        )
        eng2.sql("INSERT INTO eo_bad VALUES (1)")
