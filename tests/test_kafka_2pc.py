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
