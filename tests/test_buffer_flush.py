"""sink.buffer-flush: per-key reduce before produce.

Semantics under test are 1.12.2's jdbc/hbase sink buffer-reduce contract
(flink-connector-jdbc/.../internal/executor/
TableBufferReducedStatementExecutor.java:63-104): the buffer is a map
keyed by PK, the LAST change per key wins (tombstones included), and the
flush emits one operation per surviving key.
"""

from __future__ import annotations

import pytest

from flink_1_12_2_spark.operators.changelog import ROW_KIND


def _topic_lines(topic_dir) -> list[str]:
    """Every published envelope line across all batch dirs."""
    import os

    lines = []
    for root, _dirs, files in os.walk(str(topic_dir)):
        for f in files:
            if f.startswith(("part-", "part_")) and not f.endswith(".crc"):
                with open(os.path.join(root, f)) as fh:
                    lines.extend(ln for ln in fh.read().splitlines() if ln)
    return lines


def test_buffer_flush_reduces_to_last_change_per_key(spark, tmp_path):
    from flink_1_12_2_spark.sources.kafka_emu import (
        publish_upsert,
        read_upsert_topic_batch,
    )

    topic = str(tmp_path / "t")
    opts = {
        "sink.buffer-flush.max-rows": "100",
        "sink.buffer-flush.interval": "1s",
    }
    # one batch: k=1 updated twice, k=2 inserted then deleted, k=3 once
    df = spark.createDataFrame(
        [
            ("+I", 1, "a"),
            ("+U", 1, "b"),
            ("+I", 2, "x"),
            ("-D", 2, None),
            ("+I", 3, "c"),
        ],
        f"{ROW_KIND} string, k int, v string",
    ).coalesce(1)
    publish_upsert(df, topic, ["k"], row_kind_col=ROW_KIND, options=opts)

    # the wire carries ONE message per key (3 keys), not 5
    lines = _topic_lines(tmp_path / "t")
    assert len(lines) == 3
    # k=2's surviving message is its tombstone
    import json

    by_key = {json.loads(ln)["k"]["k"]: json.loads(ln)["v"] for ln in lines}
    assert by_key[2] is None
    assert by_key[1] == {"k": 1, "v": "b"}

    rows = {
        r["k"]: r["v"]
        for r in read_upsert_topic_batch(
            spark, topic, "k int, v string", ["k"], options=opts
        ).collect()
    }
    assert rows == {1: "b", 3: "c"}


def test_buffer_flush_matches_unreduced_state(spark, tmp_path):
    """Reduced and unreduced topics normalize to the SAME latest state."""
    from flink_1_12_2_spark.sources.kafka_emu import (
        publish_upsert,
        read_upsert_topic_batch,
    )

    plain, reduced = str(tmp_path / "plain"), str(tmp_path / "red")
    opts = {"sink.buffer-flush.max-rows": "50"}
    b1 = spark.createDataFrame(
        [("+I", i % 7, f"v{i}") for i in range(40)],
        f"{ROW_KIND} string, k int, v string",
    ).coalesce(1)
    b2 = spark.createDataFrame(
        [("+U", 3, "final3"), ("-D", 5, None)],
        f"{ROW_KIND} string, k int, v string",
    ).coalesce(1)
    for topic, o in ((plain, None), (reduced, dict(opts))):
        publish_upsert(b1, topic, ["k"], row_kind_col=ROW_KIND, options=o)
        publish_upsert(b2, topic, ["k"], row_kind_col=ROW_KIND, options=o)

    def state(topic):
        return {
            r["k"]: r["v"]
            for r in read_upsert_topic_batch(
                spark, topic, "k int, v string", ["k"]
            ).collect()
        }

    s_plain, s_red = state(plain), state(reduced)
    assert s_plain == s_red
    assert 5 not in s_red and s_red[3] == "final3"
    # but the reduced wire is smaller: 7 keys in b1, 2 in b2 vs 40 + 2
    assert len(_topic_lines(tmp_path / "red")) == 9
    assert len(_topic_lines(tmp_path / "plain")) == 42


def test_buffer_flush_bad_value_raises(spark, tmp_path):
    from flink_1_12_2_spark.sources.kafka_emu import publish_upsert

    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(ValueError, match="sink.buffer-flush.max-rows"):
        publish_upsert(
            df,
            str(tmp_path / "t"),
            ["k"],
            options={"sink.buffer-flush.max-rows": "many"},
        )
