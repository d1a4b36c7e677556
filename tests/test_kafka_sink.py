"""Transactional topic sink — the Kafka exactly-once producer analogue
(ref pkg/cdc/kafka.go:94-118, 257-312): BeginTxn → send → CommitTxn,
abort on failure, epoch-keyed idempotence, read-committed consumers."""

import pytest
from pyspark.sql import functions as F

from nebula_spark.io.kafka_sink import TopicDir, produce_exactly_once


def _messages(spark, n, tag="v"):
    return spark.range(n).select(
        F.col("id").cast("string").alias("key"),
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("value"),
    )


def test_topic_txn_exactly_once_redelivery(spark, tmp_path):
    topic = TopicDir(str(tmp_path / "t"), n_partitions=4)
    df = _messages(spark, 100)
    assert produce_exactly_once(topic, df, epoch=0)
    # foreachBatch re-delivers the same batchId after a crash — skipped
    assert not produce_exactly_once(topic, df, epoch=0)
    assert topic.read(spark).count() == 100

    assert produce_exactly_once(topic, _messages(spark, 50, "w"), epoch=1)
    out = topic.read(spark)
    assert out.count() == 150
    # partitioned like Kafka: every message in hash(key) % n_partitions
    parts = out.select("topic_partition").distinct().collect()
    assert all(0 <= r[0] < 4 for r in parts) and len(parts) > 1
    assert topic.committed_epochs() == {"0", "1"}


def test_topic_txn_uncommitted_and_aborted_invisible(spark, tmp_path):
    topic = TopicDir(str(tmp_path / "t"), n_partitions=2)
    df = _messages(spark, 20)

    staged = topic.begin(epoch=7)
    staged.send(df)  # crash before commit → nothing visible
    assert topic.read(spark).count() == 0
    assert topic.committed_epochs() == set()

    aborted = topic.begin(epoch=8)
    aborted.send(df)
    aborted.abort()
    assert topic.read(spark).count() == 0
    with pytest.raises(RuntimeError):
        aborted.commit()
    with pytest.raises(RuntimeError):
        aborted.send(df)

    # the epoch was never committed, so a retry goes through
    assert produce_exactly_once(topic, df, epoch=8)
    assert topic.read(spark).count() == 20


def test_topic_txn_multi_send_atomic(spark, tmp_path):
    """All sends of one transaction become visible together."""
    topic = TopicDir(str(tmp_path / "t"), n_partitions=2)
    txn = topic.begin(epoch=0)
    txn.send(_messages(spark, 10))
    txn.send(_messages(spark, 15, "x"))
    assert topic.read(spark).count() == 0
    txn.commit()
    assert topic.read(spark).count() == 25
