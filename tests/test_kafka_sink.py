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


def test_producer_race_on_same_epoch_is_benign(spark, tmp_path, monkeypatch):
    """Two producers race the same epoch: both pass begin(), one wins
    the marker; the loser must come back False (skip) — a benign
    duplicate delivery, not a crash — and its staged files must vanish."""
    import os

    from nebula_spark.io.kafka_sink import TopicTxn

    topic = TopicDir(str(tmp_path / "t"), n_partitions=2)
    orig_send = TopicTxn.send
    state = {"raced": False}

    def racing_send(self, df, **kw):
        orig_send(self, df, **kw)
        if not state["raced"]:
            state["raced"] = True
            # a second producer commits the SAME epoch while this txn
            # is still in flight
            assert produce_exactly_once(topic, _messages(spark, 5, "winner"), epoch=3)

    monkeypatch.setattr(TopicTxn, "send", racing_send)
    assert produce_exactly_once(topic, _messages(spark, 10, "loser"), epoch=3) is False
    out = topic.read(spark)
    assert out.count() == 5  # only the winner's messages are visible
    assert {r["value"][:6] for r in out.collect()} == {"winner"}
    assert topic.committed_epochs() == {"3"}
    # loser's staging dir was aborted; no half-written marker temp files
    leftovers = [
        f
        for f in os.listdir(os.path.join(topic.path, "_commits"))
        if not f.endswith(".json")
    ]
    assert leftovers == []


def test_begin_is_single_stat_not_directory_scan(tmp_path, monkeypatch):
    """begin(epoch) must not list/parse every commit marker — the check
    is one existence test on the epoch-named path (O(1) per batch)."""
    import os

    topic = TopicDir(str(tmp_path / "t"), n_partitions=2)
    monkeypatch.setattr(
        os,
        "listdir",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("begin() scanned a directory")),
    )
    assert topic.begin(epoch=42) is not None  # no marker yet -> txn handed out
