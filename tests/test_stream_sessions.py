"""Streaming sessionization: built-in session_window + watermark, and
the applyInPandasWithState custom rule (max_events cap) — each drained
from a file stream and compared to a pure-Python fold of the same
events."""

import os

from pyspark.sql import functions as F, types as T

from nebula_spark.streaming.sessions import (
    stream_sessionize,
    stream_sessionize_custom,
)

GAP_S = 600
BASE_US = 1_700_000_000_000_000  # fixed epoch base, microseconds


def _events():
    """Deterministic (user_id, ts_us) rows: 6 users, per-user event
    trains with engineered gaps. Returns rows sorted by ts."""
    rows = []
    for u in range(6):
        t = BASE_US + u * 1_000_000
        for burst in range(3):  # 3 sessions per user
            for i in range(4 + (u % 3)):  # 4-6 events per session
                rows.append((u, t))
                t += (30 + u) * 1_000_000  # 30-35s within session
            t += (GAP_S + 60) * 1_000_000  # gap closes the session
    rows.sort(key=lambda r: r[1])
    return rows


def _python_sessions(rows, gap_s, cap=None):
    """The oracle fold: same rule as the stream."""
    by_user = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    out = []
    for u, ts in by_user.items():
        ts.sort()
        start = last = None
        n = 0
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_s * 1_000_000:
                out.append((u, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
            if cap is not None and n >= cap:
                out.append((u, start, last, n))
                start, last, n = None, None, 0
        if start is not None:
            out.append((u, start, last, n))
    return sorted(out)


def _write_chunks(spark, tmp_path, rows, n_chunks=4, sentinel=False, shuffle_within=None):
    """Ordered parquet chunk files (name order = ts order); optional
    far-future sentinel rows in a final extra chunk to flush
    watermarks/state. ``shuffle_within``: seed to shuffle rows INSIDE
    each chunk (delivery order within a micro-batch is arbitrary; order
    across chunks stays intact — the determinism contract only covers
    intra-batch order)."""
    d = str(tmp_path / "events")
    os.makedirs(d)
    per = (len(rows) + n_chunks - 1) // n_chunks
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    import datetime

    def _mk(rs):
        return [
            (u, datetime.datetime.utcfromtimestamp(t / 1e6)) for u, t in rs
        ]

    for i in range(n_chunks):
        chunk = rows[i * per : (i + 1) * per]
        if shuffle_within is not None:
            import random

            chunk = list(chunk)
            random.Random(shuffle_within + i).shuffle(chunk)
        if chunk:
            spark.createDataFrame(_mk(chunk), schema).coalesce(1).write.parquet(
                os.path.join(d, f"c{i:03d}")
            )
    if sentinel:
        far = BASE_US + 10**9 * 1_000_000
        sent = [(u, far + u) for u in range(6)]
        spark.createDataFrame(_mk(sent), schema).coalesce(1).write.parquet(
            os.path.join(d, "c999")
        )
    return d, schema


def _drain(stream_df, tmp_path, name):
    out_rows = []

    def collect(batch_df, _):
        out_rows.extend(batch_df.collect())

    q = (
        stream_df.writeStream.foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out_rows


def _as_tuples(rows):
    import calendar

    def us(dt):
        return calendar.timegm(dt.timetuple()) * 1_000_000 + dt.microsecond

    return sorted((r["user_id"], us(r["session_start"]), us(r["session_end"]), r["n_events"]) for r in rows)


def test_builtin_session_window_stream(spark, tmp_path):
    rows = _events()
    d, schema = _write_chunks(spark, tmp_path, rows, sentinel=True)
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    sess = stream_sessionize(ev, gap=f"{GAP_S} seconds", watermark="1 second")
    got = [r for r in _drain(sess, tmp_path, "builtin") if r["session_start"].year < 2100]
    want = _python_sessions(rows, GAP_S)
    # session_window's end = last event + gap; compare (user, start, n)
    got_t = sorted((r["user_id"], _as_tuples([r])[0][1], r["n_events"]) for r in got)
    want_t = sorted((u, s, n) for u, s, _e, n in want)
    assert got_t == want_t


def test_custom_stateful_sessionizer_with_cap(spark, tmp_path):
    rows = _events()
    d, schema = _write_chunks(spark, tmp_path, rows, sentinel=True)
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    CAP = 5
    sess = stream_sessionize_custom(ev, gap_s=GAP_S, max_events=CAP)
    got = [r for r in _drain(sess, tmp_path, "custom") if r["session_start"].year < 2100]
    want = _python_sessions(rows, GAP_S, cap=CAP)
    assert _as_tuples(got) == sorted(want)
    # the cap actually fired: some sessions have exactly CAP events and
    # the 6-event trains split
    assert any(n == CAP for _, _, _, n in want)


def test_custom_sessionizer_cross_chunk_ordering(spark, tmp_path):
    """Events shuffled WITHIN each micro-batch + Arrow chunk size forced
    to 2 rows: applyInPandasWithState splits every group's batch data
    into many tiny chunks in arbitrary order, so only a global per-group
    sort (not a per-chunk sort) reproduces the batch oracle."""
    rows = _events()
    d, schema = _write_chunks(
        spark, tmp_path, rows, sentinel=True, shuffle_within=97
    )
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", 2)
    try:
        ev = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(d)
        )
        CAP = 5
        sess = stream_sessionize_custom(ev, gap_s=GAP_S, max_events=CAP)
        got = [
            r
            for r in _drain(sess, tmp_path, "xchunk")
            if r["session_start"].year < 2100
        ]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    want = _python_sessions(rows, GAP_S, cap=CAP)
    assert _as_tuples(got) == sorted(want)


def test_custom_sessionizer_cap_one(spark, tmp_path):
    """max_events=1: EVERY event closes its own session immediately —
    the fresh-session branch must not skip the cap check."""
    rows = [(u, t) for u, t in _events() if u < 2]
    d, schema = _write_chunks(spark, tmp_path, rows, n_chunks=2, sentinel=True)
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    sess = stream_sessionize_custom(ev, gap_s=GAP_S, max_events=1)
    # cap=1 closes even the far-future sentinel rows — exclude them by
    # timestamp, not just year
    far = BASE_US + 10**9 * 1_000_000
    got = [
        r
        for r in _drain(sess, tmp_path, "capone")
        if _as_tuples([r])[0][1] < far
    ]
    want = _python_sessions(rows, GAP_S, cap=1)
    assert _as_tuples(got) == sorted(want)
    assert all(n == 1 for _, _, _, n in _as_tuples(got))
    assert len(got) == len(rows)


def test_custom_sessionizer_idle_timeout_flushes_state(spark, tmp_path):
    """ProcessingTimeTimeout: a user who stops sending events gets the
    open session FLUSHED after idle_timeout_s and the state entry
    removed — without this, abandoned keys held state forever on an
    unbounded stream. Drive a real processing-time-trigger query: feed
    one chunk, then wait with no new data until the timeout fires."""
    import time

    rows = [(u, BASE_US + u * 1_000_000 + i * 30_000_000) for u in range(2) for i in range(3)]
    d, schema = _write_chunks(spark, tmp_path, rows, n_chunks=1)
    ev = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    sess = stream_sessionize_custom(ev, gap_s=GAP_S, idle_timeout_s=2)
    out_rows = []

    def collect(batch_df, _):
        out_rows.extend(batch_df.collect())

    q = (
        sess.writeStream.foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "ck_idle"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline and len(out_rows) < 2:
            time.sleep(0.5)
        assert len(out_rows) == 2, f"expected 2 flushed sessions, got {out_rows}"
        # both users' open sessions flushed with all 3 events each
        got = _as_tuples(out_rows)
        want = _python_sessions(rows, GAP_S)
        assert got == sorted(want)
        # the state store drained to zero entries
        deadline = time.time() + 60
        n_state = None
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["stateOperators"]:
                n_state = p["stateOperators"][0]["numRowsTotal"]
                if n_state == 0:
                    break
            time.sleep(0.5)
        assert n_state == 0, f"state not drained: {n_state}"
    finally:
        q.stop()
