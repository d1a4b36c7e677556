"""Streaming sessionization — windowed state over an event stream.

Two implementations, deliberately layered the Spark-first way:

- ``stream_sessionize``: the built-in path. ``session_window(ts, gap)``
  + watermark; everything JVM-side, closed sessions emitted in append
  mode once the watermark passes their end. This is what you use when
  the session rule is "gap of inactivity" — never hand-roll state for
  something the engine expresses natively.
- ``stream_sessionize_custom``: ``applyInPandasWithState`` for a rule
  session_window CANNOT express — here, sessions also close when they
  reach ``max_events`` (think: bounding a training-example context, or
  a fraud rule). State per user is a few scalars; batches arrive as
  Arrow-backed pandas frames (no per-row Python).

Both shapes scale the same way: state is partitioned by the group key
across executors, and the state store checkpoints with the stream —
resume-on-restart comes for free, matching the engine's exactly-once
posture (the reference has no streaming-session analogue; this belongs
to the training-data toolkit around the lake).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), True),
        T.StructField("last_us", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 minute",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Built-in session windows over a STREAMING DataFrame: one line of
    plan, closed sessions appear when the watermark passes them."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_sessionize_custom(
    events: DataFrame,
    gap_s: int = 1800,
    max_events: int | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    idle_timeout_s: int | None = None,
) -> DataFrame:
    """Custom stateful sessionizer: like the gap rule, but a session
    ALSO closes after ``max_events`` rows — inexpressible with
    session_window. applyInPandasWithState keeps (start, last, n) per
    user; closed sessions are emitted as they close, the open tail
    stays in state until more data or the idle timeout fires.

    ``idle_timeout_s``: PROCESSING-TIME idle timeout. A user whose
    open session sees no new data for this long gets the session
    flushed and the state entry REMOVED — without it, every abandoned
    key holds state forever on an unbounded stream (the built-in
    session_window path ages state out via watermark; this is the
    equivalent for the custom rule). SET THIS on any long-running
    (processing-time-trigger) deployment, typically to ~gap_s. Default
    None = no timeout, which is what an ``availableNow`` backlog drain
    wants: with timeouts armed, the drain would idle-wait for every
    open session's timer before terminating. Flushing on a
    processing-time clock means an extremely late event (arriving
    after the idle flush, stamped within gap of the flushed tail)
    starts a NEW session instead of extending the flushed one — the
    same tradeoff the watermark path makes.

    Determinism contract: within each micro-batch the group's rows are
    sorted by ``ts`` before folding, so results depend on the batch
    boundaries only through which sessions have CLOSED yet — the
    closed-session set for fully-delivered data is independent of the
    batch split (same rule as the batch oracle).

    applyInPandasWithState delivers a large group as MULTIPLE Arrow
    chunks (default ~10k rows) in arbitrary post-shuffle order, so the
    sort must happen over the whole group's batch data, not per chunk —
    the chunks are concatenated first (one timestamp int64 array per
    chunk, so memory is 8 bytes/event, not the full rows). A group too
    big for that would already be too big for its own state fold."""
    import numpy as np
    import pandas as pd  # noqa: F401 (documents the pandas dependency)

    cap = max_events if max_events is not None else 1 << 62
    idle_ms = (idle_timeout_s or 0) * 1000

    def fold(key, pdf_iter, state):
        (user,) = key
        import pandas as pd

        def _emit(rows):
            if not rows:
                return pd.DataFrame(
                    columns=["user_id", "session_start", "session_end", "n_events"]
                )
            df = pd.DataFrame(
                rows,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )
            df["session_start"] = pd.to_datetime(df["session_start"], unit="us")
            df["session_end"] = pd.to_datetime(df["session_end"], unit="us")
            return df

        if idle_ms and state.hasTimedOut:
            # no data for this user since the timeout was armed: flush
            # the open session and DROP the state entry — state size is
            # now bounded by the active-key set, not every key ever seen
            start_us, last_us, n = state.get
            state.remove()
            yield _emit([(user, start_us, last_us, n)])
            return

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0
        # accumulate every chunk's timestamps, sort ONCE globally: events
        # out of order ACROSS chunk boundaries must not close sessions
        # against a non-monotone stream
        chunks = [
            pdf[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
            for pdf in pdf_iter
        ]
        ts_us = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, "int64")
        out = []
        for t in ts_us:
            t = int(t)
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_s * 1_000_000:
                out.append((user, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
            # every accepted event passes the cap test — including the
            # first event of a fresh session, so max_events=1 closes
            # each session immediately instead of leaking a 2-event one
            if n >= cap:
                out.append((user, start_us, last_us, n))
                start_us, last_us, n = None, None, 0
        if start_us is None:
            state.remove()
        else:
            state.update((start_us, last_us, n))
            if idle_ms:
                # re-armed on every batch that touches this user; fires
                # only after a full idle window with no new data
                state.setTimeoutDuration(idle_ms)
        yield _emit(out)

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy(user_col).applyInPandasWithState(
        fold,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_ms
            else GroupStateTimeout.NoTimeout
        ),
    )
