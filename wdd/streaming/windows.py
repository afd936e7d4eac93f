"""Event-time streaming operators: watermarked windowed aggregation and a
custom stateful sessionization operator (SURVEY.md §2.8 breadth beyond the
availableNow ingest stage).

The reference itself has no late-data semantics (its Redis TTL is
operational, not event-time), so these are the training-data-pipeline
extensions a streaming capture feed needs:

  * `windowed_event_counts` — per-key tumbling-window counts with a
    watermark: late rows beyond the watermark are DROPPED by the engine
    (state for closed windows is evictable — the property that makes the
    aggregation runnable forever at cluster scale).
  * `sessionize` — gap-based sessions per user via applyInPandasWithState:
    the canonical custom stateful operator (state = open session summary
    per key; a row later than `gap` after the previous one closes the
    session and emits it; timed-out state is flushed via the event-time
    timeout). State is O(open sessions), not O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events int")
_SESSION_STATE_SCHEMA = "start double, end double, n int"


def windowed_event_counts(events: DataFrame,
                          window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time window counts per user. Works identically on a
    batch frame (window() is an ordinary expression) and a stream (where
    the watermark bounds state and drops late rows)."""
    out = events
    if out.isStreaming:
        out = out.withWatermark("ts", watermark)
    return (out
            .groupBy(F.window("ts", window).alias("w"), F.col("user_id"))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("w.start").alias("win_start"),
                    F.col("w.end").alias("win_end"),
                    "user_id", "n_events", "sum_value"))


def sessionize(events: DataFrame, gap_seconds: int = 600,
               watermark: str = "30 minutes") -> DataFrame:
    """Gap-based sessionization per user over an event-time stream.

    applyInPandasWithState contract: one call per (key, batch); state holds
    the open session (start, end, count) as plain floats (epoch seconds).
    A batch's rows are processed in timestamp order; a row more than
    `gap_seconds` after the open session's end closes it (emitted) and
    opens a new one. When the watermark passes an open session's end + gap
    with no new rows, the event-time timeout fires and flushes it — so
    sessions are emitted exactly once, whether closed by data or by time.
    """
    import pandas as pd

    def _update(key, pdfs, state: GroupState):
        (user_id,) = key
        out = []
        if state.hasTimedOut:
            start, end, n = state.get
            out.append((user_id, start, end, int(n)))
            state.remove()
        else:
            cur = state.get if state.exists else None
            ts_all = []
            for pdf in pdfs:
                ts_all.append(pdf["ts"])
            ts = pd.concat(ts_all).sort_values() if ts_all else pd.Series([], dtype="datetime64[ns]")
            for t in ts:
                sec = t.timestamp()
                if cur is None:
                    cur = (sec, sec, 1)
                elif sec - cur[1] > gap_seconds:
                    out.append((user_id, cur[0], cur[1], int(cur[2])))
                    cur = (sec, sec, 1)
                else:
                    cur = (cur[0], sec, cur[2] + 1)
            if cur is not None:
                state.update(cur)
                # flush when the watermark passes the session's close window
                state.setTimeoutTimestamp(int((cur[1] + gap_seconds) * 1000))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "session_start",
                                             "session_end", "n_events"]) \
                .assign(session_start=lambda d: pd.to_datetime(
                            d["session_start"], unit="s"),
                        session_end=lambda d: pd.to_datetime(
                            d["session_end"], unit="s"))

    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _update, SESSION_SCHEMA, _SESSION_STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
