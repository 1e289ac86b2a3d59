"""Custom stateful streaming operator: gap-based sessionization.

The reference has no stream processing; this is the engine-completeness
tier for event streams (the `events` table shape): group a stream by
user, maintain per-user session state across micro-batches with
``applyInPandasWithState``, and emit a session row once a gap larger than
``gap_seconds`` closes it. The pattern is the canonical
training-data-pipeline sessionizer (click/interaction logs → session
documents).

Semantics (deterministic given a deterministic batch sequence, e.g. the
file source with ``maxFilesPerTrigger=1``):
  * events within a batch are processed in ``ts`` order per user;
  * an event more than ``gap_seconds`` after the previous one closes the
    open session and starts a new one; closed sessions are emitted;
  * state (open session) carries across micro-batches via the checkpoint —
    kill and restart resumes exactly;
  * ``ProcessingTimeTimeout`` flushes idle users' open sessions after
    ``idle_flush_ms`` so state does not grow unboundedly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("session_start", T.TimestampType(), False),
    T.StructField("session_end", T.TimestampType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("closed_by", T.StringType(), False),  # 'gap' | 'timeout'
])

# state: (session_start_us, last_ts_us, n_events)
STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType(), False),
    T.StructField("last_us", T.LongType(), False),
    T.StructField("n", T.LongType(), False),
])


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _ts(us: int) -> pd.Timestamp:
    return pd.Timestamp(us * 1000)


def _session_fn(gap_seconds: float, idle_flush_ms: int | None):
    gap_us = int(gap_seconds * 1_000_000)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        out = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                out.append((user_id, _ts(start_us), _ts(last_us), n,
                            "timeout"))
                state.remove()
        else:
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = n = None
            # a group's batch data may arrive as several Arrow chunks —
            # sorting per chunk would process out of ts order across the
            # chunk boundary; collect all timestamps first, sort once
            all_ts: list = []
            for pdf in pdfs:
                all_ts.extend(pdf["ts"])
            for ts in sorted(all_ts):
                t = _us(ts)
                if start_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    out.append((user_id, _ts(start_us), _ts(last_us),
                                n, "gap"))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us, n = max(last_us, t), n + 1
            if start_us is not None:
                state.update((start_us, last_us, n))
                if idle_flush_ms is not None:
                    state.setTimeoutDuration(idle_flush_ms)
        yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA])

    return fn


def sessionize(events: DataFrame, gap_seconds: float = 1800,
               idle_flush_ms: int | None = None) -> DataFrame:
    """events stream (user_id, ts, …) → closed-session stream.

    ``idle_flush_ms=None`` (the default) disables the idle timeout
    (NoTimeout): open sessions close only when a later event exceeds the
    gap. This is the only configuration compatible with
    ``trigger(availableNow)`` drains — pending processing-time timers
    otherwise keep the one-shot trigger spinning empty micro-batches until
    every timer has fired — so the hanging variant is opt-in: pass an
    explicit ``idle_flush_ms`` only on continuously-triggered streams."""
    timeout = (GroupStateTimeout.NoTimeout if idle_flush_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return (events.groupBy("user_id")
            .applyInPandasWithState(
                _session_fn(gap_seconds, idle_flush_ms),
                outputStructType=SESSION_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=timeout))
