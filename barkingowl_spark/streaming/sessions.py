"""Stateful streaming: per-host fetch-session tracking — SURVEY.md
section 2.8's "session windows = per-host fetch sessions", implemented
as a custom stateful operator with ``applyInPandasWithState``.

A fetch-event stream (host, ts, url) — e.g. the fetcher fleet's access
log — is grouped by host; a session is a run of fetches with no gap
larger than ``gap_s``. Sessions close two ways:

  * in-stream: an arriving event whose ts exceeds the open session's
    last ts by more than the gap closes it immediately (emitted in the
    same micro-batch, exactly like the batch sessionizer would);
  * by timeout: an idle host's open session closes when the event-time
    watermark passes last_ts + gap (GroupStateTimeout.EventTimeTimeout),
    so open state is bounded even for hosts that never fetch again.

State per host is one small tuple (start, last, n) — at 10^7 hosts that
is a few hundred MB across the cluster, partitioned by the group key;
the checkpoint makes it exactly-once across restarts (tested: state
survives a stop/restart between file drops).

Batch equivalence: on the same finite input, closed sessions equal the
gap-split sessions of the batch window expression
(__spark_entry__.q_events_sessionize's shape); the streaming value-add
is incremental emission + bounded state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("session_start", LongType()),   # epoch seconds
    StructField("session_end", LongType()),
    StructField("n_fetches", IntegerType()),
])

_STATE_SCHEMA = StructType([
    StructField("start", LongType()),
    StructField("last", LongType()),
    StructField("n", IntegerType()),
])


def _close_sessions(gap_s: int):
    def fn(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        closed: list[tuple[Any, ...]] = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((host, start, last, n))
            state.remove()
        else:
            cur = state.get if state.exists else None
            ts = sorted(
                int(t.timestamp())
                for pdf in pdfs
                for t in pdf["ts"].dropna()
            )
            for t in ts:
                if cur is None:
                    cur = (t, t, 1)
                elif t - cur[1] > gap_s:
                    closed.append((host, *cur))
                    cur = (t, t, 1)
                else:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1)
            if cur is not None:
                state.update(cur)
                # close via watermark once the host goes idle past the gap
                state.setTimeoutTimestamp((cur[1] + gap_s) * 1000)
        yield pd.DataFrame(
            closed, columns=["host", "session_start", "session_end",
                             "n_fetches"]
        )

    return fn


def track_sessions(
    fetch_events: DataFrame, gap_s: int = 1800, watermark: str = "10 seconds"
) -> DataFrame:
    """(host, ts, ...) stream -> closed-session stream (SESSION_SCHEMA).

    ``fetch_events`` must be a streaming DataFrame with an event-time
    ``ts`` timestamp column; output is append-mode (each closed session
    exactly once)."""
    return (
        fetch_events.withWatermark("ts", watermark)
        .groupBy(F.col("host"))
        .applyInPandasWithState(
            _close_sessions(gap_s),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
