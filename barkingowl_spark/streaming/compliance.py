"""Streaming politeness-compliance monitor — the LIVE face of
operators/politeness.py::politeness_audit (which scores a finished
fetch log after the fact): a stateful per-host stream that emits a
violation row the moment two fetches land closer than the host's
crawl-delay, so an operator can throttle a misbehaving fetcher while
the wave is still running.

Custom stateful operator via ``applyInPandasWithState`` (the same
machinery as streaming/sessions.py): state per host is ONE long — the
last fetch timestamp — so state size is bounded by active hosts
regardless of stream length; crawl-delays ride the closure as a plain
dict (the robots Crawl-delay dim is host-keyed and small — the
broadcast-dim assumption politeness.py already makes).

Ordering contract: events are event-time-sorted within each
micro-batch and checked against the carried last-fetch state, which is
exact when the per-host log arrives in order (a fetcher's own log
does). A cross-batch straggler that lands BEHIND the carried state is
reported as a violation with its (negative) gap rather than silently
re-ordering history — a finalized timeline is never retro-edited, the
same stance streaming/telemetry.py takes on late windows.

Batch equivalence (tested): on an in-order finite input the emitted
violation count per host equals politeness_audit's n_gap_violations on
the same log.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

VIOLATION_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("prev_ts", LongType()),     # epoch seconds
    StructField("ts", LongType()),
    StructField("gap_s", LongType()),
    StructField("delay_s", LongType()),
])

_STATE_SCHEMA = StructType([StructField("last", LongType())])


def _monitor(delays: dict[str, int], default_delay_s: int):
    def fn(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        delay = int(delays.get(host, default_delay_s))
        last = state.get[0] if state.exists else None
        rows: list[tuple[Any, ...]] = []
        ts = sorted(
            int(t.timestamp())
            for pdf in pdfs
            for t in pdf["ts"].dropna()
        )
        for t in ts:
            if last is not None and t - last < delay:
                rows.append((host, last, t, t - last, delay))
            last = t if last is None else max(last, t)
        if last is not None:
            state.update((last,))
        yield pd.DataFrame(
            rows, columns=["host", "prev_ts", "ts", "gap_s", "delay_s"]
        )

    return fn


def monitor_compliance(
    fetch_events: DataFrame,
    delays: dict[str, int] | None = None,
    default_delay_s: int = 1,
    watermark: str = "10 seconds",
) -> DataFrame:
    """(host, ts, ...) stream -> live crawl-delay violation stream
    (VIOLATION_SCHEMA, append mode — each violation exactly once).

    ``fetch_events`` must be a streaming DataFrame with an event-time
    ``ts`` timestamp column; ``delays`` maps host -> crawl-delay
    seconds (absent hosts use default_delay_s)."""
    return (
        fetch_events.withWatermark("ts", watermark)
        .groupBy(F.col("host"))
        .applyInPandasWithState(
            _monitor(delays or {}, default_delay_s),
            outputStructType=VIOLATION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
