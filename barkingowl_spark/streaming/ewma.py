"""Streaming EWMA rate baseline — the LIVE face of
operators/temporal.py::ewma_baseline (which scores a finished event
log): a stateful per-key stream that closes each time bucket the
moment a later bucket arrives and emits the bucket's count, its
truncated-horizon EWMA, and the deviation/spike read against the
PREVIOUS bucket's baseline — the adaptive-level monitor a crawl
operator watches next to the compliance and rate-alert streams.

Custom stateful operator via ``applyInPandasWithState`` (the
sessions/compliance machinery): state per key is (buckets seen, the
last <= lags closed-bucket counts, the open bucket id + its running
count) — bounded by ``lags`` longs per active key regardless of
stream length.

Bucket-closing contract: a bucket emits exactly once, when a later
bucket's first event closes it; gaps between activity emit as real
zero buckets (the densification ewma_baseline applies after the
fact). The stream's trailing OPEN bucket never emits — on a finite
input the output equals the batch operator's rows minus each key's
final bucket (tested). Stragglers older than the open bucket are
counted INTO the open bucket rather than retro-editing emitted
history — the same never-rewrite stance as streaming/compliance.py.

Weights are the batch spec verbatim: alpha = 1/2 truncated at
``lags``, integer power-of-two weights, ONE floor division
(unigram-style length(bin) tricks not needed — the window is bounded).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EWMA_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("t", LongType()),            # bucket index
    StructField("x", LongType()),
    StructField("ewma_milli", LongType()),
    StructField("dev_milli", LongType()),
    StructField("spike", BooleanType()),
])

_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("counts", ArrayType(LongType())),
    StructField("open_b", LongType()),
    StructField("open_c", LongType()),
])


def _weighted_milli(win: list[int]) -> int:
    num = sum(x << i for i, x in enumerate(win))
    return 1000 * num // ((1 << len(win)) - 1)


def _monitor(bucket_s: int, lags: int, max_span: int):
    def fn(
        key: tuple[str], pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        k = key[0]
        if state.exists:
            n, counts, open_b, open_c = state.get
            counts = list(counts)
        else:
            n, counts, open_b, open_c = 0, [], None, 0
        c: Counter = Counter()
        for pdf in pdfs:
            for t in pdf["ts"].dropna():
                b = int(t.timestamp()) // bucket_s
                if open_b is not None and b < open_b:
                    b = open_b  # straggler: never retro-edit
                c[b] += 1
        rows = []
        if c:
            mx = max(c)
            if open_b is None:
                open_b = min(c)
            # fold the open bucket's carried count in, then walk the
            # ACTIVE buckets pairwise: each active bucket closes when
            # the next one exists; the zeros between densify only when
            # the quiet stretch fits max_span. A longer gap would emit
            # one row per missing bucket (a day gap on 1-s buckets =
            # 86k rows; a year ~ 31M) — the batch twin's forbidden
            # unbounded-densification shape (_dense_series caps at
            # max_span for the same reason) — so instead the baseline
            # RESETS at the gap and restarts cold at the next
            # activity. Per-key per-batch output stays <=
            # max_span * len(active) rows, each a real bucket.
            c[open_b] = c.get(open_b, 0) + open_c
            marks = sorted(b for b in c if b >= open_b)
            for a0, a1 in zip(marks, marks[1:]):
                small_gap = a1 - a0 <= max_span
                stop = a1 if small_gap else a0 + 1
                for b in range(a0, stop):
                    x = c.get(b, 0)
                    prev = (_weighted_milli(counts[-lags:])
                            if n >= 1 else None)
                    win = (counts + [x])[-lags:]
                    ew = _weighted_milli(win)
                    dev = None if prev is None else x * 1000 - prev
                    spike = bool(prev is not None and dev > prev)
                    rows.append((k, b, x, ew, dev, spike))
                    counts = (counts + [x])[-lags:]
                    n += 1
                if not small_gap:
                    n, counts = 0, []
            open_b, open_c = mx, c[mx]
        state.update((n, counts, open_b, open_c))
        yield pd.DataFrame(
            rows,
            columns=["key", "t", "x", "ewma_milli", "dev_milli",
                     "spike"],
        ).astype({"dev_milli": "object"})

    return fn


def monitor_rate_baseline(
    events: DataFrame,
    key_col: str = "host",
    bucket_s: int = 3600,
    lags: int = 16,
    watermark: str = "10 seconds",
    max_span: int = 4096,
) -> DataFrame:
    """(key_col, ts) stream -> live EWMA baseline stream
    (EWMA_SCHEMA, append mode — each closed bucket exactly once).

    ``max_span`` caps the densified gap, mirroring the batch twin's
    span guard (temporal._dense_series): when a key goes quiet for
    more than max_span buckets, the baseline resets and re-seeds at
    the new activity instead of emitting one zero row per gap bucket.
    """
    if not 1 <= int(lags) <= 62:
        raise ValueError("lags must be in [1, 62]")
    if int(max_span) < 1:
        raise ValueError("max_span must be >= 1")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            _monitor(int(bucket_s), int(lags), int(max_span)),
            outputStructType=EWMA_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
