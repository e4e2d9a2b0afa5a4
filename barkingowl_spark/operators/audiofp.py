"""Audio landmark fingerprinting and snippet matching (Wang, "An
Industrial-Strength Audio Search Algorithm", ISMIR 2003 — the Shazam
constellation scheme), as multimodal-column plumbing + relational
matching.

Pipeline (the real thing and this implementation, stage for stage):

  decode -> spectrogram peaks     (t, f) constellation per track
  peaks  -> landmark hashes       pair each peak with the next few
                                  peaks in a target zone; hash
                                  (f1, f2, dt) — translation-invariant
  hashes -> inverted index        (h -> track, t1)
  query  -> same hashes -> join   histogram of (track, t_track -
                                  t_query); a tall bin IS a match
                                  (time-coherent hash agreement)

The DECODE stage needs an audio codec, absent in this container by
design — _peaks_real raises NotImplementedError and _peaks_stub
derives a deterministic fake constellation from the payload bytes
(byte i is the 'spectral energy' of frame i; strict-left/gte-right
local maxima are 'peaks'), keeping the Spark-side plumbing real and
oracle-checkable: schema, Arrow batching, partitioning, and every
relational stage downstream are exactly what the codec-present
deployment runs (the operators/multimodal.py convention).

Scale shape: peaks are a mapInPandas over the audio table (payloads
read ONCE, never shuffled); landmarks are a per-track self-join bounded
by max_dt and a per-(track,t1) fan-out cap (WindowGroupLimit);
matching is ONE equi-join on the landmark hash + ONE map-side-combined
(query, track, offset) count — the vote histogram — and the per-query
winner is a query-partitioned top-1 window. The track index side is
built once and reused across query batches.

No reference counterpart (/root/reference is empty, SURVEY §0); pinned
by tests/test_audiofp.py's independent Python reimplementation and the
audio_landmarks / audio_match DuckDB oracles.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HAVE_CODEC = False  # no audio codec in this container (by design)


def _peaks_real(payload: bytes) -> list[tuple[int, int]]:
    """Real path: decode, STFT, local-max constellation. Needs an
    audio codec — absent here by design."""
    raise NotImplementedError(
        "audio codec not available in this environment; "
        "the deterministic stub below exercises the same plumbing"
    )


def _peaks_stub(payload: bytes) -> list[tuple[int, int]]:
    """Deterministic fake constellation: frame t's 'energy' is byte t;
    a peak is a strict rise then non-rise (b[t-1] < b[t] >= b[t+1]).
    Interior frames only — every rule is reproducible in plain SQL."""
    b = list(payload)
    return [
        (t, b[t])
        for t in range(1, len(b) - 1)
        if b[t - 1] < b[t] and b[t] >= b[t + 1]
    ]


def extract_peaks(audio: DataFrame, id_col: str = "track_id") -> DataFrame:
    """(id, t, f): the constellation map per payload — one Arrow-batch
    pass, payload bytes never leave the map task."""
    peaks_fn = _peaks_real if _HAVE_CODEC else _peaks_stub

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ts, fs = [], [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                for t, f in peaks_fn(bytes(payload)):
                    ids.append(i)
                    ts.append(t)
                    fs.append(f)
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "t": pd.Series(ts, dtype="int64"),
                                "f": pd.Series(fs, dtype="int64")})

    return audio.select(id_col, "payload").mapInPandas(
        batches, f"{id_col} long, t long, f long"
    )


def landmark_hashes(
    peaks: DataFrame,
    id_col: str = "track_id",
    fanout: int = 3,
    max_dt: int = 16,
) -> DataFrame:
    """(id, t1, h): each peak paired with its next `fanout` peaks
    within `max_dt` frames (the target zone), hashed
    h = (f1*256 + f2)*64 + dt — Wang §2.2's translation-invariant
    combinatorial hash in one int64. Equi-join on the id + a
    (id, t1)-partitioned rank<=fanout cut (WindowGroupLimit)."""
    if not 1 <= max_dt <= 63:
        raise ValueError("max_dt must be in [1, 63] (6 hash bits)")
    if fanout < 1:
        raise ValueError("fanout must be >= 1")
    a = peaks.select(F.col(id_col), F.col("t").alias("t1"),
                     F.col("f").alias("f1"))
    b = peaks.select(F.col(id_col), F.col("t").alias("t2"),
                     F.col("f").alias("f2"))
    w = Window.partitionBy(id_col, "t1").orderBy("t2")
    return (
        a.join(b, id_col)
        .filter((F.col("t2") > F.col("t1"))
                & (F.col("t2") - F.col("t1") <= max_dt))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= fanout)
        .select(
            id_col, "t1",
            ((F.col("f1") * 256 + F.col("f2")) * 64
             + (F.col("t2") - F.col("t1"))).cast("long").alias("h"),
        )
    )


def match_fingerprints(
    index_lm: DataFrame,
    query_lm: DataFrame,
    min_votes: int = 2,
) -> DataFrame:
    """(query_id, track_id, offset, votes): the Shazam vote histogram —
    hash-join index and query landmarks, bin by the time offset, count.
    Only bins with votes >= min_votes survive (isolated hash collisions
    are noise; time-coherent agreement is signal)."""
    i = index_lm.select(F.col("track_id"), F.col("t1").alias("ti"),
                        "h")
    q = query_lm.select(F.col("query_id"), F.col("t1").alias("tq"),
                        "h")
    return (
        q.join(i, "h")
        .groupBy("query_id", "track_id",
                 (F.col("ti") - F.col("tq")).alias("offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("votes"))
        .filter(F.col("votes") >= min_votes)
    )


def best_matches(histogram: DataFrame) -> DataFrame:
    """(query_id, track_id, offset, votes): each query's winning bin —
    most votes, ties to smallest track then smallest offset; a
    query-partitioned top-1 window (parallel across queries)."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc("track_id"), F.asc("offset"))
    return (
        histogram.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", "track_id", "offset", "votes")
    )
