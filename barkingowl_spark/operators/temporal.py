"""Temporal joins: as-of and bucketed range/interval joins — the two
join shapes feature pipelines need that plain equi-joins can't express
(the kdb+ `aj` / pandas merge_asof semantics, relationally).

A crawl/corpus engine meets them constantly: "the robots.txt that was
in force when this page was fetched", "the frontier config active at
this wave", "the latest quality score at or before this snapshot",
"events inside a maintenance window".

as-of join — ONE key shuffle, never a range-condition join:
  A naive `l JOIN r ON l.key = r.key AND r.ts <= l.ts` + argmax
  explodes to |matches-per-key|^2 rows before pruning, and Spark plans
  non-equi conditions as a broadcast-nested-loop when the equi-key is
  absent. The union-tag trick instead: stack left and right rows in
  one stream keyed by (key), sort each key group by
  (ts, side, tiebreak) with right rows BEFORE left rows at equal ts
  (inclusive semantics), and carry the right payload forward with
  last(col, ignorenulls) over the running frame. Each left row reads
  the most recent right row at-or-before it — one partitioned window,
  O(n log n) per key group, no quadratic intermediate. Forward mode
  flips the sort. (Same plan shape Flink's temporal join and kdb's aj
  compile to.)

range/interval join — bucketed equi-join:
  point t in [lo, hi) is not an equi-condition; Spark's fallback is a
  cartesian per key. Bucketing restores the equi-join: an interval
  emits one row per covering bucket of width W, a point maps to its
  single bucket, the join runs on (key, bucket) and the exact
  containment filter touches candidates only. Each point meets an
  interval in exactly one bucket (the point's own), so no dedup pass
  is needed. W trades replication (intervals emit span/W rows)
  against candidate precision — set it near the median interval
  length (Chaudhuri et al.'s band-join bucketing; the same pigeonhole
  shape as corpus_dedup.hamming_band_pairs).

No reference counterpart (/root/reference is empty, SURVEY §0);
pinned by tests/test_temporal.py (independent Python reimpls) and the
events_asof / events_interval DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    tie: str | None = None,
    direction: str = "backward",
    prefix: str = "r_",
) -> DataFrame:
    """left.* + prefixed right columns (+ f'{prefix}{ts}'): each left
    row matched to the right row with the greatest right ts <= left ts
    (backward, inclusive) or smallest right ts >= left ts (forward),
    per key; NULL prefixed columns when no right row qualifies.

    `tie` (a right column, e.g. a unique id) makes the winner among
    equal right timestamps deterministic: the LARGEST tie wins in
    backward mode (latest-writer), the SMALLEST in forward mode."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = [c for c in left.columns]
    out_right = [f"{prefix}{c}" for c in right_cols] + [f"{prefix}{ts}"]
    l_tag = left.select(
        F.col(key).alias("_k"), F.col(ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.schema[tie].dataType if tie else "long"
        ).alias("_tie"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(p)
          for c, p in zip(right_cols, out_right[:-1])],
        F.lit(None).cast(right.schema[ts].dataType)
        .alias(out_right[-1]),
    )
    r_tag = right.select(
        F.col(key).alias("_k"), F.col(ts).alias("_t"),
        F.lit(0).alias("_side"),
        (F.col(tie) if tie else F.lit(None).cast("long")).alias("_tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lcols],
        *[F.col(c).alias(p)
          for c, p in zip(right_cols, out_right[:-1])],
        F.col(ts).alias(out_right[-1]),
    )
    if direction == "backward":
        order = [F.asc("_t"), F.asc("_side"), F.asc("_tie")]
    else:
        order = [F.desc("_t"), F.asc("_side"), F.desc("_tie")]
    w = (
        Window.partitionBy("_k").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_side",
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.last(p, ignorenulls=True).over(w).alias(p)
          for p in out_right],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    t: str,
    lo: str,
    hi: str,
    bucket_width: int,
) -> DataFrame:
    """points.* + intervals.*: every (point, interval) pair with the
    same key and lo <= t < hi — candidates from the (key, bucket)
    equi-join, exact containment on candidates only; empty and
    negative-length intervals match nothing. Integer NONNEGATIVE
    time axis (convert timestamps to epoch micros first; integer
    `div` bucketing — exact, no float rounding); point and interval
    column names must not collide beyond the key."""
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    p = points.withColumn("_b", F.expr(f"{t} div {bucket_width}L"))
    i = intervals.filter(F.col(lo) < F.col(hi)).withColumn(
        "_b",
        F.explode(F.sequence(
            F.expr(f"{lo} div {bucket_width}L"),
            F.expr(f"({hi} - 1) div {bucket_width}L"),
        )),
    )
    return (
        p.join(i, [key, "_b"])
        .filter((F.col(t) >= F.col(lo)) & (F.col(t) < F.col(hi)))
        .drop("_b")
    )


def burstiness(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(key, n_gaps, sum_gap_s, burst_milli): Goh-Barabási burstiness
    (EPL 2008) of the inter-arrival gaps per key,

        B = (sigma - mu) / (sigma + mu)   in [-1, 1),

    the revisit-scheduler's regularity signal: B near -1 means
    clockwork arrivals (poll at the period and stop probing), B near
    0 Poisson, B near 1 means bursts (rate-limit by burst, not by
    mean — the mean gap is a lie). Sessionization reads gaps against
    a threshold; this reads their SHAPE.

    Integer-exact form: gaps in whole seconds (epoch-micro difference
    floor-divided by 1e6 — diff first, then floor, identically in the
    oracle), and with S1 = sum(g), S2 = sum(g^2), R = isqrt(n*S2 -
    S1^2) = n*sigma the n's cancel:

        burst_milli = 1000 * (R - S1)  div  (R + S1)

    sign-split (Spark DIV truncates, DuckDB // floors — they agree
    only on non-negatives, so the negative branch is -(1000*(S1-R)
    DIV (R+S1)), mirrored in the oracle). The shared +/-1-corrected
    double isqrt is bit-exact for its argument <= 2^52 — per-key
    n * sum(gap^2) stays inside that for any sane key (1e4 events x
    1e5-s gaps ~ 1e14); keys beyond it need the gap unit coarsened.
    Keys with one event have no gaps and are absent; an all-zero-gap
    key (S1 = 0, R = 0) yields NULL rather than 0/0.

    Scale shape: ONE hash shuffle on the key + a per-key window sort
    (ts, id tiebreak — gap multiset is tie-order invariant, the
    tiebreak is pure determinism), then a map-side-combined groupBy
    on the SAME key — no second exchange; the isqrt correction runs
    post-aggregate on one row per key."""
    from barkingowl_spark.operators.mix import _isqrt

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    gaps = (
        events.select(key_col, ts_col, id_col)
        .withColumn("_prev", F.lag(F.col(ts_col)).over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            key_col,
            # cast("timestamp") accepts TIMESTAMP_NTZ sources too —
            # offset-free because the session timezone is pinned UTC
            ((F.unix_micros(F.col(ts_col).cast("timestamp"))
              - F.unix_micros(F.col("_prev").cast("timestamp")))
             .cast("long") / F.lit(1_000_000))
            .cast("long").alias("_gap"),
        )
    )
    agg = gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("_gap").cast("long").alias("_s1"),
        F.sum(F.col("_gap").cast("decimal(38,0)") * F.col("_gap"))
        .alias("_s2"),
    )
    rr = _isqrt(
        F.col("n_gaps").cast("decimal(38,0)") * F.col("_s2")
        - F.col("_s1").cast("decimal(38,0)") * F.col("_s1"))
    return (
        agg.withColumn("_r", rr)
        .select(
            key_col,
            "n_gaps",
            F.col("_s1").alias("sum_gap_s"),
            F.when(F.col("_r") + F.col("_s1") == 0, F.lit(None))
            .when(
                F.col("_r") >= F.col("_s1"),
                F.expr("1000 * (_r - _s1) DIV (_r + _s1)"))
            .otherwise(F.expr("-(1000 * (_s1 - _r) DIV (_r + _s1))"))
            .cast("long").alias("burst_milli"),
        )
    )


def _dense_series(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    bucket_s: int,
    max_span: int,
) -> DataFrame:
    """(key, _n, _s, _t, _x): per-bucket event counts densified over
    each key's observed span [tmin, tmax] (missing buckets are real
    zeros; t = epoch_us DIV bucket_us). _n = span length in buckets,
    _s = total events. Keys spanning fewer than 2 or more than
    max_span buckets are dropped — the span cap is what bounds the
    densified row count (sum of spans <= keys * max_span; an
    unbounded sequence() explode is the non-scalable shape this cap
    exists to forbid). Shared by periodicity and mad_anomalies."""
    bucket_us = int(bucket_s) * 1_000_000
    counts = (
        events.select(
            key_col,
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        )
        .withColumn("_t", F.expr(f"_us DIV {bucket_us}"))
        .groupBy(key_col, "_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    spans = (
        counts.groupBy(key_col)
        .agg(
            F.min("_t").alias("_tmin"),
            F.max("_t").alias("_tmax"),
            F.sum("_c").cast("long").alias("_s"),
        )
        .withColumn("_n", (F.col("_tmax") - F.col("_tmin") + 1)
                    .cast("long"))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= int(max_span)))
    )
    return (
        spans.select(
            key_col, "_n", "_s",
            F.explode(F.sequence("_tmin", "_tmax")).alias("_t"))
        .join(counts, [key_col, "_t"], "left")
        .select(
            key_col, "_n", "_s", "_t",
            F.coalesce("_c", F.lit(0)).cast("long").alias("_x"),
        )
    )


def periodicity(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lags: tuple[int, ...] = (1, 2, 3, 6, 12, 24),
    bucket_s: int = 3600,
    max_span: int = 4096,
) -> DataFrame:
    """(key, lag, n_buckets, r_milli): integer sample autocorrelation
    of the per-key event-count series at fixed lags — the
    periodicity face of the revisit-scheduler signal pair
    (burstiness reads the gap SHAPE; this reads the CYCLE: r high at
    lag 24 on hour buckets = daily rhythm -> schedule revisits on the
    phase, r flat = no cycle -> fall back to the Poisson rate).

    Series: x_t = events in bucket t (t = epoch_us DIV bucket_us,
    non-negative timestamps assumed), densified over the key's
    observed span [tmin, tmax] (missing buckets are real zeros).
    Centering without rationals: X_t = n*x_t - S (n = span length,
    S = total events) is n times the centered series, and the n's
    cancel in the ratio

        r(lag) = sum_t X_t * X_{t+lag}  /  sum_t X_t^2   in [-1, 1]

    reported in sign-split floored milli (Spark DIV truncates,
    DuckDB // floors; they agree on non-negatives). NULL when the
    denominator is 0 (a perfectly uniform series: every X_t = 0) or
    the lag has no overlap (lag >= n). Products DECIMAL(38,0)-widened:
    X_t ~ n * x_max already overflows int64 squared at x_max ~ 3e4
    per bucket with n = 4096.

    Keys spanning fewer than 2 or more than max_span buckets are
    dropped (a span cap is what bounds the densified row count —
    sum of spans <= keys * max_span; an unbounded sequence() explode
    is the non-scalable shape this cap exists to forbid).

    Scale shape: counts roll up map-side on (key, t); the span stats
    and the final sums are groupBys on key; densification is an
    explode of sequence(tmin, tmax) left-joined back to the counts on
    (key, t); all L lags ride ONE window sort (L lead columns over
    the same (key, t) ordering), then one explode turns the per-key
    row into L output rows — no per-lag pass over the data."""
    if not lags or any(int(x) < 1 for x in lags):
        raise ValueError("lags must be positive")
    if max_span < 2:
        raise ValueError("max_span must be >= 2")
    dense = _dense_series(events, key_col, ts_col, bucket_s, max_span) \
        .select(
            key_col, "_n", "_t",
            (F.col("_n") * F.col("_x") - F.col("_s"))
            .cast("long").alias("_X"),
        )
    w = Window.partitionBy(key_col).orderBy("_t")
    led = dense.select(
        key_col, "_n", "_X",
        *[F.lead("_X", int(l)).over(w).alias(f"_l{l}") for l in lags],
    )
    xd = F.col("_X").cast("decimal(38,0)")
    agg = led.groupBy(key_col).agg(
        F.first("_n").alias("n_buckets"),
        F.sum(xd * F.col("_X")).alias("_den"),
        *[F.sum(xd * F.col(f"_l{l}")).alias(f"_num{l}") for l in lags],
    )
    stacked = agg.select(
        key_col, "n_buckets", "_den",
        F.explode(F.array(*[
            F.struct(
                F.lit(int(l)).cast("long").alias("lag"),
                F.col(f"_num{l}").alias("_num"),
            ) for l in lags
        ])).alias("_e"),
    ).select(key_col, F.col("_e.lag").alias("lag"), "n_buckets",
             "_den", F.col("_e._num").alias("_num"))
    return stacked.select(
        key_col, "lag", "n_buckets",
        F.when(
            (F.col("_den") > 0) & F.col("_num").isNotNull(),
            F.when(
                F.col("_num") >= 0,
                F.expr("(CAST(1000 AS DECIMAL(38,0)) * _num)"
                       " DIV _den"))
            .otherwise(
                F.expr("-((CAST(1000 AS DECIMAL(38,0)) * (-_num))"
                       " DIV _den)")),
        ).cast("long").alias("r_milli"),
    )


def _low_median(df: DataFrame, key_col: str, val_col: str,
                out_col: str) -> DataFrame:
    """(key, out_col): the LOW median of val_col per key — the element
    at rank (_n + 1) DIV 2 of the (val, _t) ascending sort, where _n
    (the key's row count) already rides every _dense_series row, so
    this is ONE window sort + rank filter, no extra count agg or
    self-join. Low (not midpoint-averaged) keeps everything integer."""
    w = Window.partitionBy(key_col).orderBy(val_col, "_t")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == F.expr("(_n + 1) DIV 2"))
        .select(key_col, F.col(val_col).alias(out_col))
    )


def mad_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_s: int = 3600,
    k_milli: int = 4450,
    max_span: int = 4096,
) -> DataFrame:
    """(key, t, x, med, mad): the anomalous buckets of each key's
    event-count series under the Hampel identifier (Davies & Gather
    1993; the robust outlier gate telemetry pipelines use because one
    spike cannot drag the threshold the way it drags mean/stddev):
    flag bucket t when

        1000 * |x_t - median| > k_milli * MAD

    with median = LOW median of the densified per-bucket counts
    (element at rank (n+1) DIV 2 of the ascending sort — stays
    integer, no midpoint average) and MAD = low median of
    |x_t - median|. k_milli = 4450 is the classic 3-sigma-equivalent
    3 * 1.4826 in milli. MAD == 0 (over half the buckets identical)
    degenerates to "any deviating bucket flags" — the standard Hampel
    convention, right for crawl telemetry where a dead-flat host
    suddenly bursting IS the signal.

    Series and span-cap semantics are _dense_series's (missing
    buckets are real zeros; keys with span outside [2, max_span]
    dropped).

    Scale shape: one (key, t) map-side count rollup; densification
    bounded by max_span; the two medians are each ONE window sort
    partitioned by key (rank == (n+1) DIV 2 filter — n rides every
    row from the span stats, so no extra count agg or self-join);
    stats rejoin on key. No driver-side state, no UDFs."""
    if k_milli < 0:
        raise ValueError("k_milli must be >= 0")
    if max_span < 2:
        raise ValueError("max_span must be >= 2")
    dense = _dense_series(events, key_col, ts_col, bucket_s, max_span)
    med = _low_median(dense, key_col, "_x", "_med")
    dev = dense.join(med, key_col).select(
        key_col, "_n", "_t", "_x", "_med",
        F.abs(F.col("_x") - F.col("_med")).alias("_dev"),
    )
    mad = _low_median(dev, key_col, "_dev", "_mad")
    return (
        dev.join(mad, key_col)
        .filter(F.lit(1000) * F.col("_dev")
                > F.lit(int(k_milli)) * F.col("_mad"))
        .select(
            key_col,
            F.col("_t").alias("t"),
            F.col("_x").alias("x"),
            F.col("_med").alias("med"),
            F.col("_mad").alias("mad"),
        )
    )


def cusum_alarms(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_s: int = 3600,
    k: int = 1,
    h: int = 6,
    max_span: int = 4096,
) -> DataFrame:
    """(key, t, x, med, s): buckets where Page's one-sided upper CUSUM
    (Page 1954) over each key's densified per-bucket count series
    exceeds the decision interval h — the classic sequential
    change-point detector for "this host's event rate has SHIFTED UP
    and stayed up", complementing mad_anomalies (which flags isolated
    spikes, while CUSUM accumulates small sustained drifts a
    per-bucket gate never sees).

    Recursion S_t = max(0, S_{t-1} + x_t - med - k) has the closed
    form  S_t = P_t - min(0, min_{j<=t} P_j)  with P the running
    prefix sum of the drift-adjusted deviations d_t = x_t - med - k
    (med = per-key LOW median as the in-control level, k = the
    allowance that absorbs noise; both integer). Alarm when S_t > h.

    Scale shape: _dense_series's one count rollup + span-capped
    densification, the _low_median window sort, then TWO stacked
    running windows (sum, then min) per key partition — no self-join,
    no recursion, no UDF; everything stays long-integer so the DuckDB
    oracle reproduces it bit-exactly."""
    if k < 0:
        raise ValueError("k must be >= 0")
    if h < 0:
        raise ValueError("h must be >= 0")
    if max_span < 2:
        raise ValueError("max_span must be >= 2")
    dense = _dense_series(events, key_col, ts_col, bucket_s, max_span)
    med = _low_median(dense, key_col, "_x", "_med")
    w = (
        Window.partitionBy(key_col)
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = dense.join(med, key_col).select(
        key_col, "_t", "_x", "_med",
        F.sum(F.col("_x") - F.col("_med") - F.lit(int(k)))
        .over(w).cast("long").alias("_p"),
    )
    scored = pref.select(
        key_col, "_t", "_x", "_med",
        (F.col("_p") - F.least(F.lit(0), F.min("_p").over(w)))
        .cast("long").alias("_s"),
    )
    return scored.filter(F.col("_s") > int(h)).select(
        key_col,
        F.col("_t").alias("t"),
        F.col("_x").alias("x"),
        F.col("_med").alias("med"),
        F.col("_s").alias("s"),
    )


def forecast_skill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    season: int = 24,
    bucket_s: int = 3600,
    max_span: int = 4096,
) -> DataFrame:
    """(key, n_buckets, naive_sae, seas_sae, n1, ns, mase_milli):
    does seasonal forecasting beat last-value forecasting for this
    key's event rate? Hyndman & Koehler's MASE idea (Int. J.
    Forecasting 2006) specialized to the two cheapest forecasters a
    scheduler actually has: seasonal-naive x̂_t = x_{t-season} scored
    against naive-1 x̂_t = x_{t-1} on the same densified series.

        mase_milli = 1000 * (seas_sae / ns) / (naive_sae / n1)
                   = (1000 * seas_sae * n1) DIV (ns * naive_sae)

    — one floor, nonneg operands. Below 1000: the key has exploitable
    seasonal structure (alert thresholds and revisit phases should be
    season-aware — the decision face of what periodicity's lag-24
    autocorrelation measures); at/above 1000 or NULL (no seasonal
    pairs, or a constant series with naive_sae = 0): fall back to the
    rate model. Series and span-cap semantics are _dense_series's
    (missing buckets are real zeros).

    Scale shape: the shared densify (one count rollup + span-capped
    explode), both lags on ONE (key, t) window sort, one per-key agg."""
    if season < 1:
        raise ValueError("season must be >= 1")
    if max_span < 2:
        raise ValueError("max_span must be >= 2")
    dense = _dense_series(events, key_col, ts_col, bucket_s, max_span)
    w = Window.partitionBy(key_col).orderBy("_t")
    d = dense.select(
        key_col, "_n", "_x",
        F.lag("_x", 1).over(w).alias("_p1"),
        F.lag("_x", int(season)).over(w).alias("_ps"),
    )
    g = d.groupBy(key_col).agg(
        F.first("_n").cast("long").alias("n_buckets"),
        F.sum(F.abs(F.col("_x") - F.col("_p1"))).cast("long")
        .alias("naive_sae"),
        F.sum(F.abs(F.col("_x") - F.col("_ps"))).cast("long")
        .alias("seas_sae"),
        F.count("_p1").cast("long").alias("n1"),
        F.count("_ps").cast("long").alias("ns"),
    )
    return g.select(
        F.col(key_col).alias("key"), "n_buckets", "naive_sae",
        "seas_sae", "n1", "ns",
        F.expr(
            "CASE WHEN ns > 0 AND naive_sae > 0 THEN"
            " 1000 * seas_sae * n1 DIV (ns * naive_sae) END")
        .cast("long").alias("mase_milli"),
    )


def persistence(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_s: int = 3600,
) -> DataFrame:
    """(key, n_events, n_present, w_total, persistence_ppm,
    burst_ratio_ppm): persistence vs frequency per key — in how many
    of the corpus's observed time windows does the key appear at all?
    The bot/scraper separator frequency alone misses (Lahiri et al.'s
    persistent-items observation): organic users are bursty (many
    events, few windows), automation is metronomic (a window-presence
    ratio near 1e6 across the whole span). burst_ratio_ppm =
    1e6 * n_present DIV n_events (low = concentrated bursts).

    w_total is the count of windows in which ANY key was observed
    (the corpus's live span — a global constant riding a 1-row
    broadcast), so persistence is comparable across keys.

    Scale shape: one (key, t) distinct rollup (map-side combine),
    one per-key agg, a 1-row global distinct count broadcast — no
    windows, no explode, no densification."""
    bucket_us = int(bucket_s) * 1_000_000
    kt = events.select(
        F.col(key_col).alias("key"),
        F.expr(
            f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
            f" DIV {bucket_us}").alias("_t"),
    )
    per = kt.groupBy("key", "_t").agg(
        F.count(F.lit(1)).cast("long").alias("_c"))
    tot = per.select("_t").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("w_total"))
    return (
        per.groupBy("key")
        .agg(
            F.sum("_c").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_present"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "key", "n_events", "n_present", "w_total",
            F.expr("1000000 * n_present DIV w_total").cast("long")
            .alias("persistence_ppm"),
            F.expr("1000000 * n_present DIV n_events").cast("long")
            .alias("burst_ratio_ppm"),
        )
    )


def ewma_baseline(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_s: int = 3600,
    lags: int = 16,
    max_span: int = 4096,
) -> DataFrame:
    """(key, t, x, ewma_milli, dev_milli, spike): exponentially
    weighted moving-average rate baseline per key over the densified
    per-bucket count series — the smoothed "normal rate" a monitor
    compares each new bucket against (mad_anomalies flags isolated
    spikes, cusum_alarms sustained shifts; EWMA gives the adaptive
    LEVEL both of those lack, the number dashboards draw).

    Spec (exact, engine-portable): alpha = 1/2 truncated at `lags`
    buckets — ewma_t = 1000 * sum_{i} x_{t-i} * 2^(L-1-i)
    DIV (2^L - 1) over the L = min(t+1, lags) available buckets
    (integer weights, one floor division; NO per-step flooring, so
    the recursion pitfall never arises). dev_milli = x*1000 minus the
    PREVIOUS bucket's ewma (NULL on each key's first bucket); spike =
    rate more than doubled vs that baseline.

    Scale shape: _dense_series's count rollup + span-capped
    densification, ONE per-key ordered window whose frame-ordered
    collect_list feeds a JVM-side aggregate/transform power sum
    (arrays of <= lags longs — never a self-join), one lag. The span
    cap bounds rows; lags bounds the array."""
    if not 1 <= int(lags) <= 62:
        raise ValueError("lags must be in [1, 62] (2^lags in int64)")
    dense = _dense_series(events, key_col, ts_col, bucket_s, max_span)
    w = (
        Window.partitionBy(key_col)
        .orderBy("_t")
        .rowsBetween(-(int(lags) - 1), Window.currentRow)
    )
    wl = Window.partitionBy(key_col).orderBy("_t")
    scored = (
        dense.withColumn("_arr", F.collect_list("_x").over(w))
        .withColumn(
            "ewma_milli",
            F.expr(
                "CAST(1000 * aggregate(transform(_arr,"
                " (x, i) -> x * shiftleft(1L, i)), 0L,"
                " (a, v) -> a + v)"
                " DIV (shiftleft(1L, size(_arr)) - 1) AS BIGINT)"))
        .withColumn("_prev", F.lag("ewma_milli").over(wl))
    )
    return scored.select(
        F.col(key_col).alias("key"),
        F.col("_t").alias("t"),
        F.col("_x").alias("x"),
        "ewma_milli",
        F.expr("CAST(_x * 1000 - _prev AS BIGINT)").alias("dev_milli"),
        F.expr("CASE WHEN _prev IS NULL THEN false"
               " ELSE _x * 1000 - _prev > _prev END").alias("spike"),
    )
