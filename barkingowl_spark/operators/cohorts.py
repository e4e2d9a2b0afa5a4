"""Behavioral analytics over the events stream: ordered funnels and
cohort retention — the two product-analytics staples (Amplitude /
Mixpanel / GA-style) every events table eventually gets asked, and a
crawl engine's own telemetry asks of its fetch lifecycle (queued →
fetched → parsed → matched is a funnel; per-host weekly liveness is a
retention matrix).

funnel — stage-wise min-aggregation, NOT a per-key sequence scan:
  "earliest completion time of stage i at-or-after stage i-1, inside
  the horizon anchored at stage 1" is computed one stage at a time:
  filter the events to stage i's type, equi-join the survivors-so-far
  on the key, keep ts >= t_{i-1} and ts < t_1 + horizon, take
  min(ts). K stages cost K-1 (filter -> join -> partial-agg) passes,
  every one an equi-shuffle on the SAME key (AQE reuses the
  partitioning), and each pass touches only that stage's events —
  never a window over each key's full event history, never a
  cross-stage explosion. Matches the standard "first touch, strictly
  ordered, windowed" funnel semantics (ties at equal ts count, like
  the as-of join's inclusive bound).

retention — two rollups:
  activity dedup to distinct (key, bucket), cohort = min bucket per
  key, then count keys per (cohort, offset). Both shuffles are on
  uniform derived keys; output is O(span^2 / 2) buckets independent
  of row count.

No reference counterpart (/root/reference is empty, SURVEY §0);
pinned by tests/test_cohorts.py (independent Python reimpls) and the
events_funnel / events_funnel_report / events_retention DuckDB
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_s: int = 7 * 86400,
) -> DataFrame:
    """(key, t1..tK, reached): per-key first-touch funnel times.

    t1 = min ts of stage-1 events; t_i = min ts of stage-i events at
    or after t_{i-1} and strictly inside [t1, t1 + horizon_s); NULL
    once a stage is unreached (and every later stage stays NULL by
    construction — stage i only joins keys that reached i-1).
    reached = number of completed stages (>= 1 for every emitted key;
    keys with no stage-1 event do not appear)."""
    if len(stages) < 2:
        raise ValueError("need at least 2 stages")
    if horizon_s <= 0:
        raise ValueError("horizon_s must be positive")
    base = events.select(
        key_col,
        F.col(type_col).alias("_ty"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
    )
    cur = (
        base.filter(F.col("_ty") == stages[0])
        .groupBy(key_col)
        .agg(F.min("_ts").alias("t1"))
    )
    deadline = F.col("t1") + F.expr(f"INTERVAL {int(horizon_s)} SECOND")
    for i, st in enumerate(stages[1:], start=2):
        carry = [key_col, "t1"] + ([f"t{i - 1}"] if i > 2 else [])
        hit = (
            base.filter(F.col("_ty") == st)
            .join(cur.select(*carry), key_col)
            .filter(
                (F.col("_ts") >= F.col(f"t{i - 1}"))
                & (F.col("_ts") < deadline)
            )
            .groupBy(key_col)
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        cur = cur.join(hit, key_col, "left")
    reached = F.lit(1)
    for i in range(2, len(stages) + 1):
        reached = reached + F.col(f"t{i}").isNotNull().cast("int")
    return cur.select(
        key_col,
        *[f"t{i}" for i in range(1, len(stages) + 1)],
        reached.cast("long").alias("reached"),
    )


def funnel_report(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    horizon_s: int = 7 * 86400,
) -> DataFrame:
    """(stage, stage_type, users, conv_ppm): keys reaching each funnel
    stage and the step conversion vs the PREVIOUS stage in integer ppm
    (stage 1 = 1_000_000 by definition). One 1-row aggregation over
    funnel_times, unpivoted stage-per-row — integer throughout."""
    times = funnel_times(events, stages, key_col, type_col, ts_col,
                         horizon_s)
    counts = times.agg(
        *[F.count(f"t{i}").cast("long").alias(f"c{i}")
          for i in range(1, len(stages) + 1)]
    )
    stack = ", ".join(
        f"{i}L, '{st}', c{i}" for i, st in enumerate(stages, start=1)
    )
    long = counts.select(
        F.expr(f"stack({len(stages)}, {stack})")
        .alias("stage", "stage_type", "users")
    )
    # bounded-global-window: frame is stack(len(stages)) aggregate
    # rows in-plan
    w = Window.orderBy("stage")
    return (
        long.withColumn("_prev", F.lag("users").over(w))
        .select(
            "stage", "stage_type", "users",
            F.when(F.col("stage") == 1, F.lit(1_000_000).cast("long"))
            .when(F.col("_prev") == 0, F.lit(None).cast("long"))
            .otherwise(F.expr("(users * 1000000) DIV _prev"))
            .cast("long").alias("conv_ppm"),
        )
    )


def retention_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket_s: int = 7 * 86400,
) -> DataFrame:
    """(cohort, offset, users): classic retention triangle — keys are
    cohorted by the bucket of their FIRST event (bucket = epoch_us DIV
    bucket_us, weekly by default), and users counts the cohort's keys
    active (>= 1 event) at each bucket offset from their cohort
    bucket. offset 0 rows equal the cohort sizes by construction."""
    if bucket_s <= 0:
        raise ValueError("bucket_s must be positive")
    bucket_us = int(bucket_s) * 1_000_000
    active = (
        events.select(
            key_col,
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        )
        .withColumn("_b", F.expr(f"_us DIV {bucket_us}"))
        .select(key_col, "_b")
        .distinct()
    )
    cohort = active.groupBy(key_col).agg(F.min("_b").alias("_c"))
    return (
        active.join(cohort, key_col)
        .groupBy(
            F.col("_c").cast("long").alias("cohort"),
            (F.col("_b") - F.col("_c")).cast("long").alias("offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
    )


def srm_check(
    events: DataFrame,
    key_col: str = "event_type",
    unit_col: str = "user_id",
    crit_milli: int = 3841,
) -> DataFrame:
    """(key, n, arm0, arm1, chi2_milli, srm): sample-ratio-mismatch
    detection per key for a 50/50 hash-split experiment — the FIRST
    check any A/B readout must pass (a traffic split that isn't the
    designed ratio invalidates every downstream metric; Fabijan et
    al., "Diagnosing Sample Ratio Mismatch", KDD 2019). Units are
    assigned by the portable md5-bit draw (the same engine-identical
    hash mix_sample uses), so the whole table value-hashes.

    chi-square with E = n/2 collapses to an exact integer:

        chi2 = (arm0 - E)^2/E + (arm1 - E)^2/E = (arm0 - arm1)^2 / n

    reported in milli with floor; srm flags chi2_milli > crit_milli
    (default 3841 = the 0.05 critical value of chi^2_1). int64-safe
    through n ~ 3e6 per key at full imbalance ((arm0-arm1)^2 * 1000);
    the DECIMAL widening keeps it exact beyond.

    Scale shape: one map-side-combined groupBy(key) — the assignment
    is a projection, no join, no second pass."""
    arm = (
        F.conv(F.substring(F.md5(F.col(unit_col).cast("string")
                                 .cast("binary")), 1, 15), 16, 10)
        .cast("long") % 2
    )
    return (
        events.select(F.col(key_col).alias("key"), arm.alias("_arm"))
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("_arm") == 0, 1).otherwise(0))
            .cast("long").alias("arm0"),
            F.sum(F.when(F.col("_arm") == 1, 1).otherwise(0))
            .cast("long").alias("arm1"),
        )
        .select(
            "key", "n", "arm0", "arm1",
            F.expr(
                "CAST(CAST(1000 AS DECIMAL(38,0)) * (arm0 - arm1)"
                " * (arm0 - arm1) DIV n AS BIGINT)")
            .alias("chi2_milli"),
        )
        .withColumn("srm", F.col("chi2_milli") > int(crit_milli))
    )


def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str | None = None,
) -> DataFrame:
    """(from_type, to_type, n, p_ppm, rk): the first-order Markov
    transition matrix of event types over per-user event sequences —
    what actually follows what, the behavioral model behind funnel
    design and next-action prediction (and, on fetch logs, the
    host-to-host navigation pattern a focused crawler exploits).
    p_ppm row-normalizes each from_type (floor); rk ranks destinations
    within a row (n desc, to_type asc), so rk=1 is the modal next
    action.

    Sequences are per-key (ts, tie) ordered — pass tie_col when
    timestamps can collide (determinism rule as everywhere else);
    the last event of each key has no successor and drops out.

    Scale shape: ONE key-partitioned window sort for lead(), one
    (from, to) map-side-combined count, a broadcast-sized row-total
    join (|types|^2 table), a WindowGroupLimit rank."""
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        events.select(
            F.col(key_col), F.col(ts_col),
            *( [F.col(tie_col)] if tie_col else [] ),
            F.col(type_col).alias("from_type"))
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rows = pairs.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("_row_n"))
    rk = Window.partitionBy("from_type").orderBy(
        F.col("n").desc(), F.col("to_type"))
    return (
        pairs.join(F.broadcast(rows), "from_type")
        .select(
            "from_type", "to_type", "n",
            F.expr("1000000 * n DIV _row_n").cast("long")
            .alias("p_ppm"))
        .withColumn("rk", F.row_number().over(rk).cast("long"))
    )


def session_affinity(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    gap_s: int = 1800,
    min_count: int = 3,
    k: int = 50,
) -> DataFrame:
    """(type_a, type_b, n_ab, n_a, n_b, lift_ppm): top-k event-type
    pairs that co-occur in the same session far more often than their
    session frequencies predict — the order-free market-basket
    companion to transition_matrix's ordered transitions (Markov asks
    "what follows", affinity asks "what belongs together"), scored by
    the same no-log integer lift collocations uses:

        lift_ppm = (n_ab * S * 1e6) DIV (n_a * n_b)

    over session-presence counts (a type counts once per session;
    S = total sessions). Sessions split on gaps > gap_s within each
    key's (ts, type) order. min_count guards the rare-pair blowup;
    ties (type_a, type_b) ascending.

    Scale shape: one key window builds session ids (running sum of
    gap breaks), one distinct to presence rows, the pair join is
    WITHIN (key, session) — bounded by each session's distinct types,
    never corpus-wide — then map-side-combined counts, broadcast
    singles, TakeOrderedAndProject(k)."""
    if gap_s < 1 or min_count < 1 or k < 1:
        raise ValueError("gap_s, min_count, k must be >= 1")
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), F.col(type_col))
    sess = (
        events.select(
            F.col(key_col).alias("key"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
            F.col(type_col).alias("t"))
        .withColumn(
            "_brk",
            F.when(
                F.col("_us") - F.lag("_us").over(
                    Window.partitionBy("key").orderBy("_us", "t"))
                > int(gap_s) * 1_000_000, 1).otherwise(0))
        .withColumn(
            "sid",
            F.sum("_brk").over(
                Window.partitionBy("key").orderBy("_us", "t")
                .rowsBetween(Window.unboundedPreceding,
                             Window.currentRow)))
        .select("key", "sid", "t")
        .distinct()
    )
    singles = sess.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"))
    total = sess.select("key", "sid").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("s_tot"))
    a = sess.select("key", "sid", F.col("t").alias("type_a"))
    b = sess.select("key", "sid", F.col("t").alias("type_b"))
    pairs = (
        a.join(b, ["key", "sid"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_count))
    )
    return (
        pairs
        .join(F.broadcast(singles.select(
            F.col("t").alias("type_a"), F.col("n_s").alias("n_a"))),
            "type_a")
        .join(F.broadcast(singles.select(
            F.col("t").alias("type_b"), F.col("n_s").alias("n_b"))),
            "type_b")
        .crossJoin(F.broadcast(total))
        .select(
            "type_a", "type_b", "n_ab", "n_a", "n_b",
            F.expr(
                "CAST(CAST(n_ab AS DECIMAL(38,0)) * s_tot * 1000000"
                " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
            .alias("lift_ppm"))
        .orderBy(F.desc("lift_ppm"), F.asc("type_a"), F.asc("type_b"))
        .limit(int(k))
    )


def active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    wau_days: int = 7,
    mau_days: int = 28,
    max_span: int = 4096,
) -> DataFrame:
    """(day, dau, wau, mau, stickiness_ppm): rolling active-user
    counts over the event log — DAU, trailing-window WAU/MAU (windows
    END on the day, the standard product-analytics convention), and
    DAU/MAU "stickiness" in ppm: the engagement dashboard every crawl
    or serving tier ships next to its health monitors. day =
    epoch_us DIV 86400e6 (the repo's bucket convention).

    Exact distinct counts, no sketch: the (user, day) distinct table
    joins a day GRID on a bounded range predicate, so each user-day
    lands in <= mau_days window rows. Spans longer than max_span days
    raise (the grid is driver-broadcast; an unbounded grid is the
    non-scalable shape this cap forbids — at 10 years of days the
    grid is still only ~3.7k rows, the cap is generous).

    Scale shape: one distinct shuffle over (user, day), one broadcast
    range join against the <= max_span-row grid, one distinct-count
    rollup per window size (the wau/mau rollups reuse the SAME joined
    table). Growth is O(users x days x mau_days), independent of raw
    event volume after the first rollup.

    Two behaviors callers must not assume away:
      * Days whose ENTIRE trailing mau_days window is empty are
        ABSENT from the output (the grid join is inner), not emitted
        as zero rows — a dashboard densifying the day axis must
        treat missing days as dau=wau=mau=0 itself. Days with any
        window activity but no same-day activity DO appear
        (dau=0, mau>0).
      * The span check runs EAGERLY: building this query executes a
        2-value min/max aggregate (and raises on span > max_span) at
        construction time, unlike the otherwise-lazy driver-query
        builders — plan construction here is not side-effect free."""
    day_us = 86_400_000_000
    ud = (
        events.select(
            F.col(user_col).alias("u"),
            F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
                   f" DIV {day_us}").alias("day"))
        .distinct()
    )
    span = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    lo, hi = span.collect()[0]
    if lo is None:
        return ud.sparkSession.createDataFrame(
            [], "day long, dau long, wau long, mau long,"
                " stickiness_ppm long")
    if hi - lo + 1 > int(max_span):
        raise ValueError(
            f"span {hi - lo + 1} days exceeds max_span={max_span}")
    grid = ud.sparkSession.range(lo, hi + 1).select(
        F.col("id").alias("gday"))
    j = (
        F.broadcast(grid).join(
            ud,
            (ud.day <= F.col("gday"))
            & (ud.day > F.col("gday") - int(mau_days)))
        .select("gday", "u", "day")
    )
    return (
        j.groupBy("gday")
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("gday"), F.col("u")))
            .cast("long").alias("dau"),
            F.countDistinct(
                F.when(F.col("day") > F.col("gday") - int(wau_days),
                       F.col("u"))).cast("long").alias("wau"),
            F.countDistinct("u").cast("long").alias("mau"))
        .select(
            F.col("gday").alias("day"), "dau", "wau", "mau",
            F.expr("CAST(1000000 * dau DIV mau AS BIGINT)")
            .alias("stickiness_ppm"))
    )
