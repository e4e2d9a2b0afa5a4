"""Per-host politeness budget + robots filter — SURVEY.md O20 / section 2.9 note.

Reference: single-threaded sequential fetch per site = implicit 1-at-a-time
politeness (C1); the per-host budget B and robots.txt handling are
north_star additions (DRV), default-OFF for oracle-match runs
(SURVEY.md section 7.2). Under budget B the URLs fetched from host h in one
sub-iteration are exactly the first B in (depth, discovery_idx) order;
deferred rows re-enter the next sub-iteration with their ORIGINAL discovery
keys, so the trace order is invariant to B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def schedule_budget(
    due: DataFrame,
    budget: int | None,
    host_budgets: DataFrame | None = None,
) -> DataFrame:
    """Top-B per host by discovery order; B=None means unlimited.

    ``host_budgets`` is a small (host, host_budget) dim — the per-host
    override derived from robots.txt Crawl-delay (run_crawl turns delay
    d into floor(politeness_wave_seconds / d), min 1 so every host
    progresses). Broadcast joined; hosts without an entry fall back to
    the global budget (or unlimited)."""
    if budget is None and host_budgets is None:
        return due
    w = Window.partitionBy("host").orderBy("discovery_idx", "seed_url")
    d = due.withColumn("_rn", F.row_number().over(w))
    if host_budgets is None:
        return d.filter(F.col("_rn") <= budget).drop("_rn")
    cap = F.coalesce(
        F.col("host_budget"),
        F.lit(budget if budget is not None else (1 << 31) - 1),
    )
    return (
        d.join(F.broadcast(host_budgets.select("host", "host_budget")),
               "host", "left")
        .filter(F.col("_rn") <= cap)
        .drop("_rn", "host_budget")
    )


def schedule_scored(
    due: DataFrame,
    budget: int | None,
    url_scores: DataFrame | None,
    score_col: str = "score_fp",
) -> DataFrame:
    """Priority-scored top-B per host: within each host the budget goes
    to the highest-scored URLs first (score desc, then the oracle's
    (discovery_idx, seed_url) order as the deterministic tie-break).
    ``url_scores`` is (url_hash, score_fp) — e.g. fixed-point PageRank
    from operators/linkgraph.py over the discovered edge graph; unscored
    URLs sort last (coalesce to long-min), so a cold-start frontier with
    no rank yet behaves exactly like schedule_budget. Opt-in, like the
    other non-oracle semantics (SURVEY §7.2).

    Scale shape: url_scores is O(frontier), so the join is hinted
    shuffle_hash (never a driver broadcast of a growing side — the same
    rule as the seen anti-join); the window is per-host, bounded by the
    budget's own skew cap."""
    if url_scores is None:
        return schedule_budget(due, budget)
    scored = due.join(
        url_scores.select("url_hash", score_col).hint("shuffle_hash"),
        "url_hash", "left",
    )
    w = Window.partitionBy("host").orderBy(
        F.desc_nulls_last(
            F.coalesce(F.col(score_col), F.lit(-(1 << 62)))),
        "discovery_idx", "seed_url",
    )
    d = scored.withColumn("_rn", F.row_number().over(w)).drop(score_col)
    if budget is None:
        return d.drop("_rn")
    return d.filter(F.col("_rn") <= budget).drop("_rn")


def waterfill_budget(queue_counts: DataFrame, budget: int) -> DataFrame:
    """Max-min-fair division of a GLOBAL wave budget across hosts
    (integer waterfilling) — the allocator that turns "fetch at most G
    URLs this wave" into per-host caps for schedule_budget.

    queue_counts: (host, n_queued). Returns (host, n_queued, alloc)
    with sum(alloc) == min(G, sum(n_queued)), alloc <= n_queued, and
    the water-level property: every host short of its demand receives
    within 1 of every other short host (remainder units go to short
    hosts in (n_queued, host) order).

    Closed-form, no iteration: hosts sorted by demand ascending; a host
    is `saturated` (gets its full queue) iff raising the water level to
    its demand costs <= G — that cost, prefix_sum_before + demand *
    hosts_remaining, is monotone in the sort order, so saturation is a
    prefix and two window passes + one tiny broadcast of the level
    scalars decide every allocation.

    Scale shape: the input is the per-host COUNT table — O(hosts),
    never the per-URL frontier — and the global rank + prefix sum run
    on ranking.global_running_sums (ONE range shuffle, per-partition
    windows, O(#partitions) driver offsets), so no single task ever
    sees all hosts: a 10^9-host web (the 10^10-URL design point)
    ranks in parallel. The obvious alternative — a driver loop over
    hosts — serializes on exactly the axis that grows. Query
    construction is EAGER (the primitive collects its O(#partitions)
    offsets), like active_users' span check.
    """
    from barkingowl_spark.operators.ranking import global_running_sums

    s = global_running_sums(
        queue_counts.select(
            "host", F.col("n_queued").cast("long").alias("n_queued"))
        .withColumn("_one", F.lit(1).cast("long")),
        ["n_queued", "host"],
        # _k = running count (keys unique => global row number in
        # (n_queued, host) order); _pk = inclusive demand prefix sum
        {"_k": "_one", "_pk": "n_queued"},
    ).drop("_one")
    s = s.crossJoin(F.broadcast(
        s.agg(F.count(F.lit(1)).cast("long").alias("_h"))))
    sat = s.withColumn(
        "_is_sat",
        ((F.col("_pk") - F.col("n_queued"))
         + F.col("n_queued") * (F.col("_h") - F.col("_k") + 1)
         <= F.lit(budget)).cast("int"),
    )
    lvl = sat.agg(
        F.coalesce(F.sum("_is_sat"), F.lit(0)).alias("_kk"),
        F.coalesce(
            F.sum(F.when(F.col("_is_sat") == 1, F.col("n_queued"))),
            F.lit(0).cast("long"),
        ).alias("_psat"),
        F.count("*").alias("_h2"),
    ).selectExpr(
        "_kk",
        f"CASE WHEN _h2 > _kk THEN CAST(({budget} - _psat)"
        " DIV (_h2 - _kk) AS BIGINT) END AS _lvl",
        f"CASE WHEN _h2 > _kk THEN ({budget} - _psat)"
        " % (_h2 - _kk) END AS _rem",
    )
    alloc = (
        F.when(F.col("_is_sat") == 1, F.col("n_queued"))
        .when(F.col("_k") - F.col("_kk") <= F.col("_rem"),
              F.col("_lvl") + 1)
        .otherwise(F.col("_lvl"))
    )
    return (
        sat.crossJoin(F.broadcast(lvl))
        .select("host", "n_queued", alloc.cast("long").alias("alloc"))
    )


def robots_filter(links: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop links whose canonical path starts with a disallowed prefix.

    ``robots`` is the small F3 dim table (host, disallow_prefixes) —
    broadcast; the prefix test is a native EXISTS over the array (no UDF).
    Applied BEFORE the seen-set, mirroring discovery-time filtering.
    """
    if robots is None:
        return links
    path = F.regexp_extract(F.col("url"), r"^[a-z][a-z0-9+.-]*://[^/]+([^?]*)", 1)
    disallowed = F.exists(
        F.col("disallow_prefixes"),
        lambda p: F.coalesce(path, F.lit("/")).startswith(p),
    )
    return (
        links.join(F.broadcast(robots.select("host", "disallow_prefixes")),
                   "host", "left")
        .filter(F.col("disallow_prefixes").isNull() | ~disallowed)
        .drop("disallow_prefixes")
    )


def fetch_timeline(
    scheduled: DataFrame,
    delays: DataFrame | None = None,
    id_col: str = "url",
    host_col: str = "host",
    order_cols: tuple = ("discovery_idx",),
    default_delay_ms: int = 1000,
    wave_start_ms: int = 0,
) -> DataFrame:
    """(id, host, slot, fetch_at_ms): the dispatch calendar of one wave.
    Per host, the k-th fetch in order_cols order happens at
    wave_start_ms + (k-1) * crawl_delay_ms — the reference's
    one-at-a-time per-site politeness (SURVEY §2 O20) made explicit as
    timestamps a distributed fetcher fleet can execute against without
    coordinating: every worker reads its own host's calendar.

    delays: (host, delay_ms) small dim (robots.txt Crawl-delay,
    operators/robots.py); hosts absent fall back to default_delay_ms.

    Scale shape: one window shuffle on host (the same partitioning any
    per-host fetch queue needs anyway); the delay dim is broadcast —
    map-side after the window. Hot hosts concentrate a partition, but
    the per-row work is a counter, and a host's calendar is
    intrinsically sequential (that is what politeness MEANS), so
    host-level parallelism is the true upper bound, not a plan defect."""
    w = Window.partitionBy(host_col).orderBy(*order_cols)
    d = scheduled.withColumn("slot", F.row_number().over(w))
    if delays is not None:
        d = d.join(
            F.broadcast(delays.select(host_col, "delay_ms")),
            host_col, "left",
        )
        delay = F.coalesce(F.col("delay_ms"), F.lit(default_delay_ms))
    else:
        delay = F.lit(default_delay_ms)
    return d.select(
        id_col,
        host_col,
        F.col("slot").cast("long").alias("slot"),
        (F.lit(wave_start_ms) + (F.col("slot") - 1) * delay)
        .cast("long").alias("fetch_at_ms"),
    )


def timeline_makespan(timeline: DataFrame,
                      host_col: str = "host") -> DataFrame:
    """(host, n_fetches, makespan_ms): each host's last-fetch offset;
    the wave's wall-clock floor is max(makespan_ms) — the politeness
    critical path that no amount of executors shortens."""
    return timeline.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.max("fetch_at_ms").alias("makespan_ms"),
    )


def aimd_rates(
    fetch_log: DataFrame,
    base_rate: int = 1000,
    add_step: int = 100,
    min_rate: int = 125,
    max_rate: int = 8000,
) -> DataFrame:
    """(host, n_events, n_errors, rate_final, rate_min, rate_max):
    AIMD per-host fetch-rate adaptation — the TCP-congestion-control
    discipline applied to politeness (the adaptive-delay family in
    production crawlers, e.g. Heritrix): replay each host's fetch
    outcomes in time order, ADD `add_step` milli-requests/min on a
    success, HALVE (floor, clamped to `min_rate`) on an error/timeout,
    cap at `max_rate`. rate_min/rate_max trace the excursion (includes
    the starting rate), the scheduler's stability signal.

    `fetch_log` columns: host, ts, event_id, is_error. The sequential
    recurrence runs as ONE Catalyst `aggregate` fold over the host's
    time-sorted outcome array (array_sort on struct(ts, event_id) makes
    the order total and engine-portable) — no UDF, no iteration, one
    shuffle on host. Per-host state is the telemetry window's event
    count — bounded by the same retention the scheduler already needs;
    at the 10^10 design point the log is windowed per host BEFORE this
    fold (the rate is a control signal, not an archive)."""
    b, s, lo, hi = (
        int(base_rate), int(add_step), int(min_rate), int(max_rate)
    )

    def _next(acc_rate: str) -> str:
        return (
            f"CASE WHEN e.is_error THEN"
            f" greatest(CAST({lo} AS BIGINT), {acc_rate} DIV 2)"
            f" ELSE least(CAST({hi} AS BIGINT), {acc_rate} + {s}) END"
        )

    fold = (
        "aggregate("
        " array_sort(collect_list(struct(ts, event_id, is_error))),"
        f" named_struct('rate', CAST({b} AS BIGINT),"
        f"              'mn', CAST({b} AS BIGINT),"
        f"              'mx', CAST({b} AS BIGINT)),"
        " (acc, e) -> named_struct("
        f"   'rate', {_next('acc.rate')},"
        f"   'mn', least(acc.mn, {_next('acc.rate')}),"
        f"   'mx', greatest(acc.mx, {_next('acc.rate')})))"
    )
    return (
        fetch_log.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("is_error").cast("long")).alias("n_errors"),
            F.expr(fold).alias("_st"),
        )
        .select(
            "host", "n_events", "n_errors",
            F.col("_st.rate").alias("rate_final"),
            F.col("_st.mn").alias("rate_min"),
            F.col("_st.mx").alias("rate_max"),
        )
    )


def ucb_host_ranks(stats: DataFrame, k: int = 10) -> DataFrame:
    """(host, n, reward, mean_ppm, bonus_ppm, ucb_ppm, rank): UCB1
    explore/exploit host scheduling (Auer, Cesa-Bianchi & Fischer,
    Machine Learning 2002) — which hosts should the next crawl wave
    spend budget on, balancing observed document yield (exploit)
    against under-sampled hosts (explore)?

    `stats` is the per-host ledger (host, n plays >= 1, reward
    successes <= n * r_max). Integer base-2 form of the UCB1 bonus
    sqrt(2 ln t / n), all floor math so the DuckDB oracle value-hash
    matches:

        t         = sum(n) over all hosts         (epoch plays,
                    contract t < 2^31 so t^2 fits int64)
        hb        = bitlen(t*t) - 1               (= floor(2*log2 t))
        2*ln t    ~= hb * ln2  ->  bonus_ppm
                  = isqrt((693147 * 1e6 * hb) DIV n)
        mean_ppm  = 1e6 * reward DIV n
        ucb_ppm   = mean_ppm + bonus_ppm

    isqrt is EXACT despite the double sqrt: the +-1 correction clause
    repairs the only representable-rounding error possible at this
    magnitude (x <= ~4.3e13 << 2^52).

    Unplayed hosts (n = 0) are the caller's job — UCB gives them
    infinite priority, i.e. they go straight into the wave before this
    ranking is consulted; rows with n <= 0 are rejected here.

    Scale shape: one map-side-combined groupBy feeds a 1-row broadcast
    (t); top-k is orderBy+limit => TakeOrderedAndProject (per-partition
    heaps, never a global sort shuffle); the final rank runs on
    ranking.global_dense_rank over the k survivors (no
    single-partition WindowExec anywhere; the primitive's offset
    collect makes query construction eager)."""
    tot = stats.agg(F.sum("n").alias("t"))
    scored = (
        stats.crossJoin(F.broadcast(tot))
        .withColumn("hb", F.expr("length(bin(t * t)) - 1"))
        .withColumn(
            # assert_true returns NULL on success (throws on n <= 0),
            # so the coalesce keeps the check inside the used column
            "mean_ppm",
            F.expr("coalesce(CAST(assert_true(n > 0,"
                   " 'ucb_host_ranks: n must be >= 1') AS BIGINT),"
                   " CAST(1000000 * reward DIV n AS BIGINT))"))
        .withColumn(
            "_x", F.expr("CAST((CAST(693147 AS BIGINT) * 1000000 * hb)"
                         " DIV greatest(n, 1) AS BIGINT)"))
        .withColumn(
            "_s0",
            F.expr("CAST(floor(sqrt(CAST(_x AS DOUBLE))) AS BIGINT)"))
        .withColumn(
            "bonus_ppm",
            F.expr("CASE WHEN (_s0 + 1) * (_s0 + 1) <= _x"
                   " THEN _s0 + 1"
                   " WHEN _s0 * _s0 > _x THEN _s0 - 1"
                   " ELSE _s0 END"))
        .withColumn(
            "ucb_ppm", F.expr("CAST(mean_ppm + bonus_ppm AS BIGINT)"))
    )
    top = (
        scored.select("host", "n", "reward", "mean_ppm", "bonus_ppm",
                      "ucb_ppm")
        .orderBy(F.col("ucb_ppm").desc(), F.col("host").asc())
        .limit(int(k))
    )
    # rank the k survivors via the scalable rank primitive (host is
    # unique => dense rank == row number) — k rows would fit one task,
    # but a WindowExec with no partitionBy is the shape this repo
    # forbids outright (tests/test_plan_shapes.py pins its absence)
    from barkingowl_spark.operators.ranking import global_dense_rank

    return global_dense_rank(
        top.withColumn("_negucb", -F.col("ucb_ppm")),
        ["_negucb", "host"], out_col="rank").drop("_negucb")


def host_health(
    outcomes: DataFrame,
    host_col: str = "host",
    error_col: str = "is_error",
) -> DataFrame:
    """(host, n, errors, err_ppm, wilson_lb_ppm): per-host error rate
    with the Wilson score LOWER bound at z=2 (~95.4%) — the backoff
    gate that won't blacklist a host over 1 failed fetch in 2 (raw
    rate 50%, Wilson LB ~6%) yet fires fast on persistent failures.

    Integer form (z=2, z^2=4; exact-isqrt idiom, all floor):

        lb = (e + 2 - 2*sqrt((e*(n-e) + n) / n)) / (n + 4)
        wilson_lb_ppm = max(0, 1e6*(e+2) - 2*isqrt(1e12*(e*(n-e)+n)
                        DIV n)) DIV (n + 4)

    Envelope: 1e12 * e * (n-e) DIV n must fit int64 — holds to n ~
    3.6e7 fetches per host per window (slice longer windows upstream).

    Scale shape: ONE map-side-combined groupBy(host); the Wilson math
    is per-row expressions in codegen."""
    agg = (
        outcomes.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr(f"CASE WHEN {error_col} THEN 1 ELSE 0 END"))
            .cast("long").alias("errors"),
        )
    )
    return (
        agg.withColumn(
            "err_ppm",
            F.expr("CAST(1000000 * errors DIV n AS BIGINT)"))
        .withColumn(
            "_x",
            F.expr("CAST(1000000 AS BIGINT) * 1000000"
                   " * (errors * (n - errors) + n) DIV n"))
        .withColumn(
            "_s0",
            F.expr("CAST(floor(sqrt(CAST(_x AS DOUBLE))) AS BIGINT)"))
        .withColumn(
            "_s",
            F.expr("CASE WHEN (_s0 + 1) * (_s0 + 1) <= _x"
                   " THEN _s0 + 1"
                   " WHEN _s0 * _s0 > _x THEN _s0 - 1 ELSE _s0 END"))
        .withColumn(
            "wilson_lb_ppm",
            F.expr("CAST(greatest(CAST(0 AS BIGINT),"
                   " 1000000 * (errors + 2) - 2 * _s)"
                   " DIV (n + 4) AS BIGINT)"))
        .select("host", "n", "errors", "err_ppm", "wilson_lb_ppm")
    )


def politeness_audit(
    fetches: DataFrame,
    robots: DataFrame | None = None,
    delays: DataFrame | None = None,
    default_delay_ms: int = 1000,
) -> DataFrame:
    """(host, n_fetches, n_disallowed, delay_ms, min_gap_ms,
    n_gap_violations, compliant): did the fetcher fleet actually honor
    robots + crawl-delay? The after-the-fact compliance scoreboard over
    a realized fetch log (host, ts_ms, url) — the operational twin of
    fetch_timeline (which plans) and robots_filter (which gates):

      * n_disallowed counts fetched urls whose path starts with a
        disallow prefix — the SAME native EXISTS expression
        robots_filter applies, so gate and audit can never disagree on
        semantics;
      * gap violations compare each host's successive fetch gaps
        (ordered ts_ms, url — deterministic under timestamp ties)
        against its crawl-delay (dim, else default_delay_ms);
        min_gap_ms is NULL for single-fetch hosts;
      * compliant = no disallowed fetches and no gap violations.

    Scale shape: two broadcast dims (robots, delays — host-keyed and
    small), ONE host-partitioned window for the lag (the same
    partitioning any per-host politeness machinery needs), one
    map-side-combined per-host agg."""
    path = F.regexp_extract(
        F.col("url"), r"^[a-z][a-z0-9+.-]*://[^/]+([^?]*)", 1)
    if robots is not None:
        disallowed = F.exists(
            F.col("disallow_prefixes"),
            lambda p: F.coalesce(path, F.lit("/")).startswith(p),
        )
        j = (
            fetches.join(
                F.broadcast(robots.select("host", "disallow_prefixes")),
                "host", "left")
            .withColumn(
                "_dis",
                F.when(F.col("disallow_prefixes").isNotNull()
                       & disallowed, 1).otherwise(0))
            .drop("disallow_prefixes")
        )
    else:
        j = fetches.withColumn("_dis", F.lit(0))
    if delays is not None:
        j = j.join(
            F.broadcast(delays.select("host", "delay_ms")),
            "host", "left")
        j = j.withColumn(
            "_delay",
            F.coalesce(F.col("delay_ms"), F.lit(default_delay_ms))
            .cast("long")).drop("delay_ms")
    else:
        j = j.withColumn(
            "_delay", F.lit(default_delay_ms).cast("long"))
    w = Window.partitionBy("host").orderBy("ts_ms", "url")
    j = j.withColumn(
        "_gap", F.col("ts_ms") - F.lag("ts_ms").over(w))
    return (
        j.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fetches"),
            F.sum("_dis").cast("long").alias("n_disallowed"),
            F.first("_delay").cast("long").alias("delay_ms"),
            F.min("_gap").cast("long").alias("min_gap_ms"),
            F.sum(F.when(F.col("_gap") < F.col("_delay"), 1)
                  .otherwise(0)).cast("long").alias("n_gap_violations"),
        )
        .withColumn(
            "compliant",
            (F.col("n_disallowed") == 0)
            & (F.col("n_gap_violations") == 0))
    )
