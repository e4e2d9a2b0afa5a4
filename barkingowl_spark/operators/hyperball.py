"""HyperBall: geometric centralities (ball sizes, harmonic, closeness)
over mergeable HyperLogLog registers (Boldi & Vigna, "In-Core
Computation of Geometric Centralities with HyperBall", WWW 2014 /
arXiv:1308.2144; registers per Flajolet et al. AofA 2007, small-range
linear counting per the HLL++ practice, Heule et al. EDBT 2013).

A crawler wants "how central is this page/host in the discovered web"
for frontier prioritization and seed auditing, but exact closeness/
harmonic centrality needs all-pairs distances — hopeless at 10^10
nodes. HyperBall's trick: keep ONE tiny HLL sketch per node whose
estimate is |B(u,t)| = #nodes within distance t, and grow every ball
one hop per round with a pure register merge:

    B(u, t) = {u}  ∪  ⋃_{u→v} B(v, t-1)
    regs(u, t) = elementwise-max(regs(u, t-1), regs of each successor)

max is associative/commutative/idempotent, so the whole round is ONE
edge-keyed shuffle join + ONE map-side-combined groupBy max — the same
plan shape as an integer PageRank iteration, and the register table is
exactly functions/hll.py's (bucket, max_rank) sketch keyed by node.

Everything is INTEGER-EXACT end to end (the repo invariant that makes
DuckDB value-hash oracles possible):

  * h60 md5 draw, bucket/rank math: identical to functions/hll.py.
  * raw estimate: the hll.py DECIMAL(38,0) formula, per node.
  * small-range correction: raw HLL overestimates tiny sets (a
    singleton ball reads ~alpha*m), so below the standard 2.5*m
    threshold with V>0 empty registers we use linear counting
    m*ln(m/V) — FROZEN as an integer lookup table per p (V has only m
    possible values), so no runtime transcendental; both engines index
    the same literal array.
  * centralities: per-term floor-div fixed point; the t-th shell is
    clamped at 0 (the HLL++ raw/LC switch makes per-t estimates not
    strictly monotone in general — the clamp is the standard
    HyperBall practice; at small ball sizes the LC regime is exact-ish
    and the clamp never fires).

Scale shape (10^10 nodes): state is (node, bucket, max_rank) rows,
<= m per node (m=64 at p=6). Each round: join state⋈edges on the ball
owner side (both hash-partitioned on the join key — AQE reuses the
exchange across rounds), then groupBy(node,bucket) max with map-side
partial aggregation, so a hub's 10^6 incoming register copies combine
to <= m rows per map task BEFORE the shuffle — register row count, not
degree, bounds the reduce side. localCheckpoint truncates lineage per
round like pagerank_fixed. The paper packs registers into one array
per node (m-fold fewer rows, elementwise-max merge); the row form is
chosen here because partial aggregation gives the same network volume
while keeping every stage a plain relational groupBy.

No reference counterpart (/root/reference is empty, SURVEY §0);
semantics are defined by this module, the independent Python
recurrence in tests/test_hyperball.py, and the DuckDB oracles for the
graph_hyperball / graph_harmonic driver queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from barkingowl_spark.functions.hll import ALPHA_PPM

MICRO = 1_000_000

# Linear-counting table: LC[p][V-1] = round(m * ln(m / V)), m = 2^p,
# for V = 1..m empty registers. Frozen integers (computed once from
# math.log and pinned) so Spark and DuckDB index the same literal —
# no runtime ln(), no float drift. p=6 is the module default.
LC_TABLE = {
    4: [44, 33, 27, 22, 19, 16, 13, 11, 9, 8, 6, 5, 3, 2, 1, 0],
    5: [111, 89, 76, 67, 59, 54, 49, 44, 41, 37, 34, 31, 29, 26, 24,
        22, 20, 18, 17, 15, 13, 12, 11, 9, 8, 7, 5, 4, 3, 2, 1, 0],
    6: [266, 222, 196, 177, 163, 151, 142, 133, 126, 119, 113, 107,
        102, 97, 93, 89, 85, 81, 78, 74, 71, 68, 65, 63, 60, 58, 55,
        53, 51, 48, 46, 44, 42, 40, 39, 37, 35, 33, 32, 30, 28, 27,
        25, 24, 23, 21, 20, 18, 17, 16, 15, 13, 12, 11, 10, 9, 7, 6,
        5, 4, 3, 2, 1, 0],
}


def _init_registers(nodes: DataFrame, p: int) -> DataFrame:
    """(node, bucket, rank): each node's singleton-ball sketch — the
    register of its own namespaced draw, B(u, 0) = {u}."""
    m = 1 << p
    w = 60 - p
    h = ("CAST(conv(substring(md5(CAST(concat('hb#',"
         " CAST(node AS STRING)) AS BINARY)), 1, 15), 16, 10)"
         " AS BIGINT)")
    return nodes.selectExpr(
        "node",
        f"({h}) % {m} AS bucket",
        f"({h}) DIV {m} AS q",
    ).selectExpr(
        "node", "bucket",
        f"CAST(CASE WHEN q > 0 THEN {w} - (length(bin(q)) - 1)"
        f" ELSE {w} + 1 END AS INT) AS rank",
    )


def _ball_estimates(state: DataFrame, p: int) -> DataFrame:
    """(node, ball_est): per-node HLL++ estimate from a register table
    — raw DECIMAL(38,0) estimator, linear counting below 2.5*m."""
    m = 1 << p
    k = (60 - p) + 1
    alpha = ALPHA_PPM[p]
    lc = ", ".join(str(v) for v in LC_TABLE[p])
    agg = state.groupBy("node").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {k} - rank)"))
        .alias("s"),
    )
    raw = (f"CAST((CAST({alpha} AS DECIMAL(38,0)) * {m} * {m}"
           f" * shiftleft(CAST(1 AS BIGINT), {k}))"
           f" DIV (CAST({MICRO} AS DECIMAL(38,0))"
           f" * (s + ({m} - c) * shiftleft(CAST(1 AS BIGINT), {k})))"
           f" AS BIGINT)")
    return agg.selectExpr(
        "node",
        f"CAST(CASE WHEN ({raw}) <= {5 * m} DIV 2 AND c < {m}"
        f" THEN element_at(array({lc}), CAST({m} - c AS INT))"
        f" ELSE ({raw}) END AS BIGINT) AS ball_est",
    )


def hyperball_sizes(
    edges: DataFrame,
    n_iter: int = 2,
    p: int = 6,
    reverse: bool = False,
) -> DataFrame:
    """(node, t, ball_est) for t = 0..n_iter: the estimated number of
    nodes within distance t FROM each node along edge direction
    (reverse=True flips the edges first: nodes that REACH each node —
    the side centrality wants, per the paper §4).

    One join + one map-side-combined max per round; estimates are one
    extra groupBy over the <= n*m-row state per t."""
    if p not in LC_TABLE:
        raise ValueError(f"p must be one of {sorted(LC_TABLE)}")
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    src, dst = ("dst", "src") if reverse else ("src", "dst")
    e = edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst")
    ).distinct().localCheckpoint()
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .union(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    state = _init_registers(nodes, p).localCheckpoint()
    out = _ball_estimates(state, p).select(
        "node", F.lit(0).cast("int").alias("t"), "ball_est")
    for t in range(1, n_iter + 1):
        prop = (
            state.join(e, F.col("node") == F.col("e_dst"))
            .select(F.col("e_src").alias("node"), "bucket", "rank")
        )
        state = (
            state.unionByName(prop)
            .groupBy("node", "bucket")
            .agg(F.max("rank").alias("rank"))
            .localCheckpoint()
        )
        out = out.unionByName(
            _ball_estimates(state, p).select(
                "node", F.lit(t).cast("int").alias("t"), "ball_est"))
    return out


def centralities_from_sizes(sizes: DataFrame) -> DataFrame:
    """(node, reached_est, sum_dist_est, harmonic_micro,
    closeness_micro) from a (node, t, ball_est) table:

        shell_t        = max(0, ball_t - ball_{t-1})       [clamped]
        reached_est    = sum_t shell_t            (t >= 1)
        sum_dist_est   = sum_t t * shell_t
        harmonic_micro = sum_t (shell_t * 1e6) div t
        closeness_micro= (reached_est * 1e6) div sum_dist_est, 0 if
                         nothing reached  [Lin's index numerator
                         variant left to callers]

    Pure fixed point — per-term floor-div, so engine- and cluster-
    size-portable. One window + one groupBy."""
    from pyspark.sql import Window

    w = Window.partitionBy("node").orderBy("t")
    shell = F.greatest(
        F.lit(0).cast("long"),
        (F.col("ball_est") - F.lag("ball_est", 1).over(w)).cast("long"),
    )
    per_t = sizes.select(
        "node", "t", shell.alias("shell")
    ).filter(F.col("t") >= 1)
    return (
        per_t.groupBy("node")
        .agg(
            F.sum("shell").alias("reached_est"),
            F.sum(F.col("t").cast("long") * F.col("shell"))
            .alias("sum_dist_est"),
            F.sum(F.expr(f"(shell * CAST({MICRO} AS BIGINT)) div t"))
            .alias("harmonic_micro"),
        )
        .selectExpr(
            "node", "reached_est", "sum_dist_est", "harmonic_micro",
            f"CASE WHEN sum_dist_est > 0 THEN (reached_est"
            f" * CAST({MICRO} AS BIGINT)) div sum_dist_est"
            f" ELSE CAST(0 AS BIGINT) END AS closeness_micro",
        )
    )


def hyperball_centrality(
    edges: DataFrame, n_iter: int = 2, p: int = 6
) -> DataFrame:
    """Harmonic/closeness centrality per node on the REVERSED graph
    (who can reach me, the centrality convention) — the one-call
    surface: hyperball_sizes + centralities_from_sizes."""
    return centralities_from_sizes(
        hyperball_sizes(edges, n_iter=n_iter, p=p, reverse=True))


def effective_diameter(
    sizes: DataFrame, q_ppms: tuple[int, ...] = (500_000, 900_000)
) -> DataFrame:
    """(q_ppm, t_eff, d_eff_micro): effective diameter at each quantile
    from a HyperBall (node, t, ball_est) table (ANF / Palmer KDD'02;
    Boldi & Vigna WWW'14 report exactly this off the same sketches).

    N(t) = sum over nodes of ball_est(node, t) estimates the number of
    pairs within distance t; t_eff is the smallest t with
    N(t) * 1e6 >= q * N(t_max), and d_eff_micro linearly interpolates
    inside the last shell (the standard effective-diameter definition):

        d = (t - 1) + (q*N(max) - N(t-1)) / (N(t) - N(t-1)),  d(0) = 0

    in micro units with floor division — engine-portable.

    Scale note: everything after the per-t rollup operates on a table
    of diameter+1 rows; the unpartitioned lag window is bounded by the
    graph's diameter (tens), not its size — the one place a global
    window is the RIGHT plan."""
    from pyspark.sql import Window

    spark = sizes.sparkSession
    nt = sizes.groupBy("t").agg(
        F.sum("ball_est").cast("long").alias("n"))
    # bounded-global-window: frame is one row per iteration t
    # (diameter-bounded by construction of the caller's loop)
    lagd = nt.withColumn(
        "n_prev",
        F.lag("n", 1, 0).over(Window.orderBy("t")))
    tot = nt.agg(F.expr("max_by(n, t)").cast("long").alias("total"))
    qs = spark.createDataFrame(
        [(int(q),) for q in q_ppms], "q_ppm long")
    hits = (
        qs.crossJoin(F.broadcast(tot))
        .crossJoin(lagd)
        .filter(
            F.col("n").cast("decimal(38,0)") * F.lit(MICRO)
            >= F.col("q_ppm").cast("decimal(38,0)") * F.col("total"))
        .withColumn(
            "d_micro",
            F.expr(
                f"CASE WHEN t = 0 THEN CAST(0 AS BIGINT) ELSE"
                f" CAST((t - 1) * CAST({MICRO} AS BIGINT)"
                f" + (CAST(q_ppm AS DECIMAL(38,0)) * total"
                f"    - CAST(n_prev AS DECIMAL(38,0)) * {MICRO})"
                f"   DIV (n - n_prev) AS BIGINT) END"),
        )
    )
    return hits.groupBy("q_ppm").agg(
        F.min("t").cast("long").alias("t_eff"),
        F.expr("min_by(d_micro, t)").cast("long").alias("d_eff_micro"),
    )
