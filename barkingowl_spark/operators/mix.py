"""Deterministic domain-mix sampling — the data-mixing step of a
training pipeline: given per-host keep quotas (e.g. downweight SEO
farms, upweight reference sites), select that fraction of each host's
documents WITHOUT randomness, so the mix is reproducible bit-for-bit
across runs, engines, and re-partitions.

Rule: u = (low 60 bits of md5(host || '#' || doc_id)) mod 1e6 is a
per-doc uniform draw in ppm space; a doc survives iff u < keep_ppm for
its host (hosts absent from the quota table get default_keep_ppm).
Hashing (host, doc_id) — not doc_id alone — decorrelates the draw from
any other doc_id-keyed decision in the pipeline. md5-hex is the repo's
portable-hash idiom (corpus_dedup.py): DuckDB reproduces it with
CAST('0x' || substring(md5(..),1,15) AS BIGINT), so the oracle runs the
same draw. The 2^60-mod-1e6 nonuniformity is ~1e-12 — far below any
statistical relevance, and identical in both engines.

Scale shape (10^10 docs): the quota table is a per-host dim (10^7 rows
at web scale) — broadcast it; sampling is then a pure map-side filter
fused into the scan (no shuffle, no RNG state). The achieved-mix report
is one groupBy(host) with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def _draw_ppm(host_col: str, id_col: str):
    key = F.concat(F.col(host_col), F.lit("#"),
                   F.col(id_col).cast("string"))
    h = F.conv(F.substring(F.md5(key.cast("binary")), 1, 15), 16, 10) \
        .cast("long")
    return (h % PPM).alias("u_ppm")


def mix_sample(
    docs: DataFrame,
    quotas: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "source",
    default_keep_ppm: int = PPM,
) -> DataFrame:
    """(id, host, u_ppm, keep): every doc with its deterministic draw
    and the quota verdict. quotas = (host_col, keep_ppm). Filter on
    `keep` for the sampled corpus; keep the flag for audits."""
    q = F.broadcast(quotas.select(host_col, "keep_ppm"))
    return (
        docs.select(id_col, host_col, _draw_ppm(host_col, id_col))
        .join(q, host_col, "left")
        .select(
            id_col,
            host_col,
            "u_ppm",
            (F.col("u_ppm")
             < F.coalesce("keep_ppm", F.lit(default_keep_ppm)))
            .alias("keep"),
        )
    )


def epoch_plan(
    counts: DataFrame,
    weights: DataFrame,
    budget_tokens: int,
    max_epochs_ppm: int = 5_000_000,
    domain_col: str = "domain",
) -> DataFrame:
    """Token-budget allocation across domains — the mix table a training
    run is actually launched with (The-Pile-style weight/epochs tables):
    given per-domain token counts, target mix weights (ppm), a total
    token budget, and a repetition ceiling (max_epochs_ppm, e.g.
    5_000_000 = each domain's data may be seen at most 5 times):

      requested_d = floor(B * w_d / 1e6)
      cap_d       = floor(tokens_d * max_epochs_ppm / 1e6)
      alloc_d     = min(requested_d, cap_d), then ONE redistribution
                    pass hands the capped domains' shortfall to domains
                    with headroom, proportional to their weights
                    (bonus_d = min(room_d, floor(S * w_d / W_unsat))).

    A single redistribution pass — not the fixed point — is the
    documented contract: it is what production mix tables do, it is
    closed-form (no driver iteration), and the residual slack is
    auditable as B - sum(alloc). All arithmetic is DECIMAL(38,0)
    multiply + integer DIV, bit-identical in DuckDB HUGEINT math
    (B ~ 1e13 tokens x 1e6 ppm overflows int64; never multiply in
    longs). Counts and weights join on domain (inner: a domain with no
    weight is not in the mix).

    Scale shape: both inputs are per-domain dims (10^5..10^7 rows at
    web scale); the shortfall/headroom scalars are one tiny aggregate
    broadcast back — no corpus-sized anything."""
    j = counts.select(domain_col, F.col("tokens").cast("long")
                      .alias("tokens")).join(
        weights.select(domain_col, F.col("weight_ppm").cast("long")
                       .alias("weight_ppm")),
        domain_col,
    )
    base = j.select(
        domain_col,
        "tokens",
        "weight_ppm",
        F.expr(
            f"CAST((CAST({int(budget_tokens)} AS DECIMAL(38,0))"
            " * weight_ppm) DIV 1000000 AS BIGINT)"
        ).alias("requested"),
        F.expr(
            f"CAST((CAST(tokens AS DECIMAL(38,0)) * {int(max_epochs_ppm)})"
            " DIV 1000000 AS BIGINT)"
        ).alias("_cap"),
    ).withColumn(
        "_alloc1", F.least("requested", "_cap")
    ).withColumn("_room", F.col("_cap") - F.col("_alloc1"))
    tot = base.agg(
        F.coalesce(F.sum(F.col("requested") - F.col("_alloc1")),
                   F.lit(0).cast("long")).alias("_s"),
        F.coalesce(F.sum(F.when(F.col("_room") > 0, F.col("weight_ppm"))),
                   F.lit(0).cast("long")).alias("_w"),
    )
    out = base.crossJoin(F.broadcast(tot)).withColumn(
        "_bonus",
        F.when(
            (F.col("_room") > 0) & (F.col("_w") > 0),
            F.least(
                F.col("_room"),
                F.expr("CAST((CAST(_s AS DECIMAL(38,0)) * weight_ppm)"
                       " DIV _w AS BIGINT)"),
            ),
        ).otherwise(F.lit(0).cast("long")),
    ).withColumn("alloc", F.col("_alloc1") + F.col("_bonus"))
    return out.select(
        domain_col,
        "tokens",
        "weight_ppm",
        "requested",
        "alloc",
        F.when(
            F.col("tokens") > 0,
            F.expr("CAST((CAST(alloc AS DECIMAL(38,0)) * 1000000)"
                   " DIV tokens AS BIGINT)"),
        ).otherwise(F.lit(0).cast("long")).alias("epochs_ppm"),
    )


def mix_report(sampled: DataFrame,
               host_col: str = "source") -> DataFrame:
    """(host, total, kept, kept_ppm): the achieved mix, for asserting
    the sample landed within tolerance of the quota."""
    return sampled.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.floor(
            F.sum(F.col("keep").cast("long")) * F.lit(PPM)
            / F.count(F.lit(1))
        ).cast("long").alias("kept_ppm"),
    )


def split_assign(
    docs: DataFrame,
    val_ppm: int = 10_000,
    test_ppm: int = 10_000,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """(id, u_ppm, split): deterministic train/val/test assignment by
    the md5 draw on (salt, id) — the split every training-data export
    needs, with the properties that matter at corpus scale: map-only
    (no shuffle, no sampling pass), stable across reruns AND across
    corpus growth (a doc's split never changes when other docs are
    added/removed, unlike randomSplit), and disjoint by construction.

    Draw < val_ppm -> 'val'; < val_ppm + test_ppm -> 'test'; rest
    'train'. Change `salt` to derive independent splits (e.g. per
    evaluation round) from the same ids."""
    key = F.concat(F.lit(salt), F.lit("#"),
                   F.col(id_col).cast("string"))
    u = (
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 15), 16, 10)
        .cast("long") % F.lit(PPM)
    ).alias("u_ppm")
    return docs.select(id_col, u).select(
        id_col,
        "u_ppm",
        F.when(F.col("u_ppm") < val_ppm, F.lit("val"))
        .when(F.col("u_ppm") < val_ppm + test_ppm, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def materialize_epochs(
    docs: DataFrame,
    plan: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, domain, epoch): the dataset-construction step for
    epoch_plan — turn the per-domain epochs_ppm allocation into actual
    repeated rows: every doc of a domain appears
    floor(epochs_ppm / 1e6) times (epoch = 1..full), plus one more
    (epoch = full + 1) iff its deterministic md5 draw lands under the
    fractional part — so each domain's expected token count equals its
    allocation, reruns are bit-identical, and per-doc fan-out is
    bounded by the repetition cap (never data-dependent explosion).

    Shape: the plan is a per-domain dim (broadcast); the explode is
    map-side; no shuffle at all — the writer downstream repartitions
    by shard as usual (operators/shards.py)."""
    key = F.concat(F.lit("epoch#"), F.col(id_col).cast("string"))
    u = (
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 15), 16, 10)
        .cast("long") % F.lit(PPM)
    )
    j = (
        docs.select(id_col, F.col(domain_col).alias("domain"))
        .join(
            F.broadcast(plan.select("domain", "epochs_ppm")), "domain"
        )
        .withColumn("_full", F.expr(f"CAST(epochs_ppm DIV {PPM} AS INT)"))
        .withColumn("_frac", F.expr(f"epochs_ppm % {PPM}"))
        .withColumn("_u", u)
    )
    return (
        j.select(
            id_col, "domain", "_full", "_frac", "_u",
            F.explode(F.expr("sequence(1, _full + 1)")).alias("epoch"),
        )
        .filter(
            (F.col("epoch") <= F.col("_full"))
            | (F.col("_u") < F.col("_frac"))
        )
        .select(id_col, "domain", "epoch")
    )


def _isqrt(col: F.Column) -> F.Column:
    """Exact integer sqrt: double-sqrt estimate corrected by +/-1 —
    floor(sqrt(x)) bit-exact in Spark and DuckDB for x <= 2^52 (the
    IEEE estimate is within one of the true root there; doc counts per
    group are far below that)."""
    s0 = F.floor(F.sqrt(col.cast("double"))).cast("long")
    return (
        F.when((s0 + 1) * (s0 + 1) <= col, s0 + 1)
        .when(s0 * s0 > col, s0 - 1)
        .otherwise(s0)
    )


def temperature_quotas(
    docs: DataFrame,
    group_col: str = "source",
    alpha_num: int = 1,
    alpha_den: int = 2,
) -> DataFrame:
    """(group, n_docs, weight, quota_ppm): temperature-balanced
    sampling quotas — the multilingual/domain balancing rule of mC4
    (Raffel et al. 2020 appendix) and XLM-R (Conneau et al. 2020):
    sample group g proportionally to n_g^alpha, alpha in (0, 1], so
    head groups are downweighted and tail groups upweighted relative
    to natural frequency.

    alpha = alpha_num / alpha_den with alpha_den a power of two <= 8.
    n^alpha is computed as the FLOOR-EXACT integer product over the
    binary expansion of alpha: with r1 = isqrt(n), r2 = isqrt(r1),
    r3 = isqrt(r2) (n^(1/2), n^(1/4), n^(1/8) floored), weight =
    prod(r_i for set bit i of alpha_num). This is a deterministic
    integer approximation of n^alpha (floors compose monotonically:
    weight is nondecreasing in n and within a few ulps of the real
    power) — determinism and engine-parity are the contract, the
    absolute value is a sampling weight. quota_ppm = weight * 1e6 div
    total_weight: feed (group, quota_ppm * PPM div (n share...)) — or
    directly mix_sample keep_ppm = min(1e6, quota_ppm * total_docs div
    n_docs) — downstream; this operator just fixes the target mix.

    Scale shape: one map-side-combined groupBy(group) count (the only
    pass over the corpus), pure expressions for the roots, ONE 1-row
    total broadcast for the normalization — the output is a per-group
    dim table, O(groups)."""
    if alpha_den not in (2, 4, 8):
        raise ValueError("alpha_den must be 2, 4 or 8")
    if not (1 <= alpha_num <= alpha_den):
        raise ValueError("alpha_num must be in [1, alpha_den]")
    counts = docs.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))
    if alpha_num == alpha_den:
        w = F.col("n_docs")
    else:
        k = alpha_den.bit_length() - 1
        roots, cur = [], F.col("n_docs")
        for _ in range(k):
            cur = _isqrt(cur)
            roots.append(cur)
        w = F.lit(1).cast("long")
        for i in range(k):
            if (alpha_num >> (k - 1 - i)) & 1:
                w = w * roots[i]
    weighted = counts.select("group", "n_docs",
                             w.cast("long").alias("weight"))
    total = weighted.agg(F.sum("weight").alias("_tw"))
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            "group", "n_docs", "weight",
            F.expr(f"(weight * {PPM}L) div _tw").alias("quota_ppm"),
        )
    )


def stratified_sample_exact(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    strata_col: str = "source",
) -> DataFrame:
    """(id, strata, rank): EXACTLY min(k, |stratum|) rows per stratum,
    deterministic and growth-stable-ish — rows are ranked by the same
    md5 draw as mix_sample (full 60-bit hash, doc_id tie-break), so
    which k win is a pure function of (strata, id): re-runs are
    bit-identical, and adding new docs evicts an old winner only when
    a new doc hashes below the stratum's k-th draw. The exact-k
    complement to mix_sample's expected-rate draw — eval holdouts and
    per-host probe sets need exact counts, not rates.

    Scale shape: one window shuffle on the stratum key with
    WindowGroupLimit pushdown (rank <= k prunes to k rows per group
    map-side before the final sort) — the same plan class as
    postings' capped lists; never a global sort."""
    key = F.concat(F.col(strata_col), F.lit("#"),
                   F.col(id_col).cast("string"))
    h = (
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 15), 16, 10)
        .cast("long")
    )
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col))
    return (
        docs.select(id_col, strata_col)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
    )


_U40 = 1 << 40


def priority_sample(
    docs: DataFrame,
    k: int,
    weight_col: str = "w",
    id_col: str = "doc_id",
    host_col: str = "source",
) -> DataFrame:
    """(doc_id, w, u, priority, tau, w_est): weight-proportional
    sample of size k via PRIORITY SAMPLING (Duffield, Lund & Thorup,
    JACM 2007): each item draws u uniform in [1, 2^40] (deterministic
    md5 on host#id — same decorrelation rationale as _draw_ppm),
    priority = floor(w * 2^40 / u), the sample is the top-k by
    (priority desc, id asc) and tau is the (k+1)-th priority. The
    per-item estimator w_est = max(w, tau) makes ANY subset-sum
    unbiased (up to the 2^-40 floor bias, far below the estimator's
    own variance): sum(w_est) over the sample estimates total weight,
    sum over a filtered slice estimates that slice's weight — the ONE
    sample that answers every subset query, which is why it beats
    per-query sampling for corpus telemetry.

    Weights must be >= 1; priorities stay in BIGINT for w < 2^22 even
    at the adversarial u = 1 (doc-length-class weights; for byte-count
    weights at the 100TB point, shift both w and the 2^40 scale down
    by a common power of two — only the ratio orders).

    Plan shape: the scan computes (w, u, priority) map-side; the ONLY
    cut is TakeOrderedAndProject(k+1) — no global sort, no shuffle of
    the corpus; tau and the rank trim run on the k+1 survivors (one
    tiny single-partition window, bounded by k)."""
    key = F.concat(F.col(host_col), F.lit("#"),
                   F.col(id_col).cast("string"))
    u = (
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 15), 16, 10)
        .cast("long") % F.lit(_U40) + 1
    ).alias("u")
    pri = F.expr(
        f"CAST(CAST(w AS DECIMAL(38,0)) * {_U40} DIV u AS BIGINT)"
    ).alias("priority")
    topk1 = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(weight_col).cast("long").alias("w"),
            u,
        )
        .select("doc_id", "w", "u", pri)
        .orderBy(F.col("priority").desc(), F.col("doc_id").asc())
        .limit(k + 1)
    )
    # bounded-global-window: input is .limit(k + 1) in-plan
    w_rank = Window.orderBy(F.col("priority").desc(),
                            F.col("doc_id").asc())
    ranked = topk1.withColumn("rn", F.row_number().over(w_rank))
    tau = ranked.agg(
        F.max(F.when(F.col("rn") == k + 1, F.col("priority")))
        .alias("tau"))
    return (
        ranked.filter(F.col("rn") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            "doc_id", "w", "u", "priority",
            F.coalesce("tau", F.lit(0)).alias("tau"),
            F.greatest(F.col("w"), F.coalesce("tau", F.lit(0)))
            .alias("w_est"),
        )
    )


def priority_estimate(sample: DataFrame, truth: DataFrame) -> DataFrame:
    """1 row (n_sampled, tau, est_total, true_total, err_ppm): the
    subset-sum estimate from a priority_sample next to the exact total
    (truth = (doc_id, w) full table; one agg each, the exact side is
    the audit a pipeline runs at small scale to qualify the sampler
    before trusting it at large)."""
    est = sample.agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.max("tau").alias("tau"),
        F.sum("w_est").cast("long").alias("est_total"),
    )
    tot = truth.agg(F.sum("w").cast("long").alias("true_total"))
    return (
        est.crossJoin(tot)
        .select(
            "n_sampled", "tau", "est_total", "true_total",
            F.expr(
                "CAST(abs(est_total - true_total) * 1000000"
                " DIV true_total AS BIGINT)").alias("err_ppm"),
        )
    )


def neyman_allocation(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    val_col: str = "val",
) -> DataFrame:
    """(group, n_docs, w, alloc): optimal (Neyman 1934) sample-size
    allocation of a labeling/eval budget across strata — sample
    stratum h proportionally to N_h * sigma_h, which minimizes the
    variance of the stratified mean at fixed total budget. The
    standard answer to "we can hand-label 10k docs; how many from each
    source?" — uniform splits waste budget on low-variance strata.

    Integer contract: N_h * sigma_h = sqrt(N_h * sumsq_h - sum_h^2)
    exactly (population variance), taken with the exact-isqrt idiom
    (bit-exact for the radicand <= 2^52 — fine through ~60M docs per
    stratum at |val| <= 1e3; shard beyond). Seats are floored
    proportional shares plus largest-remainder top-up (remainder desc,
    group asc), so sum(alloc) == budget exactly and the result is
    engine-portable. All-constant strata (every w = 0) fall back to
    proportional-to-size on N_h — documented, deterministic.

    Scale shape: one map-side-combined groupBy(group); everything
    after runs on the strata table (one row per group), and the
    largest-remainder rank uses ranking.global_dense_rank — no
    single-partition window even if strata proliferate. Building the
    query is EAGER (the rank primitive collects its partition
    offsets), like active_users' span check."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    g = (
        docs.groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col(val_col)).cast("long").alias("_s"),
            F.sum(F.col(val_col) * F.col(val_col)).cast("long")
            .alias("_ss"),
        )
        .withColumn(
            "w",
            _isqrt(F.col("n_docs") * F.col("_ss")
                   - F.col("_s") * F.col("_s")).cast("long"))
    )
    # NB: Spark resolves column names case-insensitively — _W vs _w
    # would collide, hence the distinct _wsel/_wtot names below
    tot = g.agg(
        F.sum("w").cast("long").alias("_W"),
        F.sum("n_docs").cast("long").alias("_N"))
    j = (
        g.crossJoin(F.broadcast(tot))
        .withColumn(
            "_wsel",
            F.when(F.col("_W") > 0, F.col("w"))
            .otherwise(F.col("n_docs")))
        .withColumn(
            "_wtot",
            F.when(F.col("_W") > 0, F.col("_W"))
            .otherwise(F.col("_N")))
        .withColumn(
            "_floor",
            F.expr(f"CAST({int(budget)} AS BIGINT) * _wsel DIV _wtot"))
        .withColumn(
            "_rem", F.expr(f"CAST({int(budget)} AS BIGINT) * _wsel % _wtot"))
    )
    # largest-remainder rank + floor-sum via the scalable primitives:
    # group is unique => dense rank == row number; the floor total is
    # a 1-row broadcast. No single-partition WindowExec (the strata
    # table is tiny today, but the plan shape must survive a
    # 10^6-stratum mix — tests/test_plan_shapes.py pins it). NB: the
    # rank primitive collects its partition offsets eagerly, so
    # building this query executes the upstream aggregate.
    from barkingowl_spark.operators.ranking import global_dense_rank

    j = global_dense_rank(
        j.withColumn("_negrem", -F.col("_rem")),
        ["_negrem", "group"], out_col="_rk")
    left = j.agg(
        (F.lit(int(budget)) - F.coalesce(F.sum("_floor"), F.lit(0)))
        .cast("long").alias("_left"))
    return (
        j.crossJoin(F.broadcast(left))
        .select(
            "group", "n_docs", "w",
            (F.col("_floor")
             + F.when(F.col("_rk") <= F.col("_left"), 1).otherwise(0))
            .cast("long").alias("alloc"),
        )
    )
