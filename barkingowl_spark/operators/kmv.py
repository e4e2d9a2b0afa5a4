"""KMV ("k minimum values" / theta) distinct-value sketches with SET
INTERSECTION — Beyer, Haas, Reinwald, Sismanis & Gemulla, SIGMOD 2007
"On Synopses for Distinct-Value Estimation Under Multiset Operations";
the theta-sketch framing is Dasgupta, Lang, Rhodes & Thaler's
DataSketches line.

Why next to HLL (functions/hll.py): HLL registers are strictly
smaller, but they only UNION — you cannot ask "how much content do
hosts A and B share" from two HLLs. A KMV sketch (the k smallest
60-bit hash draws of a set) supports union AND intersection: merge two
sketches, keep the k smallest of the merge, and the fraction of those
that appear in both input sketches is an unbiased Jaccard estimate
(SIGMOD'07 §5). That turns mirror screening / host-overlap triage into
sketch-vs-sketch arithmetic: per-host state is k rows, ALL-PAIRS work
is bounded by hosts*k sketch rows, and the corpus is touched exactly
once to build the sketches — the cheap front half of what
operators/mirrors.py proves precisely.

Integer-exact end to end (the repo's oracle invariant):

  h        = 60-bit md5 prefix of 'kmv#' || key   (the repo-wide draw)
  sketch_g = k smallest DISTINCT h of group g     (rank <= k window —
             Spark pushes the filter down as WindowGroupLimit, so each
             map task keeps a k-heap; no group ever materializes)
  D̂(g)     = c                    if c < k   (sketch IS the set: exact)
             (k-1)*2^60 div h_(k) otherwise  (Beyer et al. eq. 2,
             DECIMAL(38,0) numerator, floor division)
  pair (a,b): L = k smallest of sketch_a ∪ sketch_b (distinct),
  matches  = |{h in L : h in sketch_a AND h in sketch_b}|
  jacc_ppm = matches * 1e6 div |L|
  inter̂    = jacc_ppm * D̂(a∪b) div 1e6

When both sets have < k members the sketches are the sets and every
estimate above is EXACT — the small-range regime needs no correction
table (contrast hll.py's linear counting).

Scale shape (10^5 hosts x 10^9 shingles): one explode + distinct +
windowed top-k to build sketches (the only corpus-sized pass), then
every pair stage runs on <= hosts*k rows; candidate pairs come from a
sketch-row self-join on h, so hosts sharing NOTHING never form a pair
(omitted pairs estimate 0 — callers wanting zeros outer-join the host
list). A hash shared by H hosts fans out H^2 candidate rows — the
hot-key cap of mirrors.py applies if a boilerplate shingle saturates;
sketch keys are md5 draws, so only a genuinely corpus-wide key (k-min
of every host) can go hot.

No reference counterpart (/root/reference empty, SURVEY §0); semantics
pinned by tests/test_kmv.py's independent hashlib/heapq
reimplementation and the kmv_host_distinct / kmv_host_overlap DuckDB
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000
SPACE = 1 << 60  # h60 hash space size


def _h60(key_col) -> F.Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv#"), key_col)
                          .cast("binary")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(
    keys: DataFrame, group_col: str = "grp", key_col: str = "key",
    k: int = 32,
) -> DataFrame:
    """(grp, h): each group's k smallest distinct 60-bit draws — the
    mergeable sketch table. One distinct + one windowed top-k (both
    map-side-combinable; rank<=k becomes WindowGroupLimit)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    hashed = keys.select(
        F.col(group_col).alias("grp"), _h60(F.col(key_col)).alias("h")
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", "h")
    )


def kmv_estimate(sketch: DataFrame, k: int = 32) -> DataFrame:
    """(grp, sketch_size, distinct_est) from a sketch table: exact
    when the sketch is the whole set, (k-1)*2^60 div h_(k) otherwise."""
    return (
        sketch.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("sketch_size"),
             F.max("h").alias("kth"))
        .selectExpr(
            "grp", "CAST(sketch_size AS BIGINT) AS sketch_size",
            f"CAST(CASE WHEN sketch_size < {k} THEN sketch_size"
            f" ELSE (CAST({k - 1} AS DECIMAL(38,0))"
            f" * {SPACE}) DIV greatest(kth, 1) END AS BIGINT)"
            f" AS distinct_est",
        )
    )


def kmv_overlap_pairs(sketch: DataFrame, k: int = 32) -> DataFrame:
    """(grp_a, grp_b, matches, union_k, jaccard_est_ppm, union_est,
    inter_est): sketch-vs-sketch overlap for every group pair sharing
    at least one sketch hash (disjoint-sketch pairs estimate 0 and are
    omitted). Exact when both sets are smaller than k.

    All stages run on sketch rows (<= groups*k): candidate self-join
    on h, per-pair merge, one window for the k-smallest-of-union cut,
    one groupBy for the estimates."""
    s = sketch.select("grp", "h")
    cand = (
        s.alias("a").join(s.alias("b"), "h")
        .filter(F.col("a.grp") < F.col("b.grp"))
        .select(F.col("a.grp").alias("grp_a"),
                F.col("b.grp").alias("grp_b"))
        .distinct()
    )
    sa = s.select(F.col("grp").alias("grp_a"), "h",
                  F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    sb = s.select(F.col("grp").alias("grp_b"), "h",
                  F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        cand.join(sa, "grp_a")
        .unionByName(cand.join(sb, "grp_b"))
        .groupBy("grp_a", "grp_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("grp_a", "grp_b").orderBy("h")
    top = merged.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k)
    return (
        top.groupBy("grp_a", "grp_b")
        .agg(
            F.sum(F.col("in_a") * F.col("in_b")).alias("matches"),
            F.count(F.lit(1)).alias("union_k"),
            F.max("h").alias("kth"),
        )
        .selectExpr(
            "grp_a", "grp_b",
            "CAST(matches AS BIGINT) AS matches",
            "CAST(union_k AS BIGINT) AS union_k",
            f"CAST((matches * CAST({MICRO} AS BIGINT)) DIV union_k"
            f" AS BIGINT) AS jaccard_est_ppm",
            f"CAST(CASE WHEN union_k < {k} THEN union_k"
            f" ELSE (CAST({k - 1} AS DECIMAL(38,0)) * {SPACE})"
            f" DIV greatest(kth, 1) END AS BIGINT) AS union_est",
        )
        .withColumn(
            # DECIMAL(38,0) before the multiply: ppm * a 2^60-scale
            # estimate overflows int64 (the ADVICE-r01 widen-first rule)
            "inter_est",
            F.expr(f"(CAST(jaccard_est_ppm AS DECIMAL(38,0))"
                   f" * union_est) DIV {MICRO}").cast("long"),
        )
    )
