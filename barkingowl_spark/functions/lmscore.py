"""Unigram-LM surprisal scoring + perplexity bucketing (CCNet-style).

Wenzek et al. 2020 ("CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") partitions a crawled corpus into
head/middle/tail quality tiers by language-model perplexity; the same
gate (with bigger LMs) underlies most published webtext pipelines.
This module is that gate re-expressed relationally with a unigram LM
and INTEGER log2 arithmetic so the score is bit-identical across
engines and cluster sizes (the repo-wide no-floats discipline):

  surprisal_bits(token) = floor(log2(total / count(token)))
                        = length(bin(total DIV count)) - 1

(`floor(log2(a/b)) == floor(log2(a DIV b))` exactly, because no power
of two lies strictly between `a DIV b` and `a/b`; `bin()` has identical
no-leading-zeros semantics in Spark and DuckDB.)

Pipeline shape at the 10^10-doc design point:
  * unigram_lm: one explode + map-side-combined groupBy on token — the
    only corpus-wide shuffle; `min_count` prunes the junk-token tail so
    the model is broadcastable (CCNet ships its SentencePiece+KenLM
    model to every worker the same way).
  * surprisal_scores: exploded tokens LEFT-join the broadcast model;
    out-of-vocabulary tokens get the ceiling `floor(log2(total)) + 1`
    ("rarer than anything retained"). Per-doc rollup is one groupBy on
    doc_id.
  * perplexity_buckets: CCNet's head/middle/tail WITHOUT a global sort:
    the score distribution is grouped by VALUE (mean surprisal in
    centibits is bounded, so the distribution table is tiny), a running
    count over that tiny table yields each value's rank, and
    bucket = 1 + floor(rank_below * n / N) maps back via broadcast
    join. Ties share a bucket (threshold-on-value, exactly CCNet's
    cutoff semantics); no single-partition ntile window ever sees the
    corpus-sized side.

Reference: BarkingOwl archives page text (SURVEY.md §2 O27); this is
the corpus-quality tiering a training-data consumer applies to that
archive. Tokenization contract shared with functions/textstats.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _tokens_exploded(documents: DataFrame) -> DataFrame:
    """(doc_id, token) with multiplicity — frequency matters for LM
    counts, unlike the dedup shingle paths."""
    return documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")


def unigram_lm(documents: DataFrame, min_count: int = 1) -> DataFrame:
    """(token, cnt): corpus unigram counts, pruned to cnt >= min_count.
    One map-side-combined shuffle; prune before broadcast."""
    return (
        _tokens_exploded(documents)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def _floor_log2(col: F.Column) -> F.Column:
    """floor(log2(x)) for x >= 1, pure integer: bin() emits no leading
    zeros in Spark or DuckDB."""
    return (F.length(F.bin(col)) - 1).cast("int")


def surprisal_scores(
    documents: DataFrame,
    lm: DataFrame | None = None,
    total: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, sum_bits, mean_surprisal_cb): per-doc total
    and mean (centibits, floor) unigram surprisal. `lm` defaults to a
    model trained on `documents` itself (then no token is OOV); pass a
    pruned external model + its `total` token count to score a corpus
    against a reference LM (the CCNet setup). OOV surprisal is
    floor(log2(total)) + 1."""
    if lm is None:
        lm = unigram_lm(documents)
    if total is None:
        totals = lm.agg(F.sum("cnt").alias("lm_total"))
    else:
        totals = None
    toks = _tokens_exploded(documents)
    scored = toks.join(broadcast(lm), "token", "left")
    if totals is not None:
        scored = scored.crossJoin(broadcast(totals))
    else:
        scored = scored.withColumn("lm_total", F.lit(int(total)))
    oov = _floor_log2(F.col("lm_total")) + F.lit(1)
    bits = F.when(
        F.col("cnt").isNotNull(),
        _floor_log2(F.expr("lm_total DIV cnt")),
    ).otherwise(oov)
    return (
        scored.withColumn("bits", bits)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("bits").alias("sum_bits"),
        )
        .withColumn(
            "mean_surprisal_cb",
            F.expr("CAST((sum_bits * 100) DIV n_tokens AS BIGINT)"),
        )
    )


def importance_weights(
    documents: DataFrame,
    target_lm: DataFrame,
    target_total: int | None = None,
    raw_lm: DataFrame | None = None,
    raw_total: int | None = None,
    max_shift: int = 20,
) -> DataFrame:
    """(doc_id, delta_bits, keep_ppm): DSIR importance weights (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling") with both LMs unigram and all math integer:

      log2 w(doc) = log2(p_target/p_raw) = sum_bits_raw - sum_bits_tgt
      keep_ppm    = min(1e6, 2^delta_bits * 1e6)
                  = 1e6 >> (-delta_bits) when delta < 0 (0 beyond
                    max_shift — the weight underflowed ppm resolution)

    `target_lm` is the reference-domain model (counts of the corpus you
    want more of — DSIR's hashed-ngram feature space collapses to the
    token itself here; plug hash_features-style buckets in for the full
    fidelity); `raw_lm` defaults to self-training on `documents`.
    Tokens missing from a model take that model's OOV ceiling. Two
    broadcast-scored passes + one doc_id join — no new shuffle class."""
    s_raw = surprisal_scores(documents, lm=raw_lm, total=raw_total)
    s_tgt = surprisal_scores(documents, lm=target_lm, total=target_total)
    return (
        s_raw.select("doc_id", F.col("sum_bits").alias("_raw"))
        .join(
            s_tgt.select("doc_id", F.col("sum_bits").alias("_tgt")),
            "doc_id",
        )
        .select(
            "doc_id",
            (F.col("_raw") - F.col("_tgt")).alias("delta_bits"),
        )
        .withColumn(
            "keep_ppm",
            F.expr(
                f"CAST(CASE WHEN delta_bits >= 0 THEN 1000000"
                f" WHEN delta_bits <= -{int(max_shift)} THEN 0"
                f" ELSE 1000000 DIV shiftleft(CAST(1 AS BIGINT),"
                f"      CAST(-delta_bits AS INT)) END AS BIGINT)"
            ),
        )
    )


def dsir_sample(
    documents: DataFrame,
    target_lm: DataFrame,
    target_total: int | None = None,
    raw_lm: DataFrame | None = None,
    raw_total: int | None = None,
    max_shift: int = 20,
) -> DataFrame:
    """(doc_id, delta_bits, keep_ppm, u_ppm, keep): DSIR's sample step —
    the deterministic md5 draw (same convention as operators/mix.py)
    against the importance weight. Expected kept mass per doc equals
    its normalized-capped importance; reruns are bit-identical."""
    w = importance_weights(
        documents, target_lm, target_total=target_total,
        raw_lm=raw_lm, raw_total=raw_total, max_shift=max_shift,
    )
    key = F.concat(F.lit("dsir#"), F.col("doc_id").cast("string"))
    u = (
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 15), 16, 10)
        .cast("long") % F.lit(1_000_000)
    )
    return (
        w.withColumn("u_ppm", u)
        .withColumn("keep", F.col("u_ppm") < F.col("keep_ppm"))
    )


def perplexity_buckets(
    documents: DataFrame,
    n_buckets: int = 3,
    lm: DataFrame | None = None,
    total: int | None = None,
) -> DataFrame:
    """(doc_id, mean_surprisal_cb, bucket): CCNet head/middle/tail.
    bucket = 1 + floor(docs_with_strictly_lower_score * n / N) — rank
    thresholds on the VALUE distribution (tiny table: centibit scores
    are bounded), so equal scores always share a bucket and the corpus
    side never enters a global sort. bucket 1 = lowest surprisal =
    CCNet's 'head'."""
    s = surprisal_scores(documents, lm=lm, total=total)
    dist = s.groupBy("mean_surprisal_cb").agg(
        F.count(F.lit(1)).alias("_nv")
    )
    # bounded-global-window: distinct CENTIBIT scores (an integer
    # value domain, not the corpus) — runtime-asserted
    from pyspark.sql import Window

    from barkingowl_spark.operators.ranking import assert_max_rows

    dist = assert_max_rows(dist, 1_000_000, "lmscore.score_distinct")
    # bounded-global-window: runtime-asserted just above
    w = (
        Window.orderBy("mean_surprisal_cb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # bounded-global-window: same guarded distinct-score frame
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dist = dist.select(
        "mean_surprisal_cb",
        F.coalesce(F.sum("_nv").over(w), F.lit(0)).alias("_below"),
        F.sum("_nv").over(wall).alias("_n"),
    ).withColumn(
        "bucket",
        F.expr(f"CAST(1 + (_below * {int(n_buckets)}) DIV _n AS INT)"),
    )
    return s.join(
        broadcast(dist.select("mean_surprisal_cb", "bucket")),
        "mean_surprisal_cb",
    ).select("doc_id", "mean_surprisal_cb", "bucket")


def bigram_pairs(documents: DataFrame) -> DataFrame:
    """(doc_id, w1, w2): adjacent token pairs, derived MAP-SIDE from
    the per-doc token array (transform over an index sequence — no
    window, no per-doc sort, no shuffle). Docs with < 2 tokens
    contribute nothing."""
    w = documents.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("w"),
    ).filter(F.size("w") >= 2)
    return w.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2),"
                " j -> struct(w[j] AS w1, w[j + 1] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")


def bigram_lm(documents: DataFrame, min_count: int = 1) -> DataFrame:
    """(w1, w2, cnt): corpus bigram counts, pruned to cnt >= min_count.
    The training half of the CCNet gate that `surprisal_scores` only
    consumes: the model is TRAINED in-engine with the same one
    map-side-combined shuffle shape as `unigram_lm` (key = the pair).
    Prune before persisting/broadcasting — Zipf makes the cnt >= 2
    table a small fraction of the distinct-pair space."""
    return (
        bigram_pairs(documents)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def bigram_surprisal(
    documents: DataFrame,
    lm: DataFrame | None = None,
    vocab: int | None = None,
) -> DataFrame:
    """(doc_id, n_bigrams, sum_bits, mean_surprisal_cb): per-doc
    add-one-smoothed bigram surprisal, integer log2 throughout:

      bits(w1 -> w2) = floor(log2( (c(w1·) + V) / (c(w1,w2) + 1) ))
                     = length(bin((ctx + V) DIV (cnt + 1))) - 1

    with c(w1·) the context count (sum of the model row counts for
    w1) and V the vocabulary size. ctx + V >= cnt + V >= cnt + 1, so
    the ratio is >= 1 and the DIV/log2 floor identity holds. The SAME
    formula covers out-of-model transitions when an external `lm` is
    passed (coalesce counts to 0): unseen pair in a seen context pays
    floor(log2(ctx + V)); an unseen context degrades to the uniform
    floor(log2(V)) — exactly add-one semantics, no special cases.

    Scale shape: the pruned model and its w1-rollup are both broadcast
    sides; the corpus-sized pair stream is scored in two map-side
    (broadcast) left joins + one doc_id rollup — no new shuffle class.
    `lm` defaults to self-training
    on `documents` (then every pair is in-model). Docs with < 2 tokens
    have no transitions and are absent (no 0/0 mean)."""
    if lm is None:
        lm = bigram_lm(documents)
    ctx = lm.groupBy("w1").agg(F.sum("cnt").alias("ctx_cnt"))
    if vocab is None:
        vtab = (
            documents.select(
                F.explode(F.split("text", " ")).alias("t")
            )
            .filter(F.col("t") != "")
            .agg(F.count_distinct("t").cast("long").alias("vocab"))
        )
    else:
        vtab = None
    scored = (
        bigram_pairs(documents)
        .join(broadcast(lm), ["w1", "w2"], "left")
        .join(broadcast(ctx), ["w1"], "left")
    )
    if vtab is not None:
        scored = scored.crossJoin(broadcast(vtab))
    else:
        scored = scored.withColumn("vocab", F.lit(int(vocab)))
    bits = _floor_log2(
        F.expr(
            "(coalesce(ctx_cnt, 0L) + vocab) DIV (coalesce(cnt, 0L) + 1)"
        )
    )
    return (
        scored.withColumn("bits", bits)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("bits").cast("long").alias("sum_bits"),
        )
        .withColumn(
            "mean_surprisal_cb",
            F.expr("CAST((sum_bits * 100) DIV n_bigrams AS BIGINT)"),
        )
    )


def collocations(
    documents: DataFrame, min_count: int = 5, k: int = 100
) -> DataFrame:
    """(w1, w2, cnt, lift_ppm): the corpus's top-k collocations —
    adjacent pairs occurring far more often than their parts predict
    (Church & Hanks, "Word Association Norms, Mutual Information, and
    Lexicography", Computational Linguistics 1990). The ranking score
    is the integer LIFT

        lift_ppm = (c_ab * N * 1e6) DIV (c_a1 * c_b2)

    — exp(PMI) in ppm (c_a1/c_b2 = positional unigram counts over the
    bigram stream, N = total bigrams), monotone in PMI and exact in
    DECIMAL(38,0), so the ranking is engine-portable where a float
    log2 would drift. min_count guards the classic PMI
    rare-pair blowup; ties break (w1, w2) ascending.

    Scale shape: ONE map-side bigram explode feeds three
    map-side-combined counts (pair, first-position, second-position);
    the scoring joins touch only the cnt>=min_count pair table
    (Zipf-small), N rides a 1-row broadcast, and the top-k is
    TakeOrderedAndProject — never a global sort."""
    if min_count < 1 or k < 1:
        raise ValueError("min_count and k must be >= 1")
    pairs = bigram_pairs(documents)
    total = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    c1 = pairs.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("c1"))
    c2 = pairs.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("c2"))
    cab = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    from pyspark.sql.functions import broadcast

    scored = (
        cab.join(c1, "w1").join(c2, "w2")
        .crossJoin(broadcast(total))
        .selectExpr(
            "w1", "w2", "cnt",
            "CAST((CAST(cnt AS DECIMAL(38,0)) * n_tot * 1000000)"
            " DIV (CAST(c1 AS DECIMAL(38,0)) * c2) AS BIGINT)"
            " AS lift_ppm",
        )
    )
    return (
        scored.orderBy(F.desc("lift_ppm"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def kneser_ney_bigram(documents: DataFrame, min_count: int = 1) -> DataFrame:
    """(w1, w2, c_uw, c_u, n1_fwd, n1_back, pkn_ppm): interpolated
    Kneser-Ney bigram probabilities (Kneser & Ney ICASSP'95; Chen &
    Goodman 1998 eq. 4.26) with absolute discount D = 3/4, in integer
    ppm fixed point. The add-one model (bigram_surprisal) over-smooths
    exactly where web text is burstiest; KN's continuation
    distribution ("how many contexts does w complete?") is the
    standard fix and every count it needs is relational:

        P_KN(w|u) = max(c(u,w) - D, 0)/c(u)
                    + D * N1+(u,*)/c(u) * N1+(*,w)/N_bi

    With D = 3/4 both addends clear their denominators in integers:

        pkn_ppm = (4*c(u,w) - 3) * 1e6 DIV (4*c(u))
                  + 3 * N1+(u,*) * N1+(*,w) * 1e6
                      DIV (4 * c(u) * N_bi)

    (two floors, mirrored exactly in the oracle; c(u,w) >= 1 keeps
    the first numerator positive). Scale shape: bigram counts are one
    map-side-combined shuffle; the context rollup (c_u, N1+(u,*))
    re-uses the SAME w1 keying (shuffle-hash join, no broadcast of a
    vocab-sized dim); the continuation rollup joins on w2; N_bi is a
    1-row broadcast. Products ride DECIMAL(38,0): at 1e8-type
    vocabularies 3 * N1fwd * N1back * 1e6 ~ 3e28 and the denominator
    4 * c_u * N_bi ~ 4e20 both fit."""
    bi = bigram_lm(documents, min_count=1)
    ctx = bi.groupBy("w1").agg(
        F.sum("cnt").cast("long").alias("c_u"),
        F.count(F.lit(1)).cast("long").alias("n1_fwd"),
    )
    cont = bi.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1_back"))
    nbi = bi.agg(F.count(F.lit(1)).cast("long").alias("n_bi"))
    return (
        bi.filter(F.col("cnt") >= min_count)
        .withColumnRenamed("cnt", "c_uw")
        .join(ctx.hint("shuffle_hash"), "w1")
        .join(cont.hint("shuffle_hash"), "w2")
        .crossJoin(broadcast(nbi))
        .select(
            "w1", "w2", "c_uw", "c_u", "n1_fwd", "n1_back",
            F.expr(
                "CAST((4 * c_uw - 3) * CAST(1000000 AS DECIMAL(38,0))"
                " DIV (4 * c_u)"
                " + CAST(3 AS DECIMAL(38,0)) * n1_fwd * n1_back"
                "   * 1000000"
                "   DIV (CAST(4 AS DECIMAL(38,0)) * c_u * n_bi)"
                " AS BIGINT)").alias("pkn_ppm"),
        )
    )


def source_divergence(documents: DataFrame) -> DataFrame:
    """(source, n_tokens, n_types, kl_hb): per-source KL divergence
    of the source's unigram token distribution from the whole-corpus
    distribution, in signed HALF-BITS (floor) — the domain-drift
    number a mixer reads next to mix_temperature: a source whose
    language matches the corpus scores ~0; jargon/spam/off-language
    sources score high.

        KL(P_s || Q) = sum_t p_t * log2(p_t / q_t),
        p_t = c_st / n_s,  q_t = c_t / N

    Per-term weight in half-bits via the squared-DECIMAL bitlen
    identity on r = (c_st * N) / (n_s * c_t), sign-split because r
    crosses 1: w = hb(r) for r >= 1, else -hb(1/r) (hb(x) =
    bitlen(floor(x^2)) - 1 = floor(2*log2 x); the negative branch is
    -floor rather than ceil — documented, mirrored in the oracle).
    True KL is >= 0 but the floors can push a near-uniform source a
    half-bit negative, so the final division is sign-split like
    kappa's. int64/DECIMAL envelope: num^2 = (c_st * N)^2 must fit
    DECIMAL(38,0) — fine to N ~ 1e9 tokens per the qpp idf note;
    shard the rollup beyond that.

    Scale shape: one (source, token) map-side-combined shuffle, one
    token-keyed shuffle-hash join against the token totals (both
    sides token-keyed — no vocab-sized broadcast), a broadcast of the
    |sources|-row totals dim, one source rollup."""
    tok = documents.select(
        "source", F.explode(F.split("text", " ")).alias("t")
    ).filter(F.col("t") != "")
    st = tok.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("long").alias("c_st"))
    ct = tok.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("c_t"))
    ns = st.groupBy("source").agg(
        F.sum("c_st").cast("long").alias("n_s"),
        F.count(F.lit(1)).cast("long").alias("n_types"))
    ntot = ct.agg(F.sum("c_t").cast("long").alias("n_tot"))
    w = (
        st.join(ct.hint("shuffle_hash"), "t")
        .join(broadcast(ns), "source")
        .crossJoin(broadcast(ntot))
        .withColumn(
            "_w_hb",
            F.expr(
                "CASE WHEN CAST(c_st AS DECIMAL(38,0)) * n_tot"
                " >= CAST(n_s AS DECIMAL(38,0)) * c_t THEN"
                " length(bin(CAST("
                " (CAST(c_st AS DECIMAL(38,0)) * n_tot)"
                " * (CAST(c_st AS DECIMAL(38,0)) * n_tot)"
                " DIV ((CAST(n_s AS DECIMAL(38,0)) * c_t)"
                "      * (CAST(n_s AS DECIMAL(38,0)) * c_t))"
                " AS BIGINT))) - 1"
                " ELSE -(length(bin(CAST("
                " (CAST(n_s AS DECIMAL(38,0)) * c_t)"
                " * (CAST(n_s AS DECIMAL(38,0)) * c_t)"
                " DIV ((CAST(c_st AS DECIMAL(38,0)) * n_tot)"
                "      * (CAST(c_st AS DECIMAL(38,0)) * n_tot))"
                " AS BIGINT))) - 1) END"),
        )
    )
    return (
        w.groupBy("source", "n_s", "n_types")
        .agg(F.sum(F.expr("c_st * _w_hb")).cast("long").alias("_num"))
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            "n_types",
            F.expr(
                "CASE WHEN _num >= 0 THEN CAST(_num DIV n_s AS BIGINT)"
                " ELSE -CAST((-_num) DIV n_s AS BIGINT) END"
            ).alias("kl_hb"),
        )
    )
