"""Inverted-index construction + per-doc salient terms (tf-idf order).

A training-data pipeline over webtext wants both directions of the
term-document matrix:

  * postings(term -> docs): the search-index build — used here for
    corpus introspection (which documents carry a contamination term,
    which hosts own a keyword) without rescanning text;
  * topk_terms(doc -> terms): per-document salient terms under a
    tf/df score — a cheap relevance/topic feature and the usual input
    to keyword-based mix balancing.

Everything is native column expressions over one tokenize+explode pass:
no UDFs, integer-only scoring (ppm fixed point, floor division) so the
DuckDB oracle value-hash-matches bit-for-bit.

Scale notes (the 10^10 design point):
  * the explode output is (doc_id, term) — shuffled once on term for
    the index and once on doc_id for the per-doc ranking; both keys are
    content-derived and uniform except stopword terms, whose heat is
    absorbed map-side (partial count/sum) before the shuffle.
  * postings lists are CAPPED via a row_number window *before* any
    collect_list, so no executor ever materializes an unbounded list —
    the stopword row carries a count and a truncated exemplar list,
    exactly what an index shard header needs (full postings for hot
    terms belong in a bucketed layout, not one array cell).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def term_freqs(documents: DataFrame) -> DataFrame:
    """(doc_id, term, tf): whitespace tokenization, empty terms dropped,
    NULL text yields no rows (explode of NULL array)."""
    toks = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def postings(documents: DataFrame, max_postings: int = 8) -> DataFrame:
    """(term, doc_freq, total_tf, postings): doc_freq/total_tf are over
    ALL occurrences; postings is the first `max_postings` doc_ids
    ascending, comma-joined (the bounded exemplar list)."""
    tf = term_freqs(documents)
    w = Window.partitionBy("term").orderBy("doc_id")
    ranked = tf.withColumn("rn", F.row_number().over(w))
    # collect_list skips NULLs -> only the first max_postings doc ids
    # ever enter the list; the count/sum still cover every row.
    capped = F.when(F.col("rn") <= max_postings, F.col("doc_id"))
    return ranked.groupBy("term").agg(
        F.count("*").alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(capped)),
                lambda x: x.cast("string"),
            ),
        ).alias("postings"),
    )


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1_ppm: int = 1_200_000,
    b_ppm: int = 750_000,
) -> DataFrame:
    """(doc_id, n_terms, score_fp): top-k documents for a bag-of-terms
    query under BM25 (Robertson & Zaragoza 2009), every quantity in
    integer fixed point so ranking is bit-identical across engines:

      idf_hb  = floor(2 * log2((2N - 2df + 1) / (2df + 1)))   [half-bits,
                clamped at 0 — the +-0.5 survives via the doubled form;
                floor(2*log2(a/b)) == bitlen(a^2 DIV b^2) - 1 exactly,
                squared in DECIMAL(38,0) so N up to ~2^31 is safe]
      norm_ppm = (1e6 - b) + b * dl * N DIV total_len          [b, ppm]
      sat_ppm  = tf*(k1 + 1e6)*1e6 DIV (tf*1e6 + k1*norm_ppm DIV 1e6)
      score_fp = sum over query terms of idf_hb * sat_ppm

    Plan shape: term_freqs is the one corpus-wide shuffle (shared with
    the index build); df is computed from the query-filtered slice and
    broadcast (O(|Q|) rows); corpus stats are a 1-row cross join; the
    final top-k is TakeOrderedAndProject, never a global sort. A
    deployed search tier would read tf/df/dl from the prebuilt
    postings()/doc-length tables instead of re-tokenizing — the scoring
    algebra is identical."""
    tf = term_freqs(documents)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    return bm25_from_index(
        tf, dl, stats, query_terms, k=k, k1_ppm=k1_ppm, b_ppm=b_ppm
    )


def bm25_from_index(
    tf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1_ppm: int = 1_200_000,
    b_ppm: int = 750_000,
) -> DataFrame:
    """BM25 top-k from PREBUILT index tables — the deployed search
    path (jobs/build_index.py exports them once; queries never
    re-tokenize the corpus): tf = (doc_id, term, tf), dl = (doc_id,
    dl), stats = 1 row (n_docs, total_len). Identical scoring algebra
    and plan shape to bm25_topk; the term filter prunes the tf scan
    (partition/bucket the export by term at scale and the filter
    becomes partition pruning)."""
    tfq = tf.filter(F.col("term").isin(list(query_terms)))
    df_t = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tfq.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("_num", F.expr("2 * n_docs - 2 * df + 1"))
        .withColumn("_den", F.expr("2 * df + 1"))
        .withColumn(
            "idf_hb",
            F.expr(
                "CASE WHEN _num < _den THEN 0 ELSE "
                "length(bin(CAST((CAST(_num AS DECIMAL(38,0)) * _num)"
                " DIV (CAST(_den AS DECIMAL(38,0)) * _den)"
                " AS BIGINT))) - 1 END"
            ),
        )
        .withColumn(
            "norm_ppm",
            F.expr(
                f"CAST((1000000 - {int(b_ppm)})"
                f" + (CAST({int(b_ppm)} AS DECIMAL(38,0)) * dl * n_docs)"
                f" DIV total_len AS BIGINT)"
            ),
        )
        .withColumn(
            "sat_ppm",
            F.expr(
                f"CAST((CAST(tf AS DECIMAL(38,0))"
                f" * ({int(k1_ppm)} + 1000000) * 1000000)"
                f" DIV (tf * 1000000"
                f" + ({int(k1_ppm)} * norm_ppm) DIV 1000000)"
                f" AS BIGINT)"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(F.expr("idf_hb * sat_ppm")).alias("score_fp"),
        )
        .orderBy(F.col("score_fp").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def topk_terms(documents: DataFrame, k: int = 5) -> DataFrame:
    """(doc_id, term, tf, doc_freq, score_fp, rank): top-k terms per doc
    by score_fp = tf * 1e6 // doc_freq (integer tf-idf surrogate —
    monotone in tf, inverse in df; floor div keeps it bit-portable),
    ties broken by term ascending."""
    tf = term_freqs(documents)
    df_counts = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    scored = tf.join(df_counts, "term").withColumn(
        "score_fp",
        F.expr(f"CAST((tf * {PPM}) DIV doc_freq AS BIGINT)"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_fp").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "doc_freq", "score_fp", "rank")
    )


def positional_postings(documents: DataFrame) -> DataFrame:
    """(term, doc_id, pos): the positional index in its relational
    (exploded) layout — pos is the 0-based offset in the doc's
    empty-token-filtered whitespace token sequence (so adjacent rows
    are adjacent words, the invariant phrase search needs).

    Scale shape: one map-side posexplode; persisted index shards should
    be written bucketed/sorted by term so a phrase query's per-term
    filters become partition-pruned scans (jobs/build_index.py layout
    convention). No shuffle here — downstream consumers pick the key.
    """
    w = documents.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("w"),
    )
    return w.select(
        "doc_id", F.posexplode("w").alias("pos", "term")
    ).select("term", "doc_id", F.col("pos").cast("long").alias("pos"))


def phrase_match(postings: DataFrame, phrase: str) -> DataFrame:
    """(doc_id, n_hits, first_pos): exact-phrase retrieval by
    positional-list intersection over a `positional_postings` table —
    the classic search-engine phrase plan (term-at-a-time merge):

      docs with phrase t0..tk-1 = rows of t0 at pos p such that
      (t_i, doc, p + i) exists for every i.

    Each phrase term contributes ONE filtered slice of the index
    (predicate pushes to the scan; with a term-bucketed layout only k
    buckets are read — the corpus itself is never touched), and the
    k-1 equi-joins are on (doc_id, pos), a uniform content-derived
    key. Join order: ascending selectivity doesn't matter at k<=5;
    AQE re-plans if a term is a stopword. Rows: n_hits counts
    overlapping occurrences too (positions are exact)."""
    terms = [t for t in phrase.split(" ") if t != ""]
    if not terms:
        raise ValueError("empty phrase")
    base = (
        postings.filter(F.col("term") == terms[0])
        .select("doc_id", "pos")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = postings.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - F.lit(i)).alias("pos")
        )
        base = base.join(nxt, ["doc_id", "pos"])
    return base.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.min("pos").cast("long").alias("first_pos"),
    )


def upsert_term_freqs(
    base_tf: DataFrame, delta_tf: DataFrame
) -> DataFrame:
    """(doc_id, term, tf): the index's source-of-truth table after a
    re-crawl batch — delta docs REPLACE their base rows entirely
    (last-write-wins per doc_id; a re-parsed page's old term rows must
    not survive). One anti-join on doc_id + a union: O(base) read but
    only the delta shuffles (the anti-join's build side is the delta's
    distinct doc set)."""
    upd = delta_tf.select("doc_id").distinct()
    return delta_tf.unionByName(
        base_tf.join(upd, "doc_id", "left_anti")
    )


def merge_doc_freqs(
    base_df: DataFrame, base_tf: DataFrame, delta_tf: DataFrame
) -> DataFrame:
    """(term, doc_freq): document frequencies of the POST-upsert corpus
    computed incrementally — only the re-crawled docs' old and new term
    sets are touched, never the full corpus:

        df'(t) = df(t) + |delta docs newly containing t|
                       - |delta docs that contained t and no longer do|

    so a 10^10-doc index absorbs a million-doc re-crawl with
    O(delta)-sized joins (the base side contributes one semi-join probe
    and the final term-keyed merge of the tiny Δdf table). Terms whose
    df' reaches 0 drop out (the last doc carrying them was re-crawled
    away). Equals a from-scratch recount by construction — pinned by
    the driver oracle, which recomputes on the merged corpus."""
    upd = delta_tf.select("doc_id").distinct()
    old_terms = (
        base_tf.join(upd, "doc_id", "left_semi")
        .select("doc_id", "term").distinct()
    )
    new_terms = delta_tf.select("doc_id", "term").distinct()
    added = (
        new_terms.join(old_terms, ["doc_id", "term"], "left_anti")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("_add"))
    )
    removed = (
        old_terms.join(new_terms, ["doc_id", "term"], "left_anti")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("_rm"))
    )
    delta = added.join(removed, "term", "full_outer").select(
        "term",
        (F.coalesce("_add", F.lit(0)) - F.coalesce("_rm", F.lit(0)))
        .alias("_d"),
    )
    return (
        base_df.join(delta, "term", "full_outer")
        .select(
            "term",
            (F.coalesce("doc_freq", F.lit(0))
             + F.coalesce("_d", F.lit(0)))
            .cast("long").alias("doc_freq"),
        )
        .filter(F.col("doc_freq") > 0)
    )


def best_snippet(
    postings: DataFrame, query_terms: list[str], window: int = 8
) -> DataFrame:
    """(doc_id, snippet_start, hits): per matching doc, the start
    position of the `window`-token span containing the most query-term
    hits (occurrences, not distinct terms), ties to the earliest
    start — the search-result snippet selector, computed entirely on
    the positional index (the corpus text is never rescanned; the
    caller slices tokens [start, start+window) for display).

    Plan: filter the index to the query terms (pushed-down scan, k
    bucket reads under the build_index.py layout), ONE doc-keyed
    RANGE-frame window counts hits in [pos, pos+window), and the
    winner is a plain max over hits*2^40 + (2^40-1-pos) — the packed
    argmax (operators/focused.py discipline), valid while docs stay
    under 2^40 tokens."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if window < 1:
        raise ValueError("window must be >= 1")
    big = 1 << 40
    hits = postings.filter(
        F.col("term").isin(list(query_terms))).select("doc_id", "pos")
    w = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rangeBetween(0, window - 1)
    )
    scored = hits.withColumn(
        "h", F.count(F.lit(1)).over(w).cast("long"))
    return (
        scored.groupBy("doc_id")
        .agg(F.max(F.col("h") * big + (F.lit(big - 1) - F.col("pos")))
             .alias("pack"))
        .selectExpr(
            "doc_id",
            f"CAST({big - 1} - pack % {big} AS BIGINT)"
            f" AS snippet_start",
            f"CAST(pack div {big} AS BIGINT) AS hits",
        )
    )


def bm25f_topk(
    field_tf: DataFrame,
    field_params: dict[str, tuple[int, int]],
    query_terms: list[str],
    k: int = 10,
    k1_ppm: int = 1_200_000,
) -> DataFrame:
    """(doc_id, n_terms, score_fp): top-k under BM25F (Robertson,
    Zaragoza, Taylor CIKM'04 "Simple BM25 extension to multiple
    weighted fields") over a fielded index
    field_tf = (doc_id, field, term, tf).

    field_params maps field -> (weight, b_ppm). Per field the length
    norm is the BM25 one (avg length over docs HAVING the field):

      norm_ppm(d,f)  = (1e6 - b_f) + b_f * dl_f * n_f DIV total_f

    and per (doc, term) the field-weighted pseudo-frequency is

      tfn_ppm(d,t)   = sum_f  w_f * tf_f * 1e12 DIV norm_ppm(d,f)

    saturated ONCE (the whole point of BM25F — per-field saturation
    would let one spammy field dominate):

      sat_ppm        = tfn_ppm * 1e6 DIV (tfn_ppm + k1)
      score_fp       = sum_t idf_hb(t) * sat_ppm

    idf is the half-bit integer idf shared with bm25_topk; df(t) counts
    docs containing t in ANY field, N counts docs having any field. All
    floor-division fixed point, DuckDB-reproducible.

    Plan shape: two broadcast dims (per-field stats: |fields| rows;
    per-term df: |Q| rows), one doc-keyed join of the query-pruned tf
    slice against the (doc, field) norms, one doc-keyed rollup, top-k
    via TakeOrderedAndProject. At scale the fielded index is bucketed
    by term, so the isin() prune becomes partition pruning exactly as
    in bm25_from_index."""
    rows = [(f, int(w), int(b)) for f, (w, b) in sorted(field_params.items())]
    params = field_tf.sparkSession.createDataFrame(
        rows, "field string, w long, b_ppm long")
    dlf = field_tf.groupBy("doc_id", "field").agg(
        F.sum("tf").cast("long").alias("dl"))
    fstats = dlf.groupBy("field").agg(
        F.count(F.lit(1)).cast("long").alias("n_f"),
        F.sum("dl").cast("long").alias("total_f"))
    norms = (
        dlf.join(F.broadcast(fstats), "field")
        .join(F.broadcast(params), "field")
        .selectExpr(
            "doc_id", "field",
            "CAST((1000000 - b_ppm)"
            " + (CAST(b_ppm AS DECIMAL(38,0)) * dl * n_f)"
            " DIV total_f AS BIGINT) AS norm_ppm",
            "w")
    )
    tfq = field_tf.filter(F.col("term").isin(list(query_terms)))
    df_t = (
        tfq.select("term", "doc_id").distinct()
        .groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    n_docs = field_tf.select("doc_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))
    tfn = (
        tfq.join(norms, ["doc_id", "field"])
        .groupBy("doc_id", "term")
        .agg(F.sum(F.expr(
            "CAST((CAST(w AS DECIMAL(38,0)) * tf * 1000000 * 1000000)"
            " DIV norm_ppm AS BIGINT)")).alias("tfn_ppm"))
    )
    scored = (
        tfn.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("_num", F.expr("2 * n_docs - 2 * df + 1"))
        .withColumn("_den", F.expr("2 * df + 1"))
        .withColumn(
            "idf_hb",
            F.expr(
                "CASE WHEN _num < _den THEN 0 ELSE "
                "length(bin(CAST((CAST(_num AS DECIMAL(38,0)) * _num)"
                " DIV (CAST(_den AS DECIMAL(38,0)) * _den)"
                " AS BIGINT))) - 1 END"),
        )
        .withColumn(
            "sat_ppm",
            F.expr(
                f"CAST((CAST(tfn_ppm AS DECIMAL(38,0)) * 1000000)"
                f" DIV (tfn_ppm + {int(k1_ppm)}) AS BIGINT)"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(F.expr("idf_hb * sat_ppm")).cast("long")
            .alias("score_fp"),
        )
        .orderBy(F.col("score_fp").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def qld_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    mu: int = 2000,
) -> DataFrame:
    """(doc_id, n_terms, score_hb): top-k documents under the Dirichlet
    query-likelihood model (Zhai & Lafferty, TOIS 2004) — the language-
    modeling third of the classic ranking triad next to bm25_topk and
    bm25f_topk. Query-constant terms dropped, the ranking-equivalent
    decomposition is

        score(d) = sum_{t in Q, tf>0} log(1 + tf*C / (mu*cf_t))
                   + |Q_c| * log(mu / (dl + mu))

    with C = total corpus tokens, cf_t = collection frequency, and
    |Q_c| = query terms that exist in the corpus (cf = 0 terms carry no
    probability mass under the collection model, so they are excluded
    on both sides — the standard practice).

    Integer half-bit fixed point (same bitlen identity as BM25's idf):

        w_hb   = floor(2*log2((tf*C + mu*cf) / (mu*cf)))
               = bitlen((tf*C + mu*cf)^2 DIV (mu*cf)^2) - 1
        len_hb = floor(2*log2((dl + mu) / mu))
        score_hb = sum(w_hb) - |Q_c| * len_hb          [may be negative]

    Both numerators square inside DECIMAL(38,0) (HUGEINT in the
    oracle), so tf*C is safe to ~10^18 total corpus tokens — past that,
    divide C and cf by a common power of two first (the ratio is all
    that matters).

    Plan shape is bm25_from_index's: the term filter prunes the one
    tokenize+explode pass, cf/stats are O(|Q|)- and 1-row broadcast
    sides, candidates are docs holding >= 1 query term, and the cut is
    TakeOrderedAndProject — no global sort, no dense corpus x query
    scoring."""
    tf = term_freqs(documents)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.sum("dl").alias("c_tokens"))
    tfq = tf.filter(F.col("term").isin(list(query_terms)))
    cfq = tfq.groupBy("term").agg(F.sum("tf").alias("cf"))
    nq = cfq.agg(F.count(F.lit(1)).alias("n_q"))
    scored = (
        tfq.join(F.broadcast(cfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(nq))
        .withColumn(
            "w_hb",
            F.expr(
                f"length(bin(CAST("
                f"(CAST(tf AS DECIMAL(38,0)) * c_tokens"
                f" + CAST({int(mu)} AS DECIMAL(38,0)) * cf)"
                f" * (CAST(tf AS DECIMAL(38,0)) * c_tokens"
                f" + CAST({int(mu)} AS DECIMAL(38,0)) * cf)"
                f" DIV (CAST({int(mu)} AS DECIMAL(38,0)) * cf"
                f" * CAST({int(mu)} AS DECIMAL(38,0)) * cf)"
                f" AS BIGINT))) - 1"),
        )
    )
    return (
        scored.groupBy("doc_id", "dl", "n_q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("w_hb").alias("sum_w"),
        )
        .withColumn(
            "len_hb",
            F.expr(
                f"length(bin(CAST("
                f"CAST(dl + {int(mu)} AS DECIMAL(38,0))"
                f" * (dl + {int(mu)})"
                f" DIV CAST({int(mu) * int(mu)} AS DECIMAL(38,0))"
                f" AS BIGINT))) - 1"),
        )
        .select(
            "doc_id",
            "n_terms",
            (F.col("sum_w") - F.col("n_q") * F.col("len_hb"))
            .cast("long").alias("score_hb"),
        )
        .orderBy(F.col("score_hb").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def block_max_postings(
    documents: DataFrame,
    query_terms: list[str] | None = None,
    block: int = 64,
    k1_ppm: int = 1_200_000,
    b_ppm: int = 750_000,
) -> DataFrame:
    """(term, block_id, n_docs, min_doc_id, max_doc_id, ub_fp):
    block-max skip metadata over doc_id-ordered postings (Ding &
    Suel's Block-Max WAND, SIGIR 2011) — each term's postings list is
    chunked into fixed blocks and each block carries the upper bound
    ub_fp = idf_hb * max(sat_ppm) any of its documents can contribute
    to a BM25 score. A query-time scorer skips a whole block when the
    bound proves it can't reach the current top-k threshold; the table
    is what an index shard persists next to the postings.

    Plan shape: one tokenize+explode pass (shared algebra with
    bm25_from_index), the only per-term ordering is a window
    PARTITIONED by term (rank -> block_id), then one groupBy
    (term, block_id) — no global sort; at scale the window's term
    partitioning is the same key the postings export is already
    bucketed by."""
    tf = term_freqs(documents)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    tfq = tf if query_terms is None else tf.filter(
        F.col("term").isin(list(query_terms)))
    df_t = tfq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tfq.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("_num", F.expr("2 * n_docs - 2 * df + 1"))
        .withColumn("_den", F.expr("2 * df + 1"))
        .withColumn(
            "idf_hb",
            F.expr(
                "CASE WHEN _num < _den THEN 0 ELSE "
                "length(bin(CAST((CAST(_num AS DECIMAL(38,0)) * _num)"
                " DIV (CAST(_den AS DECIMAL(38,0)) * _den)"
                " AS BIGINT))) - 1 END"),
        )
        .withColumn(
            "norm_ppm",
            F.expr(
                f"CAST((1000000 - {int(b_ppm)})"
                f" + (CAST({int(b_ppm)} AS DECIMAL(38,0)) * dl * n_docs)"
                f" DIV total_len AS BIGINT)"),
        )
        .withColumn(
            "sat_ppm",
            F.expr(
                f"CAST((CAST(tf AS DECIMAL(38,0))"
                f" * ({int(k1_ppm)} + 1000000) * 1000000)"
                f" DIV (tf * 1000000"
                f" + ({int(k1_ppm)} * norm_ppm) DIV 1000000)"
                f" AS BIGINT)"),
        )
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "block_id",
            F.expr(f"CAST((rn - 1) DIV {int(block)} AS BIGINT)"))
        .groupBy("term", "block_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            (F.max("idf_hb") * F.max("sat_ppm")).cast("long")
            .alias("ub_fp"),
        )
    )


def blockmax_prune_stats(
    block_maxima: DataFrame, theta: DataFrame
) -> DataFrame:
    """(term, n_blocks, n_skippable): per query term, how many of its
    postings blocks a MaxScore-style bound proves skippable at
    threshold theta (1 row, column theta_fp — typically the k-th score
    of a first-pass top-k): block b of term t is skippable iff

        ub_fp(b) + sum over other terms t' of max_b ub_fp(t', b)
          < theta_fp

    i.e. even paired with every other term's single best block the
    block can't reach the heap threshold. The pruning RATE is the
    quantity a capacity plan needs: it says what fraction of posting
    I/O the skip metadata saves at this corpus shape."""
    gm = block_maxima.groupBy("term").agg(
        F.max("ub_fp").alias("term_max"),
        F.count(F.lit(1)).alias("n_blocks"),
    )
    tot = gm.agg(F.sum("term_max").alias("all_max"))
    return (
        block_maxima
        .join(F.broadcast(gm), "term")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(theta))
        .withColumn(
            "skippable",
            F.expr("ub_fp + (all_max - term_max) < theta_fp"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(F.expr("CASE WHEN skippable THEN 1 ELSE 0 END"))
            .cast("long").alias("n_skippable"),
        )
    )


def posting_compression(documents: DataFrame) -> DataFrame:
    """(term, df, ef_bits, vbyte_bits, bitmap_bits, best, best_bits):
    per-posting-list storage cost under three classic encodings — the
    layout-planning table an index build consults before choosing a
    per-list codec (Vigna, "Quasi-succinct indices", WSDM 2013 for
    Elias-Fano; 7-bit varint a la Scholer et al. SIGIR 2002 for VByte;
    a dense bitmap as the high-df baseline, the roaring-style cutover).

    All-integer bit math over the universe U = max(doc_id) + 1:

        EF:     l = floor(log2(U DIV n))  (0 when U DIV n = 1)
                bits = n*l + n + (U >> l)       (lower bits + unary)
        VByte:  bits = 8 * sum over gaps g of (bitlen(g) + 6) DIV 7
                gaps from doc_id-sorted postings, first gap = id + 1
        bitmap: bits = U

    best picks the smallest (tie order ef < vbyte < bitmap — the
    deterministic cutover rule).

    Scale shape: one tokenize+explode pass; the gap window is
    PARTITIONED by term (the key the postings export is already
    bucketed by — no global sort) feeding one map-side-combined
    groupBy(term); U is a 1-row broadcast."""
    tf = term_freqs(documents)
    u = tf.agg((F.max("doc_id") + F.lit(1)).alias("u"))
    w = Window.partitionBy("term").orderBy("doc_id")
    g = (
        tf.select("term", "doc_id")
        .withColumn("gap", F.col("doc_id") - F.lag("doc_id", 1, -1).over(w))
        .withColumn("vb", F.expr("(length(bin(gap)) + 6) DIV 7"))
    )
    per = g.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.expr("CAST(8 * sum(vb) AS BIGINT)").alias("vbyte_bits"),
    )
    return (
        per.crossJoin(F.broadcast(u))
        .withColumn("l", F.expr("length(bin(u DIV df)) - 1"))
        .withColumn(
            "ef_bits",
            F.expr("CAST(df * l + df + shiftright(u, CAST(l AS INT))"
                   " AS BIGINT)"))
        .withColumn("bitmap_bits", F.col("u").cast("long"))
        .withColumn(
            "best_bits",
            F.expr("least(ef_bits, vbyte_bits, bitmap_bits)"))
        .withColumn(
            "best",
            F.expr("CASE WHEN ef_bits = best_bits THEN 'ef'"
                   " WHEN vbyte_bits = best_bits THEN 'vbyte'"
                   " ELSE 'bitmap' END"))
        .select("term", "df", "ef_bits", "vbyte_bits", "bitmap_bits",
                "best", "best_bits")
    )


def compression_rollup(per_term: DataFrame) -> DataFrame:
    """1 row (n_terms, ef_bits, vbyte_bits, bitmap_bits, mixed_bits,
    n_ef, n_vbyte, n_bitmap): whole-index totals per codec plus the
    pick-per-list mixed layout (what a real index ships) — mixed_bits
    <= min of the pure totals by construction."""
    return per_term.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("ef_bits").cast("long").alias("ef_bits"),
        F.sum("vbyte_bits").cast("long").alias("vbyte_bits"),
        F.sum("bitmap_bits").cast("long").alias("bitmap_bits"),
        F.sum("best_bits").cast("long").alias("mixed_bits"),
        F.sum(F.expr("CASE WHEN best = 'ef' THEN 1 ELSE 0 END"))
        .cast("long").alias("n_ef"),
        F.sum(F.expr("CASE WHEN best = 'vbyte' THEN 1 ELSE 0 END"))
        .cast("long").alias("n_vbyte"),
        F.sum(F.expr("CASE WHEN best = 'bitmap' THEN 1 ELSE 0 END"))
        .cast("long").alias("n_bitmap"),
    )


def min_cover_span(documents: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id, min_span, n_hits): the shortest token window covering
    ALL query terms per document (MinCover — the proximity evidence of
    Tao & Zhai CIKM'07: rank-equivalent retrieval treats a tight span
    as near-phrase relevance that bag-of-words scores cannot see).

    Classic one-pass sweep, relationalized: for each query-term hit at
    position p, the candidate span is p - min over terms t of
    (latest position of t at or before p) + 1, defined only once every
    term has appeared; min over candidates = the exact minimal cover
    (the optimal window always ends at some hit). Per term the latest
    position is a running MAX window over the doc's hit sequence — m
    columns for an m-term query, all sharing ONE doc-partitioned
    window sort. Docs missing any term drop out (no cover exists).

    Scale shape: the positional slice is df-bounded (term filters push
    to the scan; term-bucketed index layout prunes); the sweep is one
    window + one groupBy, both keyed doc_id — no self-joins, no
    per-pair work, unlike the O(m^2) pairwise-distance variants."""
    terms = list(dict.fromkeys(terms))
    if len(terms) < 2:
        raise ValueError("min_cover_span needs >= 2 distinct terms")
    pos = positional_postings(documents).filter(
        F.col("term").isin(terms))
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(Window.unboundedPreceding, 0))
    lasts = [
        F.max(F.when(F.col("term") == t, F.col("pos"))).over(w)
        .alias(f"_l{i}")
        for i, t in enumerate(terms)
    ]
    hits = pos.select("doc_id", "pos", *lasts)
    cols = [f"_l{i}" for i in range(len(terms))]
    # least() skips NULLs in both engines, so gate on every term seen
    span = F.expr(
        "CASE WHEN " + " AND ".join(f"{c} IS NOT NULL" for c in cols)
        + " THEN pos - least(" + ", ".join(cols) + ") + 1 END")
    return (
        hits.withColumn("_span", span)     # NULL until all terms seen
        .groupBy("doc_id")
        .agg(
            F.min("_span").cast("long").alias("min_span"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
        )
        .filter(F.col("min_span").isNotNull())
    )


def champion_lists(
    documents: DataFrame, m: int = 4
) -> DataFrame:
    """(term, doc_id, tf, champ_rank): the top-m highest-tf documents
    per term — champion lists / high-impact tier (Manning, Raghavan &
    Schuetze IIR ch.7): a query evaluator probes these first and only
    falls back to the full postings when the tier can't fill top-k,
    which at web scale skips almost every posting block for almost
    every query.

    Deterministic tier cut: tf desc, doc_id asc. Scale shape: the
    same hashpartitioning(term) the index build already uses —
    WindowGroupLimit prunes to m rows per term BEFORE the final sort
    per partition; no global sort, no collect_list."""
    tf = term_freqs(documents)
    w = Window.partitionBy("term").orderBy(
        F.col("tf").desc(), F.col("doc_id").asc())
    return (
        tf.withColumn("champ_rank",
                      F.row_number().over(w).cast("long"))
        .filter(F.col("champ_rank") <= int(m))
        .select("term", "doc_id", "tf", "champ_rank")
    )


def suggest_topk(
    documents: DataFrame,
    k: int = 3,
    max_prefix: int = 6,
    min_prefix: int = 1,
) -> DataFrame:
    """(prefix, rnk, term, df): query autocompletion — for every term
    prefix of length min_prefix..max_prefix, the top-k completions by
    document frequency (ties by term ascending). The search-box
    counterpart of champion_lists: precomputed, keyed by what the
    user has TYPED rather than by term.

    Scale shape: the vocabulary (not the corpus) is exploded at most
    max_prefix-fold, then ONE prefix-partitioned window cut
    (WindowGroupLimit pushes the k-cut below the sort). Short
    prefixes are the hot keys, but the group size is bounded by
    |vocab with that prefix| and the output by k per prefix — no
    corpus-sized skew. At web vocabularies, drop min_prefix=1 groups
    downstream if single-letter boxes aren't served; the operator
    keeps them because the cut bounds the cost anyway."""
    df_tab = (
        term_freqs(documents)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    pref = df_tab.select(
        "term", "df",
        F.explode(F.expr(
            f"transform(sequence({int(min_prefix)},"
            f" least(length(term), {int(max_prefix)})),"
            " i -> substr(term, 1, i))")).alias("prefix"),
    )
    w = Window.partitionBy("prefix").orderBy(
        F.desc("df"), F.asc("term"))
    return (
        pref.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(k))
        .select("prefix", "rnk", "term", "df")
    )


def tier_assign(
    items: DataFrame,
    budgets: tuple[int, ...] = (1_000_000, 10_000_000),
    id_col: str = "doc_id",
    score_col: str = "score",
    cost_col: str = "cost",
) -> DataFrame:
    """(id, score, cost, cum_cost, tier): greedy tiered-index
    placement — rank everything by score (desc, id tiebreak), fill
    tier 0 until its cost budget is exhausted, then tier 1, ...; the
    leftovers land in tier len(budgets). The hot/warm/cold serving
    split every large index runs (hot tier in RAM, warm on SSD, cold
    archival), made deterministic: an item whose INCLUSIVE cumulative
    cost exceeds a boundary belongs to the next tier, so a tier never
    overruns its budget.

    Scale shape: the global ranking uses global_running_sum's
    range-shuffle + bounded-driver-offsets cumulative — no
    single-partition window; tier assignment is then a pure
    projection against literal boundaries."""
    from barkingowl_spark.operators.ranking import global_running_sum

    if any(int(b) < 0 for b in budgets):
        raise ValueError("budgets must be >= 0")
    d = items.select(
        F.col(id_col), F.col(score_col).alias("score"),
        F.col(cost_col).cast("long").alias("cost"),
        (-F.col(score_col)).alias("_neg"),
    )
    d = global_running_sum(d, ["_neg", id_col], "cost",
                           out_col="cum_cost")
    bounds = []
    acc = 0
    for b in budgets:
        acc += int(b)
        bounds.append(acc)
    tier = F.lit(len(budgets))
    for i in range(len(budgets) - 1, -1, -1):
        tier = F.when(F.col("cum_cost") <= bounds[i], i).otherwise(tier)
    return d.select(
        id_col, "score", "cost",
        F.col("cum_cost").cast("long").alias("cum_cost"),
        tier.cast("long").alias("tier"),
    )


def trigram_postings(documents: DataFrame) -> DataFrame:
    """(tri, doc_id): distinct character trigrams per document — the
    Code-Search index (Cox, "Regular Expression Matching with a
    Trigram Index", 2012): ANY literal substring of length >= 3 can be
    answered by intersecting the postings of its trigrams, then
    verifying only the survivors — regex/grep over a corpus without
    scanning it.

    Trigrams are taken over the raw text (spaces included — a phrase
    query's cross-word trigrams prune harder than word-level postings
    could). Relational: sequence+transform+explode, distinct — no
    UDF.

    Scale shape: one explode pass, one (tri, doc_id) distinct; at
    corpus scale write it bucketed by tri so candidate intersection
    is shuffle-free. Posting-list skew mirrors trigram frequency
    (Zipf) — the classic mitigation (also Cox's) is to SELECT the
    rarest trigrams of the query rather than all of them; the
    candidates operator does exactly that via its max_tris knob."""
    return (
        documents.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(0,"
                    " length(coalesce(text, '')) - 2)),"
                    " i -> substring(coalesce(text, ''), i, 3))"))
            .alias("tri"))
        .distinct()
    )


def trigram_candidates(
    postings: DataFrame,
    documents: DataFrame,
    literal: str,
    max_tris: int = 8,
) -> DataFrame:
    """(doc_id, n_tris_hit, verified): documents that MIGHT contain
    ``literal`` by trigram-postings intersection, with the exact
    contains() verdict computed on the candidates only — the pruning
    ratio (candidates vs verified) is the index's quality number.

    The query plans itself the way Code Search does: take up to
    ``max_tris`` of the literal's RAREST trigrams (ties: trigram
    ascending) — rare trigrams prune hardest and skip the monster
    posting lists — and demand a candidate hit ALL of them.

    Scale shape: rarity ranking touches |literal| postings-df rows;
    the intersection is a semi-join on <= max_tris trigram keys with a
    doc-keyed count; verification scans candidates only."""
    if len(literal) < 3:
        raise ValueError("literal must be at least 3 chars")
    tris = sorted({literal[i:i + 3] for i in range(len(literal) - 2)})
    df = (
        postings.filter(F.col("tri").isin(tris))
        .groupBy("tri")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    picked = [
        r["tri"]
        for r in df.orderBy(F.col("df").asc(), F.col("tri").asc())
        .limit(int(max_tris)).collect()
    ]
    # a query trigram with NO postings row can never be hit: the
    # literal cannot occur anywhere — return the empty frame cheaply
    if len(picked) < min(len(tris), int(max_tris)):
        spark = postings.sparkSession
        return spark.createDataFrame(
            [], "doc_id long, n_tris_hit long, verified boolean")
    cands = (
        postings.filter(F.col("tri").isin(picked))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tris_hit"))
        .filter(F.col("n_tris_hit") == len(picked))
    )
    return (
        cands.join(documents.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id", "n_tris_hit",
            F.col("text").contains(literal).alias("verified"))
    )
