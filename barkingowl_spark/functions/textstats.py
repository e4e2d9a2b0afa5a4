"""Text analysis for training-data pipelines: token stats, quality score,
language-ID heuristic, document fingerprint.

These are the corpus-hygiene ops a 100TB web-text pipeline runs after the
crawl (driver contract: first-class alongside SURVEY.md section 2). All are
pure Catalyst column expressions (whole-stage codegen, no UDFs); every
numeric output is integer (counts / ppm ratios / cents) so the DuckDB
oracle comparison is exact — raw double aggregates are never emitted.

Tokenization contract (shared with the DuckDB oracle SQL in
__spark_entry__): tokens = split(text, ' ') — the synthetic corpus is
single-space word salad; a real corpus would normalize first (see
fingerprint's whitespace collapse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# marker tokens per language for the n-gram/stopword language-ID heuristic;
# ties broken by this order (en first), mirrored in the oracle SQL.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "value", "table"),
    "de": ("der", "die", "und", "nicht", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "y", "las", "por"),
    "zh": ("de", "shi", "le"),
}


def _tokens() -> F.Column:
    return F.split(F.col("text"), " ")


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-doc token counting: count, distinct count, avg token length
    (ppm integer: sum(len)*1e6 / count — exact integer division)."""
    t = _tokens()
    return documents.select(
        "doc_id",
        F.size(t).alias("token_count"),
        F.size(F.array_distinct(t)).alias("distinct_tokens"),
        (
            F.expr(
                "aggregate(transform(split(text, ' '), x -> length(x)),"
                " 0L, (acc, v) -> acc + v)"
            )
            * F.lit(1_000_000)
            / F.size(t)
        ).cast("long").alias("avg_token_len_ppm"),
        F.col("n_chars"),
    )


def quality_score(documents: DataFrame, min_tokens: int = 20) -> DataFrame:
    """Stopword-ratio + length quality gate (ppm integers)."""
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    stop_hits = F.expr(
        f"size(filter(split(text, ' '), x -> x IN ({stop_list})))"
    )
    t = _tokens()
    stop_ppm = (
        stop_hits.cast("long") * F.lit(1_000_000) / F.size(t)
    ).cast("long")
    return documents.select(
        "doc_id",
        F.size(t).alias("token_count"),
        stop_ppm.alias("stop_ppm"),
        (
            (F.size(t) >= min_tokens)
            & (stop_ppm > 0)
            & (stop_ppm < 500_000)
        ).alias("is_quality"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-token language-ID: argmax of per-language marker hits,
    ties broken by LANG_MARKERS order; abstains to 'und' on zero hits."""
    hits = {}
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in markers)
        hits[lang] = F.expr(
            f"size(filter(split(text, ' '), x -> x IN ({lst})))"
        ).alias(f"hits_{lang}")
    df = documents.select("doc_id", "lang", *hits.values())
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANG_MARKERS])
    pred = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        pred = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return df.select(
        "doc_id",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("is_correct"),
    )


# GPT-2-style pre-tokenizer pattern, restricted to syntax that Java regex
# (Spark) and RE2 (DuckDB) interpret identically: contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_stats(documents: DataFrame) -> DataFrame:
    """BPE-ish token counting: the GPT-2 pre-tokenizer regex as a native
    ``regexp_extract_all`` (codegen, no UDF) next to the whitespace count,
    plus their ratio in ppm — the 'tokens per word' statistic a training
    pipeline uses for corpus sizing."""
    bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0))
    ws = F.size(_tokens())
    return documents.select(
        "doc_id",
        bpe.alias("bpe_token_count"),
        ws.alias("ws_token_count"),
        F.floor(bpe.cast("long") * F.lit(1_000_000) / ws).cast("long")
        .alias("bpe_per_ws_ppm"),
    )


def winnow_fingerprints(
    documents: DataFrame, k: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
    every word k-gram (rolling window of the token stream), keep the min
    hash of each w-window of consecutive k-gram hashes, emit the distinct
    mins as (doc_id, fp) rows. Hashes are md5 hex (lexicographic min —
    bit-portable to the DuckDB oracle, same idiom as the MinHash sigs).
    Pure per-row array expressions: no shuffle, scales linearly."""
    toks = _tokens()
    kgrams = F.expr(
        f"transform(sequence(1, size(split(text, ' ')) - {k - 1}),"
        f" i -> md5(concat_ws(' ', slice(split(text, ' '), i, {k}))))"
    )
    docs = documents.filter(F.size(toks) >= k).select(
        "doc_id", kgrams.alias("h")
    )
    wins = F.when(
        F.size(F.col("h")) <= w, F.array(F.array_min("h"))
    ).otherwise(
        F.expr(
            f"transform(sequence(1, size(h) - {w - 1}),"
            f" j -> array_min(slice(h, j, {w})))"
        )
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(wins)).alias("fp")
    )


def winnow_pairs(
    documents: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_docs_per_fp: int = 32,
) -> DataFrame:
    """(doc_a, doc_b, shared): document pairs sharing >= min_shared
    winnowing fingerprints — the MOSS detection join (Schleimer et al.
    2003 §4) on top of winnow_fingerprints: local text reuse
    (plagiarism, syndicated passages) that whole-document MinHash
    dilutes away, caught by position-robust k-gram mins.

    Same scale guards as the mirror join (operators/mirrors.py): a
    fingerprint carried by more than max_docs_per_fp documents is a
    stop fingerprint (boilerplate phrase) and is dropped BEFORE the
    self-join, bounding per-key fan-out at max_docs_per_fp^2; output
    is O(pairs that actually share rare fingerprints), never
    all-pairs."""
    fps = winnow_fingerprints(documents, k=k, w=w)
    keyn = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter((F.col("_nd") >= 2) & (F.col("_nd") <= max_docs_per_fp))
        .select("fp")
    )
    t = fps.join(keyn, "fp")
    a = t.select(F.col("doc_id").alias("doc_a"), "fp")
    b = t.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    text, plus a 2-hex-char shard bucket (the partition key a 100TB dedup
    would shuffle on)."""
    norm = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    fp = F.md5(norm.cast("binary"))
    return documents.select(
        "doc_id", fp.alias("fp"), F.substring(fp, 1, 2).alias("bucket")
    )


def length_percentiles(documents: DataFrame) -> DataFrame:
    """Per-source EXACT discrete token-length percentiles:
    (source, n_docs, p25, p50, p75, p90) where p_q is the ceil(q*n)-th
    smallest whitespace token count (NULL text counts as 0 tokens).

    Exactness over approx_percentile on purpose: the corpus-monitoring
    report this feeds gates hygiene thresholds, and t-digest outputs
    are neither engine-portable nor run-stable. The explicit integer
    ceil-index formulas ((n+3) div 4, (n+1) div 2, (3n+3) div 4,
    (9n+9) div 10) make Spark and DuckDB agree bit-for-bit — the same
    reason the quality scores are ppm integers, not doubles.

    Scale shape: one window sort per source partition (the per-group
    sort any exact percentile needs — source cardinality is O(hosts),
    rows per group bounded by host size; hot hosts are exactly the
    partitions the salting machinery already splits for other per-host
    sorts) + one map-side-combined groupBy. For a monitoring-grade
    answer at 10^12 docs, swap in approx_percentile and drop the
    oracle claim — documented tradeoff, not a default.
    """
    from pyspark.sql import Window

    tok = F.coalesce(
        F.size(F.expr("filter(split(text, ' '), x -> x <> '')"))
        .cast("long"),
        F.lit(0).cast("long"),
    )
    w = Window.partitionBy("source").orderBy("tok")
    d = (
        documents.select("source", tok.alias("tok"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("source")))
    )
    def _at(expr_idx: str, name: str) -> F.Column:
        return F.max(
            F.when(F.col("rn") == F.expr(expr_idx), F.col("tok"))
        ).alias(name)

    return d.groupBy("source").agg(
        F.max("n").alias("n_docs"),
        _at("(n + 3) div 4", "p25"),
        _at("(n + 1) div 2", "p50"),
        _at("(3 * n + 3) div 4", "p75"),
        _at("(9 * n + 9) div 10", "p90"),
    )


def token_entropy(documents: DataFrame) -> DataFrame:
    """(doc_id, dl, n_types, ent_hb): per-document token-distribution
    Shannon entropy in HALF-BITS per token (integer):

        ent_hb = (sum over types t of tf_t * floor(2*log2(dl / tf_t)))
                 DIV dl

    via the squared-DECIMAL bitlen identity (invindex.py's idf trick).
    Low entropy = repetitive text (a boilerplate/keyword-stuffing
    signal Gopher-style duplicate-line ratios miss when the repetition
    is interleaved); the all-unique-tokens ceiling is 2*log2(dl).

    One tokenize+explode pass, one (doc_id, term) agg, one doc_id
    rollup — entropy of a 10^10-doc corpus is two shuffles."""
    toks = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("dl"),
        F.count(F.lit(1)).alias("n_types"),
    )
    return (
        tf.join(dl, "doc_id")
        .withColumn(
            "w_hb",
            F.expr(
                "tf * (length(bin(CAST("
                "CAST(dl AS DECIMAL(38,0)) * dl"
                " DIV (CAST(tf AS DECIMAL(38,0)) * tf)"
                " AS BIGINT))) - 1)"),
        )
        .groupBy("doc_id", "dl", "n_types")
        .agg(F.expr("CAST(sum(w_hb) DIV dl AS BIGINT)")
             .alias("ent_hb"))
        .select("doc_id", F.col("dl").cast("long"),
                F.col("n_types").cast("long"), "ent_hb")
    )


def vocab_growth(documents: DataFrame, n_checkpoints: int = 10) -> DataFrame:
    """(checkpoint_doc_id, vocab_size, tokens_cum): Heaps'-law audit —
    distinct vocabulary and cumulative token count after ingesting the
    corpus prefix up to each doc_id checkpoint. A corpus whose
    vocabulary curve flattens is re-crawling the same text (the
    corpus-level twin of the per-doc novelty curve); a curve that
    keeps its power-law slope is still finding new language.

    Checkpoints are a deterministic grid: c_i = ((i+1) * max_doc_id)
    DIV n, i = 0..n-1 (the last always covers the whole corpus).
    vocab_size counts a term at the first checkpoint >= its earliest
    doc_id.

    Scale shape: one tokenize pass -> groupBy(term) min(doc_id) (map-
    side combined, the only corpus-wide shuffle) -> broadcast the
    n-row grid, min-match each term/doc to its checkpoint, count into
    n cells; the cumulative sum runs over n rows."""
    from pyspark.sql import Window

    n = int(n_checkpoints)
    toks = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    mx = toks.agg(F.max("doc_id").alias("mx"))
    spark = documents.sparkSession
    grid = (
        spark.range(n).select(F.col("id").alias("i"))
        .crossJoin(F.broadcast(mx))
        .select("i", F.expr("CAST(((i + 1) * mx) DIV " + str(n)
                            + " AS BIGINT)").alias("cp"))
    )
    first = toks.groupBy("term").agg(F.min("doc_id").alias("fd"))
    vcell = (
        first.join(F.broadcast(grid), F.col("cp") >= F.col("fd"))
        .groupBy("term").agg(F.min("i").alias("i"))
        .groupBy("i").agg(F.count(F.lit(1)).alias("v_in"))
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tcell = (
        dl.join(F.broadcast(grid), F.col("cp") >= F.col("doc_id"))
        .groupBy("doc_id", "dl").agg(F.min("i").alias("i"))
        .groupBy("i").agg(F.sum("dl").alias("t_in"))
    )
    # bounded-global-window: frame is the checkpoint grid (one row
    # per grid step) in-plan
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(vcell, "i", "left").join(tcell, "i", "left")
        .withColumn("vocab_size",
                    F.sum(F.coalesce("v_in", F.lit(0))).over(w)
                    .cast("long"))
        .withColumn("tokens_cum",
                    F.sum(F.coalesce("t_in", F.lit(0))).over(w)
                    .cast("long"))
        .select(F.col("cp").alias("checkpoint_doc_id"),
                "vocab_size", "tokens_cum")
    )


def oov_rate(
    documents: DataFrame, vocab_size: int = 16,
    by_col: str = "source",
) -> DataFrame:
    """(source, tokens, oov_tokens, oov_ppm): out-of-vocabulary token
    rate per corpus slice against the corpus's own top-`vocab_size`
    vocabulary (total tf desc, term asc) — the coverage audit run
    before freezing a tokenizer vocab: a slice with a high OOV rate
    will fragment into bytes/unks and train badly.

    Scale shape: the vocabulary is a global TakeOrderedAndProject
    (per-partition heaps over the term-aggregated counts — never a
    global sort) broadcast back as a LEFT-join probe; the per-slice
    reduce is one map-side-combined groupBy."""
    toks = documents.select(
        F.col(by_col).alias("source"),
        F.explode(F.split("text", " ")).alias("term"),
    ).filter(F.col("term") != "")
    vocab = (
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("ctf"))
        .orderBy(F.col("ctf").desc(), F.col("term").asc())
        .limit(int(vocab_size))
        .select("term", F.lit(1).alias("_inv"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tokens"),
            F.sum(F.expr("CASE WHEN _inv IS NULL THEN 1 ELSE 0 END"))
            .cast("long").alias("oov_tokens"),
        )
        .withColumn(
            "oov_ppm",
            F.expr("CAST(1000000 * oov_tokens DIV tokens AS BIGINT)"))
    )


def zipf_slope(documents: DataFrame, top_n: int = 64) -> DataFrame:
    """1 row (n_terms, slope_ppm): integer least-squares slope of
    half-bit log2(frequency) against half-bit log2(rank) over the
    corpus's top-`top_n` terms — the Zipf exponent check (natural
    language sits near slope -1, i.e. -1e6 ppm; template/boilerplate
    floods flatten it, gibberish steepens it).

    x = hb(rank), y = hb(tf) with hb(v) = bitlen(v^2)-1 (the repo's
    half-bit identity; int64 envelope tf < ~3e9 per term):

        slope_ppm = sign * (1e6 * |n*Sxy - Sx*Sy|)
                    DIV (n*Sxx - Sx^2)

    Scale shape: one tokenize pass -> term counts -> global
    TakeOrderedAndProject(top_n) (per-partition heaps) -> the rank
    window + regression run over top_n rows only."""
    from pyspark.sql import Window

    toks = documents.select(
        F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    top = (
        toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("term").asc())
        .limit(int(top_n))
    )
    # bounded-global-window: input is .limit(top_n) in-plan
    w = Window.orderBy(F.col("tf").desc(), F.col("term").asc())
    xy = (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            F.expr("length(bin(CAST(rank AS BIGINT) * rank)) - 1")
            .alias("x"),
            F.expr("length(bin(CAST(tf AS BIGINT) * tf)) - 1")
            .alias("y"),
        )
    )
    return xy.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.expr("CAST(sum(CAST(x AS BIGINT))  AS BIGINT)").alias("_sx"),
        F.expr("CAST(sum(CAST(y AS BIGINT)) AS BIGINT)").alias("_sy"),
        F.expr("CAST(sum(CAST(x AS BIGINT) * y) AS BIGINT)")
        .alias("_sxy"),
        F.expr("CAST(sum(CAST(x AS BIGINT) * x) AS BIGINT)")
        .alias("_sxx"),
    ).select(
        "n_terms",
        F.expr(
            "CASE WHEN n_terms * _sxx - _sx * _sx = 0"
            " THEN CAST(0 AS BIGINT)"
            " WHEN n_terms * _sxy - _sx * _sy >= 0 THEN"
            " CAST((1000000 * (n_terms * _sxy - _sx * _sy))"
            " DIV (n_terms * _sxx - _sx * _sx) AS BIGINT)"
            " ELSE -CAST((1000000 * (_sx * _sy - n_terms * _sxy))"
            " DIV (n_terms * _sxx - _sx * _sx) AS BIGINT) END"
        ).alias("slope_ppm"),
    )


def lang_confusion(documents: DataFrame) -> DataFrame:
    """(lang, pred_lang, n, share_ppm): confusion matrix of the
    marker-token language-ID against the declared lang column —
    share_ppm is the row-normalized rate within each declared
    language, i.e. the per-language misroute profile a corpus builder
    reads before trusting lang-blocked dedup or lang-stratified
    mixing.

    Scale shape: detection is per-row codegen (lang_id); the matrix is
    one map-side-combined groupBy over at most |langs|^2+|langs| cells
    and the row normalization a window over those cells."""
    from pyspark.sql import Window

    pred = lang_id(documents).select("doc_id", "pred_lang")
    cells = (
        documents.select("doc_id", "lang").join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("lang")
    return (
        cells.withColumn("_tot", F.sum("n").over(w))
        .withColumn(
            "share_ppm",
            F.expr("CAST(1000000 * n DIV _tot AS BIGINT)"))
        .drop("_tot")
    )


def readability(documents: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_sents, n_syll, grade_milli, ease_milli):
    Flesch-Kincaid grade level and Flesch reading ease (Kincaid et
    al. 1975) in integer MILLI fixed point — the classic cheap
    readability gate a corpus mixer uses next to the Gopher rules
    (very low grade = menu/listing junk, very high = OCR noise or
    run-on boilerplate).

    Heuristics, identical on both engines:
      * words     = non-empty space-split tokens;
      * sentences = count of '.', '!', '?' characters, floored at 1
        (counted via length-difference after replace — no regex);
      * syllables = maximal [aeiouy]+ runs in the lowercased text
        (split by the run regex yields runs+1 pieces in Spark and
        DuckDB alike), floored at one per word.

    Fixed-point forms (floor at each division, both engines):

        grade_milli = (390*W) DIV S + (11800*Y) DIV W - 15590
        ease_milli  = 206835 - (1015*W) DIV S - (84600*Y) DIV W

    Word-less docs get NULL scores rather than a divide-by-zero.
    Per-row codegen only — no shuffle, no UDF; at 10^10 docs this is
    a map-only pass fused into whatever scan feeds it."""
    txt = F.coalesce(F.col("text"), F.lit(""))

    def occ(ch: str) -> F.Column:  # count of a 1-char literal
        return F.length(txt) - F.length(
            F.expr(f"replace(coalesce(text, ''), '{ch}', '')"))

    words = F.size(F.filter(F.split(txt, " "), lambda x: x != ""))
    sents = F.greatest(F.lit(1), occ(".") + occ("!") + occ("?"))
    runs = F.size(F.split(F.lower(txt), "[aeiouy]+")) - 1
    return (
        documents.select(
            "doc_id",
            words.cast("long").alias("n_words"),
            sents.cast("long").alias("n_sents"),
            F.greatest(
                F.greatest(F.lit(0), runs).cast("long"),
                words.cast("long"),
            ).alias("n_syll"),
        )
        .withColumn(
            "grade_milli",
            F.expr(
                "CASE WHEN n_words > 0 THEN CAST("
                "(390 * n_words) DIV n_sents"
                " + (11800 * n_syll) DIV n_words"
                " - 15590 AS BIGINT) END"),
        )
        .withColumn(
            "ease_milli",
            F.expr(
                "CASE WHEN n_words > 0 THEN CAST("
                "206835 - (1015 * n_words) DIV n_sents"
                " - (84600 * n_syll) DIV n_words AS BIGINT) END"),
        )
    )


MOJIBAKE_MARKERS = ("Ã", "â€", "Â", "ï¿½", "�")


def mojibake_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, moji_hits, moji_kinds, moji_suspect): encoding-damage
    detection — the classic double-decoded-UTF-8 artifacts ('Ã©' where
    'é' was meant, 'â€™' for a smart quote, 'ï¿½'/U+FFFD replacement
    characters). A corpus that went bytes→latin-1→utf-8 anywhere in
    its fetch/parse chain is full of these, and they poison tokenizers
    (every mangled vowel becomes a new BPE unit) and dedup (mangled
    and clean copies stop matching).

    Marker occurrences are counted by character-length difference
    after replace() — no regex, no UDF, exact in both engines (Spark
    length() and DuckDB len() both count code points):

        occ(m) = (len(text) - len(replace(text, m, ''))) DIV len(m)

    moji_hits = sum of occurrences, moji_kinds = markers present,
    suspect = hits >= 3 OR kinds >= 2 (one 'Â' alone can be legitimate
    text — systematic damage repeats). Map-only codegen pass."""
    occs = []
    for i, m in enumerate(MOJIBAKE_MARKERS):
        esc = m.replace("'", "''")
        occs.append(
            (
                (F.length(F.coalesce(F.col("text"), F.lit("")))
                 - F.length(F.expr(
                     f"replace(coalesce(text, ''), '{esc}', '')")))
                / F.lit(len(m))
            ).cast("long").alias(f"_occ{i}")
        )
    with_occ = documents.select("doc_id", *occs)
    hits = sum(F.col(f"_occ{i}") for i in range(len(MOJIBAKE_MARKERS)))
    kinds = sum(
        F.when(F.col(f"_occ{i}") > 0, 1).otherwise(0)
        for i in range(len(MOJIBAKE_MARKERS))
    )
    return (
        with_occ.select(
            "doc_id",
            hits.cast("long").alias("moji_hits"),
            kinds.cast("long").alias("moji_kinds"),
        )
        .withColumn(
            "moji_suspect",
            (F.col("moji_hits") >= 3) | (F.col("moji_kinds") >= 2))
    )


def source_keyness(
    documents: DataFrame,
    k: int = 10,
    min_count: int = 3,
) -> DataFrame:
    """(source, term, tf_in, tf_out, lift_ppm, rk): each source's top-k
    DISTINCTIVE terms — the corpus-linguistics keyness table ("what is
    this slice about, relative to everything else?"), the audit to
    read before trusting a source label or a mixing weight.

    Score = smoothed relative risk in ppm,

        lift_ppm = (tf_in * (T_out + 1) * 1e6)
                   DIV ((tf_out + 1) * T_in)

    (T = source token totals; +1 on the out side keeps
    source-exclusive terms finite) — monotone in pointwise MI exactly
    as collocations' exp-PMI lift, so the ranking needs no log and is
    engine-exact in DECIMAL. min_count guards the rare-term blowup;
    ties break term-ascending.

    Scale shape: ONE tokenize pass feeds the (source, term) counts;
    per-term corpus totals come off that table (map-side combine) and
    tf_out = corpus - in needs no second scan; source totals ride a
    broadcast; the k-cut is a source-partitioned WindowGroupLimit."""
    if k < 1 or min_count < 1:
        raise ValueError("k and min_count must be >= 1")
    from pyspark.sql import Window

    toks = documents.select(
        "source", F.explode(F.split(F.coalesce("text", F.lit("")), " "))
        .alias("term")).filter(F.col("term") != "")
    st = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf_in"))
    tot_term = st.groupBy("term").agg(
        F.sum("tf_in").cast("long").alias("tf_all"))
    tot_src = st.groupBy("source").agg(
        F.sum("tf_in").cast("long").alias("t_in"))
    tot_all = tot_src.agg(
        F.sum("t_in").cast("long").alias("t_all"))
    scored = (
        st.filter(F.col("tf_in") >= min_count)
        .join(tot_term, "term")
        .join(F.broadcast(tot_src), "source")
        .crossJoin(F.broadcast(tot_all))
        .select(
            "source", "term", "tf_in",
            (F.col("tf_all") - F.col("tf_in")).alias("tf_out"),
            F.expr(
                "CAST(CAST(tf_in AS DECIMAL(38,0))"
                " * (t_all - t_in + 1) * 1000000"
                " DIV (CAST(tf_all - tf_in + 1 AS DECIMAL(38,0))"
                " * t_in) AS BIGINT)").alias("lift_ppm"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("lift_ppm").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("source", "term", "tf_in", "tf_out", "lift_ppm",
                F.col("rk").cast("long").alias("rk"))
    )


def vocab_coverage(
    documents: DataFrame,
    ks: tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512,
                           1024, 2048, 4096),
) -> DataFrame:
    """(k, covered_tokens, total_tokens, coverage_ppm): cumulative
    token mass of the top-k term types, at the given k grid — the
    vocabulary-sizing curve ("what vocab covers 99.5% of running
    tokens?") that decides tokenizer vocab size and OOV budget; the
    cumulative companion of text_vocab_growth's Heaps law and
    text_zipf's slope. Grid points beyond the actual type count are
    omitted (the curve has nothing more to say there).

    Ranking is (tf desc, term asc) — deterministic under tf ties.

    Scale shape: one tokenize pass -> term counts (map-side combine);
    BOTH the cumulative mass and the rank ride global_running_sum's
    range-shuffle + bounded-driver-offsets primitive over the distinct
    types (never a single-partition window over the vocabulary); the
    grid filter then keeps |ks| rows."""
    if not ks or any(int(k) < 1 for k in ks):
        raise ValueError("ks must be positive")
    from barkingowl_spark.operators.ranking import global_running_sum

    tf = (
        documents.select(
            F.explode(F.split(F.coalesce("text", F.lit("")), " "))
            .alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn("_neg", -F.col("tf"))
        .withColumn("_one", F.lit(1).cast("long"))
    )
    r = global_running_sum(tf, ["_neg", "term"], "tf", out_col="cum")
    r = global_running_sum(r, ["_neg", "term"], "_one", out_col="rk")
    tot = tf.agg(F.sum("tf").cast("long").alias("total_tokens"))
    return (
        r.filter(F.col("rk").isin([int(k) for k in ks]))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("rk").cast("long").alias("k"),
            F.col("cum").cast("long").alias("covered_tokens"),
            "total_tokens",
            F.expr("1000000 * cum DIV total_tokens").cast("long")
            .alias("coverage_ppm"),
        )
    )


def lexical_diversity(
    documents: DataFrame, group_col: str = "source"
) -> DataFrame:
    """(group, n_tokens, n_types, ttr_ppm, yule_k_milli): per-group
    lexical-diversity audit — type-token ratio plus Yule's K
    (Yule 1944), the repeat-rate statistic K = 10^4 (S2 - S1) / S1^2
    with S1 = token count and S2 = sum_m m^2 V_m over the frequency
    spectrum. TTR collapses as groups grow (it is length-biased);
    K is length-stable, which is why corpus QA uses the pair
    together: low K + low TTR separates genuinely templated/spammy
    sources from merely large ones.

    Integer-exact: K in milli (10^7-scaled) and TTR in ppm, both with
    DECIMAL(38,0)/HUGEINT products so the m^2 spectrum sum and the
    N^2 denominator carry the 1e10-token design point. Groups with no
    tokens produce no row.

    Scale shape: explode -> (group, term) count -> per-group rollup;
    two hash shuffles, both map-side combined, no UDF, no window."""
    tok = (
        documents.select(
            F.col(group_col).alias("_g"),
            F.explode(F.split(
                F.coalesce("text", F.lit("")), " ")).alias("_t"))
        .filter(F.col("_t") != "")
    )
    tf = tok.groupBy("_g", "_t").agg(
        F.count(F.lit(1)).cast("long").alias("m"))
    return (
        tf.groupBy("_g")
        .agg(
            F.sum("m").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(F.expr("CAST(m AS DECIMAL(38,0)) * m")).alias("_s2"))
        .select(
            F.col("_g").alias(group_col), "n_tokens", "n_types",
            F.expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_types"
                   " DIV n_tokens AS BIGINT)").alias("ttr_ppm"),
            F.expr("CAST(CAST(10000000 AS DECIMAL(38,0))"
                   " * (_s2 - n_tokens)"
                   " DIV (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens)"
                   " AS BIGINT)").alias("yule_k_milli"))
    )


# Codepoint ranges shared verbatim with the DuckDB oracle (literal
# characters, not \\u escapes, so Java regex and RE2 read the same
# class); each class counts via length-delta after stripping.
SCRIPT_RANGES = {
    "latin": "A-Za-zÀ-ɏ",
    "cyrillic": "Ѐ-ӿ",
    "cjk": "一-鿿",
    "digit": "0-9",
}


def script_mix(documents: DataFrame) -> DataFrame:
    """(doc_id, n_chars, latin_ppm, cyrillic_ppm, cjk_ppm, digit_ppm,
    other_ppm, main_script): per-document writing-script composition —
    the language-ID prior and the mixed-script spam signal (Latin page
    stuffed with CJK keywords, Cyrillic lookalike phishing). Char
    counts per class come from the length delta after stripping one
    codepoint-range character class (SCRIPT_RANGES, shared verbatim
    with the oracle); main_script is the first argmax in declared
    class order, 'other' only when every class count is zero.

    ppm envelope: doc length <= ~9e12 chars inside the BIGINT
    1e6-scaled division — far beyond any real document.

    Scale shape: map-only projection, no UDF, no shuffle."""
    t = F.coalesce(F.col("text"), F.lit(""))

    def cnt(rng: str) -> F.Column:
        return (F.length(t) - F.length(
            F.regexp_replace(t, "[" + rng + "]", ""))).cast("long")

    base = documents.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        cnt(SCRIPT_RANGES["latin"]).alias("n_latin"),
        cnt(SCRIPT_RANGES["cyrillic"]).alias("n_cyrillic"),
        cnt(SCRIPT_RANGES["cjk"]).alias("n_cjk"),
        cnt(SCRIPT_RANGES["digit"]).alias("n_digit"),
    ).filter(F.col("n_chars") > 0)
    ppm = "CAST(1000000 * n_{s} DIV n_chars AS BIGINT)"
    return base.select(
        "doc_id", "n_chars",
        F.expr(ppm.format(s="latin")).alias("latin_ppm"),
        F.expr(ppm.format(s="cyrillic")).alias("cyrillic_ppm"),
        F.expr(ppm.format(s="cjk")).alias("cjk_ppm"),
        F.expr(ppm.format(s="digit")).alias("digit_ppm"),
        F.expr("CAST(1000000 * (n_chars - n_latin - n_cyrillic"
               " - n_cjk - n_digit) DIV n_chars AS BIGINT)")
        .alias("other_ppm"),
        F.expr(
            "CASE WHEN n_latin = 0 AND n_cyrillic = 0 AND n_cjk = 0"
            " AND n_digit = 0 THEN 'other'"
            " WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk"
            " AND n_latin >= n_digit THEN 'latin'"
            " WHEN n_cyrillic >= n_cjk AND n_cyrillic >= n_digit"
            " THEN 'cyrillic'"
            " WHEN n_cjk >= n_digit THEN 'cjk'"
            " ELSE 'digit' END").alias("main_script"),
    )


def term_burstiness(documents: DataFrame, top_n: int = 64) -> DataFrame:
    """(term, cf, df, burst_ppm): Church-Gale term burstiness over the
    corpus — collection frequency vs document frequency. Function
    words spread evenly (burst ~ their per-doc rate, low), content
    words clump (a doc that mentions them mentions them repeatedly,
    high cf/df) — the signal behind stopword derivation, keyword
    weighting beyond idf, and template detection (boilerplate terms
    are high-df low-burst). burst_ppm = 1e6 * cf DIV df, top_n rows
    by (cf desc, term asc).

    Scale shape: rides term_freqs' one tokenize pass + (doc, term)
    rollup; the per-term agg is a second map-side-combined shuffle
    (no countDistinct expand — df = row count of the tf table);
    TakeOrdered cut."""
    from barkingowl_spark.operators.invindex import term_freqs

    tf = term_freqs(documents)
    return (
        tf.groupBy("term")
        .agg(F.sum("tf").cast("long").alias("cf"),
             F.count(F.lit(1)).cast("long").alias("df"))
        .withColumn("burst_ppm",
                    F.expr("CAST(1000000 * cf DIV df AS BIGINT)"))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(int(top_n))
    )
