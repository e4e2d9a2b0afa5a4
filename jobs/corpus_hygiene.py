"""spark-submit entry point for the post-crawl training-data hygiene
pipeline: the corpus-level cleanup a web-text pipeline runs over the
crawl's document archive before training.

  spark-submit --py-files dist/bowspark.zip jobs/corpus_hygiene.py \
      --documents <parquet of (doc_id, text, lang, ...)> --out <dir> \
      [--jaccard-ppm 600000] [--langs en,de] [--min-tokens 20]

Stages (each one shuffle, all native Catalyst — no UDFs):
  0-pre'. optional Gopher doc gate (--gopher-rules): Rae et al. 2021
     document-level thresholds (word count/length, bullet/ellipsis
     shares, alpha share, symbol ratio, stopword floor) — map-only
     (functions/gopherrules.py); drops land as 'gopher_<rule>'
  0-pre. optional C4 line rules (--c4-rules): Raffel et al. 2020 line
     filter (terminal punctuation, min words, no 'javascript') + page
     gates ('lorem ipsum', curly brace, min surviving lines) BEFORE any
     other stage — map-only (functions/c4rules.py), so it shrinks every
     downstream shuffle; page-rule drops land in decisions/ with reason
     'c4_blocklist' / 'c4_brace' / 'c4_short'
  0-pre''. optional line-density main-content extraction
     (--density-clean [MIN_KEPT_PPM]): boilerpipe/jusText-style chrome
     removal by word-count density with neighbor smoothing
     (functions/densitytext.py) — one doc-keyed window; all-chrome
     docs drop as 'density_empty', thin ones as 'density_low'
  0. optional boilerplate strip (--strip-boilerplate HOST_COL): per-host
     repeated-line removal (operators/boilerplate.py) BEFORE hashing, so
     two docs differing only in nav/footer chrome become exact dups in
     stage 1 instead of slipping to (or past) the near-dup stage
  0a'. optional corpus-global paragraph dedup (--dedup-paragraphs):
      first-occurrence-wins paragraph rewrite (operators/paradedup.py)
      after the boilerplate strip — mirrors/syndication collapse into
      shorter docs (possibly '') before any hashing
  0a''. optional exact duplicate-substring cut (--cut-dup-spans N):
      corpus-duplicated N-token spans are cut from every doc
      (operators/dupspans.py, Lee et al. 2022 ExactSubstr) after the
      paragraph pass — catches mid-paragraph syndication the
      line-aligned passes miss; note the rewrite re-joins tokens with
      single spaces (whitespace-normalizing, like the packing path)
  0b. optional incremental gate (--prior KEPT_PARQUET): docs whose
      content fingerprint already exists in a PRIOR run's kept/ output
      drop first with reason 'prior_dup' — the re-run path: only new
      content flows into the in-batch stages below
  1. exact dedup      — md5(normalized text) groups, keeper = min doc_id
  2. near-dup         — MinHash-LSH band candidates (equi-join on band
                        keys, never all-pairs), then exact token-Jaccard
                        verification of ONLY the candidates; default
                        drop rule = the larger doc_id of every verified
                        pair (greedy, single-pass); --transitive swaps
                        in the iterative connected-components pass
                        (operators/components.py) for one-keeper-per-
                        cluster semantics
  3. quality gate     — stopword-ratio/length heuristic (textstats)
  3b. optional repetition gate (--max-dup-line-ppm / --max-top-bigram-
      ppm): Gopher-style within-doc repetition shares (functions/
      repetition.py), reason 'repetitive'
  3c. optional decontamination (--decontam EVAL_PARQUET [--decontam-n
      13]): any doc sharing an n-gram with the eval set drops with
      reason 'contaminated' (operators/decontam.py, broadcast probe)
  3d. optional CCNet perplexity-tail cut (--ppl-drop-bucket N
      [--ppl-buckets 3]): unigram-LM surprisal tiers in integer log2
      (functions/lmscore.py); docs in bucket >= N drop with reason
      'ppl_tail' — after dedup, so duplicated mass never sets the
      thresholds
  3e. optional classifier gate (--clf-weights WEIGHTS_PARQUET
      [--clf-threshold-milli 0] [--clf-buckets 262144]): fastText-style
      hashed-ngram linear score (functions/hashclf.py); docs below the
      threshold drop with reason 'clf_reject'
  4. optional lang allow-list
Post-decision output transforms (applied to kept/ only):
  --redact-pii        mask email/phone tokens in the surviving text
                      (functions/pii.py, byte-exact elsewhere)
  --mix-quotas DIM    deterministic domain-mix downsampling of the
                      survivors (operators/mix.py; DIM = parquet of
                      (source, keep_ppm)); dropped count reported as
                      'mix_sampled' in the stats line
Outputs under --out:
  decisions/   (doc_id, keep BOOLEAN, reason STRING) for every input doc
  kept/        the surviving documents (all input columns)
and prints one JSON stats line (input/kept/dropped per reason).

Scale notes (100TB design point): stage 1 and the LSH band join shuffle
on content-derived keys that are uniform by construction (md5/minhash),
so no skew handling is needed; the candidate-pair verify join is bounded
by band collisions (tune MINHASH_SEEDS/LSH_BANDS for the target recall);
at re-run scale, bucket the archive by fp to make stage 1 shuffle-free.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hygiene_decisions(
    docs: DataFrame,
    jaccard_ppm: int = 600_000,
    min_tokens: int = 20,
    langs: list[str] | None = None,
    transitive: bool = False,
    simhash_hamming: int | None = None,
    max_dup_line_ppm: int | None = None,
    max_top_bigram_ppm: int | None = None,
    eval_docs: DataFrame | None = None,
    decontam_n: int = 13,
    prior_docs: DataFrame | None = None,
    scale_keys: bool = False,
    ppl_drop_bucket: int | None = None,
    ppl_buckets: int = 3,
    clf_weights: DataFrame | None = None,
    clf_threshold_milli: int = 0,
    clf_buckets: int = 262_144,
) -> DataFrame:
    """(doc_id, keep, reason) for every input row. Deterministic; reasons
    apply in stage order (a doc dropped as exact_dup is not re-judged).

    transitive=True replaces the greedy pair-drop of stage 2 with the
    connected-components pass (operators/components.py): one keeper (the
    min doc_id) per transitive near-dup CLUSTER, so a chain A~B~C drops
    both B and C even though A and C are not directly similar.

    simhash_hamming=H adds a SECOND near-dup detector after MinHash:
    64-bit SimHash pairs within hamming H (banded pigeonhole equi-join,
    corpus_dedup.simhash64_near_pairs) — catches boilerplate-style
    near-dups whose token SETS differ enough to slip past Jaccard;
    larger doc_id of each pair drops with reason 'simhash_near'."""
    from barkingowl_spark.functions.textstats import quality_score
    from barkingowl_spark.operators.corpus_dedup import (
        exact_dup_groups,
        verified_near_dup_pairs,
    )

    ids = docs.select("doc_id")

    # Each drop-id set below is consumed 2-3 times (the next stage's
    # anti-join + the final label union). They are TINY (ids of dropped
    # docs), but their lineage is the expensive detection chain — and
    # Catalyst does not exchange-reuse across the differently-pruned
    # consumers (measured: verify subtree planned 2x, 0 ReusedExchange).
    # persist() pins each set so every detector runs exactly once; the
    # corpus itself is never cached (at 10^10 docs re-scanning parquet
    # is the designed trade, caching it is not an option).
    def _pin(df: DataFrame) -> DataFrame:
        return df.persist()

    from barkingowl_spark.operators.corpus_dedup import content_fp

    fps = docs.select("doc_id", content_fp().alias("fp"))

    # 0b. incremental: content already kept by a prior run drops first
    prior_drop = None
    remaining = docs
    if prior_docs is not None:
        prior_fps = prior_docs.select(content_fp().alias("fp")).distinct()
        prior_drop = _pin(
            fps.join(prior_fps, "fp", "left_semi").select("doc_id"))
        remaining = docs.join(prior_drop, "doc_id", "left_anti")

    # 1. exact duplicates: every doc whose fp-group keeper is not itself
    exact_drop = _pin(
        fps.join(exact_dup_groups(remaining), "fp")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    survivors = remaining.join(exact_drop, "doc_id", "left_anti")

    # 2. near-duplicates among exact-survivors: LSH candidates, verified
    # by exact token-Jaccard on only those pairs; then either drop the
    # larger id of each pair (greedy, single-pass) or every non-keeper
    # of each transitive cluster (iterative connected components)
    pairs = verified_near_dup_pairs(survivors, jaccard_ppm)
    if transitive:
        from barkingowl_spark.operators.components import (
            connected_components,
        )

        comp = connected_components(pairs)
        near_drop = (
            comp.filter(F.col("id") != F.col("component_id"))
            .select(F.col("id").alias("doc_id"))
        )
    else:
        near_drop = (
            pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        )
    near_drop = _pin(near_drop)

    # 2b. optional second near-dup detector: 64-bit SimHash hamming<=H
    sim_drop = None
    if simhash_hamming is not None:
        from barkingowl_spark.operators.corpus_dedup import (
            simhash64_near_pairs,
        )

        remaining = survivors.join(near_drop, "doc_id", "left_anti")
        sim_drop = _pin(
            simhash64_near_pairs(remaining, max_hamming=simhash_hamming)
            .select(F.col("doc_b").alias("doc_id")).distinct()
        )

    # 3. quality gate on what's left
    after_near = survivors.join(near_drop, "doc_id", "left_anti")
    if sim_drop is not None:
        after_near = after_near.join(sim_drop, "doc_id", "left_anti")
    quality_drop = (
        quality_score(after_near,
                      min_tokens=min_tokens)
        .filter(~F.col("is_quality"))
        .select("doc_id")
    )

    # 3b. within-doc repetition gate (Gopher-style), reason 'repetitive'
    rep_drop = None
    if max_dup_line_ppm is not None or max_top_bigram_ppm is not None:
        from barkingowl_spark.functions.repetition import (
            line_repetition,
            top_bigram_share,
        )

        parts = []
        if max_dup_line_ppm is not None:
            parts.append(
                line_repetition(after_near)
                .filter(F.col("dup_line_ppm") > max_dup_line_ppm)
                .select("doc_id"))
        if max_top_bigram_ppm is not None:
            parts.append(
                top_bigram_share(after_near)
                .filter(F.col("top_bigram_ppm") > max_top_bigram_ppm)
                .select("doc_id"))
        rep_drop = parts[0] if len(parts) == 1 else \
            parts[0].union(parts[1]).distinct()

    # 3c. eval-set decontamination, reason 'contaminated'
    contam_drop = None
    if eval_docs is not None:
        from barkingowl_spark.operators.decontam import (
            ngram_decontaminate,
        )

        contam_drop = (
            ngram_decontaminate(after_near, eval_docs, n=decontam_n,
                                probe_on_hash=scale_keys)
            .filter("contaminated").select("doc_id")
        )

    # 3d. CCNet perplexity-tail gate (functions/lmscore.py), reason
    # 'ppl_tail': docs in bucket >= ppl_drop_bucket of the surprisal
    # distribution drop — after dedup (CCNet's order: the LM shouldn't
    # be trained on, or thresholds set by, duplicated mass)
    ppl_drop = None
    if ppl_drop_bucket is not None:
        from barkingowl_spark.functions.lmscore import perplexity_buckets

        ppl_drop = (
            perplexity_buckets(after_near, n_buckets=ppl_buckets)
            .filter(F.col("bucket") >= ppl_drop_bucket)
            .select("doc_id")
        )

    # 3e. model-based quality classifier (functions/hashclf.py), reason
    # 'clf_reject': mean-pooled hashed-ngram linear score below the
    # threshold — the fastText-style filter after the heuristic gates
    clf_drop = None
    if clf_weights is not None:
        from barkingowl_spark.functions.hashclf import clf_scores

        clf_drop = (
            clf_scores(after_near, clf_weights, n_buckets=clf_buckets,
                       threshold_milli=clf_threshold_milli)
            .filter(~F.col("keep")).select("doc_id")
        )

    # 4. language allow-list — strict gate: NULL (undetected) lang is NOT
    # on the allow-list, so it drops too (isin alone evaluates to NULL for
    # NULL lang and would silently keep those rows)
    lang_drop = (
        survivors.filter(
            ~F.col("lang").isin(langs) | F.col("lang").isNull()
        ).select("doc_id")
        if langs else None
    )

    # label assembly: ONE union of the (sparse) drop sets + a min-
    # priority agg + ONE join back to ids — not a left join per stage
    # (a doc can sit in several drop sets; the lowest priority number =
    # the earliest pipeline stage wins, same precedence as before)
    ranked = [
        ("prior_dup", prior_drop),
        ("exact_dup", exact_drop), ("near_dup", near_drop),
        ("simhash_near", sim_drop),
        ("contaminated", contam_drop), ("repetitive", rep_drop),
        ("low_quality", quality_drop), ("ppl_tail", ppl_drop),
        ("clf_reject", clf_drop), ("lang", lang_drop),
    ]
    branches = [
        d.select("doc_id", F.lit(prio).alias("_prio"),
                 F.lit(name).alias("reason"))
        for prio, (name, d) in enumerate(ranked) if d is not None
    ]
    dropped = branches[0]
    for b in branches[1:]:
        dropped = dropped.unionByName(b)
    best = (
        dropped.groupBy("doc_id")
        .agg(F.min_by("reason", "_prio").alias("reason"))
    )
    return ids.join(best, "doc_id", "left").select(
        "doc_id",
        F.col("reason").isNull().alias("keep"),
        "reason",
    )


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--documents", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--jaccard-ppm", type=int, default=600_000)
    p.add_argument("--min-tokens", type=int, default=20)
    p.add_argument("--langs", default=None,
                   help="comma-separated allow-list, e.g. en,de")
    p.add_argument("--simhash-hamming", type=int, default=None)
    p.add_argument("--ppl-drop-bucket", type=int, default=None,
                   help="drop docs in surprisal bucket >= N (CCNet "
                        "tail cut; buckets 1..--ppl-buckets)")
    p.add_argument("--ppl-buckets", type=int, default=3)
    p.add_argument("--clf-weights", metavar="WEIGHTS_PARQUET",
                   default=None,
                   help="hashed-ngram classifier model (bucket, "
                        "weight_milli); docs scoring below "
                        "--clf-threshold-milli drop as 'clf_reject'")
    p.add_argument("--clf-threshold-milli", type=int, default=0)
    p.add_argument("--clf-buckets", type=int, default=262_144)
    p.add_argument("--gopher-rules", action="store_true",
                   help="Gopher doc-level quality gate before every "
                        "other stage (functions/gopherrules.py "
                        "defaults); drops land as 'gopher_<rule>'")
    p.add_argument("--c4-rules", action="store_true",
                   help="C4 line filter + page gates before every other "
                        "stage (functions/c4rules.py defaults)")
    p.add_argument("--density-clean", type=int, nargs="?", const=0,
                   default=None, metavar="MIN_KEPT_PPM",
                   help="rewrite each doc to its line-density main "
                        "content (functions/densitytext.py, "
                        "boilerpipe/jusText-style) before hashing; "
                        "docs whose every line is chrome drop as "
                        "'density_empty', docs below MIN_KEPT_PPM "
                        "kept-line share as 'density_low'")
    p.add_argument("--strip-boilerplate", metavar="HOST_COL", default=None,
                   help="strip per-host boilerplate lines (stage 0) "
                        "using this host column, e.g. 'source'")
    p.add_argument("--dedup-paragraphs", action="store_true",
                   help="corpus-global first-occurrence paragraph "
                        "rewrite before hashing (stage 0a')")
    p.add_argument("--cut-dup-spans", type=int, metavar="N", default=None,
                   help="cut corpus-duplicated N-token spans from every "
                        "doc before hashing (stage 0a''; ExactSubstr)")
    p.add_argument("--transitive", action="store_true",
                   help="connected-components near-dup clusters instead "
                        "of greedy pair-drop")
    p.add_argument("--max-dup-line-ppm", type=int, default=None,
                   help="drop docs whose duplicate-line share exceeds "
                        "this (reason 'repetitive')")
    p.add_argument("--max-top-bigram-ppm", type=int, default=None,
                   help="drop docs whose top-bigram share exceeds this "
                        "(reason 'repetitive')")
    p.add_argument("--decontam", metavar="EVAL_PARQUET", default=None,
                   help="parquet of eval-set texts; docs sharing any "
                        "n-gram drop (reason 'contaminated')")
    p.add_argument("--decontam-n", type=int, default=13)
    p.add_argument("--scale-keys", action="store_true",
                   help="use the 8-byte xxhash64 key variants for the "
                        "boilerplate anti-join and the decontamination "
                        "probe (cuts shuffle width at corpus scale; "
                        "2^-64 collisions only ever DROP/FLAG an extra "
                        "doc, never keep a duplicate)")
    p.add_argument("--redact-pii", action="store_true",
                   help="mask email/phone tokens in the kept/ output")
    p.add_argument("--prior", metavar="KEPT_PARQUET", default=None,
                   help="a prior run's kept/ output: docs whose content "
                        "fingerprint already exists there drop with "
                        "reason 'prior_dup' (incremental re-run)")
    p.add_argument("--mix-quotas", metavar="DIM_PARQUET", default=None,
                   help="parquet of (source, keep_ppm): deterministic "
                        "domain-mix downsampling of the survivors")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("bowspark-corpus-hygiene") \
        .getOrCreate()
    docs = spark.read.parquet(args.documents)
    gopher_drops = None
    if args.gopher_rules:
        from barkingowl_spark.functions.gopherrules import gopher_quality

        gq = gopher_quality(docs)
        gopher_drops = gq.filter(F.col("reason") != "keep").select(
            "doc_id",
            F.lit(False).alias("keep"),
            F.concat(F.lit("gopher_"), F.col("reason")).alias("reason"),
        )
        docs = docs.join(
            gq.filter(F.col("reason") == "keep").select("doc_id"),
            "doc_id", "left_semi",
        )
    c4_drops = None
    if args.c4_rules:
        from barkingowl_spark.functions.c4rules import c4_clean

        dec4 = c4_clean(docs)
        c4_drops = dec4.filter(F.col("reason") != "keep").select(
            "doc_id",
            F.lit(False).alias("keep"),
            F.concat(F.lit("c4_"), F.col("reason")).alias("reason"),
        )
        docs = docs.drop("text").join(
            dec4.filter(F.col("reason") == "keep")
            .select("doc_id", F.col("clean_text").alias("text")),
            "doc_id",
        )
    density_drops = None
    if args.density_clean is not None:
        from barkingowl_spark.functions.densitytext import density_clean

        dd = density_clean(docs)
        min_ppm = max(int(args.density_clean), 1)
        bad = dd.filter(F.col("kept_ppm") < min_ppm).select(
            "doc_id",
            F.lit(False).alias("keep"),
            F.when(F.col("kept_ppm") == 0, F.lit("density_empty"))
            .otherwise(F.lit("density_low")).alias("reason"),
        )
        density_drops = bad
        docs = docs.drop("text").join(
            dd.filter(F.col("kept_ppm") >= min_ppm)
            .select("doc_id", F.col("text_main").alias("text")),
            "doc_id",
        )
    if args.strip_boilerplate:
        from barkingowl_spark.operators.boilerplate import (
            strip_boilerplate,
        )

        cleaned = strip_boilerplate(docs, host_col=args.strip_boilerplate,
                                    join_on_hash=args.scale_keys)
        docs = docs.drop("text").join(
            cleaned.withColumnRenamed("text_clean", "text"), "doc_id")
    if args.dedup_paragraphs:
        from barkingowl_spark.operators.paradedup import paragraph_dedup

        rewritten = paragraph_dedup(docs,
                                    shuffle_on_hash=args.scale_keys)
        docs = docs.drop("text").join(
            rewritten.withColumnRenamed("text_clean", "text"), "doc_id")
    if args.cut_dup_spans:
        from barkingowl_spark.operators.dupspans import (
            cut_duplicate_spans,
        )

        cut = cut_duplicate_spans(docs, n=args.cut_dup_spans,
                                  hash_grams=args.scale_keys)
        docs = docs.drop("text").join(
            cut.select("doc_id", F.col("text_kept").alias("text")),
            "doc_id")
    decisions = hygiene_decisions(
        docs,
        jaccard_ppm=args.jaccard_ppm,
        min_tokens=args.min_tokens,
        langs=args.langs.split(",") if args.langs else None,
        transitive=args.transitive,
        simhash_hamming=args.simhash_hamming,
        max_dup_line_ppm=args.max_dup_line_ppm,
        max_top_bigram_ppm=args.max_top_bigram_ppm,
        eval_docs=(spark.read.parquet(args.decontam)
                   if args.decontam else None),
        decontam_n=args.decontam_n,
        prior_docs=(spark.read.parquet(args.prior)
                    if args.prior else None),
        scale_keys=args.scale_keys,
        ppl_drop_bucket=args.ppl_drop_bucket,
        ppl_buckets=args.ppl_buckets,
        clf_weights=(spark.read.parquet(args.clf_weights)
                     if args.clf_weights else None),
        clf_threshold_milli=args.clf_threshold_milli,
        clf_buckets=args.clf_buckets,
    )
    if gopher_drops is not None:
        decisions = decisions.unionByName(gopher_drops)
    if c4_drops is not None:
        decisions = decisions.unionByName(c4_drops)
    if density_drops is not None:
        decisions = decisions.unionByName(density_drops)
    decisions.write.mode("overwrite").parquet(f"{args.out}/decisions")
    decisions = spark.read.parquet(f"{args.out}/decisions")
    kept = docs.join(decisions.filter("keep").select("doc_id"), "doc_id")

    mix_dropped = 0
    if args.mix_quotas:
        from barkingowl_spark.operators.mix import mix_sample

        quotas = spark.read.parquet(args.mix_quotas)
        verdicts = mix_sample(kept, quotas).select("doc_id", "keep") \
            .withColumnRenamed("keep", "_mix_keep")
        kept = kept.join(verdicts, "doc_id")
        mix_dropped = kept.filter(~F.col("_mix_keep")).count()
        kept = kept.filter("_mix_keep").drop("_mix_keep")
    if args.redact_pii:
        from barkingowl_spark.functions.pii import redact

        kept = kept.drop("text").join(
            redact(kept).withColumnRenamed("text_redacted", "text"),
            "doc_id")
    kept.write.mode("overwrite").parquet(f"{args.out}/kept")

    by_reason = {
        r["reason"]: r["n"]
        for r in decisions.filter(~F.col("keep"))
        .groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    if mix_dropped:
        by_reason["mix_sampled"] = mix_dropped
    print(json.dumps({
        # with --c4-rules `docs` is already cut, but decisions/ has one
        # row per ORIGINAL doc, so count inputs there
        "input_docs": (decisions.count()
                       if (c4_drops is not None
                           or gopher_drops is not None
                           or density_drops is not None)
                       else docs.count()),
        "kept_docs": decisions.filter("keep").count() - mix_dropped,
        "dropped": by_reason,
    }))
    # the decision DAG pinned its drop-id sets (persist); outputs are
    # on disk now, so release executor memory before the app moves on
    spark.catalog.clearCache()


if __name__ == "__main__":
    main()
