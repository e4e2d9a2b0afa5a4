"""Value-hash guards for the parse-UDF-backed driver-contract queries.

The driver's correctness gate compares every ``__spark_entry__`` query
against its DuckDB oracle at sf0.01 (CLAUDE.md). The parse-UDF queries
(o7_link_extract / o27_text_extract) are the only contract entries whose
Spark side runs Python code paths that pytest's oracle-e2e suite does not
already pin through the crawl trace html-synthesis route, so guard them
(plus the broadcast dim-chain o14) here at sf0.001 with the exact
order-insensitive value-hash the driver uses (tools/compare_oracle.py).
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.compare_oracle import TABLES, vhash

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not mounted"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize(
    "name",
    ["o7_link_extract", "o27_text_extract", "o14_config_join",
     "text_bpe_tokens", "doc_winnow_fp", "sim_topk_cosine",
     "o16_metrics_rollup", "o12_semi_probe", "o21_queue_intersect",
     "o12_cuckoo_evict", "graph_degree", "graph_pagerank",
     "graph_host_agg", "graph_pagerank_delta", "frontier_coverage",
     "sitemap_parse", "sitemap_seeds", "sitemap_coverage",
     "trap_signals", "o20_scored_topk", "text_boilerplate",
     "text_decontam", "text_paradedup", "mix_sample", "mix_report",
     "text_repetition", "text_top_bigram", "pii_scan", "pii_redact",
     "shard_assign", "shard_manifest", "redirect_resolve",
     "anchor_rollup", "idx_postings", "idx_topk_terms", "crawl_diff",
     "o20_waterfill", "graph_hits", "pack_chunks", "text_len_pctl",
     "dupspan_spans", "dupspan_cut", "recrawl_rates",
     "recrawl_schedule", "mix_epoch_plan", "dedup_keep_best",
     "cdx_index", "politeness_timeline", "politeness_audit",
     "fetch_backoff", "dedup_lsh_plan", "sample_neyman", "idx_tiers",
     "url_dates", "url_pagination", "depth_quality_corr",
     "graph_trustrank",
     "trap_templates", "c4_clean", "c4_stats", "dedup_containment",
     "dedup_bbit",
     "mirror_pairs", "mirror_replicas", "lm_surprisal", "lm_buckets",
     "search_bm25", "ring_assign", "ring_moves", "hrw_assign",
     "events_rate_windows", "events_rate_alerts", "clf_scores",
     "dsir_sample", "host_scorecard", "host_quotas",
     "graph_reciprocal", "split_assign", "winnow_pairs",
     "gopher_quality", "url_filter", "mix_epochs_out",
     "search_hybrid", "search_mmr", "pq_codes", "ann_pq_topk",
     "ann_ivfpq_topk",
     "dedup_weights", "eval_compromise", "hll_shingles",
     "graph_opic", "graph_spam_mass", "cms_tokens",
     "mix_temperature", "chunk_overlap", "robots_sitemaps",
     "dedup_semantic", "bpe_merges", "tok_unigram_vocab",
     "tok_unigram_segment", "tok_unigram_em", "graph_entropy",
     "canonical_resolve", "ams_tokens", "graph_cocite",
     "density_labels", "density_clean", "lm_bigram_model",
     "lm_bigram_surprisal", "idx_positions", "search_phrase",
     "aimd_rates", "graph_communities", "mm_phash",
     "mm_phash_pairs", "mix_stratified", "idx_merge_tf",
     "idx_merge_df", "dedup_setjoin", "graph_hyperball",
     "graph_harmonic", "kmv_host_distinct", "kmv_host_overlap",
     "fetch_revalidate", "fetch_reval_savings", "focused_frontier",
     "suffix_ranks", "suffix_dup8", "graph_kcore",
     "audio_landmarks", "audio_match", "suffix_lcp8",
     "graph_adamic", "graph_linkpred", "graph_walks", "events_asof",
     "events_interval", "hdr_len_quantiles", "url_path_tree",
     "meta_robots", "feed_parse", "feed_discover",
     "hreflang_parse", "hreflang_clusters", "host_budget_select",
     "search_snippet", "text_collocations", "text_textrank",
     "text_keyness", "text_vocab_coverage", "search_grep",
     "graph_triangles",
     "events_cms_windows", "cdc_chunks", "cdc_dedup",
     "events_zorder", "graph_indegree_skew", "graph_salsa",
     "cdc_near_dup", "graph_scc", "graph_wcc", "graph_bowtie",
     "simjoin_cosine",
     "dust_rules", "dust_canon", "search_bm25f", "graph_diameter",
     "events_hilbert", "events_change_audit", "search_qld",
     "search_runs", "search_eval", "search_eval_macro", "search_ndcg",
     "search_bpref",
     "sample_priority", "sample_priority_est",
     "idx_blockmax", "idx_blockmax_prune", "events_change_sla",
     "mm_video_frames", "mm_video_pairs", "mm_captions",
     "html_outline", "graph_ppr",
     "events_layout_audit", "url_site", "url_site_rollup",
     "graph_landmark_bfs", "graph_dist_est", "robots_wildcard",
     "clf_kappa", "clf_calibration", "clf_ece", "clf_brier",
     "dist_shift_ks", "dist_shift_emd", "clf_label_noise",
     "clf_mcc", "clf_fleiss", "clf_mcnemar",
     "text_entropy",
     "search_rm3_terms", "search_rm3", "search_rbo", "search_nqc",
     "idx_compress",
     "idx_compress_rollup", "shard_cori", "dedup_lsh_recall",
     "sched_ucb", "text_novelty", "search_qpp", "dedup_triplets", "dedup_threshold_curve", "search_mincover", "idx_champions", "text_vocab_growth",
     "graph_assortativity", "text_oov_rate", "graph_ktruss", "text_zipf",
     "text_lexdiv", "text_scripts", "text_term_burst", "emb_health", "cache_hit_curve", "events_gini", "host_health", "lang_confusion", "search_rm3_eval", "events_health_windows", "mm_sniff_mime", "trap_soft404",
     "clf_auc", "clf_ap", "text_readability", "text_mojibake",
     "lm_kn_bigram", "lm_source_kl", "search_suggest",
     "search_spell", "dedup_editdist", "graph_densest", "emb_matryoshka",
     "emb_sq8",
     "events_burstiness", "graph_modularity",
     "events_periodicity", "events_anomaly", "events_cusum",
     "events_ewma",
     "events_forecast_skill", "events_persistence", "events_srm",
     "events_markov", "events_affinity",
     "emb_pca_power", "emb_kcenter",
     "events_funnel", "events_funnel_report", "events_retention",
     "events_actives",
     "mm_png_decode", "mm_png_ahash", "mm_png_resize",
     "mm_jpeg_decode", "mm_jpeg_ahash", "mm_jpeg_resize",
     "mm_gif_decode", "mm_gif_ahash", "mm_gif_resize",
     "mm_cross_format_pairs",
     "mm_gif_frames", "mm_gif_video_pairs", "mm_bmp_decode", "mm_bmp_ahash",
     "mm_webp_decode", "mm_webp_ahash", "mm_webp_resize",
     "mm_tiff_decode", "mm_tiff_ahash", "mm_tiff_resize",
     "mm_bmp_resize", "mm_tiffjpeg_decode", "mm_tiffjpeg_ahash",
     "mm_ico_decode", "mm_ico_ahash", "zip_members", "tar_members",
     "audio_g711", "sitemap_gz", "office_texts", "xlsx_cells", "xls_cells", "ppt_texts", "document_texts", "rtf_texts", "eml_texts", "mbox_texts", "epub_texts", "meta_opengraph", "svg_dims", "cfb_members",
     "doc_texts",
     "pdf_texts", "pdf_texts_xs", "mm_bmp_embed_decode",
     "mm_bmp_embed_ahash",
     "sim_margin_pairs", "events_trend", "audio_wav_peaks",
     "audio_flac_peaks", "emb_sgns_round", "audio_aiff_peaks"],
)
def test_query_matches_oracle(spark, duck, name):
    got = entrymod.queries()[name](spark, SF).toPandas()
    want = duck.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    assert vhash(got) == vhash(want)


def test_every_query_has_oracle_or_documented_exception():
    qs = set(entrymod.queries())
    osql = set(entrymod.oracle_sql())
    assert osql <= qs
    # every query is value-hash-checked (fixed-point cosine closed the
    # round-1 no_oracle exception)
    assert qs == osql


def test_round5_gate_sample_is_driver_unseen():
    """r4 verdict item 5: the driver samples the FIRST 50 of
    queries(); from round 5 the ordering must surface queries the
    driver's gate has NEVER checked (complement of the frozen
    r1-r4 CORRECTNESS union) until that territory is exhausted."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    union = set()
    rounds = []
    for r in range(1, 20):
        p = os.path.join(root, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(p):
            rounds.append(r)
            union |= set(json.load(open(p)))
    if not rounds or max(rounds) < 4:
        return  # pre-r5 checkout: rotation contract not yet in force
    # the frozen union must cover everything the driver checked in
    # r1-r4 (later rounds may add more; those were sampled unseen-first
    # so the invariant below still holds for the CURRENT round)
    r14 = set()
    for r in (1, 2, 3, 4):
        r14 |= set(json.load(open(
            os.path.join(root, f"CORRECTNESS_r{r:02d}.json"))))
    assert r14 <= entrymod._DRIVER_CHECKED_R1_R4
    first50 = list(entrymod.queries())[:50]
    unseen_total = [n for n in entrymod.queries()
                    if n not in entrymod._DRIVER_CHECKED_R1_R4]
    expect_fresh = min(50, len(unseen_total))
    fresh = [n for n in first50
             if n not in entrymod._DRIVER_CHECKED_R1_R4]
    assert len(fresh) == expect_fresh, (
        f"gate sample re-treads driver-checked queries: "
        f"{[n for n in first50 if n in entrymod._DRIVER_CHECKED_R1_R4][:5]}")
