"""End-to-end test of the corpus-hygiene pipeline (jobs/corpus_hygiene.py)
with planted ground truth: an exact duplicate, a near-duplicate, a
low-quality fragment, and an off-language doc must each be dropped with
the right reason, in stage order, and the keeper must always survive."""

from __future__ import annotations

import pytest

from jobs.corpus_hygiene import hygiene_decisions

GOOD = (
    "the city council met on tuesday to discuss the zoning permit "
    "application for a new public library annex building downtown and "
    "the committee voted to approve the budget resolution in the hearing"
)


@pytest.fixture(scope="module")
def hygiene_docs(spark):
    words = GOOD.split()
    near = " ".join(["x" if i == 7 else w for i, w in enumerate(words)])
    docs = [
        (0, GOOD, "en", "src0", len(GOOD)),          # keeper
        (1, GOOD, "en", "src1", len(GOOD)),          # exact dup of 0
        (2, near, "en", "src2", len(near)),          # near dup of 0
        (3, "short fragment", "en", "src3", 14),     # low quality
        # off-language but quality-passing (>=20 tokens, 'in' stopword
        # hits) and token-disjoint from the others, so the ONLY reason it
        # can drop under langs=['en'] is the allow-list
        (4, "der stadtrat traf sich in dieser woche um die genehmigung in "
            "dem neuen bezirk zu besprechen und der ausschuss stimmte dem "
            "haushalt zu wahrend der sitzung heute", "de", "src4", 160),
        (5, "spark shuffle partitions behave adaptively when the optimizer "
            "re-plans skewed joins at runtime and the scheduler pipelines "
            "narrow stages into a single pass over the scanned data today",
         "en", "src5", 180),                         # unrelated keeper
    ]
    return spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_decisions_reasons_and_stage_order(hygiene_docs):
    d = {r["doc_id"]: (r["keep"], r["reason"])
         for r in hygiene_decisions(hygiene_docs, langs=["en"]).collect()}
    assert d[0] == (True, None)
    assert d[1] == (False, "exact_dup")   # not re-judged by later stages
    assert d[2] == (False, "near_dup")
    assert d[3] == (False, "low_quality")
    assert d[4] == (False, "lang")
    assert d[5] == (True, None)


def test_no_lang_filter_keeps_off_language(hygiene_docs):
    d = {r["doc_id"]: r["reason"]
         for r in hygiene_decisions(hygiene_docs).collect()}
    assert d[4] is None  # off-language doc survives without an allow-list
    assert d[0] is None and d[5] is None


def test_simhash_second_detector(spark):
    """--simhash-hamming adds a second near-dup pass AFTER MinHash: a
    doc that shares almost every token with the keeper (hamming-0
    simhash) but was diluted below the Jaccard threshold by extra
    vocabulary drops only when the simhash stage is on, with its own
    reason; MinHash-caught pairs keep the 'near_dup' reason."""
    # two appended tokens chosen (deterministic search over the md5
    # simhash space) so the pair is hamming-1 in simhash64 but only
    # 931034 ppm token-Jaccard — under a 950000 threshold it slips the
    # MinHash/Jaccard stage and ONLY the simhash stage can catch it
    diluted = GOOD + " extra21a extra21b"
    docs = spark.createDataFrame(
        [
            (0, GOOD, "en", "src0", len(GOOD)),
            (6, diluted, "en", "src6", len(diluted)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    base = {r["doc_id"]: r["reason"]
            for r in hygiene_decisions(docs, jaccard_ppm=950_000).collect()}
    with_sim = {
        r["doc_id"]: r["reason"]
        for r in hygiene_decisions(
            docs, jaccard_ppm=950_000, simhash_hamming=3
        ).collect()
    }
    assert base[6] is None                  # slips past strict Jaccard
    assert with_sim[6] == "simhash_near"    # caught by the 64-bit pass
    assert with_sim[0] is None              # keeper survives


SPARK_TEXT = (
    "spark shuffle partitions behave adaptively when the optimizer "
    "re-plans skewed joins at runtime and the scheduler pipelines "
    "narrow stages into a single pass over the scanned data today"
)


def _mini(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_repetition_gate(spark):
    """--max-dup-line-ppm: a quality-passing doc that repeats its own
    line drops with reason 'repetitive' only when the gate is on."""
    rep = SPARK_TEXT + "\n" + SPARK_TEXT
    docs = _mini(spark, [(0, GOOD, "en", "s0", 1),
                         (7, rep, "en", "s7", 1)])
    off = {r["doc_id"]: r["reason"]
           for r in hygiene_decisions(docs).collect()}
    on = {r["doc_id"]: r["reason"]
          for r in hygiene_decisions(
              docs, max_dup_line_ppm=500_000).collect()}
    assert off[7] is None
    assert on[7] == "repetitive" and on[0] is None


def test_decontam_gate(spark):
    """--decontam: a doc sharing a 5-gram with the eval set drops with
    reason 'contaminated'; disjoint docs survive."""
    docs = _mini(spark, [(0, GOOD, "en", "s0", 1),
                         (5, SPARK_TEXT, "en", "s5", 1)])
    ev = spark.createDataFrame(
        [("the city council met on",)], "text string")
    got = {r["doc_id"]: r["reason"]
           for r in hygiene_decisions(
               docs, eval_docs=ev, decontam_n=5).collect()}
    assert got[0] == "contaminated"
    assert got[5] is None
    # --scale-keys (hashed probe) must decide identically
    hashed = {r["doc_id"]: r["reason"]
              for r in hygiene_decisions(
                  docs, eval_docs=ev, decontam_n=5,
                  scale_keys=True).collect()}
    assert hashed == got


def test_incremental_prior_gate(spark):
    """--prior: content already kept by an earlier run drops first with
    reason 'prior_dup' (even whitespace-variant copies — shared
    content_fp normalization); genuinely new content still runs the
    in-batch stages, including exact dedup among the new docs."""
    prior = _mini(spark, [(100, GOOD, "en", "p0", 1)]).select("text")
    batch = _mini(spark, [
        (0, GOOD, "en", "s0", 1),              # prior dup (exact)
        (1, "  " + GOOD + " ", "en", "s1", 1),  # prior dup (ws variant)
        (2, SPARK_TEXT, "en", "s2", 1),         # new -> kept
        (3, SPARK_TEXT, "en", "s3", 1),         # in-batch exact dup of 2
    ])
    got = {r["doc_id"]: (r["keep"], r["reason"])
           for r in hygiene_decisions(batch, prior_docs=prior).collect()}
    assert got[0] == (False, "prior_dup")
    assert got[1] == (False, "prior_dup")
    assert got[2] == (True, None)
    assert got[3] == (False, "exact_dup")


def test_main_dedup_paragraphs_flag(spark, tmp_path, capsys):
    """--dedup-paragraphs: a doc whose every paragraph first appeared
    elsewhere rewrites to '' and drops at the quality gate; the
    first-occurrence carriers keep their (rewritten) text."""
    import json as _json

    from jobs.corpus_hygiene import main

    docs = _mini(spark, [
        (0, GOOD + "\n" + SPARK_TEXT, "en", "h0", 1),
        (1, SPARK_TEXT + "\n" + GOOD, "en", "h1", 1),  # both paras lose
    ])
    docs.write.parquet(str(tmp_path / "docs"))
    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "out"),
          "--min-tokens", "1", "--dedup-paragraphs"])
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["kept_docs"] == 1
    assert stats["dropped"] == {"low_quality": 1}
    [kept] = spark.read.parquet(str(tmp_path / "out" / "kept")).collect()
    assert kept["doc_id"] == 0
    assert kept["text"] == GOOD + "\n" + SPARK_TEXT


def test_main_end_to_end_with_mix_and_redaction(spark, tmp_path, capsys):
    """The spark-submit surface: decisions + kept outputs, deterministic
    mix downsampling (keep_ppm=0 kills a whole host) and PII redaction
    applied to the surviving text only."""
    import json as _json

    from jobs.corpus_hygiene import main

    docs = _mini(spark, [
        (0, GOOD + " mail bob@example.com ok", "en", "hostA", 1),
        (5, SPARK_TEXT, "en", "hostB", 1),
    ])
    docs.write.parquet(str(tmp_path / "docs"))
    spark.createDataFrame(
        [("hostA", 1_000_000), ("hostB", 0)],
        "source string, keep_ppm long",
    ).write.parquet(str(tmp_path / "quotas"))

    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "out"),
          "--min-tokens", "1",
          "--redact-pii",
          "--mix-quotas", str(tmp_path / "quotas")])

    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input_docs"] == 2
    assert stats["kept_docs"] == 1
    assert stats["dropped"].get("mix_sampled") == 1

    kept = spark.read.parquet(str(tmp_path / "out" / "kept")).collect()
    assert len(kept) == 1 and kept[0]["doc_id"] == 0
    assert "<EMAIL>" in kept[0]["text"]
    assert "bob@example.com" not in kept[0]["text"]


def test_main_cut_dup_spans_flag(spark, tmp_path, capsys):
    """--cut-dup-spans N: a 6-token phrase shared by three docs is cut
    from ALL of them (ExactSubstr all-copies rule) before hashing; the
    doc that was nothing but the phrase rewrites to '' and drops at the
    quality gate, the others keep their now-distinct remainders."""
    import json as _json

    from jobs.corpus_hygiene import main

    common = "one two three four five six"
    docs = _mini(spark, [
        (0, "the alpha beta gamma delta " + common
            + " epsilon zeta eta in theta", "en", "h0", 1),
        (1, "the psi omega " + common + " mu nu xi omicron in pi rho",
         "en", "h1", 1),
        (2, common, "en", "h2", 1),
    ])
    docs.write.parquet(str(tmp_path / "docs"))
    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "out"),
          "--min-tokens", "1", "--cut-dup-spans", "4"])
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["kept_docs"] == 2
    assert stats["dropped"] == {"low_quality": 1}
    kept = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(str(tmp_path / "out" / "kept"))
        .collect()
    }
    assert kept[0] == \
        "the alpha beta gamma delta epsilon zeta eta in theta"
    assert kept[1] == "the psi omega mu nu xi omicron in pi rho"


def test_main_c4_rules_flag(spark, tmp_path, capsys):
    """--c4-rules: page-rule failures drop with reason c4_*, line-rule
    junk is cut from survivors BEFORE hashing (so two docs differing
    only in a javascript line become exact dups in stage 1)."""
    import json as _json

    from jobs.corpus_hygiene import main

    body = ("the city council met on tuesday to approve the budget.\n"
            "the committee voted in favor of the resolution on zoning.\n"
            "a public hearing is scheduled for the end of the month.")
    docs = _mini(spark, [
        (0, body, "en", "h0", 1),                        # keeper
        (1, "please enable javascript to view this page now.\n" + body,
         "en", "h1", 1),                                 # dup after c4
        (2, "lorem ipsum dolor sit amet consectetur adipiscing elit.\n"
            + body, "en", "h2", 1),                      # blocklist page
        (3, "if (x) { return 1; }\n" + body, "en", "h3", 1),  # brace page
        (4, "too short\nno punct lines here", "en", "h4", 1),  # c4_short
    ])
    docs.write.parquet(str(tmp_path / "docs"))
    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "out"),
          "--min-tokens", "1", "--c4-rules"])
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input_docs"] == 5
    assert stats["kept_docs"] == 1
    assert stats["dropped"] == {"exact_dup": 1, "c4_blocklist": 1,
                                "c4_brace": 1, "c4_short": 1}
    kept = spark.read.parquet(str(tmp_path / "out" / "kept")).collect()
    assert len(kept) == 1 and kept[0]["doc_id"] == 0
    assert kept[0]["text"] == body  # javascript line never in keeper


def test_main_ppl_tail_flag(spark, tmp_path, capsys):
    """--ppl-drop-bucket 3: the all-rare-token doc lands in the tail
    surprisal bucket and drops with reason 'ppl_tail'; the common-token
    docs sit in bucket 1 and survive."""
    import json as _json

    from jobs.corpus_hygiene import main

    docs = _mini(spark, [
        (i, f"of alpha beta gamma delta u{i}", "en", f"h{i}", 1)
        for i in range(5)
    ] + [(9, "of zz1 zz2 zz3 zz4 zz5", "en", "h9", 1)])
    docs.write.parquet(str(tmp_path / "docs"))
    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "out"),
          "--min-tokens", "1", "--jaccard-ppm", "990000",
          "--ppl-drop-bucket", "3"])
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["kept_docs"] == 5
    assert stats["dropped"] == {"ppl_tail": 1}
    dec = {r["doc_id"]: (r["keep"], r["reason"])
           for r in spark.read.parquet(
               str(tmp_path / "out" / "decisions")).collect()}
    assert dec[9] == (False, "ppl_tail")
    assert all(dec[i] == (True, None) for i in range(5))


def test_main_clf_gate_flag(spark, tmp_path, capsys):
    """--clf-weights: docs scoring below the threshold under the
    hashed-ngram model drop with reason 'clf_reject'."""
    import hashlib
    import json as _json

    from jobs.corpus_hygiene import main

    junk_bucket = int(
        hashlib.md5(b"junk").hexdigest()[:15], 16) % 64
    spark.createDataFrame(
        [(junk_bucket, -500)], "bucket long, weight_milli long"
    ).write.parquet(str(tmp_path / "w"))
    docs = _mini(spark, [
        (0, "of good words about that city", "en", "h0", 1),
        (1, "of junk junk junk junk junk", "en", "h1", 1),
    ])
    docs.write.parquet(str(tmp_path / "docs"))
    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "out"),
          "--min-tokens", "1",
          "--clf-weights", str(tmp_path / "w"),
          "--clf-buckets", "64"])
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["dropped"] == {"clf_reject": 1}
    dec = {r["doc_id"]: (r["keep"], r["reason"])
           for r in spark.read.parquet(
               str(tmp_path / "out" / "decisions")).collect()}
    assert dec[1] == (False, "clf_reject")
    assert dec[0] == (True, None)


def test_main_gopher_rules_flag(spark, tmp_path, capsys):
    """--gopher-rules: doc-level rule failures drop as gopher_<rule>
    before any other stage; clean docs flow through."""
    import json as _json

    from jobs.corpus_hygiene import main

    body = ("the city council met on tuesday to approve the budget "
            "and the committee voted in favor of the resolution on "
            "zoning after a public hearing was held downtown today "
            "with many residents of the district in the room again "
            "and the final tally was recorded by the clerk for all")
    docs = _mini(spark, [
        (0, body, "en", "h0", 1),                        # keeper
        (1, "tiny doc here", "en", "h1", 1),             # gopher_too_short
        (2, body + " " + "##### " * 5, "en", "h2", 1),   # gopher_symbols
    ])
    docs.write.parquet(str(tmp_path / "docs"))
    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "out"),
          "--min-tokens", "1", "--gopher-rules"])
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input_docs"] == 3
    assert stats["kept_docs"] == 1
    assert stats["dropped"] == {"gopher_too_short": 1,
                                "gopher_symbols": 1}
    dec = {r["doc_id"]: r["reason"]
           for r in spark.read.parquet(
               str(tmp_path / "out" / "decisions")).collect()}
    assert dec == {0: None, 1: "gopher_too_short", 2: "gopher_symbols"}


def test_main_density_clean_flag(spark, tmp_path, capsys):
    """--density-clean: chrome lines are stripped from survivors before
    hashing (two docs differing only in nav chrome become exact dups),
    all-chrome docs drop as density_empty, thin docs below MIN_KEPT_PPM
    as density_low."""
    import json as _json

    from jobs.corpus_hygiene import main

    long1 = ("the city council met on tuesday to approve the annual "
             "budget for the parks.")
    long2 = ("a public hearing on the zoning resolution is scheduled "
             "for the end of the month.")
    body = long1 + "\n" + long2
    docs = _mini(spark, [
        (0, body, "en", "h0", 1),                       # keeper
        (1, "nav menu\n" + body + "\nfooter bar", "en", "h1", 1),
        (2, "nav one\nnav two\nnav three", "en", "h2", 1),  # all chrome
        (3, long1 + "\nnav a\nnav b\nnav c\nnav d\nnav e\nnav f\nnav g",
         "en", "h3", 1),                                # thin: 1/8 kept
    ])
    docs.write.parquet(str(tmp_path / "docs"))
    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "out"),
          "--min-tokens", "1", "--density-clean", "200000"])
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input_docs"] == 4
    assert stats["kept_docs"] == 1
    assert stats["dropped"] == {"exact_dup": 1, "density_empty": 1,
                                "density_low": 1}
    kept = spark.read.parquet(str(tmp_path / "out" / "kept")).collect()
    assert len(kept) == 1 and kept[0]["doc_id"] == 0
    assert kept[0]["text"] == body  # chrome never reached the keeper
