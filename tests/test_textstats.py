"""source_keyness: distinctive-term extraction vs hand-computed lift."""

from __future__ import annotations


def test_source_keyness_distinctive_terms(spark):
    import pytest

    from barkingowl_spark.functions.textstats import source_keyness

    docs = spark.createDataFrame(
        [(i, "sport", "goal match goal team common word")
         for i in range(5)]
        + [(10 + i, "tech", "chip code chip stack common word")
           for i in range(5)],
        "doc_id long, source string, text string")
    got = {(r["source"], r["term"]): r.asDict()
           for r in source_keyness(docs, k=3, min_count=3).collect()}
    # exclusive high-frequency terms dominate their source's list
    sport_terms = {t for (s, t) in got if s == "sport"}
    tech_terms = {t for (s, t) in got if s == "tech"}
    assert "goal" in sport_terms and "chip" in tech_terms
    assert "goal" not in tech_terms and "chip" not in sport_terms
    # shared terms score ~1x lift and are excluded by the k-cut when
    # exclusive terms exist; check the lift value for one entry
    g = got[("sport", "goal")]
    # tf_in=10, tf_out=0, T_in=30, T_out=30:
    # lift = 10 * (30+1) * 1e6 // ((0+1) * 30)
    assert (g["tf_in"], g["tf_out"]) == (10, 0)
    assert g["lift_ppm"] == 10 * 31 * 1_000_000 // 30
    with pytest.raises(ValueError):
        source_keyness(docs, k=0)


def test_vocab_coverage_curve(spark):
    import pytest

    from barkingowl_spark.functions.textstats import vocab_coverage

    docs = spark.createDataFrame(
        [(0, "a a a a b b b c c d"), (1, "a b")],
        "doc_id long, text string")
    got = {r["k"]: r.asDict()
           for r in vocab_coverage(docs, ks=(1, 2, 4, 8)).collect()}
    # tf: a=5 b=4 c=2 d=1, total 12
    assert set(got) == {1, 2, 4}  # k=8 beyond 4 types -> omitted
    assert got[1]["covered_tokens"] == 5
    assert got[1]["coverage_ppm"] == 1_000_000 * 5 // 12
    assert got[2]["covered_tokens"] == 9
    assert got[4]["coverage_ppm"] == 1_000_000
    # monotone non-decreasing in k
    ks = sorted(got)
    cov = [got[k]["coverage_ppm"] for k in ks]
    assert cov == sorted(cov)
    with pytest.raises(ValueError):
        vocab_coverage(docs, ks=())


# ---- lexical diversity + script mix -------------------------------------


def test_lexical_diversity_hand(spark):
    from barkingowl_spark.functions.textstats import lexical_diversity

    docs = spark.createDataFrame(
        [(1, "s1", "a a a b"),        # N=4 V=2 S2=9+1=10
         (2, "s1", "a b"),            # s1 total: N=6, tf a=4 b=2
         (3, "s2", "x y z"),          # all singletons
         (4, "s3", ""), (5, "s4", None)],
        "doc_id long, source string, text string")
    got = {r["source"]: r for r in lexical_diversity(docs).collect()}
    r1 = got["s1"]
    # s1: tf = {a: 4, b: 2} -> N=6, V=2, S2=16+4=20
    assert (r1["n_tokens"], r1["n_types"]) == (6, 2)
    assert r1["ttr_ppm"] == 1_000_000 * 2 // 6
    assert r1["yule_k_milli"] == 10_000_000 * (20 - 6) // 36
    r2 = got["s2"]
    # all singletons -> S2 = N -> K = 0 exactly
    assert (r2["n_tokens"], r2["n_types"], r2["yule_k_milli"]) == \
        (3, 3, 0)
    assert r2["ttr_ppm"] == 1_000_000
    # empty/NULL-text groups produce no row
    assert "s3" not in got and "s4" not in got


def test_script_mix_classes_and_argmax(spark):
    from barkingowl_spark.functions.textstats import script_mix

    docs = spark.createDataFrame(
        [(1, "abcя中7!"),             # 3 latin, 1 cyr, 1 cjk, 1 digit
         (2, "яяя"), (3, "中中"), (4, "123"),
         (5, "!!!"),                  # only 'other'
         (6, ""), (7, None),          # no row
         (8, "aя")],                  # tie -> first argmax (latin)
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in script_mix(docs).collect()}
    r1 = got[1]
    assert r1["n_chars"] == 7
    assert r1["latin_ppm"] == 1_000_000 * 3 // 7
    assert r1["cyrillic_ppm"] == 1_000_000 * 1 // 7
    assert r1["cjk_ppm"] == 1_000_000 * 1 // 7
    assert r1["digit_ppm"] == 1_000_000 * 1 // 7
    assert r1["other_ppm"] == 1_000_000 * 1 // 7
    assert r1["main_script"] == "latin"
    assert got[2]["main_script"] == "cyrillic"
    assert got[2]["cyrillic_ppm"] == 1_000_000
    assert got[3]["main_script"] == "cjk"
    assert got[4]["main_script"] == "digit"
    assert got[5]["main_script"] == "other"
    assert got[5]["other_ppm"] == 1_000_000
    assert 6 not in got and 7 not in got
    assert got[8]["main_script"] == "latin"  # declared-order tie-break


def test_term_burstiness_hand(spark):
    from barkingowl_spark.functions.textstats import term_burstiness

    docs = spark.createDataFrame(
        [(1, "the cat cat cat the"), (2, "the dog"), (3, "the"),
         (4, None)],
        "doc_id long, text string")
    got = {r["term"]: (r["cf"], r["df"], r["burst_ppm"])
           for r in term_burstiness(docs).collect()}
    # 'the': cf=4 over df=3 docs -> burst 1.33e6; 'cat': cf=3 in ONE
    # doc -> burst 3e6 (clumped content word beats the function word)
    assert got["the"] == (4, 3, 4_000_000 // 3)
    assert got["cat"] == (3, 1, 3_000_000)
    assert got["dog"] == (1, 1, 1_000_000)
    assert got["cat"][2] > got["the"][2]
    # top_n cut by (cf desc, term asc)
    top1 = term_burstiness(docs, top_n=1).collect()
    assert len(top1) == 1 and top1[0]["term"] == "the"
