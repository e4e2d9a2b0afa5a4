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
