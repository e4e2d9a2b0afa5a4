"""SymSpell deletion-neighborhood correction (operators/spell.py)."""

from __future__ import annotations


def test_spell_correct_basic(spark):
    from barkingowl_spark.operators.spell import spell_correct

    vocab = spark.createDataFrame(
        [("hello", 5), ("help", 3), ("melon", 2)], "term string, df long")
    queries = spark.createDataFrame(
        [("helo",), ("hello",), ("zzz",)], "query string")
    got = {}
    for r in spell_correct(vocab, queries, topk=3).collect():
        got.setdefault(r["query"], []).append(
            (r["rnk"], r["term"], r["dist"]))
    # insertion and substitution candidates, ranked dist then df
    assert sorted(got["helo"]) == [(1, "hello", 1), (2, "help", 1)]
    # in-vocabulary query ranks itself first at dist 0
    assert sorted(got["hello"])[0] == (1, "hello", 0)
    # no candidate within distance 1 -> absent, not a null row
    assert "zzz" not in got


def test_spell_stop_variant_cap(spark):
    from barkingowl_spark.operators.spell import spell_correct

    # 5 terms all sharing variant 'ab' (and more): cap at 3 keeps the
    # hot variant out of the join entirely
    vocab = spark.createDataFrame(
        [("ab", 1), ("aab", 1), ("abb", 1), ("abc", 1), ("xab", 1)],
        "term string, df long")
    queries = spark.createDataFrame([("ab",)], "query string")
    got = spell_correct(vocab, queries, topk=10,
                        max_terms_per_variant=3).collect()
    # 'ab' itself survives only via variants below the cap; with the
    # dominant bucket dropped the result is a subset of the uncapped
    uncapped = spell_correct(vocab, queries, topk=10).collect()
    assert {r["term"] for r in got} <= {r["term"] for r in uncapped}
    assert all(r["dist"] <= 1 for r in got)
