"""species_richness: Chao1 + Good-Turing against hand-computed truth."""

from __future__ import annotations

from barkingowl_spark.operators.coverage import species_richness


def test_species_richness_hand_case(spark):
    # host A: items x,x,x,y,z -> n=5 s=3 f1=2(y,z) f2=0
    #   chao1 = 3 + 2*1//2 = 4; unseen = 1e6*2//5 = 400000
    # host B: items p,p,q,q   -> n=4 s=2 f1=0 f2=2
    #   chao1 = 2; unseen = 0
    rows = ([("A", "x")] * 3 + [("A", "y"), ("A", "z")]
            + [("B", "p"), ("B", "p"), ("B", "q"), ("B", "q")])
    obs = spark.createDataFrame(rows, "host string, item string")
    got = {r["key"]: r.asDict()
           for r in species_richness(obs, "host", "item").collect()}
    a, b = got["A"], got["B"]
    assert (a["n_obs"], a["s_obs"], a["f1"], a["f2"]) == (5, 3, 2, 0)
    assert a["chao1_est"] == 4
    assert a["unseen_mass_ppm"] == 400_000
    assert a["coverage_ppm"] == 600_000
    assert (b["n_obs"], b["s_obs"], b["f1"], b["f2"]) == (4, 2, 0, 2)
    assert b["chao1_est"] == 2
    assert b["unseen_mass_ppm"] == 0 and b["coverage_ppm"] == 1_000_000


def test_species_richness_invariants_random(spark):
    import random

    random.seed(3)
    rows = [(f"h{random.randint(0, 3)}", f"u{random.randint(0, 50)}")
            for _ in range(600)]
    out = species_richness(
        spark.createDataFrame(rows, "host string, item string"),
        "host", "item").collect()
    from collections import Counter, defaultdict
    per = defaultdict(Counter)
    for h, u in rows:
        per[h][u] += 1
    assert {r["key"] for r in out} == set(per)
    for r in out:
        c = per[r["key"]]
        assert r["n_obs"] == sum(c.values())
        assert r["s_obs"] == len(c)
        assert r["f1"] == sum(1 for v in c.values() if v == 1)
        assert r["f2"] == sum(1 for v in c.values() if v == 2)
        # Chao1 never below observed richness; coverage in [0, 1e6]
        assert r["chao1_est"] >= r["s_obs"]
        assert 0 <= r["coverage_ppm"] <= 1_000_000
        assert r["unseen_mass_ppm"] + r["coverage_ppm"] == 1_000_000
