"""Exact discrete token-length percentiles (functions/textstats.py::
length_percentiles) vs an independent sorted-list reference."""

from __future__ import annotations

import math

from barkingowl_spark.functions.textstats import length_percentiles


def ref_pctl(groups: dict[str, list[int]]) -> dict[str, tuple]:
    out = {}
    for src, toks in groups.items():
        s = sorted(toks)
        n = len(s)
        pick = lambda q: s[max(1, math.ceil(q * n)) - 1]  # noqa: E731
        out[src] = (n, pick(0.25), pick(0.5), pick(0.75), pick(0.9))
    return out


GROUPS = {
    "a": [5, 1, 9, 3, 7, 2, 8, 4, 6, 10],  # n=10: clean quartiles
    "b": [4],                              # n=1: all percentiles = 4
    "c": [0, 0, 100],                      # skew + zero-token docs
    "d": [3, 1, 4, 1, 5, 9, 2],            # n=7: ragged indexes
}


def test_matches_sorted_reference(spark):
    rows = []
    i = 0
    for src, toks in GROUPS.items():
        for t in toks:
            rows.append((i, src, " ".join(["w"] * t) if t else None))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: (r["n_docs"], r["p25"], r["p50"], r["p75"], r["p90"])
        for r in length_percentiles(docs).collect()
    }
    assert got == ref_pctl(GROUPS)
    # ceil-index spot checks: n=10 -> p25 = 3rd smallest, p90 = 9th
    assert got["a"][1] == 3 and got["a"][4] == 9
