"""Posting-list compression audit (invindex.py::posting_compression):
bit costs pinned against a brute-force python encoder, winner rule and
rollup identities checked."""

from __future__ import annotations

from barkingowl_spark.operators.invindex import (
    compression_rollup,
    posting_compression,
)

DOCS = [
    (0, "alpha beta common"),
    (1, "beta common"),
    (2, "common"),
    (3, "alpha common gamma"),
    (4, "common"),
    (5, "common beta"),
    (6, None),
    (900, "alpha sparse common"),  # id gap: stresses vbyte multi-byte
]


def _py_costs(docs):
    posts = {}
    for doc_id, text in docs:
        for t in set((text or "").split(" ")) - {""}:
            posts.setdefault(t, []).append(doc_id)
    u = max(d for d, _ in docs if _nonempty(_)) + 1
    out = {}
    for t, ids in posts.items():
        ids = sorted(ids)
        n = len(ids)
        l = (u // n).bit_length() - 1
        ef = n * l + n + (u >> l)
        vb = 0
        prev = -1
        for d in ids:
            g = d - prev
            vb += (g.bit_length() + 6) // 7
            prev = d
        vb *= 8
        bm = u
        best_bits = min(ef, vb, bm)
        best = ("ef" if ef == best_bits
                else "vbyte" if vb == best_bits else "bitmap")
        out[t] = (n, ef, vb, bm, best, best_bits)
    return out


def _nonempty(text):
    return any(t for t in (text or "").split(" "))


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_costs_match_bruteforce(spark):
    got = {
        r["term"]: (r["df"], r["ef_bits"], r["vbyte_bits"],
                    r["bitmap_bits"], r["best"], r["best_bits"])
        for r in posting_compression(_docs(spark)).collect()
    }
    assert got == _py_costs(DOCS)


def test_winner_shapes(spark):
    rows = {r["term"]: r
            for r in posting_compression(_docs(spark)).collect()}
    # 'common' is in every doc incl. id 900: near-dense over a 901
    # universe still beats nothing — but its EF cost must be far below
    # the bitmap (901 bits vs n*(l+1) + u>>l).
    assert rows["common"]["best"] != "bitmap" or \
        rows["common"]["bitmap_bits"] <= rows["common"]["ef_bits"]
    # singleton 'sparse' (one doc at id 900): vbyte = 2 bytes = 16 bits
    assert rows["sparse"]["vbyte_bits"] == 16
    assert rows["sparse"]["df"] == 1
    # every best_bits is the true min
    for r in rows.values():
        assert r["best_bits"] == min(
            r["ef_bits"], r["vbyte_bits"], r["bitmap_bits"])


def test_rollup_identities(spark):
    per = posting_compression(_docs(spark))
    roll = compression_rollup(per).collect()[0]
    rows = per.collect()
    assert roll["n_terms"] == len(rows)
    assert roll["mixed_bits"] == sum(r["best_bits"] for r in rows)
    assert roll["mixed_bits"] <= min(
        roll["ef_bits"], roll["vbyte_bits"], roll["bitmap_bits"])
    assert (roll["n_ef"] + roll["n_vbyte"] + roll["n_bitmap"]
            == roll["n_terms"])


def test_plan_term_partitioned_no_global_sort(spark):
    q = posting_compression(_docs(spark))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(term" in plan
    assert "rangepartitioning" not in plan
