"""CORI shard selection (operators/shards.py::cori_shard_ranks):
scores pinned against a brute-force python implementation including
the md5 shard draw, plus routing sanity (the shard holding the rare
term wins its query)."""

from __future__ import annotations

import hashlib

from barkingowl_spark.operators.shards import cori_shard_ranks

DOCS = [
    (0, "alpha beta common"),
    (1, "beta common common"),
    (2, "common gamma"),
    (3, "alpha common"),
    (4, "rare common"),
    (5, "common"),
    (6, None),
    (7, "beta gamma common"),
]

QUERIES = [(1, "rare"), (2, "beta"), (3, "beta"), (3, "common")]

C = 4
DB = 400_000
PPM = 1_000_000


def _shard(doc_id):
    h = int(hashlib.md5(f"shard#{doc_id}".encode()).hexdigest()[:15], 16)
    return h % C


def _py_cori(docs, queries):
    toks = {}
    for doc_id, text in docs:
        ts = [t for t in (text or "").split(" ") if t]
        if ts:
            toks[doc_id] = ts
    cw = {}
    dfts = {}
    for doc_id, ts in toks.items():
        s = _shard(doc_id)
        cw[s] = cw.get(s, 0) + len(ts)
        for t in set(ts):
            dfts[(t, s)] = dfts.get((t, s), 0) + 1
    total_cw = sum(cw.values())
    cf = {}
    for (t, s) in dfts:
        cf[t] = cf.get(t, 0) + 1
    iden_hb = ((C + 1) ** 2).bit_length() - 1
    qdim = sorted(set(queries))
    qn = {}
    for qid, _t in qdim:
        qn[qid] = qn.get(qid, 0) + 1
    scores = {(qid, s): qn[qid] * DB for qid in qn for s in range(C)}
    for qid, t in qdim:
        for s in range(C):
            df = dfts.get((t, s), 0)
            if df == 0 or t not in cf:
                continue
            t_ppm = PPM * df // (df + 50 + (150 * cw[s] * C) // total_cw)
            i_hb = (((2 * C + 1) ** 2) // (4 * cf[t] ** 2)).bit_length() - 1
            i_ppm = PPM * i_hb // iden_hb
            extra = (PPM - DB) * ((t_ppm * i_ppm) // PPM) // PPM
            scores[(qid, s)] += extra
    out = {}
    for qid in qn:
        ordered = sorted(
            ((-scores[(qid, s)], s) for s in range(C)))
        for rank, (negs, s) in enumerate(ordered, start=1):
            out[(qid, s)] = (-negs, rank)
    return out


def test_matches_bruteforce(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, term string")
    got = {
        (r["query_id"], r["shard_id"]): (r["score_fp"], r["rank"])
        for r in cori_shard_ranks(docs, qs, C).collect()
    }
    assert got == _py_cori(DOCS, QUERIES)


def test_rare_term_routes_to_its_shard(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, term string")
    rows = cori_shard_ranks(docs, qs, C).collect()
    top = {r["query_id"]: r["shard_id"] for r in rows if r["rank"] == 1}
    # query 1 = 'rare', which lives only in doc 4's shard
    assert top[1] == _shard(4)
    # every query ranks all C shards exactly once
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, C + 1))


def test_empty_shard_gets_floor_score(spark):
    # only doc 0 survives -> 3 of 4 shards empty; their score is
    # q_n * db exactly
    docs = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, term string")
    rows = cori_shard_ranks(docs, qs, C).collect()
    s0 = _shard(0)
    qn = {1: 1, 2: 1, 3: 2}
    for r in rows:
        if r["shard_id"] != s0:
            assert r["score_fp"] == qn[r["query_id"]] * DB
