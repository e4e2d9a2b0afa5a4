"""Training-data op tests with PLANTED ground truth — the synthetic
testdata has no real near-duplicates, so these tests plant them and assert
the detectors actually detect (not just run)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def planted_docs(spark):
    base = (
        "the city council met on tuesday to discuss the zoning permit "
        "application for the new public library annex building downtown"
    )
    words = base.split()
    # doc1 == doc0 exactly; doc2 = one word changed (near-dup);
    # doc3 = shuffled tail (near-dup-ish); doc4/5 unrelated
    docs = [
        (0, base, "en", "src0", len(base)),
        (1, base, "en", "src1", len(base)),
        (2, " ".join(["a" if i == 5 else w for i, w in enumerate(words)]),
         "en", "src2", len(base)),
        (3, " ".join(words[:12] + words[12:][::-1]), "en", "src3", len(base)),
        (4, "completely different text about spark shuffle partitions and "
            "adaptive query execution in distributed engines today",
         "en", "src4", 100),
        (5, "short one", "en", "src5", 9),
    ]
    return spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_exact_dedup_finds_planted_pair(planted_docs):
    from barkingowl_spark.operators.corpus_dedup import exact_dup_groups

    groups = {r["keep_id"]: r["dup_count"]
              for r in exact_dup_groups(planted_docs).collect()}
    assert groups[0] == 2          # docs 0 and 1 collapse
    assert sum(groups.values()) == 6


def test_jaccard_finds_near_dups(planted_docs):
    from barkingowl_spark.operators.corpus_dedup import jaccard_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard_ppm"]
             for r in jaccard_pairs(planted_docs, threshold_ppm=700_000,
                                    block_col="lang").collect()}
    assert pairs[(0, 1)] == 1_000_000          # identical
    assert (0, 2) in pairs                     # one-word edit
    assert (0, 3) in pairs                     # same token set, reordered
    assert (0, 4) not in pairs and (0, 5) not in pairs


def test_minhash_lsh_finds_near_dups_and_skips_unrelated(planted_docs):
    from barkingowl_spark.operators.corpus_dedup import minhash_band_pairs

    pairs = {(r["doc_a"], r["doc_b"])
             for r in minhash_band_pairs(planted_docs).collect()}
    assert (0, 1) in pairs                     # identical -> all bands
    assert (0, 4) not in pairs                 # unrelated never collides
    assert all(a < b for a, b in pairs)


def test_simhash_identical_docs_same_hash(planted_docs):
    from barkingowl_spark.operators.corpus_dedup import (
        simhash16,
        simhash_dup_candidates,
    )

    h = {r["doc_id"]: r["simhash"] for r in simhash16(planted_docs).collect()}
    assert h[0] == h[1] == h[3]    # same token SET -> same simhash
    assert h[0] != h[4]
    cands = {r["doc_id"] for r in
             simhash_dup_candidates(planted_docs).collect()}
    assert {0, 1, 3} <= cands


def test_similarity_matches_numpy(spark):
    from barkingowl_spark.operators.similarity import cosine_topk, dot_topk

    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(40, 16)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(40)],
        "vec_id long, embedding array<float>, label int",
    )
    got = dot_topk(df, n_queries=3, k=4).collect()
    q = np.round(vecs.astype(np.float64) * 1000)
    scores = q @ q.T
    for r in got:
        assert r["score"] == int(scores[r["q_id"], r["vec_id"]])
    for qi in range(3):
        order = sorted(
            (int(-scores[qi, j]), j) for j in range(40) if j != qi
        )[:4]
        want_ids = [j for _, j in order]
        got_ids = [r["vec_id"] for r in sorted(
            (x for x in got if x["q_id"] == qi), key=lambda x: x["rank"])]
        assert got_ids == want_ids

    cos = {(r["q_id"], r["vec_id"]): r["cosine_ppm"]
           for r in cosine_topk(df, n_queries=2, k=3).collect()}
    full = vecs.astype(np.float64) @ vecs.astype(np.float64).T
    for (qi, vi), c in cos.items():
        # fixed-point ppm vs true float cosine: milli-quantization on
        # dim-16 unit vectors bounds the error well under 5e-3
        assert abs(c / 1e6 - full[qi, vi]) < 5e-3


def test_ivf_bucket_search_subset_of_bucket(spark):
    from barkingowl_spark.operators.similarity import ivf_assign, ivf_topk

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(60)],
        "vec_id long, embedding array<float>, label int",
    )
    buckets = {r["vec_id"]: r["bucket"]
               for r in ivf_assign(df, n_centroids=4).collect()}
    assert set(buckets.values()) <= set(range(4))
    for r in ivf_topk(df, n_queries=5, k=3, n_centroids=4).collect():
        assert buckets[r["vec_id"]] == buckets[r["q_id"]] == r["bucket"]


def test_embed_near_dup_planted_pair(spark):
    """A planted near-duplicate pair must surface; the accept test must
    agree with numpy's exact quantized cosine^2 on every candidate."""
    from barkingowl_spark.operators.similarity import (
        embed_near_dup_pairs,
        ivf_assign,
    )

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # plant: vec 41 = vec 40 + tiny noise -> cosine ~0.999
    vecs[41] = vecs[40] + rng.normal(scale=0.01, size=16).astype(np.float32)
    vecs[41] /= np.linalg.norm(vecs[41])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(50)],
        "vec_id long, embedding array<float>, label int",
    )
    thr = 0.9
    got = {(r["ia"], r["ib"]) for r in
           embed_near_dup_pairs(df, threshold=thr, n_centroids=4).collect()}
    assert (40, 41) in got
    # numpy replay of the exact integer-quantized accept test, restricted
    # to same-IVF-cell pairs (the operator's blocking contract)
    q = np.round(vecs.astype(np.float64) * 1000)
    n2 = (q * q).sum(axis=1)
    buckets = {r["vec_id"]: r["bucket"]
               for r in ivf_assign(df, n_centroids=4).collect()}
    want = set()
    for a in range(50):
        for b in range(a + 1, 50):
            if buckets[a] != buckets[b]:
                continue
            dot = float(q[a] @ q[b])
            if dot > 0 and dot * dot >= (thr * thr) * n2[a] * n2[b]:
                want.add((a, b))
    assert got == want


def test_multimodal_resize_and_frames(spark, planted_docs):
    from barkingowl_spark.operators.multimodal import (
        attach_binary,
        resize_images,
        sample_frames,
    )

    mm = attach_binary(planted_docs)
    for r in resize_images(mm, max_side=32).collect():
        # aspect bound holds and never upsizes
        assert max(r["out_width"], r["out_height"]) <= 32
        assert r["out_width"] <= r["width"] and r["out_height"] <= r["height"]
        assert r["out_bytes"] == r["out_width"] * r["out_height"]
    texts = {r["doc_id"]: r["text"] for r in planted_docs.collect()}
    frames = sample_frames(mm, stride=64, max_frames=8).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        n = len(texts[doc_id].encode("utf-8"))
        assert len(rows) == min(8, (n + 63) // 64)
        assert sum(r["frame_bytes"] for r in rows) == min(n, 8 * 64)
        assert [r["frame_idx"] for r in sorted(
            rows, key=lambda x: x["frame_off"])] == list(range(len(rows)))


def test_multimodal_stub_plumbing(spark, planted_docs):
    from barkingowl_spark.operators.multimodal import (
        attach_binary,
        decode_features,
    )

    out = {r["doc_id"]: r for r in
           decode_features(attach_binary(planted_docs)).collect()}
    assert len(out) == 6
    row0 = out[0]
    assert row0["byte_len"] == len(
        planted_docs.filter(F.col("doc_id") == 0).collect()[0]["text"]
        .encode("utf-8")
    )
    assert row0["width"] == (ord("t") % 64) + 16
    assert row0["is_valid"]


def test_langid_and_quality(spark):
    from barkingowl_spark.functions.textstats import lang_id, quality_score

    docs = spark.createDataFrame(
        [
            (0, "the council and the mayor of the city", "en", "s", 10),
            (1, "der rat und die stadt ist nicht klein", "de", "s", 10),
            (2, "le conseil et la ville les rues des", "fr", "s", 10),
            (3, "xyzzy qwerty plugh", "en", "s", 10),  # no markers -> und
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "fr"
    assert got[3] == "und"
    q = {r["doc_id"]: r for r in quality_score(docs, min_tokens=5).collect()}
    assert not q[3]["is_quality"]  # zero stopwords
    assert q[0]["stop_ppm"] > 0


def test_simhash_near_pairs_planted(planted_docs):
    """Identical docs are hamming-0; the banded equi-join must surface
    them; every emitted pair must satisfy the exact hamming bound; the
    pigeonhole precondition is enforced."""
    from barkingowl_spark.operators.corpus_dedup import simhash_near_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_pairs(planted_docs).collect()}
    assert pairs[(0, 1)] == 0          # exact dup pair
    assert all(h <= 3 for h in pairs.values())
    with pytest.raises(ValueError):
        simhash_near_pairs(planted_docs, max_hamming=4)


def test_simhash_near_pairs_vs_bruteforce(planted_docs):
    """Banded candidates + hamming filter == brute-force all-pairs
    hamming<=3 over the same simhashes (pigeonhole completeness)."""
    from barkingowl_spark.operators.corpus_dedup import (
        simhash16,
        simhash_near_pairs,
    )

    sims = {r["doc_id"]: r["simhash"]
            for r in simhash16(planted_docs).collect()}
    want = {
        (a, b): bin(sims[a] ^ sims[b]).count("1")
        for a in sims for b in sims
        if a < b and bin(sims[a] ^ sims[b]).count("1") <= 3
    }
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash_near_pairs(planted_docs).collect()}
    assert got == want


def test_simhash64_near_pairs_vs_bruteforce(planted_docs):
    """64-bit variant (the corpus-scale path): banded candidates +
    hamming filter == brute-force all-pairs hamming<=3 over the same
    64-bit fingerprints; identical dups are hamming-0; bit 63 packs as
    LONG_MIN (signed pattern identical across engines)."""
    from barkingowl_spark.operators.corpus_dedup import (
        simhash64,
        simhash64_near_pairs,
    )

    sims = {r["doc_id"]: r["simhash64"]
            for r in simhash64(planted_docs).collect()}
    mask = (1 << 64) - 1
    want = {
        (a, b): bin((sims[a] ^ sims[b]) & mask).count("1")
        for a in sims for b in sims
        if a < b and bin((sims[a] ^ sims[b]) & mask).count("1") <= 3
    }
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in simhash64_near_pairs(planted_docs).collect()}
    assert got == want
    assert got[(0, 1)] == 0
    with pytest.raises(ValueError):
        simhash64_near_pairs(planted_docs, max_hamming=4)


def test_lsh_bucket_search(spark):
    """Sign-LSH: identical vectors share a bucket and find each other;
    every hit stays inside the query's bucket; scores are exact
    quantized dots."""
    from barkingowl_spark.operators.similarity import lsh_assign, lsh_topk

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    vecs[25] = vecs[2]                 # planted exact duplicate of q=2
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(50)],
        "vec_id long, embedding array<float>, label int",
    )
    buckets = {r["vec_id"]: r["bucket"]
               for r in lsh_assign(df, n_planes=4).collect()}
    assert set(buckets.values()) <= set(range(16))
    assert buckets[2] == buckets[25]
    hits = lsh_topk(df, n_queries=5, k=3, n_planes=4).collect()
    q = np.round(vecs.astype(np.float64) * 1000)
    scores = q @ q.T
    for r in hits:
        # multi-probe: the hit's bucket is within one sign flip of the
        # query's, and the reported bucket is the MATCH's bucket
        assert buckets[r["vec_id"]] == r["bucket"]
        assert bin(r["bucket"] ^ buckets[r["q_id"]]).count("1") <= 1
        assert r["score"] == int(scores[r["q_id"], r["vec_id"]])
    top2 = [r for r in hits if r["q_id"] == 2 and r["rank"] == 1]
    assert top2 and top2[0]["vec_id"] == 25   # the planted dup wins
    # probe_hamming=0 keeps the strict single-bucket contract
    for r in lsh_topk(df, n_queries=5, k=3, n_planes=4,
                      probe_hamming=0).collect():
        assert buckets[r["vec_id"]] == buckets[r["q_id"]] == r["bucket"]


def test_containment_catches_excerpt(spark):
    """One-sided containment: an excerpt doc whose token set is fully
    inside a longer doc scores cont=1.0 from the excerpt's side while
    Jaccard is well below it; scores match an independent set-math
    check on every emitted pair."""
    from barkingowl_spark.operators.corpus_dedup import containment_pairs

    long_words = [f"w{i}" for i in range(45)]
    docs = [
        (0, " ".join(long_words), "en", "s0", 1),
        (1, " ".join(long_words[:30]), "en", "s1", 1),   # pure excerpt
        (2, "totally unrelated text about adaptive query execution",
         "en", "s2", 1),
    ]
    df = spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    got = {(r["doc_a"], r["doc_b"]): (r["cont_a_ppm"], r["cont_b_ppm"])
           for r in containment_pairs(df, threshold_ppm=900_000)
           .collect()}
    assert (0, 1) in got
    cont_0, cont_1 = got[(0, 1)]
    # |A∩B|=30: from the long doc's side 30/45, from the excerpt's 30/30
    assert cont_0 == 30 * 1_000_000 // 45
    assert cont_1 == 1_000_000
    toks = {d: set(t.split()) for d, t, *_ in docs}
    for (a, b), (ca, cb) in got.items():
        inter = len(toks[a] & toks[b])
        assert ca == inter * 1_000_000 // len(toks[a])
        assert cb == inter * 1_000_000 // len(toks[b])


def test_winnow_pairs_moss_join(spark):
    """MOSS-style reuse detection: docs sharing a long passage pair up
    with shared >= min_shared; a boilerplate phrase on many docs is a
    stop fingerprint and generates no pairs; counts match a pure-Python
    winnowing reimplementation."""
    import hashlib

    from barkingowl_spark.functions.textstats import winnow_pairs

    passage = ("the committee approved the zoning variance after a "
               "lengthy public comment period on tuesday evening")
    boiler = "all rights reserved worldwide"
    docs = [
        (0, passage + " and then some extra words follow here"),
        (1, "intro words first " + passage),
        (2, "totally different content about query optimizers today"),
    ] + [(10 + i, boiler + f" unique{i} tail{i} words{i} here{i}")
         for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def py_winnow(text, k=3, w=4):
        ws = text.split(" ")
        if len(ws) < k:
            return set()
        h = [hashlib.md5(" ".join(ws[i:i + k]).encode()).hexdigest()
             for i in range(len(ws) - k + 1)]
        if len(h) <= w:
            return {min(h)}
        return {min(h[j:j + w]) for j in range(len(h) - w + 1)}

    fps = {d: py_winnow(t) for d, t in docs}
    # python-side expected pairs under the same stop-fp cap
    from collections import Counter
    carry = Counter(f for s in fps.values() for f in s)
    live = {f for f, c in carry.items() if 2 <= c <= 32}
    want = {}
    ids = [d for d, _ in docs]
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n = len(fps[a] & fps[b] & live)
            if n >= 2:
                want[(min(a, b), max(a, b))] = n
    got = {(r["doc_a"], r["doc_b"]): r["shared"]
           for r in winnow_pairs(df).collect()}
    assert got == want
    assert (0, 1) in got          # the shared passage is detected
    assert all(a < 10 or b < 10 for a, b in got)  # boiler: no pairs


def test_semantic_dedup_groups_and_keeper(spark):
    """SemDeDup composition: transitive near-dup group collapses to one
    keeper (max squared quantized norm, ties lowest id); singletons are
    absent; gemm and pure-Catalyst paths agree row-for-row."""
    from barkingowl_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=16)
    base /= np.linalg.norm(base)
    vecs = rng.normal(size=(20, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    # plant a 3-chain: 10 ~ 11 ~ 12 (10 and 12 still close here, but
    # transitivity is what the CC stage guarantees regardless);
    # 11 gets a LONGER vector so it must win the keeper argmax
    vecs[10] = base
    vecs[11] = base * 1.5
    vecs[12] = base + rng.normal(scale=0.01, size=16)
    vecs[12] /= np.linalg.norm(vecs[12])
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], 0) for i in range(20)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = semantic_dedup(df, threshold=0.95, n_centroids=4).collect()
    by_id = {r["vec_id"]: r for r in rows}
    assert {10, 11, 12} <= set(by_id)
    comp = {by_id[i]["component_id"] for i in (10, 11, 12)}
    assert comp == {10}  # min-id labeling
    assert all(by_id[i]["keeper_id"] == 11 for i in (10, 11, 12))
    assert by_id[11]["is_keeper"] and not by_id[10]["is_keeper"]
    # every emitted component has exactly one keeper
    keepers = {}
    for r in rows:
        keepers.setdefault(r["component_id"], 0)
        keepers[r["component_id"]] += int(r["is_keeper"])
    assert all(v == 1 for v in keepers.values())
    # gemm and column-expression paths are identical
    got_gemm = sorted(map(tuple, (
        (r["vec_id"], r["component_id"], r["keeper_id"], r["is_keeper"])
        for r in rows)))
    got_cat = sorted(map(tuple, (
        (r["vec_id"], r["component_id"], r["keeper_id"], r["is_keeper"])
        for r in semantic_dedup(df, threshold=0.95, n_centroids=4,
                                use_gemm=False).collect())))
    assert got_gemm == got_cat


# ---- perceptual hash (multimodal near-dup) -------------------------------

def test_ahash_stub_bits_and_sign():
    from barkingowl_spark.operators.multimodal import _ahash_stub

    # all-zero payload: no pixel exceeds mean 0 -> hash 0
    assert _ahash_stub(b"\x00" * 64) == 0
    # single high byte at position 63 sets the sign bit (two's compl.)
    h = _ahash_stub(b"\x00" * 63 + b"\xff")
    assert h == -(1 << 63)
    # short payload zero-pads: 'z' at pos 0 -> mean 1 -> bit 0 only
    assert _ahash_stub(b"z") == 1
    # deterministic
    assert _ahash_stub(b"hello world") == _ahash_stub(b"hello world")


def test_perceptual_hash_matches_stub(spark):
    from barkingowl_spark.operators.multimodal import (
        _ahash_stub,
        perceptual_hash,
    )

    payloads = [
        (0, b"the quick brown fox jumps over the lazy dog " * 2),
        (1, b""),
        (2, bytes(range(64))),
        (3, b"\xff" * 64),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {r.doc_id: r.phash for r in perceptual_hash(df).collect()}
    assert got == {d: _ahash_stub(p) for d, p in payloads}


def test_phash_pairs_banded_equals_bruteforce(spark):
    from barkingowl_spark.operators.multimodal import (
        perceptual_hash,
        phash_near_pairs,
    )

    # clusters: ids 0-2 share payload A, 3-4 share B with a 1-bit-ish
    # tweak, 5 is far away
    A = bytes(range(64))
    B = A[:63] + b"\x00"
    far = bytes(reversed(range(64)))
    payloads = [(0, A), (1, A), (2, A), (3, B), (4, B), (5, far)]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    hashes = perceptual_hash(df)
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in phash_near_pairs(hashes, max_hamming=3).collect()}
    # brute force over the collected hashes
    hs = {r.doc_id: r.phash for r in hashes.collect()}
    want = {}
    for a in sorted(hs):
        for b in sorted(hs):
            if a < b:
                ham = bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
                if ham <= 3:
                    want[(a, b)] = ham
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 0
    assert (5, 0) not in got and (0, 5) not in got


def test_lsh_recall_audit(spark):
    """Truth from an independent python brute force; the audit's
    counters must match exactly (recall may be < 1e6 — LSH banding is
    allowed to miss, that is the point of measuring it)."""
    from barkingowl_spark.operators.corpus_dedup import (
        lsh_recall_audit, minhash_band_pairs)

    docs = [
        (0, "a b c d e f g h"),
        (1, "a b c d e f g h"),          # exact dup of 0
        (2, "a b c d e f g x"),          # near dup of 0/1
        (3, "p q r s t u v w"),          # unrelated
        (4, "p q r s t u v w y z"),      # near dup of 3
        (5, "one two"),                  # < 3 tokens: no shingles
        (6, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def shingles(text):
        w = [t for t in (text or "").split(" ")]
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)} \
            if len(w) >= 3 else set()

    sh = {d: shingles(t) for d, t in docs if shingles(t)}
    truth = set()
    for a in sh:
        for b in sh:
            if a < b:
                j = len(sh[a] & sh[b]) * 1_000_000 // len(sh[a] | sh[b])
                if j >= 600_000:
                    truth.add((a, b))
    cand = {(r["doc_a"], r["doc_b"])
            for r in minhash_band_pairs(df).collect()}
    row = lsh_recall_audit(df).collect()[0]
    assert row["n_true"] == len(truth)
    assert row["n_cand"] == len(cand)
    assert row["n_hit"] == len(truth & cand)
    if truth:
        assert row["recall_ppm"] == \
            1_000_000 * len(truth & cand) // len(truth)
    # the planted exact dup must always be caught (identical sigs)
    assert (0, 1) in cand and row["n_hit"] >= 1


def test_shingle_novelty(spark):
    from barkingowl_spark.operators.corpus_dedup import shingle_novelty

    docs = [
        (0, "a b c d"),        # shingles {abc, bcd} — all new
        (1, "a b c d"),        # exact dup -> novelty 0
        (2, "a b c x y"),      # {abc, bcx, cxy}: 1 seen, 2 new
        (3, "one two"),        # no shingles -> absent
        (4, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_sh"], r["n_new"], r["novelty_ppm"])
           for r in shingle_novelty(df).collect()}
    assert got == {
        0: (2, 2, 1_000_000),
        1: (2, 0, 0),
        2: (3, 2, 666_666),
    }


def test_contrastive_triplets(spark):
    from barkingowl_spark.operators.corpus_dedup import (
        contrastive_triplets, verified_near_dup_pairs)

    docs = [
        # source s1: 10/11 near-dups (not exact), 12/13 fillers
        (10, "a b c d e f g h i j", "s1"),
        (11, "a b c d e f g h i x", "s1"),
        (12, "p q r s t u v w", "s1"),
        (13, "completely different words here now", "s1"),
        # source s2: 20/21 exact dups (jaccard 1e6 -> excluded by hi)
        (20, "m n o p q r s t", "s2"),
        (21, "m n o p q r s t", "s2"),
        # s3 singleton: near-dup of nothing
        (30, "z y x w v u t s", "s3"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {(r["anchor"], r["positive"]): r["negative"]
           for r in contrastive_triplets(df).collect()}
    ver = {(r["doc_a"], r["doc_b"]): r["jaccard_ppm"]
           for r in verified_near_dup_pairs(df, 300_000).collect()}
    # 10/11 is a verified in-band pair; anchor 10's next same-source id
    # is 11 == positive, so the negative must skip to 12
    assert (10, 11) in ver and 300_000 <= ver[(10, 11)] <= 900_000
    assert got[(10, 11)] == 12
    # exact dups 20/21 are excluded by the hi bound
    assert (20, 21) in ver and ver[(20, 21)] == 1_000_000
    assert (20, 21) not in got
    # every emitted negative differs from anchor and positive
    for (a, p), n in got.items():
        assert n not in (a, p)


def test_near_dup_threshold_curve(spark):
    from barkingowl_spark.operators.corpus_dedup import (
        near_dup_threshold_curve, verified_near_dup_pairs)

    docs = [
        (0, "a b c d e f g h i j", "s"),
        (1, "a b c d e f g h i j", "s"),    # j = 1.0
        (2, "a b c d e f g h i x", "s"),    # high-j with 0/1
        (3, "a b c d e z z2 z3 z4 z5", "s"),
        (4, "completely different words here today", "s"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    ver = [r["jaccard_ppm"]
           for r in verified_near_dup_pairs(df, 500_000).collect()]
    got = {r["threshold_ppm"]: r["n_pairs_ge"]
           for r in near_dup_threshold_curve(df).collect()}
    assert set(got) == {500_000 + 50_000 * i for i in range(10)}
    for t, n in got.items():
        if t == 950_000:
            # top bucket is open-ended: counts jaccard >= 950k incl 1e6
            assert n == sum(1 for j in ver if j >= 950_000)
        else:
            assert n == sum(1 for j in ver if j >= t)
    # monotone non-increasing in threshold
    ts = sorted(got)
    assert all(got[a] >= got[b] for a, b in zip(ts, ts[1:]))


def test_vocab_growth(spark):
    from barkingowl_spark.functions.textstats import vocab_growth

    docs = [
        (0, "a b a"),
        (1, "b c"),
        (4, "c d e"),
        (7, None),
        (10, "a f"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["checkpoint_doc_id"]: (r["vocab_size"], r["tokens_cum"])
           for r in vocab_growth(df, n_checkpoints=5).collect()}
    # max doc_id = 10 -> checkpoints 2, 4, 6, 8, 10
    def brute(cp):
        vocab, toks = set(), 0
        for d, t in docs:
            if d <= cp:
                ts = [x for x in (t or "").split(" ") if x]
                vocab |= set(ts)
                toks += len(ts)
        return (len(vocab), toks)
    assert got == {cp: brute(cp) for cp in (2, 4, 6, 8, 10)}


def test_oov_rate(spark):
    from barkingowl_spark.functions.textstats import oov_rate

    docs = [
        (0, "the the the cat", "a"),
        (1, "the dog ran", "a"),
        (2, "xylophone quartz", "b"),
        (3, None, "b"),
        (4, "the", "b"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    # vocab_size=2 -> vocab = {the(5), cat/dog/ran/... tie -> 'cat'}
    got = {r["source"]: (r["tokens"], r["oov_tokens"], r["oov_ppm"])
           for r in oov_rate(df, vocab_size=2).collect()}
    # source a: 7 tokens, in-vocab: 4x the + cat -> 2 oov (dog, ran)
    assert got["a"] == (7, 2, 2_000_000 // 7)
    # source b: 3 tokens, 'the' in vocab -> 2 oov
    assert got["b"] == (3, 2, 2_000_000 // 3)


def test_zipf_slope(spark):
    from barkingowl_spark.functions.textstats import zipf_slope

    # zipfian-ish: term_i appears ~N/i times
    docs = []
    did = 0
    for i in range(1, 9):
        for _ in range(64 // i):
            docs.append((did, f"w{i}"))
            did += 1
    df = (spark.createDataFrame(docs, "doc_id long, text string"))
    row = zipf_slope(df, top_n=8).collect()[0]
    # brute force the identical integer regression
    import collections
    tf = collections.Counter(t for _, t in docs)
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    xs = [((r * r).bit_length() - 1) for r in range(1, len(top) + 1)]
    ys = [((c * c).bit_length() - 1) for _, c in top]
    n = len(top)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    want = (1_000_000 * num // den if num >= 0
            else -(1_000_000 * (-num) // den))
    assert row["n_terms"] == n
    assert row["slope_ppm"] == want
    # zipf f ~ 1/r -> hb slope near -1e6
    assert -1_300_000 < row["slope_ppm"] < -700_000


def test_cache_hit_curve(spark):
    from barkingowl_spark.operators.ranking import cache_hit_curve

    # keys with frequencies a:8 b:4 c:2 d:1 e:1
    rows = [("a",)] * 8 + [("b",)] * 4 + [("c",)] * 2 + \
        [("d",), ("e",)]
    df = spark.createDataFrame(rows, "key string")
    got = {r["cache_size"]: r["hit_ppm"]
           for r in cache_hit_curve(df, max_size_log2=3).collect()}
    total = 16
    assert got[1] == 1_000_000 * 8 // total
    assert got[2] == 1_000_000 * 12 // total
    assert got[4] == 1_000_000 * 15 // total    # a,b,c,d (d before e)
    assert got[8] == 1_000_000                  # everything cached
    assert sorted(got) == [1, 2, 4, 8]


def test_lang_confusion(spark):
    from barkingowl_spark.functions.textstats import (
        LANG_MARKERS, lang_confusion)

    en = LANG_MARKERS["en"][0]
    de = LANG_MARKERS["de"][0]
    docs = [
        (0, f"{en} {en} text", "en"),       # correct en
        (1, f"{de} wort", "en"),            # declared en, detected de
        (2, "zz qq", "de"),                 # no markers -> und
        (3, f"{de} {de}", "de"),            # correct de
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {(r["lang"], r["pred_lang"]): (r["n"], r["share_ppm"])
           for r in lang_confusion(df).collect()}
    assert got[("en", "en")] == (1, 500_000)
    assert got[("en", "de")] == (1, 500_000)
    assert got[("de", "und")] == (1, 500_000)
    assert got[("de", "de")] == (1, 500_000)


def test_sniff_mime(spark):
    from barkingowl_spark.operators.multimodal import sniff_mime

    rows = [
        (0, b"%PDF-1.4 blah", "application/pdf"),
        (1, b"\x89PNG\r\n\x1a\n....", "application/pdf"),   # lies
        (2, b"<html><body>", "text/html"),
        (3, b"GIF89a......", "image/gif"),
        (4, b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
        (5, b"PK\x03\x04zipzip", "text/plain"),             # lies
        (6, b"plain words", "text/plain"),
        (7, None, "application/pdf"),
        (8, b"BM\x9a\x00\x00\x00\x00\x00\x00\x00\x36", "image/bmp"),
        (9, b"BMW sales rose", "text/plain"),  # weak 'BM' magic
        (10, b"fLaC\x00\x00\x00\x22....", "audio/flac"),
        (11, b"\x1f\x8b\x08\x00gzip body", "application/gzip"),
        # tar: no prefix magic — 'ustar' lives at byte offset 257
        (12, b"f0\x00" + b"\x00" * 254 + b"ustar\x0000",
         "application/x-tar"),
        (13, b"x" * 257 + b"notar", "text/plain"),
        (14, b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1 word",
         "application/x-ole-storage"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, mime string")
    got = {r["doc_id"]: (r["sniffed"], r["agree"])
           for r in sniff_mime(df).collect()}
    assert got[0] == ("application/pdf", True)
    assert got[1] == ("image/png", False)
    assert got[2] == ("text/html", True)
    assert got[3] == ("image/gif", True)
    assert got[4] == ("image/jpeg", True)
    assert got[5] == ("application/zip", False)
    assert got[6] == ("application/octet-stream", False)
    assert got[7] == ("application/octet-stream", False)
    # BMP needs the 4 reserved zero bytes, not just the weak 'BM'
    assert got[8] == ("image/bmp", True)
    assert got[9] == ("application/octet-stream", False)
    assert got[10] == ("audio/flac", True)
    assert got[11] == ("application/gzip", True)
    assert got[12] == ("application/x-tar", True)
    assert got[13] == ("application/octet-stream", False)
    assert got[14] == ("application/x-ole-storage", True)


def test_soft404_scores(spark):
    from barkingowl_spark.operators.traps import soft404_scores

    rows = [
        (0, "Page Not Found - the page does not exist (404)"),
        (1, "404 error: page not found. it has been removed."),
        (2, "our catalogue of 404 ceramic tiles " + "word " * 100),
        (3, "regular article about nothing special at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["marker_hits"], r["soft404"])
           for r in soft404_scores(df).collect()}
    assert got[0][1] is True          # short + many markers
    assert got[1][1] is True
    assert got[2] == (1, False)       # long page, single marker
    assert got[3] == (0, False)
    assert got[4] == (0, False)


def test_readability(spark):
    from barkingowl_spark.functions.textstats import readability

    rows = [(0, "hello world."), (1, ""), (2, None),
            (3, "why try my gym")]  # y-only vowels
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in readability(df).collect()}
    # "hello world.": W=2 S=1 runs=3 -> syll=3
    assert got[0]["n_words"] == 2
    assert got[0]["n_sents"] == 1
    assert got[0]["n_syll"] == 3
    assert got[0]["grade_milli"] == 390 * 2 + 11800 * 3 // 2 - 15590
    assert got[0]["ease_milli"] == 206835 - 1015 * 2 - 84600 * 3 // 2
    # empty / NULL text: no words -> NULL scores, sentence floor 1
    for d in (1, 2):
        assert got[d]["n_words"] == 0
        assert got[d]["n_sents"] == 1
        assert got[d]["grade_milli"] is None
        assert got[d]["ease_milli"] is None
    # y counts as a vowel: 4 words, 4 runs
    assert got[3]["n_syll"] == 4


def test_mojibake_scores(spark):
    from barkingowl_spark.functions.textstats import mojibake_scores

    rows = [
        (0, "caffÃ© latte"),            # one Ã
        (1, "bad Ã text â€” x"),  # Ã + â€ -> 2 kinds
        (2, "a � b � c �"),        # 3 replacement chars
        (3, "clean ascii text"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["moji_hits"], r["moji_kinds"],
                         r["moji_suspect"])
           for r in mojibake_scores(df).collect()}
    assert got[0] == (1, 1, False)
    assert got[1] == (2, 2, True)
    assert got[2] == (3, 1, True)
    assert got[3] == (0, 0, False)
    assert got[4] == (0, 0, False)


def test_lsh_plan_matches_reference_curve(spark):
    import pytest

    from barkingowl_spark.operators.corpus_dedup import lsh_plan

    rows = lsh_plan(spark, n_perms=12, grid_step_ppm=100_000).collect()

    def p_ref(s, b, r):
        x = 10 ** 6
        for _ in range(r):
            x = x * s // 10 ** 6
        y = 10 ** 6
        for _ in range(b):
            y = y * (10 ** 6 - x) // 10 ** 6
        return 10 ** 6 - y

    assert {(t["b"], t["r"]) for t in rows} == {
        (1, 12), (2, 6), (3, 4), (4, 3), (6, 2), (12, 1)}
    for t in rows:
        assert t["p_ppm"] == p_ref(t["s_ppm"], t["b"], t["r"])
    # exactly one crossover per (b, r) and the curve is monotone in s
    from collections import defaultdict
    per = defaultdict(list)
    for t in rows:
        per[(t["b"], t["r"])].append(t)
    for pts in per.values():
        pts.sort(key=lambda t: t["s_ppm"])
        ps = [t["p_ppm"] for t in pts]
        assert ps == sorted(ps)
        assert sum(1 for t in pts if t["crossover"]) == 1
    # more bands -> curve shifts left (collides at lower similarity)
    cross = {(t["b"], t["r"]): t["s_ppm"] for t in rows
             if t["crossover"]}
    ordered = [cross[k] for k in sorted(cross)]  # b ascending
    assert ordered == sorted(ordered, reverse=True)

    with pytest.raises(ValueError):
        lsh_plan(spark, n_perms=0)


def test_bbit_minwise_audit_matches_reimpl(spark):
    """b-bit projection, debiased estimate, and exact Jaccard all
    match an independent hashlib reimplementation on planted dups."""
    import hashlib

    from barkingowl_spark.operators.corpus_dedup import (
        bbit_minwise_audit,
    )

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy cat",  # near-dup
        3: "the quick brown fox jumps over the lazy dog",  # exact dup
        4: "completely different words appear in here now",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]):
           (r["matches"], r["est_ppm"], r["jaccard_ppm"],
            r["abs_err_ppm"])
           for r in bbit_minwise_audit(docs).collect()}
    assert got  # LSH found the planted pairs

    def shingles(t):
        w = t.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    def sig(t, i):
        return min(hashlib.md5((s + f"#{i}").encode()).hexdigest()
                   for s in shingles(t))

    for (a, b), (m, est, jac, err) in got.items():
        want_m = sum(
            int(sig(texts[a], i)[31], 16) == int(sig(texts[b], i)[31], 16)
            for i in range(8))
        assert m == want_m, (a, b)
        assert est == max(0, (16 * want_m - 8) * 1_000_000 // (8 * 15))
        ta, tb = set(texts[a].split()), set(texts[b].split())
        want_j = int(len(ta & tb) * 1_000_000 / len(ta | tb))
        assert jac == want_j and err == abs(est - want_j)
    # the exact-dup pair estimates 1e6 exactly (all nibbles match)
    assert got[(1, 3)][0] == 8 and got[(1, 3)][1] == 1_000_000


def test_margin_knn_suppresses_hubs(spark):
    """Margin scoring (similarity.margin_knn_pairs): a hub vector with
    uniformly high cosine to everything must rank BELOW a sharp
    isolated pair of equal raw cosine — the Artetxe-Schwenk property a
    raw threshold lacks — and the integer margin must match a
    pure-Python replay of the spec."""
    import math

    from barkingowl_spark.operators.similarity import margin_knn_pairs

    dim = 6

    def unit(*basis):
        v = [0.0] * dim
        for i, wgt in basis:
            v[i] = wgt
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # evens = side A, odds = side B.
    # sharp pair: A0 ~ B1 (cos ~0.95), both far from everything else.
    # hub: A2 has cos ~0.9 to B3, B5, B7 alike (dense neighborhood).
    rows = [
        (0, unit((0, 1.0))),
        (1, unit((0, 0.95), (1, math.sqrt(1 - 0.95 ** 2)))),
        (2, unit((2, 1.0))),
        (3, unit((2, 0.9), (3, math.sqrt(1 - 0.81)))),
        (5, unit((2, 0.9), (4, math.sqrt(1 - 0.81)))),
        (7, unit((2, 0.9), (5, math.sqrt(1 - 0.81)))),
        (4, unit((3, 1.0))),   # extra A-side vectors so k-NN lists
        (6, unit((4, 1.0))),   # have mass on both sides
        (9, unit((5, 1.0))),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    got = {(r["x_id"], r["y_id"]): r
           for r in margin_knn_pairs(emb, k=3, n_side=8,
                                     top_pairs=40).collect()}
    sharp = got[(0, 1)]
    hub_edges = [got[(2, y)] for y in (3, 5, 7)]
    # hub raw cosines ~0.9e6 rival the sharp pair's 0.95e6, but every
    # hub edge's margin must fall below the sharp pair's
    assert all(e["cosine_ppm"] > 850_000 for e in hub_edges)
    for e in hub_edges:
        assert e["margin_ppm"] < sharp["margin_ppm"], (e, sharp)
    assert sharp["rank"] == min(r["rank"] for r in got.values())

    # integer replay of the full spec on the quantized vectors
    q = {i: [round(x * 1000) for x in v] for i, v in rows}
    ids_a = sorted(i for i in q if i % 2 == 0)
    ids_b = sorted(i for i in q if i % 2 == 1)

    def cos_ppm(x, y):
        dot = sum(a * b for a, b in zip(q[x], q[y]))
        nx = sum(a * a for a in q[x])
        ny = sum(b * b for b in q[y])
        return math.floor(dot * 1_000_000.0 / math.sqrt(nx * ny))

    def topk(vals, k):
        return sorted(vals, key=lambda t: (-t[0], t[1]))[:k]

    avg = {}
    for x in ids_a:
        best = topk([(cos_ppm(x, y), y) for y in ids_b], 3)
        avg[("a", x)] = math.floor(
            sum(c for c, _ in best) / len(best))
    for y in ids_b:
        best = topk([(cos_ppm(x, y), x) for x in ids_a], 3)
        avg[("b", y)] = math.floor(
            sum(c for c, _ in best) / len(best))
    for (x, y), r in got.items():
        den = avg[("a", x)] + avg[("b", y)]
        c = cos_ppm(x, y)
        assert r["cosine_ppm"] == c, (x, y)
        if den <= 0:
            assert r["margin_ppm"] is None
        else:
            want = ((2_000_000 * c) // den if c >= 0
                    else -((2_000_000 * -c) // den))
            assert r["margin_ppm"] == want, (x, y)
