"""Randomized cross-checks for the round-2 text operators: each Spark
result must equal an INDEPENDENT pure-Python reimplementation of the
spec on seeded random corpora (dup-heavy, whitespace-noisy, blank-line
riddled) — the same reference-mirror strategy the crawl suite uses.
DuckDB oracles already pin the driver-query instances; these pin the
operator semantics on shapes the fixtures don't reach."""

from __future__ import annotations

import random

import pytest

VOCAB = ["alpha", "beta", "gamma", "delta", "the", "a", "of", "zz"]


def _rand_corpus(seed: int, n_docs: int = 40):
    rng = random.Random(seed)
    hosts = [f"h{i}" for i in range(3)]
    # a pool of candidate lines; reuse across docs creates cross-doc and
    # in-doc duplicate structure
    pool = [" ".join(rng.choices(VOCAB, k=rng.randint(1, 6)))
            for _ in range(15)]
    docs = []
    for i in range(n_docs):
        lines = []
        for _ in range(rng.randint(0, 6)):
            r = rng.random()
            if r < 0.5:
                lines.append(rng.choice(pool))
            elif r < 0.65:
                lines.append("")            # blank
            elif r < 0.8:
                lines.append("  " + rng.choice(pool) + " ")  # ws noise
            else:
                lines.append(" ".join(rng.choices(VOCAB, k=3)))
        docs.append((i, rng.choice(hosts), "\n".join(lines)))
    return docs


def _df(spark, docs):
    return spark.createDataFrame(
        docs, "doc_id long, source string, text string")


def _trimmed_lines(text):
    return [ln.strip() for ln in text.split("\n") if ln.strip() != ""]


# ---------- independent reference implementations ----------

def ref_paradedup(docs):
    seen, out = set(), {}
    for i, _, text in sorted(docs):
        kept = []
        for ln in _trimmed_lines(text):
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        out[i] = "\n".join(kept)
    return out


def ref_boilerplate(docs, threshold_ppm=500_000, min_docs=2):
    from collections import defaultdict
    host_docs = defaultdict(set)
    line_docs = defaultdict(set)
    for i, h, text in docs:
        host_docs[h].add(i)
        for ln in set(_trimmed_lines(text)):
            line_docs[(h, ln)].add(i)
    bp = {
        (h, ln)
        for (h, ln), ds in line_docs.items()
        if len(ds) >= min_docs
        and len(ds) * 1_000_000 >= threshold_ppm * len(host_docs[h])
    }
    return {
        i: "\n".join(ln for ln in _trimmed_lines(text)
                     if (h, ln) not in bp)
        for i, h, text in docs
    }


def ref_line_repetition(docs):
    from collections import Counter
    out = {}
    for i, _, text in docs:
        c = Counter(_trimmed_lines(text))
        total = sum(c.values())
        dup = sum(n for n in c.values() if n > 1)
        tchars = sum(len(l) * n for l, n in c.items())
        dchars = sum(len(l) * n for l, n in c.items() if n > 1)
        out[i] = (
            total, dup,
            dup * 1_000_000 // total if total else 0,
            dchars * 1_000_000 // tchars if tchars else 0,
        )
    return out


def ref_decontam(docs, ev_texts, n):
    def grams(text):
        toks = [t for t in text.replace("\n", " ").split(" ") if t]
        return [" ".join(toks[i:i + n])
                for i in range(len(toks) - n + 1)]

    evset = set()
    for t in ev_texts:
        evset.update(grams(t))
    out = {}
    for i, _, text in docs:
        g = grams(text)
        hits = sum(1 for x in g if x in evset)
        out[i] = (len(g), hits,
                  hits * 1_000_000 // len(g) if g else 0, hits > 0)
    return out


# ---------- the cross-checks ----------

@pytest.mark.parametrize("seed", [11, 12, 13])
def test_paradedup_matches_reference(spark, seed):
    from barkingowl_spark.operators.paradedup import paragraph_dedup

    docs = _rand_corpus(seed)
    got = {r["doc_id"]: r["text_clean"]
           for r in paragraph_dedup(
               _df(spark, docs).select("doc_id", "text")).collect()}
    assert got == ref_paradedup([(i, None, t) for i, _, t in docs])


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_boilerplate_matches_reference(spark, seed):
    from barkingowl_spark.operators.boilerplate import strip_boilerplate

    docs = _rand_corpus(seed)
    got = {r["doc_id"]: r["text_clean"]
           for r in strip_boilerplate(_df(spark, docs)).collect()}
    assert got == ref_boilerplate(docs)


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_line_repetition_matches_reference(spark, seed):
    from barkingowl_spark.functions.repetition import line_repetition

    docs = _rand_corpus(seed)
    got = {r["doc_id"]: (r["total_lines"], r["dup_lines"],
                         r["dup_line_ppm"], r["dup_line_char_ppm"])
           for r in line_repetition(
               _df(spark, docs).select("doc_id", "text")).collect()}
    assert got == ref_line_repetition(docs)


def ref_top_bigram(docs):
    from collections import Counter
    out = {}
    for i, _, text in docs:
        toks = [t for t in text.replace("\n", " ").split(" ") if t]
        c = Counter(" ".join(toks[j:j + 2])
                    for j in range(len(toks) - 1))
        total = sum(c.values())
        top = max(c.values()) if c else 0
        out[i] = (total, top,
                  top * 1_000_000 // total if total else 0)
    return out


@pytest.mark.parametrize("seed", [51, 52, 53])
def test_top_bigram_matches_reference(spark, seed):
    from barkingowl_spark.functions.repetition import top_bigram_share

    docs = _rand_corpus(seed)
    got = {r["doc_id"]: (r["total_bigrams"], r["top_bigram_n"],
                         r["top_bigram_ppm"])
           for r in top_bigram_share(
               _df(spark, docs).select("doc_id", "text")).collect()}
    assert got == ref_top_bigram(docs)


def _is_email(t):
    if t.count("@") != 1:
        return False
    local, dom = t.split("@")
    return (len(local) >= 1 and len(dom) >= 3 and "." in dom
            and not dom.startswith(".") and not dom.endswith("."))


def _is_phone(t):
    s = "".join(ch for ch in t if ch not in "+-()")
    return len(s) >= 7 and s != "" and s.isdigit() \
        and all(ch in "0123456789" for ch in s)


def ref_pii(docs):
    out = {}
    for i, _, text in docs:
        toks = [t for t in text.replace("\n", " ").split(" ") if t]
        e = sum(1 for t in toks if _is_email(t))
        p = sum(1 for t in toks if not _is_email(t) and _is_phone(t))
        out[i] = (e, p, e + p > 0)
    return out


@pytest.mark.parametrize("seed", [61, 62, 63])
def test_pii_matches_reference(spark, seed):
    from barkingowl_spark.functions.pii import pii_scan

    rng = random.Random(seed)
    base = _rand_corpus(seed)
    docs = []
    for i, h, text in base:
        extra = []
        for _ in range(rng.randint(0, 3)):
            extra.append(rng.choice([
                f"user{rng.randint(0, 99)}@mail.test",
                f"+1-(555){rng.randint(1000000, 9999999)}",
                "a@@b.c", "x@.com", "x@com.", "@nope.com", "12345",
                f"{rng.randint(1000000, 99999999)}",
                "a@b", "e@f.g",
            ]))
        joined = (text + " " + " ".join(extra)).strip()
        docs.append((i, h, joined))
    got = {r["doc_id"]: (r["email_tokens"], r["phone_tokens"],
                         r["has_pii"])
           for r in pii_scan(
               _df(spark, docs).select("doc_id", "text")).collect()}
    assert got == ref_pii(docs)


@pytest.mark.parametrize("seed", [41, 42])
def test_decontam_matches_reference(spark, seed):
    from barkingowl_spark.operators.decontam import ngram_decontaminate

    docs = _rand_corpus(seed)
    rng = random.Random(seed + 1000)
    ev = [" ".join(rng.choices(VOCAB, k=5)) for _ in range(4)]
    # plus one snippet lifted verbatim from a real doc, if any is long
    for _, _, t in docs:
        toks = [x for x in t.replace("\n", " ").split(" ") if x]
        if len(toks) >= 3:
            ev.append(" ".join(toks[:3]))
            break
    ev_df = spark.createDataFrame([(t,) for t in ev], "text string")
    got = {r["doc_id"]: (r["total_ngrams"], r["hit_ngrams"],
                         r["hit_ppm"], r["contaminated"])
           for r in ngram_decontaminate(
               _df(spark, docs).select("doc_id", "text"),
               ev_df, n=3).collect()}
    assert got == ref_decontam(docs, ev, 3)