"""Seeded-fuzz parity for the map-only rule gates: gopher_quality
measurements and urlfilter scores must equal a pure-Python
reimplementation on a 200-doc corpus full of edge shapes (empty lines,
trailing spaces, double spaces, unicode-free junk, bullets, ellipses,
hashes) — one Spark job per gate."""

from __future__ import annotations

import random

import pytest

WORDS = ["the", "of", "and", "in", "zoning", "council", "x", "#tag",
         "a1", "1111", "-", "*", "longwordhere", "mid...dle", "it"]
LINE_STARTS = ["", "- ", "* ", "  ", "\t"]
LINE_ENDS = ["", "...", ".", " ", "!"]


def _fuzz_docs(n=200, seed=7):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        lines = []
        for _ in range(rng.randint(1, 6)):
            ws = [rng.choice(WORDS) for _ in range(rng.randint(0, 12))]
            line = (rng.choice(LINE_STARTS) + " ".join(ws)
                    + rng.choice(LINE_ENDS))
            lines.append(line)
        docs.append((i, "\n".join(lines)))
    return docs


def _py_gopher(text, min_words=5, max_words=60, min_wl=3, max_wl=10,
               max_bullet=900_000, max_ell=300_000, min_alpha=800_000,
               max_sym=100_000, min_stop=2):
    stop = ("the", "a", "of", "and", "to", "in", "is", "it")
    ws = [w for w in text.split(" ") if w]
    lines = text.split("\n")
    nw, nl = len(ws), max(len(lines), 1)
    mean = (sum(len(w) for w in ws) * 1_000_000) // max(nw, 1)
    # Spark/DuckDB trim() strips SPACES only (not tabs) — mirror that
    bullets = sum(1 for x in lines
                  if x.strip(" ").startswith(("-", "*"))
                  ) * 1_000_000 // nl
    ell = sum(1 for x in lines
              if x.strip(" ").endswith("...")) * 1_000_000 // nl
    # NB: tokens may span newlines (split on ' ' only) — same as Spark
    alpha = sum(1 for w in ws
                if any(c.isalpha() for c in w)) * 1_000_000 // max(nw, 1)
    sym = ((text.count("#")
            + (len(text) - len(text.replace("...", ""))) // 3)
           * 1_000_000) // max(nw, 1)
    hits = sum(1 for w in ws if w in stop)
    if nw < min_words:
        r = "too_short"
    elif nw > max_words:
        r = "too_long"
    elif mean < min_wl * 1_000_000:
        r = "word_len_low"
    elif mean > max_wl * 1_000_000:
        r = "word_len_high"
    elif bullets > max_bullet:
        r = "bullets"
    elif ell > max_ell:
        r = "ellipses"
    elif alpha < min_alpha:
        r = "non_alpha"
    elif sym > max_sym:
        r = "symbols"
    elif hits < min_stop:
        r = "stopwords"
    else:
        r = "keep"
    return (nw, mean, bullets, ell, alpha, sym, hits, r)


def test_gopher_fuzz_parity(spark):
    from barkingowl_spark.functions.gopherrules import gopher_quality

    docs = _fuzz_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["mean_word_len_ppm"],
                         r["bullet_ppm"], r["ellipsis_ppm"],
                         r["alpha_ppm"], r["symbol_ppm"],
                         r["stop_hits"], r["reason"])
           for r in gopher_quality(df, min_words=5,
                                   max_words=60).collect()}
    mismatches = {i: (got[i], _py_gopher(t))
                  for i, t in docs if got[i] != _py_gopher(t)}
    assert not mismatches, list(mismatches.items())[:3]
    # the fuzz corpus must actually exercise several outcomes
    assert len({v[7] for v in got.values()}) >= 4


def test_urlfilter_fuzz_parity(spark):
    from barkingowl_spark.functions.urlfilter import (
        DEFAULT_KW_MILLI,
        url_filter,
    )

    rng = random.Random(11)
    parts = ["casino", "blog", "login", "page", "article", "x",
             "signup", "CASINO"]
    urls = []
    for i in range(200):
        host = rng.choice(["ok.test", "bad.test", "sub.bad.test",
                           "deep.sub.bad.test", "notbad.test"])
        path = "/".join(rng.choice(parts)
                        for _ in range(rng.randint(0, 4)))
        urls.append(f"http://{host}/{path}?i={i}")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: (r["host"], r["blocked"], r["kw_score_milli"],
                      r["keep"])
           for r in url_filter(df,
                               blocked_domains=["bad.test"]).collect()}
    for u in urls:
        host = u.split("//")[1].split("/")[0]
        blocked = host == "bad.test" or host.endswith(".bad.test")
        score = sum(w for kw, w in DEFAULT_KW_MILLI.items()
                    if kw in u.lower())
        keep = (not blocked) and score >= -250
        assert got[u] == (host, blocked, score, keep), u
