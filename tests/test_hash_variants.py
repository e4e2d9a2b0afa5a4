"""Corpus-scale hash-key variants must be RESULT-IDENTICAL to the
string-key sandbox paths on fixture data (collisions are a 2^-64 event;
these corpora cannot hit one): decontam's xxhash64 probe, paradedup's
hashed window shuffle, boilerplate's (host, hash) anti-join. Also pins
that the hash paths actually change the shuffle/probe key type."""

from __future__ import annotations

from pyspark.sql import functions as F

from barkingowl_spark.operators.boilerplate import strip_boilerplate
from barkingowl_spark.operators.decontam import ngram_decontaminate
from barkingowl_spark.operators.paradedup import paragraph_dedup


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _docs(spark, n=60):
    return spark.createDataFrame(
        [(i, f"h{i % 3}",
          f"nav h{i % 3}\nbody {i % 7} the text is here\nfooter h{i % 3}")
         for i in range(n)],
        "doc_id long, source string, text string")


def test_decontam_hash_probe_identical(spark):
    d = _docs(spark).select("doc_id", "text")
    ev = spark.createDataFrame([("body 3 the text is here",)],
                               "text string")
    a = ngram_decontaminate(d, ev, n=4)
    b = ngram_decontaminate(d, ev, n=4, probe_on_hash=True)
    assert _rows(a) == _rows(b)
    assert a.filter("contaminated").count() > 0  # non-degenerate
    # the probe side really is 8-byte: join key type long, not string
    plan = b._jdf.queryExecution().analyzed().toString()
    assert "xxhash64" in plan


def test_paradedup_hash_shuffle_identical(spark):
    d = _docs(spark).select("doc_id", "text")
    a = paragraph_dedup(d)
    b = paragraph_dedup(d, shuffle_on_hash=True)
    assert _rows(a) == _rows(b)
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    # the window shuffle keys on the 8-byte hash, not the string
    assert "Exchange hashpartitioning(_w0" in plan
    assert "Exchange hashpartitioning(l" not in plan


def test_boilerplate_hash_join_identical(spark):
    d = _docs(spark)
    a = strip_boilerplate(d)
    b = strip_boilerplate(d, join_on_hash=True)
    assert _rows(a) == _rows(b)
    # nav/footer really stripped (non-degenerate fixture)
    sample = {r["doc_id"]: r["text_clean"] for r in b.collect()}
    assert sample[0].startswith("body ") and "nav" not in sample[0]
    plan = b._jdf.queryExecution().analyzed().toString()
    assert "xxhash64" in plan
