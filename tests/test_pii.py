"""PII scan/redaction (functions/pii.py): planted ground truth for the
email and phone token rules, rule-edge negatives, redaction byte-
round-trip on non-PII text, and the no-shuffle redaction plan."""

from __future__ import annotations

from barkingowl_spark.functions.pii import pii_scan, redact

DOCS = [
    # two emails (one after a newline), one phone
    (0, "contact bob@example.com or\nsue@mail.co phone +1-(555)1234567"),
    # negatives: double @, empty local, domain without dot, leading dot
    # domain, trailing dot domain, short digits, digits with letter
    (1, "a@@b.c @x.com a@nodot a@.com a@com. 123456 12345a67"),
    # clean doc with whitespace structure worth preserving
    (2, "plain  text\n\n  indented line"),
    # exactly-7-digit phone at the boundary; 6 digits is not a phone
    (3, "call 5551234 not 555123"),
    (4, ""),
    (5, None),   # NULL text: scans clean, redacts to NULL
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_scan_planted(spark):
    got = {r["doc_id"]: (r["email_tokens"], r["phone_tokens"],
                         r["has_pii"])
           for r in pii_scan(_df(spark)).collect()}
    assert got == {
        0: (2, 1, True),
        1: (0, 0, False),
        2: (0, 0, False),
        3: (0, 1, True),
        4: (0, 0, False),
        5: (0, 0, False),
    }


def test_redact_planted(spark):
    got = {r["doc_id"]: r["text_redacted"]
           for r in redact(_df(spark)).collect()}
    assert got[0] == "contact <EMAIL> or\n<EMAIL> phone <PHONE>"
    assert got[1] == DOCS[1][1]          # all negatives untouched
    assert got[2] == DOCS[2][1]          # whitespace byte-identical
    assert got[3] == "call <PHONE> not 555123"
    assert got[4] == ""
    assert got[5] is None


def test_redaction_is_shuffle_free(spark):
    plan = redact(_df(spark)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
