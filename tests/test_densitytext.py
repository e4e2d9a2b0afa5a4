"""Line-density main-content extraction (functions/densitytext.py):
hand-built coverage of the classification table — LONG is content,
SHORT is chrome, MEDIUM inherits from an adjacent LONG neighbor — plus
the cleaner's re-join order and kept_ppm arithmetic.

(The DuckDB value-hash parity for both driver queries lives in
test_entry_contract.py; this file pins the semantics with eyeballable
fixtures.)
"""

from __future__ import annotations

import pytest

from barkingowl_spark.functions.densitytext import (
    density_clean,
    line_density,
)

LONG = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"          # wc=10 -> LONG
MED = "m1 m2 m3 m4 m5"                            # wc=5  -> MEDIUM
SHORT = "nav about"                               # wc=2  -> SHORT

DOCS = [
    # medium sandwiched between longs -> content (context smoothing)
    (1, f"{LONG}\n{MED}\n{LONG}"),
    # medium between shorts -> boilerplate
    (2, f"{SHORT}\n{MED}\n{SHORT}"),
    # medium at doc start, next is long -> content (lead)
    (3, f"{MED}\n{LONG}"),
    # medium at doc end, prev is long -> content (lag)
    (4, f"{LONG}\n{MED}"),
    # lone medium (no neighbors) -> boilerplate; lone short too
    (5, MED),
    (6, SHORT),
    # all-boilerplate doc -> empty text_main, kept_ppm 0
    (7, f"{SHORT}\n{SHORT}\n{SHORT}"),
    # empty text -> one empty line, wc=0, boilerplate
    (8, ""),
    # multiple-space runs collapse in wc (filter drops empties)
    (9, "a  b   c    d     e"),  # wc=5 MEDIUM, no long neighbor
]


@pytest.fixture(scope="module")
def labeled(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = line_density(df).collect()
    return {(r.doc_id, r.line_no): r for r in rows}


def test_labels(labeled):
    lab = {k: v.label for k, v in labeled.items()}
    assert lab[(1, 0)] == "content"        # LONG
    assert lab[(1, 1)] == "content"        # MEDIUM next to LONG
    assert lab[(2, 0)] == "boilerplate"    # SHORT
    assert lab[(2, 1)] == "boilerplate"    # MEDIUM between SHORTs
    assert lab[(3, 0)] == "content"        # MEDIUM, lead is LONG
    assert lab[(4, 1)] == "content"        # MEDIUM, lag is LONG
    assert lab[(5, 0)] == "boilerplate"    # lone MEDIUM
    assert lab[(6, 0)] == "boilerplate"    # lone SHORT
    assert lab[(8, 0)] == "boilerplate"    # empty line, wc=0
    assert lab[(9, 0)] == "boilerplate"    # wc=5 (space runs), no LONG


def test_wordcount_ignores_space_runs(labeled):
    assert labeled[(9, 0)].wc == 5
    assert labeled[(8, 0)].wc == 0


def test_clean_rejoin_and_ppm(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = {r.doc_id: r for r in density_clean(df).collect()}
    # doc 1: all three lines content, original order preserved
    assert out[1].text_main == f"{LONG}\n{MED}\n{LONG}"
    assert (out[1].n_lines, out[1].n_kept) == (3, 3)
    assert out[1].kept_ppm == 1_000_000
    # doc 2: nothing survives
    assert out[2].text_main == ""
    assert out[2].kept_ppm == 0
    # doc 3: both lines content -> ppm 1e6; doc 4 symmetric
    assert out[3].kept_ppm == 1_000_000
    assert out[4].text_main == f"{LONG}\n{MED}"
    # doc 7: 3 lines, 0 kept
    assert (out[7].n_lines, out[7].n_kept, out[7].kept_ppm) == (3, 0, 0)
    # every input doc appears exactly once
    assert set(out) == {d for d, _ in DOCS}
