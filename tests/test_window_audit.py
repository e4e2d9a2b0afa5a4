"""Bounded-global-window inventory closure (r4 verdict item 6).

An unpartitioned window (`Window.orderBy` with no partitionBy, an
empty `Window.partitionBy()`, or a bare `Window.rowsBetween`) funnels
its whole input through one task — legitimate ONLY over a frame
bounded by a plan node (limit / range / stack) or by a
runtime-asserted contract (ranking.assert_max_rows). This test makes
the discipline CHECKABLE instead of conventional: every such site in
the package (and __spark_entry__.py) must carry a
`bounded-global-window:` marker comment within the four preceding
lines, stating which of the two bounds applies. A new global window
without a stated bound fails here; the full inventory lives in
PLANS.md "bounded global windows".
"""

from __future__ import annotations

import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "barkingowl_spark")

# code (not comment/docstring) uses of a global window
_PATTERNS = (
    re.compile(r"Window\.orderBy\("),
    re.compile(r"Window\.partitionBy\(\)"),
    re.compile(r"^\s*\w+\s*=\s*Window\.rowsBetween\("),
)
_MARKER = "bounded-global-window"


def _violations(path: str) -> list[str]:
    out = []
    lines = open(path, encoding="utf-8").read().splitlines()
    for i, line in enumerate(lines):
        stripped = line.strip()
        if stripped.startswith(("#", "`", '"', "'")):
            continue  # comments / docstring prose
        if not any(p.search(line) for p in _PATTERNS):
            continue
        ctx = lines[max(0, i - 4):i + 1]
        if not any(_MARKER in c for c in ctx):
            out.append(f"{os.path.relpath(path, ROOT)}:{i + 1}: "
                       f"{stripped[:70]}")
    return out


def test_every_global_window_is_marked_bounded():
    bad = []
    for dirpath, _, files in os.walk(PKG):
        for fn in files:
            if fn.endswith(".py"):
                bad += _violations(os.path.join(dirpath, fn))
    bad += _violations(os.path.join(ROOT, "__spark_entry__.py"))
    assert not bad, (
        "global windows without a stated bound (add a "
        "'# bounded-global-window: <reason>' marker AND either an "
        "in-plan limit/range or ranking.assert_max_rows):\n"
        + "\n".join(bad))


def test_assert_max_rows_fires_on_unbounded_input(spark):
    """The runtime guard actually throws when the contract is
    violated (and passes under the bound)."""
    import pytest

    from barkingowl_spark.operators.ranking import assert_max_rows

    df = spark.range(100).toDF("x")
    assert assert_max_rows(df, 100, "t").count() == 100
    with pytest.raises(Exception, match="bounded-global-window"):
        assert_max_rows(df, 99, "t").count()
