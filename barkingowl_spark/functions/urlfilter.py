"""URL-level frontier filtering (the RefinedWeb design: Penedo et al.
2023 §3.1 "URL filtering") — the content-blind gate a crawler applies
BEFORE fetching: a hard domain blocklist plus a soft keyword score on
the URL string. Complements the structural trap signals
(operators/traps.py) which catch generated URL spaces; this catches
known-bad and topically-undesired spaces.

Semantics:
  * blocked: the URL's host equals a blocklist domain or is a
    subdomain of one (suffix match on '.domain');
  * kw_score_milli: sum of weights of keywords CONTAINED in the
    lowercased URL (substring match, the published "strict subword"
    variant; weights are integer milli, negative = undesirable);
  * keep = NOT blocked AND kw_score_milli >= threshold_milli.

Scale shape: both the blocklist and the keyword table are CONFIG
(thousands of entries) — they ride into the plan as literal arrays, so
the whole gate is one map over the frontier inside whole-stage
codegen: no join, no shuffle, applied before the fetch join prunes
work for every downstream stage. For multi-million-entry blocklists,
swap the literal for a broadcast LEFT SEMI on a normalized
registered-domain column — same output contract.

Reference: BarkingOwl's scope filter (SURVEY.md §2 O9/O11) is
same-domain/scheme hygiene; this is the corpus-policy layer above it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]*)"

# a benign default weight table demonstrating the shape; deployments
# supply their own (RefinedWeb curates ~4.6M domains + a keyword list)
DEFAULT_KW_MILLI: dict[str, int] = {
    "casino": -500,
    "login": -200,
    "signup": -200,
    "blog": 100,
    "article": 100,
}


def url_filter(
    frontier: DataFrame,
    blocked_domains: list[str] = (),
    kw_milli: dict[str, int] | None = None,
    threshold_milli: int = -250,
    url_col: str = "url",
) -> DataFrame:
    """(url, host, blocked, kw_score_milli, keep): see module
    docstring. Map-only; config inlined as literal arrays."""
    if kw_milli is None:
        kw_milli = DEFAULT_KW_MILLI
    host = F.regexp_extract(F.col(url_col), _HOST_RE, 1)
    if blocked_domains:
        doms = "array(" + ", ".join(
            "'" + d.replace("'", "''") + "'" for d in blocked_domains
        ) + ")"
        blocked = F.expr(
            f"exists({doms}, d -> host = d"
            f" OR endswith(host, concat('.', d)))"
        )
    else:
        blocked = F.lit(False)
    low = F.lower(F.col(url_col))
    score = F.lit(0)
    for kw, w in sorted(kw_milli.items()):
        score = score + F.when(
            low.contains(kw.lower()), F.lit(int(w))
        ).otherwise(F.lit(0))
    return (
        frontier.select(
            F.col(url_col).alias("url"), host.alias("host")
        )
        .withColumn("blocked", blocked)
        .withColumn("kw_score_milli", score.cast("long"))
        .withColumn(
            "keep",
            ~F.col("blocked")
            & (F.col("kw_score_milli") >= F.lit(int(threshold_milli))),
        )
    )
