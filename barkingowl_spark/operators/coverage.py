"""Frontier coverage estimation: how much of a site remains undiscovered.

The crawl-planning question behind recrawl budgeting and stop rules:
given the discovery log so far (every time a link to URL u on host h was
seen counts as one observation of u), estimate per host (a) the total
number of URLs that exist, seen or not, and (b) the probability the next
discovered link points somewhere new. Classic species-richness
estimators answer both from nothing but the frequency-of-frequencies of
the observation counts:

  * Chao1 (Chao, Scand. J. Stat. 1984, bias-corrected form):
        S_est = S_obs + f1*(f1-1) / (2*(f2+1))
    a lower bound on total richness from the singleton/doubleton counts.
  * Good-Turing unseen mass (Good, Biometrika 1953): P(next obs is a
    new URL) ~ f1/n — the "is this site mined out?" dial; its
    complement is the sample coverage.

Both are integer-exact on counts (the division is floored to stay
engine-portable), so the whole operator is two relational aggregations —
no sketches, no Python.

Scale shape: groupBy(key, item) then groupBy(key) — two shuffles on
content-derived (uniform) keys, both with map-side partial aggregation;
output is one row per key. At 10^10 observations this is the same shape
as the per-host counter rollup the wave loop already does; if item
cardinality per key is skewed, the first agg is the place to salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def species_richness(
    obs: DataFrame,
    key_col: str = "host",
    item_col: str = "item",
) -> DataFrame:
    """(key, n_obs, s_obs, f1, f2, chao1_est, unseen_mass_ppm,
    coverage_ppm) per key: bias-corrected Chao1 richness estimate and
    Good-Turing unseen-probability from the item-observation log.

    chao1_est = s_obs + f1*(f1-1) DIV (2*(f2+1)) (floored — a defined
    integer semantics both engines reproduce); unseen_mass_ppm =
    1e6*f1 DIV n_obs; coverage_ppm is its complement. n_obs >= 1 per
    key by construction (keys only exist where observed)."""
    per_item = (
        obs.groupBy(
            F.col(key_col).alias("key"), F.col(item_col).alias("item"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        per_item.groupBy("key")
        .agg(
            F.sum("c").cast("long").alias("n_obs"),
            F.count(F.lit(1)).cast("long").alias("s_obs"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long").alias("f1"),
            F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
            .cast("long").alias("f2"),
        )
        .select(
            "key", "n_obs", "s_obs", "f1", "f2",
            F.expr("s_obs + f1 * (f1 - 1) DIV (2 * (f2 + 1))")
            .cast("long").alias("chao1_est"),
            F.expr("1000000 * f1 DIV n_obs")
            .cast("long").alias("unseen_mass_ppm"),
            F.expr("1000000 - 1000000 * f1 DIV n_obs")
            .cast("long").alias("coverage_ppm"),
        )
    )
