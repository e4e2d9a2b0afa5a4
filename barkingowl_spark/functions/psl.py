"""Public-suffix / registrable-domain (eTLD+1) extraction.

The host -> SITE rollup is the primitive under per-site politeness,
crawl budgets, dedup scoping and ownership attribution: "a.cdn.example
.co.uk" and "www.example.co.uk" are the same registrant, while two
"*.github.io" subdomains are DIFFERENT sites. That distinction is the
publicsuffix.org algorithm (https://publicsuffix.org/list/):

  1. a rule matches when its labels are a suffix of the host's labels,
     '*' matching exactly one label;
  2. the prevailing rule is the matching exception rule if any, else
     the matching rule with the most labels, else the implicit '*'
     (the bare last label);
  3. the public suffix is the prevailing rule's labels (an exception
     rule minus its first label); the registrable domain is the
     public suffix plus the one preceding label, NULL when the host IS
     a public suffix.

PSL_RULES below is a deterministic SUBSET of the real list (the full
~9k-rule file is a drop-in replacement — same shapes: exact, wildcard,
exception, private-section entries like github.io). The ONE constant
feeds both the Spark broadcast dim and the DuckDB oracle, so parity is
by construction.

Spark-first shape (NO UDF): candidate suffixes are generated with
posexplode over the label array (bounded by PSL_MAX_LABELS), matched
against the broadcast rule dim with an equi-join on the candidate
form (exact and wildcardized), and the prevailing rule is an integer
argmax — one narrow explode (<= 2 * PSL_MAX_LABELS rows per host),
one broadcast join, one groupBy(host). At the 10^10 design point this
runs once per newly-seen host and persists next to the host table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (rule, is_exception). Wildcards keep their '*' label; exception
# rules are stored WITHOUT the leading '!'.
PSL_RULES: list[tuple[str, bool]] = [
    ("com", False), ("net", False), ("org", False), ("edu", False),
    ("gov", False), ("mil", False), ("int", False), ("io", False),
    ("co", False), ("ai", False), ("dev", False), ("app", False),
    ("uk", False), ("co.uk", False), ("org.uk", False),
    ("ac.uk", False), ("gov.uk", False), ("ltd.uk", False),
    ("jp", False), ("co.jp", False), ("ne.jp", False),
    ("or.jp", False), ("ac.jp", False),
    ("au", False), ("com.au", False), ("org.au", False),
    ("gov.au", False), ("edu.au", False),
    ("de", False), ("fr", False), ("nl", False), ("it", False),
    ("us", False), ("ca", False), ("br", False), ("com.br", False),
    ("in", False), ("co.in", False), ("cn", False), ("com.cn", False),
    ("ck", False), ("*.ck", False), ("www.ck", True),
    ("*.bd", False), ("*.kawasaki.jp", False),
    ("city.kawasaki.jp", True),
    # private-section style entries (platform suffixes)
    ("github.io", False), ("blogspot.com", False),
    ("s3.amazonaws.com", False), ("herokuapp.com", False),
    ("netlify.app", False), ("web.app", False),
]

PSL_MAX_LABELS = 8


def site_split(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """(host, public_suffix, registrable): the PSL decomposition of
    every input host (one row per input row; pre-distinct the hosts —
    at scale this runs on the newly-seen-host delta, not per URL).

    registrable is NULL when the host is itself a public suffix (or a
    single label) — such "hosts" are never a crawl site."""
    base = hosts.select(
        F.col(host_col).alias("host"),
        F.split(host_col, "\\.").alias("labs"),
    ).withColumn("n", F.size("labs"))

    # candidate suffixes: last `take` labels, exact + wildcard form
    cand = (
        base.select(
            "host", "labs", "n",
            F.explode(
                F.sequence(F.lit(1), F.least("n", F.lit(PSL_MAX_LABELS)))
            ).alias("take"),
        )
        .withColumn(
            "exact_form",
            F.array_join(F.slice("labs", F.col("n") - F.col("take") + 1,
                                 F.col("take")), "."),
        )
        .withColumn(
            "wild_form",
            F.when(
                F.col("take") >= 2,
                F.concat(
                    F.lit("*."),
                    F.array_join(
                        F.slice("labs", F.col("n") - F.col("take") + 2,
                                F.col("take") - 1), ".")),
            ),
        )
    )
    forms = cand.select(
        "host", "labs", "n", "take",
        F.explode(
            F.array_compact(F.array(
                F.struct(F.col("exact_form").alias("form"),
                         F.lit(1).alias("is_exact")),
                F.when(F.col("wild_form").isNotNull(), F.struct(
                    F.col("wild_form").alias("form"),
                    F.lit(0).alias("is_exact"))),
            ))
        ).alias("c"),
    ).select("host", "labs", "n", "take",
             F.col("c.form").alias("form"),
             F.col("c.is_exact").alias("is_exact"))

    rules = hosts.sparkSession.createDataFrame(
        PSL_RULES, "form string, is_exc boolean")
    matched = (
        forms.join(F.broadcast(rules), "form")
        # prevailing: exception > most labels > exact-over-wildcard
        .withColumn(
            "prio",
            F.expr("CASE WHEN is_exc THEN 1048576 ELSE 0 END"
                   " + take * 4 + is_exact"),
        )
        # exception rule: public suffix = rule minus its FIRST label
        .withColumn("ps_take",
                    F.expr("CASE WHEN is_exc THEN take - 1"
                           " ELSE take END"))
    )
    best = matched.groupBy("host").agg(F.max("prio").alias("prio"))
    prevail = matched.join(best, ["host", "prio"]).select(
        "host", "ps_take")

    return (
        base.join(prevail, "host", "left")
        # no rule matched -> implicit '*': bare last label
        .withColumn("ps_take", F.coalesce("ps_take", F.lit(1)))
        .select(
            "host",
            F.array_join(
                F.slice("labs", F.col("n") - F.col("ps_take") + 1,
                        F.col("ps_take")), ".").alias("public_suffix"),
            F.when(
                F.col("n") > F.col("ps_take"),
                F.concat(
                    F.element_at("labs", F.col("n") - F.col("ps_take")),
                    F.lit("."),
                    F.array_join(
                        F.slice("labs",
                                F.col("n") - F.col("ps_take") + 1,
                                F.col("ps_take")), ".")),
            ).alias("registrable"),
        )
    )


def site_rollup(split: DataFrame) -> DataFrame:
    """(registrable, n_hosts): hosts per SITE — the grouping key for
    per-site budgets/politeness. Suffix-only hosts (registrable NULL)
    are excluded: they are infrastructure, not sites."""
    return (
        split.filter(F.col("registrable").isNotNull())
        .groupBy("registrable")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hosts"))
    )
