"""DUST rule mining — detecting "Different URLs with Similar Text"
rewrite rules from crawl evidence (Bar-Yossef, Keidar, Schonfeld
WWW'07 "Do Not Crawl in the DUST"; the query-parameter specialization
is the one production crawlers deploy as URL-parameter handling /
tracking-param stripping).

A crawl that cannot learn `sessionid=` is content-irrelevant on a host
re-fetches every page once per session token — the single largest
source of self-inflicted duplication in real crawls. This module mines
those rules from the capture log itself:

  param_rules(captures)   (host, param, support, refuted) — params
                          whose removal provably preserves content
  apply_rules(captures, rules)
                          (url, canon_url) — the learned-rule URL
                          canonicalizer for the frontier dedup path

Evidence model (relational DUST): for a host h and candidate param k,
group captures by (path, every-other-param) — i.e. URL identity modulo
k. A group is INFORMATIVE if it exercises k (>= 2 distinct k-variants,
where "absent" is a variant); it SUPPORTS the rule if all its digests
agree and REFUTES it if any differ. A rule is emitted when
support >= min_support and refuted == 0 — the Bar-Yossef "large
support, no counter-example" criterion, with likely/unlikely
refutation collapsed to the exact digest test since we hold full
content hashes.

URL convention (shared with the DuckDB oracles): everything after
"://" up to the first "/" is the host; path is up to the first "?";
the query splits on "&" into "k=v" items (key = text before the first
"=", '' value if none); a repeated key's variant is the sorted
"&"-join of its items. No percent-decoding — rules are learned over
the byte forms the frontier actually dedups on.

Scale shape (100 TB): parsing and group-key construction are pure
Catalyst higher-order functions over the capture rows (no explode of
the candidate space until the host-vocabulary join); the candidate
blow-up is |captures| x |distinct params on that host| — param
vocabularies are tens per host in practice, and the join key is the
host, so the work stays co-partitioned with the capture log. Two
shuffles end-to-end: the group rollup and the per-(host, param)
rollup. apply_rules joins the learned rules (a host-keyed dim table,
orders of magnitude smaller than the log) and rewrites with array
lambdas — no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ABSENT = "<absent>"


def _parsed(captures: DataFrame) -> DataFrame:
    """(url, digest, host, path, params): the shared URL split."""
    after = F.substring_index(F.col("url"), "://", -1)
    step = captures.select(
        "url", "digest",
        F.substring_index(after, "/", 1).alias("host"),
        F.expr(
            "substring(substring_index(url, '://', -1),"
            " length(substring_index(substring_index(url, '://', -1),"
            " '/', 1)) + 1)").alias("pathq"),
    )
    query = F.when(
        F.instr("pathq", "?") > 0,
        F.expr("substring(pathq, instr(pathq, '?') + 1)"),
    ).otherwise(F.lit(""))
    params = F.when(query == "", F.array().cast("array<string>")) \
        .otherwise(F.split(query, "&"))
    return step.select(
        "url", "digest", "host",
        F.substring_index("pathq", "?", 1).alias("path"),
        params.alias("params"))


def param_rules(captures: DataFrame, min_support: int = 2) -> DataFrame:
    """(host, param, support, refuted): every candidate query param on
    the host graded by its informative groups; only safe rules
    (refuted == 0) with support >= min_support are returned."""
    p = _parsed(captures)
    vocab = (
        p.select("host", F.explode("params").alias("kv"))
        .select("host", F.substring_index("kv", "=", 1).alias("param"))
        .distinct()
    )
    cand = p.join(vocab, "host")
    rest = F.array_join(
        F.array_sort(F.expr(
            "filter(params, x -> substring_index(x, '=', 1) != param)")),
        "&")
    mine = F.array_sort(F.expr(
        "filter(params, x -> substring_index(x, '=', 1) = param)"))
    variant = F.when(F.size(mine) == 0, F.lit(ABSENT)) \
        .otherwise(F.array_join(mine, "&"))
    groups = (
        cand.select(
            "host", "param", "path", rest.alias("rest"),
            variant.alias("variant"), "digest")
        .groupBy("host", "param", "path", "rest")
        .agg(
            F.count_distinct("variant").alias("n_var"),
            F.count_distinct("digest").alias("n_dig"),
        )
        .filter(F.col("n_var") >= 2)
    )
    return (
        groups.groupBy("host", "param")
        .agg(
            F.sum(F.when(F.col("n_dig") == 1, 1).otherwise(0))
            .cast("long").alias("support"),
            F.sum(F.when(F.col("n_dig") > 1, 1).otherwise(0))
            .cast("long").alias("refuted"),
        )
        .filter((F.col("support") >= min_support)
                & (F.col("refuted") == 0))
    )


def apply_rules(captures: DataFrame, rules: DataFrame) -> DataFrame:
    """(url, canon_url): strip every learned-irrelevant param and emit
    the canonical form host + path + '?' + sorted surviving params
    (param-order canonicalization included — two capture URLs that
    differ only in param order collapse too)."""
    p = _parsed(captures)
    per_host = rules.groupBy("host").agg(
        F.array_sort(F.collect_set("param")).alias("drop_keys"))
    joined = p.join(per_host, "host", "left").withColumn(
        "drop_keys",
        F.coalesce("drop_keys", F.array().cast("array<string>")))
    kept = F.array_sort(F.expr(
        "filter(params, x -> NOT array_contains("
        "drop_keys, substring_index(x, '=', 1)))"))
    canon = F.concat(
        F.col("host"), F.col("path"),
        F.when(F.size(kept) == 0, F.lit(""))
        .otherwise(F.concat(F.lit("?"), F.array_join(kept, "&"))),
    )
    return joined.select("url", canon.alias("canon_url"))
