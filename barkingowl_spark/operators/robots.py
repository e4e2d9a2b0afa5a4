"""robots.txt acquisition + parsing out of the page corpus — SURVEY.md
section 2 completeness note (robots support is DRV: the reference's own
robots handling is C3-unverified, but north_star names "a per-host
politeness scheduler with robots.txt caching" as part of the contract).

The (host, disallow_prefixes) dim table consumed by
operators/politeness.py::robots_filter is built FROM THE CORPUS ITSELF:
rows whose url is exactly http(s)://<host>/robots.txt are parsed with
pure relational dataflow — split / posexplode / window / groupBy, no
UDF, fully whole-stage-codegen — so the parse distributes like any
other aggregation and is byte-portable to the DuckDB oracle.

Grammar (deterministic subset of RFC 9309):

  * lines split on \\n; ``#`` comments stripped; blank lines ignored
  * a GROUP starts at a ``User-agent`` line whose preceding surviving
    line is not itself a User-agent line (consecutive UA lines share
    one group); rules before the first UA line belong to no group and
    are ignored (RFC 9309 section 2.2.1)
  * a group applies iff one of its User-agent values is ``*`` (this
    engine sends no product token)
  * ``Disallow`` values of applying groups, in file order, become
    ``disallow_prefixes``; an empty Disallow (allow-all) contributes
    nothing; ``Allow`` lines are recognized but ignored — documented
    deviation, matching robots_filter's prefix-only semantics
  * ``Crawl-delay`` of applying groups (max if repeated; non-integer
    values ignored) becomes ``crawl_delay`` seconds — the politeness
    scheduler turns it into a per-host per-wave fetch budget
  * a host whose applying groups have no non-empty Disallow and no
    Crawl-delay is absent from the output (== no restrictions)

Scale shape: the robots subset of a 10^10-row corpus is ~one row per
host; the parse is one narrow scan (url filter pushed to parquet) +
one window + one groupBy on host — shuffle volume is O(robots lines),
independent of corpus size. The result is cached per run (north_star's
"robots.txt caching") and broadcast into the wave loop's link filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROBOTS_URL_RE = r"^https?://[^/?#]+/robots\.txt$"
_HOST_RE = r"^https?://([^/?#]+)/"


def _directives(pages: DataFrame, body_col: str | None = None) -> DataFrame:
    """(host, idx, key, val): the comment-stripped directive lines of
    every robots.txt page in the corpus, in file order — the shared
    front half of robots_rules and robots_sitemaps."""
    body = (
        F.col(body_col) if body_col
        else F.decode(F.col("html"), "UTF-8")
    )
    lines = (
        pages.filter(F.col("url").rlike(ROBOTS_URL_RE))
        .select(
            F.regexp_extract("url", _HOST_RE, 1).alias("host"),
            F.posexplode(F.split(body, "\n")).alias("idx", "line"),
        )
    )
    return (
        lines.select(
            "host", "idx",
            F.trim(F.regexp_replace("line", "#.*$", "")).alias("l"),
        )
        .filter(F.col("l") != "")
        .select(
            "host", "idx",
            F.lower(F.trim(F.substring_index("l", ":", 1))).alias("key"),
            F.trim(F.regexp_extract("l", "^[^:]*:(.*)$", 1)).alias("val"),
        )
    )


def robots_rules(pages: DataFrame, body_col: str | None = None) -> DataFrame:
    """Parse robots.txt pages out of ``pages`` into the politeness dim
    table ``(host, disallow_prefixes array<string>)``.

    ``pages`` needs (url, html BINARY) per PAGES_SCHEMA; pass
    ``body_col`` to parse an already-decoded string column instead
    (used by the driver query, whose fixture bodies are synthesized as
    strings).
    """
    d = _directives(pages, body_col).filter(F.col("key").isin(
        "user-agent", "disallow", "allow", "crawl-delay"))
    # group id = running count of group-start lines (a UA line not
    # preceded by another UA line); grp=0 rows precede any group.
    # grp_start is materialized as its own column first — nesting lag()
    # inside sum() OVER is a nested window expression some engines reject
    w = Window.partitionBy("host").orderBy("idx")
    g = d.withColumn(
        "grp_start",
        (
            (F.col("key") == "user-agent")
            & (F.coalesce(F.lag("key").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("grp", F.sum("grp_start").over(w))
    grps = (
        g.filter(F.col("grp") > 0)
        .groupBy("host", "grp")
        .agg(
            F.max(
                ((F.col("key") == "user-agent") & (F.col("val") == "*"))
                .cast("int")
            ).alias("star"),
            # collect_list skips the nulls (non-disallow / empty rows)
            F.collect_list(
                F.when(
                    (F.col("key") == "disallow") & (F.col("val") != ""),
                    F.struct("idx", "val"),
                )
            ).alias("dis"),
            # non-integer Crawl-delay values try_cast to NULL and drop out
            F.max(
                F.when(F.col("key") == "crawl-delay",
                       F.col("val").try_cast("int"))
            ).alias("delay"),
        )
    )
    star = grps.filter(
        (F.col("star") == 1)
        & ((F.size("dis") > 0) | F.col("delay").isNotNull())
    )
    return (
        star.select("host", F.explode_outer("dis").alias("e"), "delay")
        .groupBy("host")
        .agg(
            # delay-only hosts explode to a NULL e; when() skips them
            F.sort_array(F.collect_list(F.when(
                F.col("e").isNotNull(),
                F.struct(F.col("e.idx").alias("idx"),
                         F.col("e.val").alias("val")),
            ))).alias("s"),
            F.max("delay").alias("crawl_delay"),
        )
        .select(
            "host",
            F.transform("s", lambda x: x["val"]).alias("disallow_prefixes"),
            "crawl_delay",
        )
    )


def robots_prefix_rows(pages: DataFrame, body_col: str | None = None) -> DataFrame:
    """Exploded oracle-friendly view: (host, ord, prefix) — one row per
    disallow prefix in file order. Plain scalar columns so the driver
    harness value-hashes it directly."""
    return robots_rules(pages, body_col).select(
        "host",
        F.posexplode("disallow_prefixes").alias("ord", "prefix"),
    )


def robots_sitemaps(
    pages: DataFrame, body_col: str | None = None
) -> DataFrame:
    """(host, ord, sitemap_url): ``Sitemap:`` directives per host — the
    sitemaps.org cross-link RFC 9309 carries (group-INDEPENDENT: a
    Sitemap line is valid anywhere in the file, regardless of which
    User-agent group surrounds it, so this never consults the group
    state machine). Exact duplicate URLs within a host collapse to
    their first occurrence; ord is the surviving file order.

    This is the acquisition bridge robots.py -> operators/sitemap.py:
    feed sitemap_url into the fetch frontier as seed candidates, then
    parse the fetched bodies with sitemap_entries / sitemap_seed_urls.

    Scale shape: same as robots_rules — one narrow filtered scan
    (O(hosts) rows), one groupBy + one window over per-host sitemap
    lines (a handful per host). Comment stripping eats ``#fragment``
    suffixes; per RFC that IS a comment, and fragments are meaningless
    in sitemap URLs anyway."""
    sm = _directives(pages, body_col).filter(
        (F.col("key") == "sitemap") & (F.col("val") != ""))
    first = sm.groupBy("host", "val").agg(F.min("idx").alias("idx"))
    w = Window.partitionBy("host").orderBy("idx")
    return first.select(
        "host",
        (F.row_number().over(w) - 1).cast("int").alias("ord"),
        F.col("val").alias("sitemap_url"),
    )


def robots_pattern_rows(
    pages: DataFrame, body_col: str | None = None
) -> DataFrame:
    """(host, ord, pattern, allow): Allow AND Disallow lines of the
    applying (star) groups in file order — the rule dim
    robots_wildcard_match consumes. Superset of robots_prefix_rows'
    information (which keeps the prefix-only Disallow view for the
    legacy politeness filter)."""
    d = _directives(pages, body_col).filter(F.col("key").isin(
        "user-agent", "disallow", "allow"))
    w = Window.partitionBy("host").orderBy("idx")
    g = d.withColumn(
        "grp_start",
        (
            (F.col("key") == "user-agent")
            & (F.coalesce(F.lag("key").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("grp", F.sum("grp_start").over(w))
    grps = (
        g.filter(F.col("grp") > 0)
        .groupBy("host", "grp")
        .agg(
            F.max(
                ((F.col("key") == "user-agent") & (F.col("val") == "*"))
                .cast("int")
            ).alias("star"),
            F.collect_list(
                F.when(
                    F.col("key").isin("allow", "disallow")
                    & (F.col("val") != ""),
                    F.struct("idx", "key", "val"),
                )
            ).alias("rules"),
        )
    )
    return (
        grps.filter((F.col("star") == 1) & (F.size("rules") > 0))
        .select("host", F.explode("rules").alias("e"))
        .groupBy("host")
        .agg(F.sort_array(F.collect_list("e")).alias("s"))
        .select("host", F.posexplode("s").alias("ord", "e"))
        .select(
            "host", "ord",
            F.col("e.val").alias("pattern"),
            (F.col("e.key") == "allow").alias("allow"),
        )
    )


def robots_wildcard_match(
    urls: DataFrame, rules: DataFrame
) -> DataFrame:
    """(host, path, allowed): the RFC 9309 / Google longest-match
    decision over wildcard rules. `urls` = (host, path); `rules` =
    (host, pattern, allow) where a pattern is a path prefix that may
    contain `*` (any char run) and a TERMINAL `$` (end anchor) —
    exactly the two metacharacters the Google robots.txt spec defines.

    Precedence: the matching rule with the LONGEST pattern wins;
    allow wins a length tie; no matching rule means allowed. Encoded
    as one integer argmax — packed = length(pattern) * 2 + allow — so
    the whole decision is join + filter + max, no UDF:

      * the rule dim is O(hosts x rules/host): broadcast, like every
        robots artifact (never corpus-sized);
      * the regex is BUILT RELATIONALLY from the pattern column
        ('.' escaped, '*' -> '.*', '^' prepended; terminal '$' passes
        through as the anchor it means) and evaluated with rlike —
        both engines' regex dialects agree on this restricted class.

    Patterns are assumed %-decoded, newline-free and free of other
    regex metacharacters (RFC-safe path chars) — the parser upstream
    guarantees that for corpus-derived rules."""
    regex = F.expr(
        r"concat('^', replace(replace(pattern, '.', '\\.'),"
        r" '*', '.*'))")
    matched = (
        urls.join(F.broadcast(rules), "host")
        .withColumn("_re", regex)
        .filter(F.expr("path rlike _re"))
        .withColumn(
            "_packed",
            F.expr("length(pattern) * 2"
                   " + CASE WHEN allow THEN 1 ELSE 0 END"),
        )
        .groupBy("host", "path")
        .agg(F.max("_packed").alias("_best"))
    )
    return (
        urls.join(matched, ["host", "path"], "left")
        .select(
            "host", "path",
            F.coalesce(F.col("_best") % 2 == 1, F.lit(True))
            .alias("allowed"),
        )
    )
