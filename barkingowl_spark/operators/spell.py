"""SymSpell-style distributed spelling correction.

A search tier over a crawled corpus needs query-time spell correction
against the corpus's OWN vocabulary (product names, jargon and new
words are exactly what a static dictionary misses). The classic
scalable shape is Garbe's SymSpell: edit-distance-1 candidates are
found WITHOUT any fuzzy scan, because

    lev(q, v) <= 1  <=>  q = v,  or v in del1(q)  (insertion in q),
                     or  q in del1(v)  (deletion in q),
                     or  del1(q) ∩ del1(v) != {} (substitution — plus
                         a thin tail of transposition/ED-2 pairs)

with del1(w) the set of 1-character deletions of w. Exploding both
sides into (variant, word) rows turns candidate generation into a
plain equi-join on variant — a shuffle on uniform md5-like short
string keys, never a cartesian or a per-row vocabulary scan. The
share-a-deletion branch over-generates a little, so candidates are
VERIFIED with levenshtein() — a built-in in both Spark and DuckDB —
on candidates only (the filter-verify discipline every dedup join in
this repo uses).

Scale guards: variants shorter than 2 chars are dropped (the 1-char
variant space is ~70 keys shared by the whole vocabulary — pure
skew); a variant carried by more than max_terms_per_variant
vocabulary words is a stop variant (same cap discipline as
mirrors.py / winnow_pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEL1 = (
    "transform(sequence(1, length({c})),"
    " i -> concat(substr({c}, 1, i - 1),"
    " substr({c}, i + 1, length({c}))))"
)


def _variants(df: DataFrame, word_col: str) -> DataFrame:
    """(word_col..., variant): the word itself plus its 1-deletions,
    distinct, variants shorter than 2 chars dropped."""
    return df.select(
        *df.columns,
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col(word_col)),
                    F.expr(_DEL1.format(c=word_col)),
                )
            )
        ).alias("variant"),
    ).filter(F.length("variant") >= 2)


def spell_correct(
    vocab: DataFrame,
    queries: DataFrame,
    topk: int = 3,
    max_terms_per_variant: int = 64,
) -> DataFrame:
    """(query, rnk, term, df, dist) — top-k corrections per query word
    from `vocab` (term, df) within Levenshtein distance 1 (the
    share-a-deletion transposition tail is verified away),
    ranked by (lev distance asc, df desc, term asc). Queries already
    in-vocabulary rank themselves first (dist 0). Queries with no
    candidate are absent (the caller's miss is the 'no suggestion'
    answer).

    Plan: explode deletions on BOTH sides, equi-join on variant,
    dedup (query, term), verify lev <= 1 on the candidate set only,
    one query-partitioned window cut."""
    vv = _variants(vocab.select("term", "df"), "term")
    stop = (
        vv.groupBy("variant")
        .agg(F.count(F.lit(1)).alias("_nv"))
        .filter(F.col("_nv") <= int(max_terms_per_variant))
        .select("variant")
    )
    vv = vv.join(stop, "variant")
    qq = _variants(queries.select("query"), "query")
    cands = (
        qq.join(vv, "variant")
        .select("query", "term", "df")
        .distinct()
        .withColumn("dist", F.levenshtein("query", "term"))
        .filter(F.col("dist") <= 1)
    )
    w = Window.partitionBy("query").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term"))
    return (
        cands.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(topk))
        .select("query", "rnk", "term", "df", "dist")
    )


def editdist_pairs(
    strings: DataFrame,
    id_col: str = "doc_id",
    str_col: str = "title",
    max_ids_per_variant: int = 64,
) -> DataFrame:
    """(id_a, id_b, dist): all UNORDERED pairs whose strings are
    within Levenshtein distance 1 — the title/URL-slug near-dup join
    (re-posts, typo mirrors, versioned re-uploads) as a SymSpell
    SELF-join: lev(a, b) <= 1 iff a = b, b in del1(a), a in del1(b),
    or del1(a) ∩ del1(b) != {} — so candidate generation is one
    equi-join on the exploded 1-deletion variants, never a fuzzy scan
    or a cartesian; the share-a-deletion over-generation (ED-2
    substitution tails) is VERIFIED away with levenshtein() on
    candidates only. Exact-duplicate pairs ride along at dist 0 (the
    word itself is one of its variants).

    Same scale guards as spell_correct: variants < 2 chars drop
    (pure-skew key space), variants carried by more than
    max_ids_per_variant ids are stop variants (the cap is part of the
    operator's spec, applied identically in the oracle).

    Scale shape: explode O(len) variants per string, one hash shuffle
    on short uniform string keys, distinct over candidate pairs, then
    levenshtein on candidates only. At a 1e10-doc corpus the variant
    table is ~len x corpus rows of short keys — the same budget as
    the MinHash band explode, with the stop-variant cap bounding any
    hot key."""
    base = strings.select(F.col(id_col).alias("_id"),
                          F.col(str_col).alias("_s"))
    vv = _variants(base, "_s")
    stop = (
        vv.groupBy("variant")
        .agg(F.count(F.lit(1)).alias("_nv"))
        .filter(F.col("_nv") <= int(max_ids_per_variant))
        .select("variant")
    )
    # both the stop-variant table and the self-join sides grow with
    # the corpus: pin shuffle_hash so Catalyst never driver-broadcasts
    # a corpus-sized side (the repo-wide wave-loop invariant)
    vv = vv.join(stop.hint("shuffle_hash"), "variant")
    a = vv.select(F.col("_id").alias("id_a"), F.col("_s").alias("sa"),
                  "variant")
    b = vv.select(F.col("_id").alias("id_b"), F.col("_s").alias("sb"),
                  "variant")
    return (
        a.join(b.hint("shuffle_hash"), "variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
        .withColumn("dist", F.levenshtein("sa", "sb"))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "dist")
    )
