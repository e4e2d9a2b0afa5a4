"""Distributed suffix-array construction over the corpus token stream
by prefix doubling (Manber & Myers, SIAM J. Comput. 1990; the
distributed formulation follows Flick & Aluru, "Parallel distributed
memory construction of suffix and longest common prefix arrays",
SC 2015 — their MPI rounds map 1:1 onto shuffles here).

Why a crawler/corpus engine wants it: the suffix array is the scale
structure behind exact-substring dedup (Lee et al. 2022 train the
deduplicator on one) and arbitrary-length repeated-phrase mining —
operators/dupspans.py answers "which FIXED-n-gram windows repeat";
the SA answers it for EVERY length at once, and its construction is
pure relational dataflow:

  stream: one token row per corpus position, docs separated by a
          per-doc unique sentinel token (chr(1)-prefixed, sorting
          below real text) so no suffix comparison crosses a document
          boundary by accident;
  gpos:   global position = dense rank of (doc_id, pos) — assigned by
          operators/ranking.py::global_dense_rank, NOT a
          single-partition window;
  r_0:    dense rank of the token string;
  round k: pair each position's rank with the rank 2^(k-1) ahead
          (an equi-join on gpos + 2^(k-1) = gpos; out-of-range = -1
          sentinel, below every real rank) and dense-rank the pairs.
          After round k, rank[i] is the dense rank of the 2^k-token
          prefix of suffix i (padded with the -1 sentinel past the
          end) — the invariant the DuckDB oracle recomputes directly
          from fixed-length padded rank lists.

Each round: ONE self-equi-join + one global_dense_rank (distinct +
range shuffle + partitioned window + bounded driver offsets). Full
construction is ceil(log2 n) rounds; `suffix_array` stops early the
first round every rank is unique (one count per round — the same
driver-side convergence probe as components.py). At the 100 TB point
each round shuffles O(corpus positions) narrow rows — exactly the
published distributed-SA cost — and rounds needed in practice is
log2(longest repeated run), not log2(n).

No reference counterpart (/root/reference is empty, SURVEY §0);
pinned by tests/test_suffixes.py's sorted-suffix brute force and the
suffix_ranks driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from barkingowl_spark.operators.ranking import global_dense_rank

SEP = "\x01#"  # per-doc sentinel prefix; sorts below printable text


def corpus_stream(documents: DataFrame) -> DataFrame:
    """(doc_id, pos, term, gpos): the corpus token stream — split on
    single space (NULL text = ''), 1-based pos, one unique sentinel
    token appended per doc, gpos the global dense rank of
    (doc_id, pos)."""
    toks = documents.select(
        "doc_id",
        F.split(F.coalesce("text", F.lit("")), " ").alias("w"),
    )
    stream = toks.select(
        "doc_id",
        F.posexplode(
            F.concat(
                "w",
                F.array(F.concat(F.lit(SEP),
                                 F.col("doc_id").cast("string"))),
            )
        ).alias("pos0", "term"),
    ).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "term"
    )
    return global_dense_rank(stream, ["doc_id", "pos"], out_col="gpos")


def suffix_ranks(
    stream: DataFrame, rounds: int
) -> DataFrame:
    """(gpos, rank): after `rounds` doublings, rank is the 1-based
    dense rank of each suffix's 2^rounds-token prefix (sentinel-padded
    past the corpus end)."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    r = global_dense_rank(
        stream.select("gpos", "term"), ["term"], out_col="rank"
    ).select("gpos", "rank")
    for k in range(rounds):
        step = 1 << k
        a = r.select(F.col("gpos"), F.col("rank").alias("r1"))
        b = r.select((F.col("gpos") - F.lit(step)).alias("gpos"),
                     F.col("rank").alias("r2"))
        pairs = (
            a.join(b, "gpos", "left")
            .select(
                "gpos", "r1",
                F.coalesce("r2", F.lit(-1).cast("long")).alias("r2"),
            )
        )
        r = global_dense_rank(
            pairs, ["r1", "r2"], out_col="rank"
        ).select("gpos", "rank").localCheckpoint()
    return r


def suffix_array(
    stream: DataFrame, max_rounds: int = 40
) -> DataFrame:
    """(sa_rank, gpos, doc_id, pos): the full suffix array — doubling
    until every rank is unique (early-stop probe: one count per
    round), then ranks ARE the lexicographic suffix order."""
    n = stream.count()
    r = global_dense_rank(
        stream.select("gpos", "term"), ["term"], out_col="rank"
    ).select("gpos", "rank")
    k = 0
    while k < max_rounds:
        if r.select("rank").distinct().count() == n:
            break
        step = 1 << k
        a = r.select(F.col("gpos"), F.col("rank").alias("r1"))
        b = r.select((F.col("gpos") - F.lit(step)).alias("gpos"),
                     F.col("rank").alias("r2"))
        pairs = (
            a.join(b, "gpos", "left")
            .select(
                "gpos", "r1",
                F.coalesce("r2", F.lit(-1).cast("long")).alias("r2"),
            )
        )
        r = global_dense_rank(
            pairs, ["r1", "r2"], out_col="rank"
        ).select("gpos", "rank").localCheckpoint()
        k += 1
    return (
        r.select(F.col("rank").alias("sa_rank"), "gpos")
        .join(stream.select("gpos", "doc_id", "pos"), "gpos")
        .select("sa_rank", "gpos", "doc_id", "pos")
    )


def _rank_tables(stream: DataFrame, rounds: int) -> list[DataFrame]:
    """[r_0 .. r_rounds]: the per-round rank tables (r_k ranks the
    2^k-token padded prefixes) — suffix_ranks keeping every level, the
    input the LCP binary descent needs."""
    r = global_dense_rank(
        stream.select("gpos", "term"), ["term"], out_col="rank"
    ).select("gpos", "rank").localCheckpoint()
    tables = [r]
    for k in range(rounds):
        step = 1 << k
        a = r.select(F.col("gpos"), F.col("rank").alias("r1"))
        b = r.select((F.col("gpos") - F.lit(step)).alias("gpos"),
                     F.col("rank").alias("r2"))
        pairs = (
            a.join(b, "gpos", "left")
            .select(
                "gpos", "r1",
                F.coalesce("r2", F.lit(-1).cast("long")).alias("r2"),
            )
        )
        r = global_dense_rank(
            pairs, ["r1", "r2"], out_col="rank"
        ).select("gpos", "rank").localCheckpoint()
        tables.append(r)
    return tables


def lcp_capped(stream: DataFrame, rounds: int) -> DataFrame:
    """(gpos, sa_pos, lcp): the LCP array of the (2^rounds)-prefix
    suffix order — sa_pos is each suffix's position in the
    (rank, gpos) order (a scalable global dense rank, no
    single-partition window), lcp the length of the longest common
    prefix with the PREVIOUS suffix in that order, measured by binary
    descent over the doubling rank tables (Flick & Aluru SC'15 §4:
    level r contributes 2^r iff the 2^r-prefixes at the advanced
    positions still agree) and therefore CAPPED at 2^rounds - 1 —
    rank-tied neighbours (true LCP >= 2^rounds) read the cap. The
    first suffix's lcp is 0 by convention.

    Adjacent-pair state is one row per suffix; the descent is
    2*rounds equi-joins against the (gpos, rank) level tables — the
    published distributed-LCP cost, log-many narrow shuffles, nothing
    quadratic. With rounds at the suffix_array convergence point the
    cap is never hit and this IS the exact LCP array (pinned in
    tests/test_suffixes.py)."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    tables = _rank_tables(stream, rounds)
    pos = global_dense_rank(
        tables[-1], ["rank", "gpos"], out_col="sa_pos"
    ).select("gpos", "sa_pos")
    prev = pos.select((F.col("sa_pos") + 1).alias("sa_pos"),
                      F.col("gpos").alias("pa"))
    st = (
        pos.join(prev, "sa_pos")
        .select("sa_pos", "pa", F.col("gpos").alias("pb"),
                F.lit(0).cast("long").alias("lcp"))
    )
    for r in range(rounds - 1, -1, -1):
        t = tables[r]
        ta = t.select(F.col("gpos").alias("pa"),
                      F.col("rank").alias("ra"))
        tb = t.select(F.col("gpos").alias("pb"),
                      F.col("rank").alias("rb"))
        step = 1 << r
        eq = (F.col("ra").isNotNull() & F.col("rb").isNotNull()
              & (F.col("ra") == F.col("rb"))).cast("long")
        st = (
            st.join(ta, "pa", "left")
            .join(tb, "pb", "left")
            .select(
                "sa_pos",
                (F.col("pa") + eq * step).alias("pa"),
                (F.col("pb") + eq * step).alias("pb"),
                (F.col("lcp") + eq * step).alias("lcp"),
            )
            .localCheckpoint()
        )
    return (
        pos.join(st.select("sa_pos", "lcp"), "sa_pos", "left")
        .select(
            "gpos", "sa_pos",
            F.coalesce("lcp", F.lit(0).cast("long")).alias("lcp"),
        )
    )
