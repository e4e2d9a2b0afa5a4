"""Transitive near-duplicate grouping: iterative connected components.

The hygiene pipeline's near-dup stage (jobs/corpus_hygiene.py) is a
deliberate single-pass greedy pair-drop; this module adds the full
transitive answer as a separate iterative job, per DESIGN.md ("a
transitive connected-components dedup is an iterative job that belongs
in a separate pass"). A near-dup CHAIN A~B~C (A and C not directly
similar) is one cluster here, so exactly one representative per cluster
survives — the semantics most training-data dedup recipes (e.g. the
MinHash dedup in GPT-3/C4-style pipelines) actually want.

Algorithm: alternating min-label propagation + pointer jumping
(label <- label[label]), the DataFrame rendering of the
large-star/small-star CC of Kiveris et al. ("Connected Components in
MapReduce and Beyond", SoCC'14). Propagation alone needs O(diameter)
rounds; the pointer-jump halves label-chain depth each round, giving
O(log n) rounds on pathological chains while staying one shuffle per
round on the (bounded) edge list.

Scale notes (the 10^10 design point):
  * per-round cost is O(E) shuffle on content-derived ids — uniform by
    construction, no skew salt needed; a giant component concentrates
    its *label* key, but the groupBy-min is partially aggregated
    map-side, so hot labels combine before the shuffle.
  * each round materializes via localCheckpoint to truncate the
    iterative lineage (same reason the wave loop checkpoints); on a
    cluster use spark.sparkContext.setCheckpointDir + .checkpoint()
    for executor-loss-tolerant truncation.
  * rounds are driver round-trips (one count per round) — the same
    iteration-latency floor as the wave loop; fine because round count
    is O(log n), not O(n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component_id) for every node in `pairs`; component_id = the
    minimum node id of the component. Nodes with no edge never appear
    in `pairs`, hence not in the output (they are singleton components).

    Raises RuntimeError if not converged in max_iter rounds — with
    pointer jumping that takes a component of diameter > ~2^max_iter,
    i.e. it never legitimately happens; silence would mean wrong labels.
    """
    e = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    edges = e.union(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct().localCheckpoint()

    labels = (
        edges.select(F.col("s").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # min label over neighbours (map-side partial agg absorbs hot keys)
        nbr = (
            edges.join(labels, edges["d"] == labels["id"])
            .groupBy("s").agg(F.min("label").alias("nbr_label"))
        )
        cand = (
            labels.join(nbr, labels["id"] == nbr["s"], "left")
            .select(
                labels["id"],
                F.least(
                    F.col("label"),
                    F.coalesce("nbr_label", F.col("label")),
                ).alias("label"),
            )
        )
        # pointer jump: label <- label(label); halves chain depth
        lut = cand.select(F.col("id").alias("l_id"),
                          F.col("label").alias("l_label"))
        new = (
            cand.join(lut, cand["label"] == lut["l_id"], "left")
            .select(cand["id"],
                    F.coalesce("l_label", "label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new.join(labels.withColumnRenamed("label", "prev"), "id")
            .filter(F.col("label") != F.col("prev")).count()
        )
        labels = new
        if changed == 0:
            return labels.select(
                F.col("id"), F.col("label").alias("component_id")
            )
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def near_dup_components(
    documents: DataFrame, threshold_ppm: int = 600_000
) -> DataFrame:
    """(doc_id, component_id, csize): transitive near-dup clusters over
    MinHash-LSH candidates verified by exact token-Jaccard >= threshold
    (same pair source as the hygiene job's greedy stage). Singleton docs
    (no verified near-dup) are not emitted."""
    from barkingowl_spark.operators.corpus_dedup import (
        verified_near_dup_pairs,
    )

    pairs = verified_near_dup_pairs(documents, threshold_ppm)
    comp = connected_components(pairs).withColumnRenamed("id", "doc_id")
    w = Window.partitionBy("component_id")
    return comp.select(
        "doc_id", "component_id", F.count("*").over(w).alias("csize")
    )


def cluster_representatives(
    components: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    comp_col: str = "component_id",
    quality_col: str = "quality",
) -> DataFrame:
    """(id, component_id, keeper_id, is_keeper): per near-dup cluster,
    the highest-quality member (ties: lowest id) is the keeper; every
    other member is the drop set. This is the keep-best refinement of
    the hygiene job's keep-lowest-id rule — dedup recipes that score
    documents (length, quality classifier) keep the best copy, not the
    first-crawled one.

    quality: (id, quality) — members missing from it rank below every
    scored member (quality coalesced to long-min), they never win over
    a scored sibling.

    Scale shape: the keeper per cluster is a groupBy argmax via
    max(struct(quality, -id)) — partial-aggregated map-side, so a giant
    cluster combines before the shuffle (a window rank would sort the
    whole cluster in one task); the member<-keeper join shuffles on the
    same comp key the argmax just produced, so AQE reuses the exchange.
    Numeric ids required (the -id tie-break); that is the repo-wide
    doc_id contract."""
    j = components.join(
        quality.select(id_col, quality_col), id_col, "left"
    ).withColumn(
        "_q",
        F.coalesce(F.col(quality_col).cast("long"),
                   F.lit(-(1 << 62)).cast("long")),
    )
    k = (
        j.groupBy(comp_col)
        .agg(F.max(F.struct(
            F.col("_q").alias("q"),
            (-F.col(id_col)).cast("long").alias("nid"),
        )).alias("_m"))
        .select(comp_col, (-F.col("_m.nid")).cast("long")
                .alias("keeper_id"))
    )
    return j.join(k, comp_col).select(
        id_col,
        comp_col,
        "keeper_id",
        (F.col(id_col) == F.col("keeper_id")).alias("is_keeper"),
    )


def dedup_weights(
    documents: DataFrame, threshold_ppm: int = 600_000
) -> DataFrame:
    """(doc_id, csize, weight_ppm): SOFT dedup — every member of a
    transitive near-dup cluster is down-weighted to 1e6 DIV csize
    instead of dropped, so each distinct content item carries one unit
    of total training mass however many times it was crawled (the
    reweighting alternative to hard removal: it preserves natural
    duplication signal for frequency-sensitive objectives while killing
    the over-representation that Lee et al. 2022 showed harms LMs).
    Singletons keep weight_ppm = 1e6.

    The weights feed the selection stack directly: multiply into
    mix_sample keep_ppm, or use as sampling weights at export. Shape:
    the component pass's shuffles + one LEFT broadcast-ish join back to
    the id table (component table is O(clustered docs), typically a
    small fraction of the corpus)."""
    comp = near_dup_components(documents, threshold_ppm)
    return (
        documents.select("doc_id")
        .join(comp.select("doc_id", "csize"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("csize", F.lit(1)).cast("long").alias("csize"),
            F.expr(
                "CAST(1000000 DIV coalesce(csize, 1) AS BIGINT)"
            ).alias("weight_ppm"),
        )
    )
