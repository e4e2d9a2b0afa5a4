"""Product quantization for embedding search (Jégou, Douze & Schmid,
TPAMI 2011, "Product Quantization for Nearest Neighbor Search") — the
vector-COMPRESSION half of the IVF+PQ stack (operators/similarity.py
holds the IVF half): each vector is split into ``m`` subspaces, each
sub-vector replaced by the id of its nearest codebook centroid, so a
d-dim float vector becomes ``m`` small integers (m bytes at ksub<=256)
— a 100-1000x memory cut that lets 10^10-vector indexes live in RAM.
Queries score against codes with an Asymmetric Distance Computation
(ADC) lookup table: d2(q, x) ~= sum_j LUT[j][code_j(x)].

Integer-exact design (the repo-wide oracle discipline): codebooks are
INTEGER vectors in the same x1000-quantized space as the corpus
(operators/similarity.QUANT). The untrained default codebook — the
first ``ksub`` vectors' sub-vectors, exactly the init kmeans uses —
makes encode/ADC fully expressible in DuckDB SQL for the driver
oracle; trained codebooks (``pq_codebooks``: per-subspace Lloyd's,
reusing similarity.kmeans_centroids) are floats floored back onto the
integer grid, and the SAME integer encode/ADC pipeline runs on them
(training quality is pinned by pytest via distortion reduction, like
the IVF recall gates).

Scale shapes:
  * encode: one broadcast of the O(m*ksub) codebook; the argmin is a
    map-side-combined min per (vec, subspace). At 10^9+ vectors swap
    the relational argmin for the Arrow GEMM UDF (similarity.py's
    ``nearest``) — same output contract.
  * ADC search: the LUT is O(n_q*m*ksub) (broadcast); scoring touches
    each CODE cell once — n*m tiny integer rows, never n*d floats;
    the cut is a per-query top-k window over candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _subvectors(vecs: DataFrame, m: int, dim: int) -> DataFrame:
    """(vec_id, j, sv): the m dim/m-length slices of each quantized
    vector. dim must be divisible by m."""
    dsub = dim // m
    slices = F.array(*[
        F.expr(f"slice(v, {j * dsub + 1}, {dsub})") for j in range(m)
    ])
    return vecs.select(
        "vec_id", F.posexplode(slices).alias("j", "sv")
    )


def _dim_of(vecs: DataFrame) -> int:
    return len(vecs.select("v").first()["v"])


def default_codebooks(
    embeddings: DataFrame, m: int = 4, ksub: int = 16
) -> DataFrame:
    """(j, code, cv): the untrained codebook — sub-vectors of the first
    ksub corpus vectors (k-means init; the oracle-expressible path)."""
    from barkingowl_spark.operators.similarity import _quantized

    vecs = _quantized(embeddings)
    dim = _dim_of(vecs)
    return _subvectors(
        vecs.filter(F.col("vec_id") < ksub), m, dim
    ).select("j", F.col("vec_id").cast("int").alias("code"),
             F.col("sv").alias("cv"))


def pq_codebooks(
    embeddings: DataFrame, m: int = 4, ksub: int = 16, iters: int = 5
) -> DataFrame:
    """Trained codebooks: per-subspace Lloyd's k-means (reuses
    similarity.kmeans_centroids — Arrow GEMM assignment + relational
    mean step), floored back onto the integer grid so the shared
    encode/ADC pipeline stays bit-exact. Returns (j, code, cv)."""
    from barkingowl_spark.operators.similarity import (
        _quantized,
        kmeans_centroids,
    )

    spark = embeddings.sparkSession
    vecs = _quantized(embeddings)
    dim = _dim_of(vecs)
    dsub = dim // m
    rows = []
    for j in range(m):
        sub = vecs.select(
            "vec_id",
            F.expr(f"transform(slice(v, {j * dsub + 1}, {dsub}),"
                   f" x -> CAST(x AS DOUBLE) / 1000.0)")
            .alias("embedding"),
        )
        cents = kmeans_centroids(sub, k=ksub, iters=iters)
        for code, c in enumerate(cents):
            rows.append((j, code, [int(x) for x in map(float, c)]))
    return spark.createDataFrame(rows, "j int, code int, cv array<bigint>")


_D2 = ("CAST(aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)),"
       " 0L, (acc, x) -> acc + x) AS BIGINT)")


def pq_encode(
    embeddings: DataFrame,
    m: int = 4,
    ksub: int = 16,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, codes): each vector's m nearest-sub-centroid ids
    (ties -> lowest code). Broadcast codebook join + one map-side-
    combined min per (vec, subspace) + one codes rollup."""
    from barkingowl_spark.operators.similarity import _quantized

    if codebooks is None:
        codebooks = default_codebooks(embeddings, m=m, ksub=ksub)
    vecs = _quantized(embeddings)
    dim = _dim_of(vecs)
    sub = _subvectors(vecs, m, dim)
    best = (
        sub.join(broadcast(codebooks), "j")
        .select("vec_id", "j", "code", F.expr(_D2).alias("d2"))
        .groupBy("vec_id", "j")
        .agg(F.min(F.struct("d2", "code")).alias("_b"))
        .select("vec_id", "j", F.col("_b.code").alias("code"))
    )
    return (
        best.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("j", "code")))
             .alias("_s"))
        .select(
            "vec_id",
            F.expr("transform(_s, x -> x.code)").alias("codes"),
        )
    )


def pq_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    m: int = 4,
    ksub: int = 16,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """(q_id, vec_id, adc_d2, rank): ADC top-k — queries (vec_id <
    n_queries) score every encoded vector through the integer lookup
    table; rank ascending by approximate distance, ties by vec_id,
    self excluded."""
    from barkingowl_spark.operators.similarity import _quantized

    if codebooks is None:
        codebooks = default_codebooks(embeddings, m=m, ksub=ksub)
    vecs = _quantized(embeddings)
    dim = _dim_of(vecs)
    codes = pq_encode(embeddings, m=m, ksub=ksub, codebooks=codebooks)
    lut = (
        _subvectors(vecs.filter(F.col("vec_id") < n_queries), m, dim)
        .withColumnRenamed("vec_id", "q_id")
        .join(broadcast(codebooks), "j")
        .select("q_id", "j", "code", F.expr(_D2).alias("d2"))
    )
    cell = codes.select(
        "vec_id", F.posexplode("codes").alias("j", "code")
    )
    scored = (
        cell.join(broadcast(lut), ["j", "code"])
        .filter(F.col("q_id") != F.col("vec_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_d2").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "adc_d2", "rank")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    m: int = 4,
    ksub: int = 16,
    n_centroids: int = 8,
    codebooks: DataFrame | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(q_id, bucket, vec_id, adc_d2, rank): the composed IVF+PQ index
    (Jegou et al. 2011 §IV) — the coarse quantizer (similarity.
    ivf_assign) routes each query to its cell, and ADC scores only the
    PQ codes INSIDE that cell: per-query cost = |cell| * m integer
    lookups, the memory- and compute-shape that serves 10^10 vectors.
    Untrained defaults for both quantizers keep it oracle-expressible;
    pass trained centroids/codebooks for the production index (same
    dataflow)."""
    from barkingowl_spark.operators.similarity import _quantized, ivf_assign

    if codebooks is None:
        codebooks = default_codebooks(embeddings, m=m, ksub=ksub)
    assign = ivf_assign(embeddings, n_centroids, centroids=centroids)
    vecs = _quantized(embeddings)
    dim = _dim_of(vecs)
    codes = pq_encode(embeddings, m=m, ksub=ksub, codebooks=codebooks)
    cell = codes.join(assign, "vec_id").select(
        "vec_id", "bucket", F.posexplode("codes").alias("j", "code")
    )
    lut = (
        _subvectors(vecs.filter(F.col("vec_id") < n_queries), m, dim)
        .withColumnRenamed("vec_id", "q_id")
        .join(broadcast(codebooks), "j")
        .select("q_id", "j", "code", F.expr(_D2).alias("d2"))
        .join(
            broadcast(
                assign.filter(F.col("vec_id") < n_queries).select(
                    F.col("vec_id").alias("q_id"), "bucket"
                )
            ),
            "q_id",
        )
    )
    scored = (
        cell.join(broadcast(lut), ["j", "code", "bucket"])
        .filter(F.col("q_id") != F.col("vec_id"))
        .groupBy("q_id", "bucket", "vec_id")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_d2").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "bucket", "vec_id", "adc_d2", "rank")
    )


def pq_distortion(
    embeddings: DataFrame,
    m: int = 4,
    ksub: int = 16,
    codebooks: DataFrame | None = None,
) -> int:
    """Total integer reconstruction error sum ||x - decode(encode(x))||^2
    — the training objective; pytest pins trained < untrained."""
    from barkingowl_spark.operators.similarity import _quantized

    if codebooks is None:
        codebooks = default_codebooks(embeddings, m=m, ksub=ksub)
    vecs = _quantized(embeddings)
    dim = _dim_of(vecs)
    codes = pq_encode(embeddings, m=m, ksub=ksub, codebooks=codebooks)
    cell = codes.select(
        "vec_id", F.posexplode("codes").alias("j", "code")
    )
    sub = _subvectors(vecs, m, dim)
    return (
        sub.join(cell, ["vec_id", "j"])
        .join(broadcast(codebooks), ["j", "code"])
        .agg(F.sum(F.expr(_D2)).alias("t"))
        .collect()[0]["t"]
    )
