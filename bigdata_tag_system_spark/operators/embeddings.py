"""Embedding-column operators: group mean-pooling, L2 normalization,
per-dimension scale fitting, and integer quantization.

Training-data pipeline surface (no reference equivalent — the reference
has no vector processing). Everything here treats ``array<float/double>``
columns with pure Catalyst expressions or one small aggregate; the corpus
is never collected and the only shuffles are the per-dimension partial
aggregates (``(pos, partial)`` pairs — 64·P rows for dim 64, independent
of corpus size).

Scale notes (100 TB):
- :func:`label_centroids` shuffles ``(group, pos, partial-sum)`` — partial
  aggregation runs map-side, so the exchange carries
  |groups| × dim × |partitions| rows at most, not the corpus.
- :func:`dim_scales` is the same shape with a global key.
- :func:`quantize_embeddings` is map-only after a broadcast of the
  one-row scale vector (crossJoin of a 1-row relation broadcasts); the
  quantized corpus never re-shuffles. int8 storage is 4× smaller than
  float32 — the standard trick to keep an ANN corpus in memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def normalize_vectors(df: DataFrame, vec_col: str = "embedding",
                      out_col: str | None = None) -> DataFrame:
    """L2-normalize an embedding column in place (map-only, no shuffle).

    Zero vectors normalize to zero (guarded denominator), NULL vectors
    stay NULL — no division-by-zero NaNs enter downstream cosine math.
    """
    v = _vec(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    safe = F.when(norm > 0, norm).otherwise(F.lit(1.0))
    return df.withColumn(
        out_col or vec_col, F.transform(v, lambda x: x / safe))


def label_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mean-pooled centroid per group: ``(group, centroid, n_members)``.

    The embedding-aggregation primitive (class prototypes, cluster
    summaries, dedup-cluster representatives): posexplode to
    ``(group, pos, val)``, per-(group, pos) average with map-side partial
    aggregation, then reassemble the array ordered by position. NULL
    vectors are excluded (they carry no dimensions to pool).
    """
    ex = df.select(
        F.col(group_col).alias("_g"),
        F.posexplode(_vec(vec_col)).alias("_pos", "_val"),
    )
    per_dim = ex.groupBy("_g", "_pos").agg(
        F.avg("_val").alias("_avg"), F.count(F.lit(1)).alias("_n"))
    return (
        per_dim.groupBy("_g")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_avg"))),
                lambda s: s["_avg"],
            ).alias("centroid"),
            F.max("_n").alias("n_members"),
        )
        .select(F.col("_g").alias(group_col), "centroid", "n_members")
    )


def dim_scales(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One-row relation: per-dimension max(|value|) as a sorted array.

    The symmetric-quantization scale vector. Computed with one partial
    aggregate over the exploded corpus; the result is dim-sized
    (broadcastable by construction).
    """
    ex = df.select(F.posexplode(_vec(vec_col)).alias("_pos", "_val"))
    per_dim = ex.groupBy("_pos").agg(F.max(F.abs(F.col("_val"))).alias("_m"))
    return per_dim.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_m"))),
            lambda s: s["_m"],
        ).alias("scales")
    )


def quantized_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    rescore: int = 4,
    scales: list[float] | None = None,
) -> DataFrame:
    """Memory-efficient cosine top-k: int8 prefilter + exact rescore.

    The pattern a quantized in-memory corpus enables at 100 TB: the
    cheap pass scores every vector against the int8-quantized query
    with an integer dot product (4× less memory traffic than float32,
    products bounded by 127²·dim — safe in int64), keeps the top
    ``rescore × k`` candidates via ``orderBy+limit``
    (TakeOrderedAndProject — per-partition heaps, no full sort), then
    rescores ONLY those with the exact float cosine. Ranking quality is
    set by ``rescore``: candidates beyond the quantization noise floor
    never reach the exact pass, and ``rescore × k ≥ corpus`` degrades
    to exact brute force (the oracle path; recall at small factors is
    pytest-checked). ``scales`` accepts a frozen per-dimension scale
    vector (list of floats) so query and a stored quantized corpus
    share one layout.
    """
    if rescore < 1:
        raise ValueError(f"rescore must be >= 1, got {rescore}")
    if scales is None:
        scales = [float(s) for s in
                  dim_scales(df, vec_col).collect()[0]["scales"]]
    if len(scales) != len(query):
        raise ValueError(
            f"scale vector has dim {len(scales)}, query has {len(query)}")
    import math

    qmax = 127
    # same floor(+0.5) rounding as quantize_embeddings, so query and
    # corpus share one quantization semantics
    q_int = [0 if s <= 0 else math.floor((v / s) * qmax + 0.5)
             for v, s in zip(query, scales)]
    sc_df = _scales_df(df, scales)
    quant = quantize_embeddings(df, vec_col, scales=sc_df)
    q_arr = F.array(*[F.lit(x) for x in q_int])
    approx = F.aggregate(
        F.zip_with("qvec", q_arr, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    cands = (
        quant.select(F.col(id_col), F.col(vec_col), approx.alias("_approx"))
        .orderBy(F.desc("_approx"), F.col(id_col))
        .limit(rescore * k)
    )
    v = _vec(vec_col)
    qlit = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(F.zip_with(v, qlit, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    qn = sum(x * x for x in query) ** 0.5 or 1.0
    vn = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    cos = dot / (vn * F.lit(qn))
    return (
        cands.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _scales_df(df: DataFrame, scales: list[float]) -> DataFrame:
    """One-row scales relation from an explicit scale vector."""
    spark = df.sparkSession
    return spark.createDataFrame(
        [(list(map(float, scales)),)], "scales array<double>")


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    bits: int = 8,
    scales: DataFrame | None = None,
    out_col: str = "qvec",
) -> DataFrame:
    """Symmetric per-dimension integer quantization of an embedding column.

    ``q = floor(v / scale * (2^(bits-1) - 1) + 0.5)`` — explicit
    floor(+0.5) round-half-up instead of ``round()`` so any SQL engine
    reproduces the integers bit-for-bit (round() tie behavior differs
    across engines). Zero-scale dimensions (constant-zero across the
    corpus) quantize to 0.

    ``scales`` defaults to :func:`dim_scales` of ``df`` itself; pass a
    precomputed/stored scale vector to quantize new batches under a
    frozen layout (same contract as the IVF index sidecar). The corpus
    pass is map-only: the one-row scale relation broadcasts through the
    crossJoin, and ``zip_with`` does the per-element math in-plan.
    """
    if not 1 < bits <= 16:
        raise ValueError(f"bits must be in 2..16, got {bits}")
    qmax = (1 << (bits - 1)) - 1
    sc = scales if scales is not None else dim_scales(df, vec_col)
    q = F.zip_with(
        _vec(vec_col),
        F.col("_scales"),
        lambda v, s: F.when(
            s > 0, F.floor(v / s * F.lit(qmax) + F.lit(0.5)).cast("int")
        ).otherwise(F.lit(0)),
    )
    return (
        df.crossJoin(F.broadcast(sc.select(F.col("scales").alias("_scales"))))
        .withColumn(out_col, q)
        .drop("_scales")
    )


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int | None = None,
):
    """Distributed PCA fit: returns ``(mean: list, components: list of
    list, explained_variance: list)`` — the whitening/compression step
    of an embedding pipeline (dim reduction before ANN, decorrelation
    before quantization).

    Only DIM-sized state ever reaches the driver: one aggregate computes
    the per-dimension sums and the dim×dim raw second-moment matrix as
    flattened partial sums (map-side combine; the exchange carries
    dim + dim² cells per partition, independent of corpus size), then
    the covariance eigendecomposition runs on the driver with numpy —
    an O(dim³) dense solve on a matrix that fits in a cache line budget,
    exactly like the k-means‖ driver re-cluster. The corpus itself is
    never collected.

    Eigenvectors are sign-normalized (largest-|component| coordinate
    made positive) so the fit is deterministic up to eigenvalue ties.
    """
    import numpy as np

    first = df.select(F.size(_vec(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("fit_pca: empty input")
    dim = first["d"]
    v = _vec(vec_col)
    sums = [F.sum(F.element_at(v, i + 1)).alias(f"s{i}")
            for i in range(dim)]
    moments = [
        F.sum(F.element_at(v, i + 1) * F.element_at(v, j + 1))
        .alias(f"m{i}_{j}")
        for i in range(dim) for j in range(i, dim)
    ]
    row = df.agg(F.count(F.lit(1)).alias("n"), *sums, *moments).first()
    n = row["n"]
    mean = np.array([row[f"s{i}"] / n for i in range(dim)])
    cov = np.zeros((dim, dim))
    for i in range(dim):
        for j in range(i, dim):
            m = row[f"m{i}_{j}"] / n - mean[i] * mean[j]
            cov[i, j] = cov[j, i] = m
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    if k is not None:
        vals, vecs = vals[:k], vecs[:, :k]
    # deterministic sign: make the largest-|coordinate| entry positive
    for c in range(vecs.shape[1]):
        i = int(np.argmax(np.abs(vecs[:, c])))
        if vecs[i, c] < 0:
            vecs[:, c] = -vecs[:, c]
    return (mean.tolist(), vecs.T.tolist(),
            np.maximum(vals, 0.0).tolist())


def project_pca(
    df: DataFrame,
    mean: list,
    components: list,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Map-only projection onto fitted components:
    ``out[c] = Σ_i (v[i] − mean[i]) · comp[c][i]``.

    The fitted (mean, components) ship as literals folded into the
    expression — no join, no broadcast table, whole-stage codegen'd;
    the corpus pass pipelines with the scan like every other embedding
    transform here.
    """
    v = _vec(vec_col)
    outs = []
    for comp in components:
        term = F.lit(0.0)
        for i, (m, w) in enumerate(zip(mean, comp)):
            if w == 0.0:
                continue
            term = term + (F.element_at(v, i + 1) - F.lit(float(m))) \
                * F.lit(float(w))
        outs.append(term)
    return df.withColumn(out_col, F.array(*outs))
