"""``pyspark.ml`` interop parity — certifying the MLlib surface the
baseline names (``BASELINE.json:7`` ``spark_approach: "DataFrame ops +
MLlib feature engineering"``) against this engine's hand-rolled,
oracle-replayable equivalents.

The engine deliberately hand-rolls its sketches (MinHash, SRP, k-means‖,
PCA, hash featurizer) because hand-rolled formulations replay in an
external SQL oracle while MLlib's internals do not. That leaves the
MLlib surface itself uncertified — these adapters close the gap: each
runs the REAL MLlib estimator/transformer and is pinned equal (or
bounded-equivalent, loudly documented) to the replayable twin by the
catalog entry that consumes it. The replayable twin stays the truth;
MLlib is the system under test.

Determinism notes (what makes these pinnable at all):

- ``MinHashLSH`` draws its permutation coefficients from a seeded RNG —
  fixed ``seed`` ⇒ identical hash functions every run. Its
  ``approxSimilarityJoin`` candidates are pairs sharing ≥1 hash-table
  bucket (OR over ``numHashTables`` single-minhash tables), then
  filtered by EXACT key distance (Jaccard over the binary-vector index
  sets) — so with recall 1.0 on a dataset the verified pair set is
  exactly the brute-force Jaccard pair set, and recall failures are
  deterministic (per seed), never flaky. P(miss a pair at Jaccard j)
  = (1−j)^numHashTables.
- ``QuantileDiscretizer`` with ``relativeError=0.0`` computes EXACT
  quantiles; measured (tools probe, r13) its fences equal DuckDB
  ``quantile_disc`` and Spark SQL ``percentile_disc`` on every
  size/tie shape tried — discrete (no-interpolation) lower-rank
  semantics all three agree on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingle_df


def minhash_lsh_ml_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hash_tables: int = 16,
    seed: int = 42,
    vocab_size: int = 1 << 20,
) -> DataFrame:
    """Near-dup pairs via the MLlib pipeline: shingle sets →
    ``CountVectorizer(binary=True)`` → ``MinHashLSH`` →
    ``approxSimilarityJoin``. Returns ``(id_a, id_b, ml_jaccard)`` with
    ``id_a < id_b`` and ``ml_jaccard ≥ threshold``.

    ``CountVectorizer`` (not ``HashingTF``) so the doc → binary-vector
    mapping is LOSSLESS while the vocabulary fits ``vocab_size`` —
    hashing collisions would perturb Jaccard and break the exact pin
    against :func:`~.dedup.minhash_dedup`. The join's distance filter
    runs on the exact key distance (1 − |A∩B|/|A∪B| over vector index
    sets), so for pairs the LSH stage recalls, ``ml_jaccard`` is the
    same rational our shingle-set Jaccard computes. The threshold is
    passed with a +1e-7 epsilon because ``approxSimilarityJoin`` keeps
    ``dist < threshold`` (strict) while the engine keeps ``jaccard ≥
    threshold``; the final ``≥`` filter below re-tightens exactly.

    100 TB: same banded-LSH shape as the hand-rolled path (the
    self-join runs bucket-keyed), but the ``CountVectorizer`` vocab is
    a driver-collected array — at corpus scale swap it for the
    hand-rolled hashed-shingle path; this adapter exists as the
    MLlib-surface certificate, not the scale path.
    """
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    sh = (
        _shingle_df(df.where(F.col(text_col).isNotNull()),
                    text_col, id_col, shingle_n)
        # the shingle relation feeds CountVectorizer.fit AND transform —
        # lazy-checkpoint so tokenize→shingle runs once, not per pass.
        # The empty-shingle guard runs AFTER the checkpoint (r14): when
        # it sat below, Catalyst pushed the size(_sh)>0 predicate under
        # the two-phase projection and re-inlined the regex tokenizer
        # INSIDE the shingle transform lambda — HOF lambdas re-evaluate
        # captured expressions per element, so the filter alone cost a
        # per-shingle regex split per row (measured: materializing this
        # relation 4.4 s → 0.6 s with the guard above the leaf; same
        # 5000 rows kept either way).
        .localCheckpoint(eager=False)
        .where(F.size("_sh") > 0)
    )
    # Right-size the fit's vocabulary bound (r13): CountVectorizer's
    # fit selects top-vocabSize terms with a size-vocabSize bounded
    # heap, so passing the 1<<20 CAP directly costs ~0.7 s of heap
    # churn per fit even when the real vocabulary is ~27k. One cheap
    # distinct-count over the checkpointed shingle relation sizes the
    # bound exactly; every term is still kept whenever the true vocab
    # fits the cap (same lossless contract — and the verified pair set
    # is invariant to vocabulary order anyway: the join's distance
    # filter is exact Jaccard over index SETS, a relabeling-invariant).
    n_vocab = sh.select(F.explode("_sh").alias("_s")).distinct().count()
    cv = CountVectorizer(
        inputCol="_sh", outputCol="features", binary=True,
        vocabSize=max(1, min(n_vocab, vocab_size)), minDF=1.0)
    # repartition before the LSH self-join: the corpus often arrives as
    # few files, and approxSimilarityJoin's expensive leg — exact key
    # distance over every bucket-colliding candidate pair — inherits
    # the input partitioning (measured 2.7× faster spread over the
    # session's shuffle width at sf0.1)
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    feats = (cv.fit(sh).transform(sh)
             .select(id_col, "features").repartition(n_part))
    # cache: approxSimilarityJoin(feats, feats) otherwise recomputes
    # the tokenize→shingle→vectorize chain once PER JOIN SIDE (the
    # vectors are certificate-scale — the vocab bound above already
    # caps this path well under cluster memory)
    feats = feats.cache()
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=num_hash_tables, seed=seed)
    model = mh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, threshold=(1.0 - threshold) + 1e-7, distCol="_dist")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            (F.lit(1.0) - F.col("_dist")).alias("ml_jaccard"))
        .where((F.col("id_a") < F.col("id_b"))
               & (F.col("ml_jaccard") >= threshold))
        .distinct()
    )


def quantile_bucket_ml(
    df: DataFrame,
    value_col: str,
    num_buckets: int = 10,
    out_col: str = "bucket",
) -> DataFrame:
    """Bucket assignment via ``QuantileDiscretizer`` fit at
    ``relativeError=0.0`` (EXACT quantiles — the summaries collapse to
    a full sort-merge; fine for fences over one column, and the price
    of an externally replayable fit). NULL values are dropped first:
    the discretizer's ``handleInvalid`` semantics (keep-as-extra-bucket
    or error) have no oracle-stable encoding, and a NULL has no
    quantile anyway.
    """
    from pyspark.ml.feature import QuantileDiscretizer

    clean = df.where(F.col(value_col).isNotNull())
    qd = QuantileDiscretizer(
        numBuckets=num_buckets, inputCol=value_col, outputCol=out_col,
        relativeError=0.0)
    out = qd.fit(clean).transform(clean)
    return out.withColumn(out_col, F.col(out_col).cast("int"))


def quantile_bucket_native(
    df: DataFrame,
    value_col: str,
    num_buckets: int = 10,
    out_col: str = "bucket",
) -> DataFrame:
    """The hand-rolled twin of :func:`quantile_bucket_ml`: exact
    ``percentile_disc`` fences at i/num_buckets (one 1-row aggregate,
    broadcast back), assignment = count of DISTINCT interior fences ≤
    value — precisely ``Bucketizer``'s ``[s_i, s_{i+1})`` placement
    after its duplicate-split collapse (ties in the data can make two
    quantiles equal; Bucketizer merges those buckets, and counting
    distinct fences merges them identically).
    """
    clean = df.where(F.col(value_col).isNotNull())
    fences = clean.agg(*[
        F.expr(f"percentile_disc({i / num_buckets}) WITHIN GROUP "
               f"(ORDER BY {value_col})").alias(f"_f{i}")
        for i in range(1, num_buckets)
    ])
    fence_arr = F.array_distinct(F.array(*[
        F.col(f"_f{i}") for i in range(1, num_buckets)]))
    return (
        clean.crossJoin(F.broadcast(fences))
        .withColumn(
            out_col,
            F.size(F.filter(fence_arr,
                            lambda f: f <= F.col(value_col))).cast("int"))
        .drop(*[f"_f{i}" for i in range(1, num_buckets)])
    )
