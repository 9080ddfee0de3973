"""Embedding operators: mean-pooling, normalization, quantization."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdata_tag_system_spark.operators.embeddings import (
    dim_scales,
    label_centroids,
    normalize_vectors,
    quantize_embeddings,
)


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, [1.0, 2.0, -4.0], "a"),
        (1, [3.0, 0.0, 2.0], "a"),
        (2, [-1.0, 6.0, 0.0], "b"),
        (3, [0.0, 0.0, 0.0], "b"),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")


class TestCentroids:
    def test_mean_pool_per_label(self, emb):
        got = {r["label"]: (r["centroid"], r["n_members"])
               for r in label_centroids(emb).collect()}
        assert got["a"] == ([2.0, 1.0, -1.0], 2)
        assert got["b"] == ([-0.5, 3.0, 0.0], 2)

    def test_null_vectors_excluded(self, spark):
        df = spark.createDataFrame(
            [(0, [2.0, 4.0], "a"), (1, None, "a")],
            "vec_id long, embedding array<double>, label string")
        got = label_centroids(df).collect()
        assert len(got) == 1
        assert got[0]["centroid"] == [2.0, 4.0]
        assert got[0]["n_members"] == 1


class TestNormalize:
    def test_unit_norm_and_zero_guard(self, emb):
        out = normalize_vectors(emb).select(
            "vec_id",
            F.round(F.aggregate(
                "embedding", F.lit(0.0), lambda a, x: a + x * x), 9
            ).alias("sq"),
        )
        got = {r["vec_id"]: r["sq"] for r in out.collect()}
        assert got[0] == got[1] == got[2] == 1.0
        assert got[3] == 0.0  # zero vector stays zero, no NaN


class TestQuantize:
    def test_scales_and_range(self, emb):
        scales = dim_scales(emb).collect()[0]["scales"]
        assert scales == [3.0, 6.0, 4.0]
        q = {r["vec_id"]: r["qvec"] for r in quantize_embeddings(emb).collect()}
        # max-|value| dims hit exactly ±127; everything inside the range
        assert q[1][0] == 127 and q[2][1] == 127 and q[0][2] == -127
        assert all(-127 <= x <= 127 for v in q.values() for x in v)
        # floor(+0.5) round-half-up: 1/3*127 = 42.33 → 42; 2/6*127 = 42.33 → 42
        assert q[0][0] == 42 and q[0][1] == 42

    def test_zero_scale_dim_quantizes_to_zero(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [-2.0, 0.0])],
            "vec_id long, embedding array<double>")
        q = {r["vec_id"]: r["qvec"] for r in quantize_embeddings(df).collect()}
        assert q[0] == [64, 0] and q[1] == [-127, 0]

    def test_frozen_scales_for_new_batch(self, spark, emb):
        # quantizing a new batch under the corpus scales must use the
        # corpus layout, not the batch's own max
        batch = spark.createDataFrame(
            [(9, [0.3, 0.6, 0.4])], "vec_id long, embedding array<double>")
        q = quantize_embeddings(
            batch, scales=dim_scales(emb)).collect()[0]["qvec"]
        assert q == [13, 13, 13]  # 0.1 of each scale → floor(12.7+0.5)

    def test_bits_validation(self, emb):
        with pytest.raises(ValueError, match="bits"):
            quantize_embeddings(emb, bits=1)

    def test_quantized_topk_exact_at_full_rescore(self, spark):
        import math
        import random

        from bigdata_tag_system_spark.operators.embeddings import quantized_topk

        rng = random.Random(11)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        query = rows[0][1]

        def cos(v):
            d = sum(a * b for a, b in zip(v, query))
            return d / (math.sqrt(sum(x * x for x in v))
                        * math.sqrt(sum(x * x for x in query)))

        exact = sorted(((round(cos(v), 9), -i) for i, v in rows),
                       reverse=True)[:5]
        exact_ids = [-neg for _, neg in exact]
        # rescore covering the corpus → identical to brute force
        got = [r["vec_id"] for r in
               quantized_topk(df, query, k=5, rescore=8).collect()]
        assert got == exact_ids
        # small rescore factor: top-1 (the query itself) must survive the
        # integer prefilter, and every returned id must rank by exact cosine
        approx = quantized_topk(df, query, k=5, rescore=2).collect()
        assert approx[0]["vec_id"] == 0
        assert [r["cosine"] for r in approx] == sorted(
            (r["cosine"] for r in approx), reverse=True)

    def test_corpus_pass_is_map_only(self, emb):
        # the corpus side of quantization must not shuffle: the one-row
        # scale relation broadcasts (IdentityBroadcastMode nested-loop),
        # and every Exchange in the plan belongs to the dim-sized scale
        # aggregation, never to a corpus-keyed repartition
        plan = quantize_embeddings(emb)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan
        assert "hashpartitioning(vec_id" not in plan


class TestPca:
    def test_recovers_planted_principal_axis(self, spark):
        import numpy as np

        from bigdata_tag_system_spark.operators.embeddings import (
            fit_pca, project_pca,
        )

        rng = np.random.RandomState(7)
        # variance 100 along (1,1,0)/sqrt2, variance 1 along others
        axis = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
        data = (rng.randn(400, 1) * 10) @ axis[None, :] \
            + rng.randn(400, 3) * 1.0 + np.array([5.0, -3.0, 2.0])
        df = spark.createDataFrame(
            [(i, row.tolist()) for i, row in enumerate(data)],
            "vec_id long, embedding array<double>")
        mean, comps, var = fit_pca(df, k=2)
        assert np.allclose(mean, data.mean(axis=0), atol=1e-9)
        # top component parallel to the planted axis
        c0 = np.array(comps[0])
        assert abs(abs(c0 @ axis) - 1.0) < 0.05
        assert var[0] > 50 * var[1]
        # components orthonormal
        C = np.array(comps)
        assert np.allclose(C @ C.T, np.eye(2), atol=1e-9)
        # projection matches numpy exactly (same arithmetic)
        out = project_pca(df, mean, comps).orderBy("vec_id").collect()
        want = (data - np.array(mean)) @ C.T
        got = np.array([r.pca for r in out])
        assert np.allclose(got, want, atol=1e-9)

    def test_determinism_and_empty(self, spark):
        import pytest as _pytest

        from bigdata_tag_system_spark.operators.embeddings import fit_pca

        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, [3.0, 1.0]), (3, [2.0, 5.0])],
            "vec_id long, embedding array<double>")
        a = fit_pca(df)
        b = fit_pca(df.repartition(3))
        import numpy as np
        assert np.allclose(a[1], b[1], atol=1e-12)
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>")
        with _pytest.raises(ValueError, match="empty"):
            fit_pca(empty)


class TestProductQuantization:
    """PQ encode / ADC / fitted codebooks (operators.embeddings.pq_*)."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        # deterministic 40×8 corpus with enough spread for 4 clusters
        rows = [
            (i, [float(((i * 7 + d * 3) % 11) - 5) / 5.0
                 for d in range(8)])
            for i in range(40)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    @pytest.fixture(scope="class")
    def books(self):
        # 2 subspaces × 4 centroids × 4 dims, fixed literals
        return [
            [[(((j * 5 + c * 3 + d) % 7) - 3) / 3.0 for d in range(4)]
             for c in range(4)]
            for j in range(2)
        ]

    def test_encode_matches_numpy(self, corpus, books):
        import numpy as np

        from bigdata_tag_system_spark.operators.embeddings import pq_encode

        got = {r["vec_id"]: list(r["pq_code"])
               for r in pq_encode(corpus, books, dim=8).collect()}
        data = {r["vec_id"]: np.array(r["embedding"])
                for r in corpus.collect()}
        B = np.array(books)  # (2, 4, 4)
        for vid, v in data.items():
            want = [int(np.argmin(((v[j * 4:(j + 1) * 4] - B[j]) ** 2)
                                  .sum(axis=1)))
                    for j in range(2)]
            assert got[vid] == want, vid

    def test_adc_matches_numpy_and_orders(self, corpus, books):
        import numpy as np

        from bigdata_tag_system_spark.operators.embeddings import (
            pq_adc_topk,
            pq_distance_table,
        )

        query = [0.3, -0.2, 0.5, 0.0, -0.4, 0.1, 0.2, -0.1]
        out = pq_adc_topk(corpus, books, query, k=5).collect()
        assert [c for c in out[0].asDict()] == \
            ["vec_id", "pq_code", "pq_dist"]
        dtab = np.array(pq_distance_table(books, query))
        # recompute each returned distance from the returned codes
        for r in out:
            want = sum(dtab[j][r["pq_code"][j]] for j in range(2))
            assert abs(r["pq_dist"] - want) < 1e-12
        dists = [r["pq_dist"] for r in out]
        assert dists == sorted(dists)

    def test_adc_rescore_returns_exact_cosine(self, corpus, books):
        import numpy as np

        from bigdata_tag_system_spark.operators.embeddings import (
            pq_adc_topk,
        )

        query = [0.3, -0.2, 0.5, 0.0, -0.4, 0.1, 0.2, -0.1]
        # rescore×k covers the whole corpus → exact brute-force top-k
        out = pq_adc_topk(corpus, books, query, k=3, rescore=20).collect()
        data = {r["vec_id"]: np.array(r["embedding"])
                for r in corpus.collect()}
        q = np.array(query)
        cos = {vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
               for vid, v in data.items()}
        want = sorted(cos, key=lambda k: (-cos[k], k))[:3]
        assert [r["vec_id"] for r in out] == want
        for r in out:
            assert abs(r["cosine"] - cos[r["vec_id"]]) < 1e-9

    def test_fit_pq_codebooks_shape_and_improvement(self, corpus):
        import numpy as np

        from bigdata_tag_system_spark.operators.embeddings import (
            fit_pq_codebooks,
        )

        books0 = fit_pq_codebooks(corpus, dim=8, m=2, k=4, iterations=0)
        books5 = fit_pq_codebooks(corpus, dim=8, m=2, k=4, iterations=5)
        assert len(books5) == 2
        assert all(len(b) == 4 for b in books5)
        assert all(len(c) == 4 for b in books5 for c in b)

        def recon_err(books):
            B = [np.array(b) for b in books]
            data = [np.array(r["embedding"]) for r in corpus.collect()]
            tot = 0.0
            for v in data:
                for j in range(2):
                    sub = v[j * 4:(j + 1) * 4]
                    tot += float(((sub - B[j]) ** 2).sum(axis=1).min())
            return tot

        # Lloyd iterations must not worsen train-set quantization error
        assert recon_err(books5) <= recon_err(books0) + 1e-9

    def test_fit_pq_rejects_bad_geometry(self, corpus):
        import pytest as _pytest

        from bigdata_tag_system_spark.operators.embeddings import (
            fit_pq_codebooks,
        )

        with _pytest.raises(ValueError, match="divisible"):
            fit_pq_codebooks(corpus, dim=8, m=3, k=4)
        with _pytest.raises(ValueError, match="at least k"):
            fit_pq_codebooks(corpus, dim=8, m=2, k=64)


class TestLabelOutliers:
    def test_matches_numpy_diagonal_mahalanobis(self, spark):
        import numpy as np

        from bigdata_tag_system_spark.operators.embeddings import (
            label_outlier_scores,
        )

        rng = np.random.default_rng(7)
        vecs = rng.normal(0.0, 1.0, size=(40, 8)).astype("float32")
        vecs[0] += 25.0  # planted far outlier in label 0
        rows = [(i, int(i % 2), [float(x) for x in vecs[i]])
                for i in range(40)]
        df = spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>")
        got = {r.vec_id: (r.z2_mean, r.is_outlier)
               for r in label_outlier_scores(df).collect()}

        for lbl in (0, 1):
            sub = vecs[lbl::2].astype("float64")
            mu = sub.mean(axis=0)
            var = sub.var(axis=0)
            for j, v in zip(range(lbl, 40, 2), sub):
                want = float(((v - mu) ** 2 / np.maximum(var, 1e-12)).mean())
                assert abs(got[j][0] - round(want, 4)) <= 1e-4, (j, want)
        assert got[0][1] == 1          # planted outlier flagged
        flagged = sum(o for _, o in got.values())
        assert flagged <= 5            # normal data mostly unflagged
