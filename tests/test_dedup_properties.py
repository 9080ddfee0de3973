"""Property-based validation of the exact n-gram-Jaccard join.

The AllPairs/PPJoin prefix + size-ratio + positional filters must lose
NO true pair (they only prune candidates that provably cannot reach the
threshold). Hypothesis builds random small corpora with planted overlap;
results are compared pair-for-pair (including the Jaccard value) against
a brute-force pure-Python computation of the same shingle semantics.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_tag_system_spark.operators.dedup import ngram_jaccard_pairs

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu"]

SHINGLE_N = 3


def _py_shingles(text: str) -> frozenset[str]:
    toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    if len(toks) <= SHINGLE_N:
        return frozenset([" ".join(toks)])
    return frozenset(
        " ".join(toks[i:i + SHINGLE_N]) for i in range(len(toks) - SHINGLE_N + 1)
    )


def _py_pairs(docs: list[str], threshold: float) -> dict[tuple[int, int], float]:
    sh = [_py_shingles(d) for d in docs]
    out = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            j = inter / union if union else 0.0
            if j >= threshold:
                out[(a, b)] = round(j, 6)
    return out


# documents: random word sequences, with mutation-of-a-base docs mixed in
# so near-duplicate pairs actually occur at every threshold
@st.composite
def _corpus(draw):
    n_base = draw(st.integers(min_value=2, max_value=4))
    bases = [
        draw(st.lists(st.sampled_from(WORDS), min_size=5, max_size=12))
        for _ in range(n_base)
    ]
    docs = [" ".join(b) for b in bases]
    for b in bases:
        n_mut = draw(st.integers(min_value=0, max_value=2))
        for _ in range(n_mut):
            mutated = list(b)
            idx = draw(st.integers(min_value=0, max_value=len(mutated) - 1))
            mutated[idx] = draw(st.sampled_from(WORDS))
            if draw(st.booleans()):
                mutated.append(draw(st.sampled_from(WORDS)))
            docs.append(" ".join(mutated))
    return docs


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=_corpus(), threshold=st.sampled_from([0.3, 0.5, 0.7, 0.9]))
def test_ngram_jaccard_matches_brute_force(spark, docs, threshold):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string").coalesce(1)
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in ngram_jaccard_pairs(df, threshold=threshold,
                                     shingle_n=SHINGLE_N).collect()
    }
    want = _py_pairs(docs, threshold)
    assert got == want, f"threshold={threshold} docs={docs}"


# ---------------------------------------------------------------------------
# Connected components (duplicate-cluster resolution)
# ---------------------------------------------------------------------------

def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for n in list(parent):
        groups.setdefault(find(n), []).append(n)
    return {n: min(groups[find(n)]) for n in parent}


def test_connected_components_vs_union_find(spark):
    import random

    from bigdata_tag_system_spark.operators.dedup import connected_components

    rng = random.Random(7)
    # a long chain (defeats O(diameter) label propagation), a clique,
    # and a random sparse graph with singleton-free nodes
    edges = [(i, i + 1) for i in range(40)]
    edges += [(100 + a, 100 + b) for a in range(10) for b in range(a + 1, 10)]
    edges += [(rng.randrange(200, 400), rng.randrange(200, 400)) for _ in range(150)]
    edges = [e for e in edges if e[0] != e[1]]

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _uf_components(edges)


def test_dedup_by_components_keeps_one_per_cluster(spark):
    from bigdata_tag_system_spark.operators.dedup import (
        connected_components,
        dedup_by_components,
    )

    edges = [(1, 2), (2, 3), (10, 11)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    kept = {r["doc_id"] for r in dedup_by_components(docs, pairs).collect()}
    # clusters {1,2,3} and {10,11} keep their minima; everything else survives
    assert kept == set(range(20)) - {2, 3, 11}
    cc = connected_components(pairs)
    assert {tuple(r) for r in cc.collect()} == {
        (1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_dedup_by_components_keep_best(spark):
    from bigdata_tag_system_spark.operators.dedup import dedup_by_components

    edges = [(1, 2), (2, 3), (10, 11), (20, 21)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    rows = [
        # cluster {1,2,3}: 2 has the best score → keep 2
        (1, 5.0), (2, 9.0), (3, 7.0),
        # cluster {10,11}: tie → keep lowest id 10
        (10, 4.0), (11, 4.0),
        # cluster {20,21}: NULL score loses to any scored copy
        (20, None), (21, 1.0),
        # unpaired rows survive regardless of score
        (15, None), (16, 2.0),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, score double")
    kept = {r["doc_id"] for r in
            dedup_by_components(docs, pairs, keep_col="score").collect()}
    assert kept == {2, 10, 21, 15, 16}


# ---------------------------------------------------------------------------
# Containment join (asymmetric near-dup: subset duplication)
# ---------------------------------------------------------------------------

def _py_containment_pairs(docs, threshold):
    sh = [_py_shingles(d) for d in docs]
    out = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            m = min(len(sh[a]), len(sh[b]))
            if m == 0:
                continue
            c = len(sh[a] & sh[b]) / m
            if c >= threshold:
                out[(a, b)] = round(c, 6)
    return out


@st.composite
def _containment_corpus(draw):
    # bases plus documents that EMBED a base inside unrelated filler —
    # high containment, low Jaccard (the case the operator exists for)
    base_docs = draw(_corpus())
    out = list(base_docs)
    for d in base_docs[:2]:
        filler = draw(st.lists(st.sampled_from(WORDS), min_size=10, max_size=25))
        out.append(" ".join(filler) + " " + d)
    return out


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=_containment_corpus(), threshold=st.sampled_from([0.5, 0.7, 0.9]))
def test_ngram_containment_matches_brute_force(spark, docs, threshold):
    from bigdata_tag_system_spark.operators.dedup import ngram_containment_pairs

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string").coalesce(1)
    got = {
        (r["id_a"], r["id_b"]): round(r["containment"], 6)
        for r in ngram_containment_pairs(df, threshold=threshold,
                                         shingle_n=SHINGLE_N).collect()
    }
    assert got == _py_containment_pairs(docs, threshold), \
        f"threshold={threshold} docs={docs}"


def test_containment_plan_is_hash_join(spark):
    """The candidate join must bind on the shingle equality (hash/SMJ),
    never degrade to a nested-loop/cartesian over documents."""
    from bigdata_tag_system_spark.operators.dedup import ngram_containment_pairs

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(4)],
        "doc_id long, text string")
    plan = ngram_containment_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Context-window chunking invariants
# ---------------------------------------------------------------------------

@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    n_words=st.integers(min_value=1, max_value=60),
    chunk_tokens=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=11),
)
def test_chunk_documents_invariants(spark, n_words, chunk_tokens, overlap):
    from bigdata_tag_system_spark.operators.text import chunk_documents

    overlap = min(overlap, chunk_tokens - 1)
    words = [f"t{i}" for i in range(n_words)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    chunks = [r.asDict() for r in chunk_documents(
        df, chunk_tokens=chunk_tokens, overlap=overlap)
        .orderBy("chunk_id").collect()]
    stride = chunk_tokens - overlap

    assert chunks, "every non-null doc emits at least one chunk"
    # chunk i starts at token i*stride; all tokens covered exactly
    seen = []
    for r in chunks:
        start = r["chunk_id"] * stride
        toks = r["chunk_text"].split(" ")
        assert toks == words[start:start + chunk_tokens]
        assert r["chunk_tokens"] == len(toks)
        seen.extend(toks[overlap:] if r["chunk_id"] else toks)
    # strided reconstruction returns the document exactly once
    assert seen == words


# ---------------------------------------------------------------------------
# Fuzzy edit-distance join: banding + histogram-L1 prefilter must lose
# NO true pair (both are proven lower bounds, but an off-by-one in band
# width or bin accounting would silently drop pairs)
# ---------------------------------------------------------------------------

def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


@st.composite
def _edit_corpus(draw):
    base = draw(st.lists(
        st.text(alphabet="abcde ", min_size=0, max_size=30),
        min_size=2, max_size=8))
    # plant near-dups: mutate some strings by a few random edits
    out = list(base)
    for s in base[: len(base) // 2]:
        t = list(s)
        for _ in range(draw(st.integers(0, 3))):
            op = draw(st.integers(0, 2))
            pos = draw(st.integers(0, max(0, len(t) - 1)))
            if op == 0 and t:
                t[pos] = draw(st.sampled_from("abcde"))
            elif op == 1:
                t.insert(pos, draw(st.sampled_from("abcde")))
            elif op == 2 and t:
                del t[pos]
        out.append("".join(t))
    return out


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_edit_corpus(), max_dist=st.sampled_from([0, 1, 3, 6]))
def test_fuzzy_edit_matches_brute_force(spark, docs, max_dist):
    from bigdata_tag_system_spark.operators.dedup import fuzzy_edit_pairs

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.dist
           for r in fuzzy_edit_pairs(df, max_dist=max_dist).collect()}
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            d = _py_lev(docs[a], docs[b])
            if d <= max_dist:
                want[(a, b)] = d
    assert got == want


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_edit_corpus(), gram_k=st.sampled_from([2, 7, 12]))
def test_fuzzy_edit_gram_k_invariant(spark, docs, gram_k):
    """The pair set is a pure function of (corpus, max_dist) — gram_k
    only steers the prefix-filter blocking (r14: the catalog entry
    tunes it to the corpus gram vocabulary), so any k must reproduce
    the default's exact output."""
    from bigdata_tag_system_spark.operators.dedup import fuzzy_edit_pairs

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string")
    base = {(r.id_a, r.id_b): r.dist
            for r in fuzzy_edit_pairs(df, max_dist=3).collect()}
    got = {(r.id_a, r.id_b): r.dist
           for r in fuzzy_edit_pairs(
               df, max_dist=3, gram_k=gram_k).collect()}
    assert got == base


def test_resolve_hierarchy_vs_python_walk(spark):
    import random

    from bigdata_tag_system_spark.operators.graph import resolve_hierarchy

    rng = random.Random(13)
    # random forest: parent[i] < i guarantees acyclicity; three roots
    parent = {}
    for i in range(3, 120):
        parent[i] = rng.randrange(0, 3) if i < 10 else rng.randrange(0, i)

    def walk(n):
        d = 0
        while n in parent:
            n, d = parent[n], d + 1
        return n, d

    df = spark.createDataFrame(
        list(parent.items()), "child long, parent long")
    got = {r["node"]: (r["root"], r["depth"])
           for r in resolve_hierarchy(df).collect()}
    want = {n: walk(n) for n in list(parent) + [0, 1, 2]}
    assert got == want


class TestBandBucketCap:
    """Hot-band guard: a mass-duplicated corpus must stay bounded
    (every copy lands in the same (band_id, band_hash) bucket; uncapped,
    the self-join is quadratic in that bucket)."""

    def _degenerate(self, spark, n=300):
        # n identical docs -> ONE bucket per band holds all n ids
        rows = [(i, "the same boilerplate text repeated everywhere " * 3)
                for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_truncate_bounds_hot_bucket(self, spark):
        from bigdata_tag_system_spark.operators.dedup import (
            minhash_candidate_pairs,
        )

        df = self._degenerate(spark, 300)
        capped = minhash_candidate_pairs(
            df, num_hashes=16, bands=4, max_bucket_size=16,
            on_overflow="truncate")
        # kept members are the 16 smallest ids in every band's bucket, so
        # candidates are exactly C(16,2) pairs, not C(300,2)=44850
        assert capped.count() == 16 * 15 // 2
        got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
        assert max(b for _, b in got) <= 15

    def test_error_mode_raises_loudly(self, spark):
        import pytest as _pytest
        from py4j.protocol import Py4JJavaError
        from bigdata_tag_system_spark.operators.dedup import (
            minhash_candidate_pairs,
        )

        df = self._degenerate(spark, 64)
        bad = minhash_candidate_pairs(
            df, num_hashes=16, bands=4, max_bucket_size=16,
            on_overflow="error")
        with _pytest.raises(Exception) as ei:
            bad.count()
        assert "max_bucket_size" in str(ei.value)

    def test_cap_no_effect_on_small_buckets(self, spark):
        from bigdata_tag_system_spark.operators.dedup import (
            minhash_candidate_pairs,
        )

        rows = [(i, f"document number {i} with its own distinct words "
                    f"{i * 7} {i * 13} {i % 5}") for i in range(40)]
        rows += [(100 + i, rows[i][1]) for i in range(5)]  # 5 true dups
        df = spark.createDataFrame(rows, "doc_id long, text string")
        uncapped = {(r["id_a"], r["id_b"]) for r in minhash_candidate_pairs(
            df, num_hashes=16, bands=4, max_bucket_size=None).collect()}
        capped = {(r["id_a"], r["id_b"]) for r in minhash_candidate_pairs(
            df, num_hashes=16, bands=4, max_bucket_size=10_000).collect()}
        assert capped == uncapped
        for i in range(5):
            assert (i, 100 + i) in capped

    def test_default_is_loud_not_silent_truncation(self, spark):
        # the public API must never SILENTLY drop candidacy: with no
        # explicit on_overflow, an over-cap bucket fails the job
        import pytest as _pytest
        from bigdata_tag_system_spark.operators.dedup import (
            minhash_candidate_pairs,
        )

        df = self._degenerate(spark, 64)
        with _pytest.raises(Exception) as ei:
            minhash_candidate_pairs(
                df, num_hashes=16, bands=4, max_bucket_size=16).count()
        assert "max_bucket_size" in str(ei.value)

    def test_bad_mode_rejected(self, spark):
        import pytest as _pytest
        from bigdata_tag_system_spark.operators.dedup import (
            minhash_candidate_pairs,
        )

        with _pytest.raises(ValueError):
            minhash_candidate_pairs(
                self._degenerate(spark, 4), on_overflow="warn")
