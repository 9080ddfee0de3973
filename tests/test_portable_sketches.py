"""Portable (md5-derived) sketch variants and robustness guards.

The ``portable=True`` SimHash / rolling-fingerprint paths exist so an
independent SQL engine can recompute the sketch bit-for-bit (the driver's
DuckDB oracle does exactly that). These tests pin the engine output to a
from-first-principles Python reference implementation, so the Spark
expression tree, the DuckDB oracle, and this file form three independent
derivations of the same numbers.
"""

from __future__ import annotations

import hashlib
import re

import pytest

from bigdata_tag_system_spark.operators import dedup as D
from bigdata_tag_system_spark.operators import text as T


def _norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_simhash60(text: str, n: int = 2) -> int:
    toks = _norm(text).split(" ")
    sh = []
    for i in range(max(len(toks) - n, 0) + 1):
        g = " ".join(toks[i:i + n])
        if g not in sh:
            sh.append(g)
    sketch = 0
    for b in range(60):
        vote = sum(1 if (_h60(g) >> b) & 1 else -1 for g in sh)
        if vote > 0:
            sketch |= 1 << b
    return sketch


def _ref_rolling_fp60(text: str, n: int = 8) -> int:
    toks = _norm(text).split(" ")
    wins = [" ".join(toks[i:i + n])
            for i in range(max(len(toks) - n, 0) + 1)]
    return min(_h60(w) for w in wins)


DOCS = [
    (1, "The quick brown fox jumps over the lazy dog near the old river bank"),
    (2, "the  quick Brown fox jumps over the lazy dog near the old river bank"),
    (3, "completely unrelated words about databases and distributed query engines"),
    (4, "tiny"),
]


class TestPortableSimhash:
    def test_sketch_matches_python_reference(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {r["doc_id"]: r["simhash"]
               for r in D.simhash_df(df, portable=True).collect()}
        want = {i: _ref_simhash60(t) for i, t in DOCS}
        assert got == want

    def test_portable_pairs_identical_docs(self, spark):
        # docs 1 and 2 normalize identically → Hamming 0
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in D.simhash_pairs(df, max_hamming=0, portable=True).collect()}
        assert pairs == {(1, 2): 0}

    def test_portable_pairs_equal_brute_force(self, spark):
        # the pigeonhole prefilter is recall-lossless: pair set must equal
        # brute-force over the reference sketches at the same budget
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        budget = 20
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in D.simhash_pairs(
                   df, max_hamming=budget, portable=True).collect()}
        sk = {i: _ref_simhash60(t) for i, t in DOCS}
        ids = sorted(sk)
        want = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                ham = bin(sk[a] ^ sk[b]).count("1")
                if ham <= budget:
                    want[(a, b)] = ham
        assert got == want


class TestPortableRollingFp:
    def test_fingerprint_matches_python_reference(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {r["doc_id"]: r["fp"] for r in df.select(
            "doc_id",
            T.rolling_fingerprint("text", portable=True).alias("fp"),
        ).collect()}
        want = {i: _ref_rolling_fp60(t) for i, t in DOCS}
        assert got == want


class TestGuards:
    def test_connected_components_rejects_string_ids(self, spark):
        pairs = spark.createDataFrame(
            [("a", "b")], "id_a string, id_b string")
        with pytest.raises(ValueError, match="integral id columns"):
            D.connected_components(pairs)

    def test_range_join_bucket_rejects_malformed(self, spark):
        from bigdata_tag_system_spark.operators.timeseries import range_join

        pts = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00")], "user_id long, ts string"
        ).selectExpr("user_id", "ts::timestamp AS ts")
        iv = spark.createDataFrame(
            [(1, "2024-01-01 09:00:00", "2024-01-01 11:00:00")],
            "user_id long, start_ts string, end_ts string",
        ).selectExpr("user_id", "start_ts::timestamp AS start_ts",
                     "end_ts::timestamp AS end_ts")
        for bad in ("1 fortnight", "soon", "3; DROP"):
            with pytest.raises(ValueError, match="bucket"):
                range_join(pts, iv, bucket=bad)
        assert range_join(pts, iv, bucket="1 Hour").count() == 1

    def test_asof_tolerance_rejects_malformed(self, spark):
        from bigdata_tag_system_spark.operators.timeseries import (
            _parse_tolerance,
            asof_join,
        )

        for bad in ("6; DROP TABLE x", "soon", "6 fortnights", "-3 hours"):
            with pytest.raises(ValueError, match="time window must look like"):
                _parse_tolerance(bad)
        # well-formed strings still parse (plan builds without error)
        left = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00")], "user_id long, ts string"
        ).selectExpr("user_id", "ts::timestamp AS ts")
        right = spark.createDataFrame(
            [(1, "2024-01-01 09:30:00", 5.0)],
            "user_id long, ts string, value double",
        ).selectExpr("user_id", "ts::timestamp AS ts", "value")
        out = asof_join(left, right, value_cols=["value"],
                        tolerance="45 Minutes")
        assert out.collect()[0]["value_asof"] == 5.0
