"""URL domain extraction, per-domain stats, and blocklist filtering."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_tag_system_spark.functions.text import extract_url_domains
from bigdata_tag_system_spark.operators.text import (
    filter_blocked_domains,
    url_domain_counts,
)


def _docs(spark):
    rows = [
        (0, "intro https://a.example.com/x then https://a.example.com/y twice"),
        (1, "plain text with no urls at all"),
        (2, "mixed http://b.org/z and https://a.example.com/"),
        (3, None),
        (4, "bare scheme-less a.example.com does not count"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExtraction:
    def test_domains_with_duplicates(self, spark):
        got = {r["doc_id"]: r["d"] for r in _docs(spark).select(
            "doc_id", extract_url_domains("text").alias("d")).collect()}
        assert got[0] == ["a.example.com", "a.example.com"]
        assert got[1] == []
        assert got[2] == ["b.org", "a.example.com"]
        assert got[3] is None
        assert got[4] == []


class TestDomainCounts:
    def test_within_doc_dedup(self, spark):
        # doc 0 mentions a.example.com twice but counts once
        got = {r["domain"]: r["doc_freq"]
               for r in url_domain_counts(_docs(spark)).collect()}
        assert got == {"a.example.com": 2, "b.org": 1}


class TestBm25:
    def test_scores_match_hand_computation(self, spark):
        import math

        from bigdata_tag_system_spark.operators.text import bm25_topk

        rows = [
            (0, "data data query"),       # tf(data)=2, tf(query)=1, len 3
            (1, "data and more words here"),  # tf(data)=1, len 5
            (2, "nothing relevant at all"),   # no hits, len 4
            (3, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["score"]
               for r in bm25_topk(df, ["data", "query"], k=10).collect()}

        n, avgdl = 3, (3 + 5 + 4) / 3
        k1, b = 1.2, 0.75

        def idf(dfreq):
            return math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)

        def term(tf, dl):
            return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

        want0 = idf(2) * term(2, 3) + idf(1) * term(1, 3)
        want1 = idf(2) * term(1, 5)
        assert got.keys() == {0, 1}
        assert abs(got[0] - want0) < 1e-9
        assert abs(got[1] - want1) < 1e-9
        assert got[0] > got[1]

    def test_empty_query_rejected(self, spark):
        import pytest as _pytest

        from bigdata_tag_system_spark.operators.text import bm25_topk

        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="query term"):
            bm25_topk(df, [])


class TestBlocklist:
    def test_filter_and_passthrough(self, spark):
        kept = {r["doc_id"] for r in filter_blocked_domains(
            _docs(spark), ["b.org"]).collect()}
        # doc 2 dropped; url-less, NULL-text, and non-URL docs survive
        assert kept == {0, 1, 3, 4}

    def test_empty_blocklist_is_identity(self, spark):
        df = _docs(spark)
        blocked = filter_blocked_domains(
            df, ["nonexistent.example"])
        assert blocked.count() == df.count()

    def test_filter_is_map_only(self, spark):
        # blocklist filtering must stay a scan-side filter: no Exchange,
        # no join — the blocklist folds into the predicate
        plan = filter_blocked_domains(_docs(spark), ["b.org"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan
