"""Property-based validation of the round-9 operators against
pure-Python models: additive aggregate merging must equal the full-scan
aggregate for ANY split of ANY fact set, and blocked sorted-neighborhood
candidates must match a brute-force replay of the sort-window semantics.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


class TestAdditiveMergeProperty:
    @given(
        facts=st.lists(
            st.tuples(st.sampled_from("abcd"),
                      st.integers(min_value=-50, max_value=50)),
            min_size=1, max_size=30),
        cut=st.integers(min_value=0, max_value=30),
    )
    @settings(**_SETTINGS)
    def test_split_merge_equals_full_aggregate(self, spark, facts, cut):
        from bigdata_tag_system_spark.operators.merge import (
            merge_additive_aggregates,
        )

        cut = min(cut, len(facts))
        df = spark.createDataFrame(
            [(i, k, v) for i, (k, v) in enumerate(facts)],
            "i long, k string, v long")

        def agg(d):
            return d.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
                F.max("v").alias("mx"), F.min("v").alias("mn"))

        left, right = df.where(f"i < {cut}"), df.where(f"i >= {cut}")
        if left.count() == 0 or right.count() == 0:
            return  # merge needs two real slices; trivial splits skip
        merged = merge_additive_aggregates(
            agg(left), agg(right), ["k"], sum_cols=["s"], count_col="n",
            max_cols=["mx"], min_cols=["mn"])
        assert sorted(map(tuple, merged.collect())) == \
            sorted(map(tuple, agg(df).collect()))


def _py_snm(docs: list[str | None], window: int, block_chars: int):
    """Brute-force blocked sorted-neighborhood model."""
    keyed = []
    for i, text in enumerate(docs):
        if text is None:
            continue
        k = re.sub(r"\s+", " ", text.lower()).strip()
        if k == "":
            continue
        keyed.append((k[:block_chars], k, i))
    out = set()
    blocks: dict[str, list[tuple[str, int]]] = {}
    for blk, k, i in keyed:
        blocks.setdefault(blk, []).append((k, i))
    for members in blocks.values():
        members.sort()
        for pos, (_, i) in enumerate(members):
            for d in range(1, window + 1):
                if pos + d < len(members):
                    out.add((i, members[pos + d][1], d))
    return out


class TestSortedNeighborhoodProperty:
    @given(
        docs=st.lists(
            st.one_of(
                st.none(),
                st.text(alphabet="ab c", min_size=0, max_size=8)),
            min_size=2, max_size=15),
        window=st.integers(min_value=1, max_value=4),
    )
    @settings(**_SETTINGS)
    def test_matches_brute_force_model(self, spark, docs, window):
        from bigdata_tag_system_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)],
            "doc_id long, text string")
        got = {(r["id_a"], r["id_b"], r["rank_distance"])
               for r in sorted_neighborhood_pairs(
                   df, window=window, block_chars=3).collect()}
        assert got == _py_snm(docs, window, 3)
