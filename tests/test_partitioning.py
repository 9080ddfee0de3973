"""Size-derived partition policy for persisted loop relations (r14)."""
import pytest

from bigdata_tag_system_spark.partitioning import _bytes_conf, sized_partitions


class _FakeConf:
    def __init__(self, values):
        self._v = values

    def get(self, key):
        return self._v[key]


class _FakeSpark:
    def __init__(self, values):
        self.conf = _FakeConf(values)


class TestBytesConf:
    @pytest.mark.parametrize("raw,expected", [
        ("64MB", 64 << 20),
        ("64mb", 64 << 20),
        ("1048576b", 1 << 20),
        ("1m", 1 << 20),
        ("2g", 2 << 30),
        ("4096", 4096),
        ("1.5mb", int(1.5 * (1 << 20))),
    ])
    def test_parses_spark_size_strings(self, raw, expected):
        sp = _FakeSpark({"k": raw})
        assert _bytes_conf(sp, "k", 7) == expected

    def test_missing_or_garbage_falls_back(self):
        class Boom:
            def get(self, key):
                raise RuntimeError("no such key")

        sp = _FakeSpark({"k": "not-a-size"})
        assert _bytes_conf(sp, "k", 7) == 7
        sp2 = _FakeSpark({})
        sp2.conf = Boom()
        assert _bytes_conf(sp2, "k", 9) == 9


class TestSizedPartitions:
    def test_small_relation_gets_few_partitions(self, spark):
        df = spark.range(1000).selectExpr("id AS _u", "id + 1 AS _v")
        n = sized_partitions(df)
        # a KB-scale relation must not be spread across every core:
        # floor <= n <= defaultParallelism, and well under the 200-ish
        # cluster default
        assert n is not None
        assert 2 <= n <= spark.sparkContext.defaultParallelism

    def test_floor_respected(self, spark):
        df = spark.range(10).selectExpr("id AS _u")
        n = sized_partitions(df, floor=3)
        assert n >= 3

    def test_scales_with_estimate(self, spark):
        small = spark.range(1000).selectExpr("id AS _u")
        big = spark.range(2_000_000).selectExpr(
            "id AS _u", "repeat('x', 64) AS pad")
        ns, nb = sized_partitions(small), sized_partitions(big)
        assert ns is not None and nb is not None
        assert nb >= ns

    def test_graph_loops_still_exact(self, spark):
        # the partition count must not change WHAT the loops compute
        from bigdata_tag_system_spark.operators.graph import (
            bfs_depths,
            kcore,
        )

        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (0, 2), (4, 5)], ["src", "dst"])
        depths = {r["node"]: r["depth"]
                  for r in bfs_depths(edges, 0).collect()}
        assert depths == {0: 0, 1: 1, 2: 1, 3: 2}
        tri = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0), (2, 3)], ["src", "dst"])
        core = {r["node"]: r["degree"] for r in kcore(tri, 2).collect()}
        assert core == {0: 2, 1: 2, 2: 2}
