"""Semantic tests for the adapted TPC-H suite beyond oracle parity.

The DuckDB oracles pin values; these tests pin the *formulations*:
the decorrelated / aggregate rewrites must equal the literal
subquery-shaped plans they replace, and the star joins must keep the
fact side out of every broadcast.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def qs():
    return entry._build_queries()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestQ21FormulationEquivalence:
    """The one-pass per-order aggregate (distinct suppliers vs distinct
    late suppliers) must equal the literal EXISTS / NOT-EXISTS pair of
    correlated lineitem self-joins from the TPC-H spec text."""

    def test_aggregate_rewrite_equals_literal_exists_pair(
            self, spark, sf_dir, qs):
        got = _rows(qs["tpch_q21"](spark, sf_dir))

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_suppkey", "l_shipdate")
        orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
                  .where(F.col("o_orderstatus") == "F")
                  .select("o_orderkey", "o_orderdate"))
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        late = (j.where(F.col("l_shipdate")
                        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
                .select("l_orderkey", "l_suppkey").distinct())
        pairs = j.select("l_orderkey", "l_suppkey").distinct()

        # EXISTS: another supplier on the same order
        other = pairs.withColumnRenamed("l_suppkey", "o_supp")
        has_other = (late.alias("l").join(
            other.alias("o"),
            (F.col("l.l_orderkey") == F.col("o.l_orderkey"))
            & (F.col("l.l_suppkey") != F.col("o.o_supp")),
            "left_semi"))
        # NOT EXISTS: another LATE supplier on the same order
        other_late = late.withColumnRenamed("l_suppkey", "ol_supp")
        sole_late = (has_other.alias("l").join(
            other_late.alias("o"),
            (F.col("l.l_orderkey") == F.col("o.l_orderkey"))
            & (F.col("l.l_suppkey") != F.col("o.ol_supp")),
            "left_anti"))
        supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            "s_suppkey", "s_name")
        want = _rows(
            sole_late.groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .join(F.broadcast(supp),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_name", "numwait")
            .orderBy(F.desc("numwait"), "s_name").limit(100))
        assert got == want


class TestQ17BoundaryMath:
    """qty < 0.2·avg(qty) must be evaluated as 5·qty·cnt < sum — the
    integer-exact form. A float 0.2·(sum/cnt) compare can disagree with
    the oracle exactly at the boundary; prove the two forms agree on
    every candidate row (they only COULD diverge when 5·qty·cnt == sum,
    where float division may land on either side)."""

    def test_integer_form_matches_definitionally(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        stats = li.groupBy("l_partkey").agg(
            F.sum("l_quantity").alias("qty_sum"),
            F.count(F.lit(1)).alias("qty_cnt"))
        j = li.join(stats, "l_partkey").select(
            "l_quantity", "qty_sum", "qty_cnt")
        diverging = j.where(
            (F.col("l_quantity") * 5 * F.col("qty_cnt") < F.col("qty_sum"))
            != (F.col("l_quantity")
                < 0.2 * (F.col("qty_sum") / F.col("qty_cnt")))).count()
        boundary = j.where(
            F.col("l_quantity") * 5 * F.col("qty_cnt")
            == F.col("qty_sum")).count()
        assert diverging <= boundary

    def test_quantities_are_integral(self, spark, sf_dir):
        # the rewrite's exactness rests on integral quantities — guard
        # the assumption against future testdata drift
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        frac = li.where(
            F.col("l_quantity") != F.floor("l_quantity")).count()
        assert frac == 0


class TestStarJoinShape:
    """The fact side must never end up inside a BroadcastExchange: at
    100 TB the dims broadcast, lineitem/orders never do."""

    @pytest.mark.parametrize("name", ["tpch_q5", "tpch_q8", "tpch_q9"])
    def test_fact_side_not_broadcast(self, spark, sf_dir, qs, name):
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        tree = [ln.strip() for ln in plan.splitlines()
                if ln.strip().startswith("(")]
        n_broadcast = sum(1 for ln in tree if "BroadcastExchange" in ln)
        # one broadcast per dim subtree (incl. the nested
        # nation⋈region builds); a fact-side broadcast would push the
        # count past the dim-join budget
        assert 1 <= n_broadcast <= 8, f"{name}: {n_broadcast} broadcasts"
        # the fact flow must still shuffle for its aggregate — a plan
        # with zero plain Exchanges means everything (incl. the fact
        # side) was broadcast
        assert any(") Exchange" in ln for ln in tree), plan

    def test_q9_single_fact_shuffle(self, spark, sf_dir, qs):
        # all three dims broadcast -> the only Exchanges are the final
        # agg and the output sort
        df = qs["tpch_q9"](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        plain_exchanges = plan.count("(") and sum(
            1 for line in plan.splitlines()
            if line.strip().startswith("(")
            and ") Exchange" in line)
        assert plain_exchanges <= 2, plan


class TestQ2CorrelatedMin:
    def test_every_row_is_the_partition_min(self, spark, sf_dir, qs):
        rows = qs["tpch_q2"](spark, sf_dir).collect()
        by_part = {}
        for r in rows:
            by_part.setdefault(r["p_partkey"], []).append(r["s_acctbal"])
        for pk, bals in by_part.items():
            assert len(set(bals)) == 1, (pk, bals)
