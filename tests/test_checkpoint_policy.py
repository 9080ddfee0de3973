"""§5 lineage-truncation size policy (r14): edge-sized loop-invariant
relations use the RELIABLE checkpoint whenever the deployment has
configured a checkpoint directory, and executor-local blocks otherwise
(bigdata_tag_system_spark/checkpoint.py)."""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_tag_system_spark.checkpoint import loop_invariant_leaf


class TestLoopInvariantLeaf:
    def test_local_mode_without_checkpoint_dir(self, spark):
        assert spark.sparkContext.getCheckpointDir() is None
        df = loop_invariant_leaf(spark.range(10), eager=True)
        # local form: truncated lineage (an RDD leaf), same rows
        assert df.count() == 10
        assert "LogicalRDD" in df._jdf.queryExecution().optimizedPlan().toString()

    def test_dispatches_to_reliable_when_dir_configured(
            self, spark, monkeypatch):
        # the policy switch is the deployment's checkpoint dir; fake it
        # (actually calling setCheckpointDir would leak reliable mode
        # into every later test in the shared session)
        calls = []
        cls = type(spark.range(1))  # the classic DataFrame subclass
        monkeypatch.setattr(
            spark.sparkContext, "getCheckpointDir", lambda: "/ckpt")
        monkeypatch.setattr(
            cls, "checkpoint",
            lambda self, eager=True: calls.append(eager) or self)
        monkeypatch.setattr(
            cls, "localCheckpoint",
            lambda self, eager=True: (_ for _ in ()).throw(
                AssertionError("edge-sized leaf must go reliable")))
        out = loop_invariant_leaf(spark.range(3), eager=False)
        assert calls == [False] and out.count() == 3

    def test_values_identical_to_input(self, spark):
        base = spark.range(50).select(
            F.col("id").alias("s"), (F.col("id") % 7).alias("d"))
        a = sorted(map(tuple, base.collect()))
        b = sorted(map(tuple, loop_invariant_leaf(base).collect()))
        assert a == b
