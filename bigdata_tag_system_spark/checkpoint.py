"""Lineage-truncation policy helpers (guide §5; r14).

The engine truncates lineage at two very different relation sizes, and
the mechanism must differ with the size:

- **Dimension-sized relations** (degree tables, per-key aggregates,
  sketch summaries — O(|V|) rows or less): ``localCheckpoint`` is the
  right tool. Blocks live on executors with no fault tolerance, but the
  relation is cheap to recompute and small to hold; the win is cutting
  Catalyst re-analysis of a growing plan, not durability.

- **Edge-sized relations** (normalized edge lists, joined pair
  relations — O(|E|) rows): ``localCheckpoint`` at 100 TB materializes
  terabytes into executor-local storage with NO fault tolerance — one
  lost executor kills the whole job, and the blocks compete with
  shuffle/execution memory (the r13 VERDICT's §5 finding). Production
  iterative jobs (GraphX et al.) use the RELIABLE checkpoint for these.

:func:`loop_invariant_leaf` encodes the policy for the second class:
when the cluster has configured a checkpoint directory
(``SparkContext.setCheckpointDir`` — the deployment's signal that
reliable storage exists), the relation is checkpointed reliably; a
local/bench session without one (where executor loss IS driver loss)
keeps the cheap local form. Scale behavior is therefore driven by
cluster configuration, not by a code constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def loop_invariant_leaf(df: DataFrame, eager: bool = False) -> DataFrame:
    """Truncate lineage of a LARGE (edge-sized) loop-invariant relation.

    Reliable ``checkpoint`` when the session has a checkpoint dir (set
    by the cluster deployment), ``localCheckpoint`` otherwise. See the
    module docstring for the size policy; dimension-sized relations
    should call ``localCheckpoint`` directly.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
