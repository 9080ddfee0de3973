"""Graph analytics over edge-list DataFrames.

Connected components (duplicate clustering) lives in ``operators.dedup``
— it is star-contraction, specialized for the dedup pipeline. This
module holds the general iterative-propagation shape: weighted PageRank
by power iteration, the importance measure behind domain-authority
weighting in web-corpus curation (rank a domain/citation graph, weight
or filter documents by their source's rank).

Scale shape: ranks and messages are (node, double) relations keyed by
node — every iteration is one join + one aggregate reusing that key
partitioning; the edge list is never mutated. Lineage is truncated
every few rounds with ``localCheckpoint`` so the plan depth stays
bounded no matter the iteration count (same discipline as the CC
rounds in ``dedup``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Weighted PageRank by fixed-count power iteration:
    ``r'(v) = (1-d)/N + d · Σ_{u→v} r(u) · w(u,v) / out(u)``.

    Fixed iteration count (not convergence-tested) keeps the result a
    pure function of the inputs — independently recomputable by an
    oracle, and deterministic across runs. Unweighted edges
    (``weight=None``) use weight 1. Nodes are the union of both
    endpoint sets; dangling nodes (no out-edges) simply contribute
    nothing — the standard simplification; redistribute mass upstream
    if your graph needs it. Every arithmetic step is plain double
    math in a fixed association order, so independent engines agree to
    ~1e-14 relative.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    w = (F.col(weight).cast("double") if weight is not None
         else F.lit(1.0))
    e = edges.select(
        F.col(src).alias("_u"), F.col(dst).alias("_v"), w.alias("_w"))
    out_tot = e.groupBy("_u").agg(F.sum("_w").alias("_out"))
    e = e.join(out_tot, "_u").select(
        "_u", "_v", (F.col("_w") / F.col("_out")).alias("_p"))
    nodes = (
        e.select(F.col("_u").alias("node"))
        .union(e.select(F.col("_v").alias("node")))
        .distinct()
    )
    n_row = nodes.agg(F.count(F.lit(1)).alias("_n"))
    nodes = nodes.crossJoin(F.broadcast(n_row))
    ranks = nodes.select(
        "node", "_n", (F.lit(1.0) / F.col("_n")).alias("rank"))
    base = F.lit(1.0 - damping) / F.col("_n")
    for i in range(iterations):
        contrib = (
            ranks.join(e, ranks.node == e._u)
            .groupBy(F.col("_v").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("_p")).alias("_c"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node", "_n",
                (base + F.lit(damping) * F.coalesce(F.col("_c"),
                                                    F.lit(0.0)))
                .alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank")
