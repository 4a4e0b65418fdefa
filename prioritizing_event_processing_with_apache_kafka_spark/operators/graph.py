"""Connected components over an edge list — the dedup-clustering step.

MinHash/SimHash/Jaccard emit near-duplicate *pairs*; a training-data
pipeline needs *clusters* (keep one canonical doc per component, drop
the rest). That closure is a connected-components computation.

Algorithm: iterated min-label propagation with path compression —
each node's label starts as its own id; every round, a node adopts the
minimum label in its closed neighborhood, and labels are then
flattened by joining label→label (pointer jumping). Convergence is
checked with a cheap ``sum(label)`` fixpoint (labels only ever
decrease, so the sum is strictly monotone until the fixpoint —
one scalar action per round, no row-level diff join). Rounds needed:
O(log(diameter)) with the compression step; near-dup clusters are
tiny cliques in practice, so 2-3 rounds.

Scale notes:

- every step is a hash equi-join / groupBy on node id — no driver
  collection of edges, no quadratic step;
- each round's labels are ``localCheckpoint``-ed: the propagate and
  compress steps reference the previous labels twice, so without
  lineage truncation the logical plan DOUBLES per round and the
  planner itself OOMs around round ~15 (measured). On a real cluster
  with executor churn, swap in reliable ``checkpoint()`` against a
  checkpoint dir — localCheckpoint state dies with an executor;
- the iteration driver loop only moves one scalar (the checksum) to
  the driver per round.

This is the composition Spark GraphFrames uses under the hood; it is
reimplemented here from first principles to stay dependency-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame,
    *,
    src: str = "x",
    dst: str = "y",
    max_rounds: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the minimum node id of the component (deterministic).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    for _ in range(max_rounds):
        # Propagate: min label over the closed neighborhood.
        neighbor_labels = (
            sym.join(labels.withColumnRenamed("node", "b"), on="b")
            .select(F.col("a").alias("node"), "label")
        )
        proposed = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # Compress: follow label -> label's label (pointer jumping).
        compressed = (
            proposed.alias("n")
            .join(
                proposed.select(
                    F.col("node").alias("label"),
                    F.col("label").alias("parent"),
                ).alias("p"),
                on="label",
                how="left",
            )
            .select("node", F.coalesce("parent", "label").alias("label"))
            .localCheckpoint()
        )
        cur_sum = compressed.agg(F.sum("label")).collect()[0][0]
        labels = compressed
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    sym.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("component"))
