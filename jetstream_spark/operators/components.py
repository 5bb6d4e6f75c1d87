"""Connected components over an edge DataFrame (hash-to-min propagation).

The dedup family (dedup.py) emits near-duplicate *pairs*; an actual dedup
pipeline needs *clusters* — transitively-closed groups with one canonical
representative — so "keep one per cluster" can be a single anti-join.

Algorithm: min-label propagation ("hash-to-min"). Every node starts labeled
with itself; each round every node takes the min of its own label and its
neighbors' labels. Converges in O(graph diameter) rounds. Near-dup graphs
are band-join outputs, i.e. unions of near-cliques, so the diameter — and
the round count — stays small at any corpus size; the cap exists to fail
loudly on pathological chain graphs rather than loop forever (for those,
the alternating large-star/small-star variant [Kiveris et al., CC in
MapReduce] drops rounds to O(log² n) at the cost of 2× the shuffles/round).

Scale shape per round: one shuffle to join labels onto edges + one shuffle
for the min-aggregate, both keyed by node id — no driver materialization,
no broadcast of anything that grows with the graph. Convergence is detected
with a 1-number action: labels only ever decrease, so sum(label) is
strictly decreasing until the fixpoint.

Lineage: iterative DataFrame loops grow the logical plan exponentially
(round i's plan embeds round i-1's twice — once in the join, once in the
union), so each round is cut with an eager localCheckpoint; `persist`
alone is NOT enough, it caches data but keeps the full plan, and Spark
OOMs just *printing* the plan after ~12 rounds. On a multi-executor
cluster swap localCheckpoint for reliable `checkpoint()` (HDFS/S3 dir) if
executor loss mid-algorithm must be survivable; the fixpoint loop itself
is restartable from any round's labels, so either works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Return (node, component) where component = min node id reachable
    from `node` over the undirected graph given by `edges`.

    Nodes are whatever integer type the edge columns carry. Isolated nodes
    (absent from `edges`) are by definition their own component and are not
    emitted — union them in with label = id if needed.
    """
    # one eager cut: the edge frame may carry an arbitrarily deep upstream
    # plan (e.g. the minhash-LSH pair query); without this every round's
    # join would re-embed it
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        msgs = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("label")
        )
        # eager localCheckpoint = materialize AND truncate lineage, so round
        # i+1's plan starts from a leaf instead of embedding rounds 0..i
        new_labels = (
            labels.union(msgs).groupBy("node").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        cur_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds the cap; use the large-star/small-star variant)"
    )
