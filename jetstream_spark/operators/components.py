"""Connected components over an edge DataFrame (hash-to-min propagation).

The dedup family (dedup.py) emits near-duplicate *pairs*; an actual dedup
pipeline needs *clusters* — transitively-closed groups with one canonical
representative — so "keep one per cluster" can be a single anti-join.

Algorithm: min-label propagation ("hash-to-min"). Every node starts labeled
with itself; each round every node takes the min of its own label and its
neighbors' labels. Converges in O(graph diameter) rounds. Near-dup graphs
are band-join outputs, i.e. unions of near-cliques, so the diameter — and
the round count — stays small at any corpus size; on hitting the round cap
(a pathological chain graph) the public entry point escalates to the
alternating large-star/small-star variant [Kiveris et al., CC in
MapReduce], which drops rounds to O(log² n) at the cost of 2× the
shuffles/round — so any graph shape terminates with the same contract.

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
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        # lazy localCheckpoint + the convergence sum in ONE job (r13; was
        # eager + a second collect job per round): the full-aggregate sum
        # covers every partition, so it materializes the checkpoint as a
        # side effect — lineage is truncated exactly as before, round i+1
        # still starts from a leaf
        new_labels = _hash_to_min_round(sym, labels).localCheckpoint(eager=False)
        cur_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    # diameter exceeded the cap — a chain-shaped graph, the one shape
    # hash-to-min handles badly. Escalate to the O(log² n)-round
    # large-star/small-star variant instead of failing: same output
    # contract, so callers never need to know which algorithm ran.
    return connected_components_star(edges, src, dst)


def _hash_to_min_round(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """ONE hash-to-min round as a frame (pre-checkpoint): join labels onto
    the symmetric edges, union with the current labels, min-aggregate by
    node — two key-hashed shuffles, nothing broadcast-or-collected that
    grows with the graph. Extracted so the per-round physical plan is
    test-assertable (the engine-wide plan sweep only sees final frames,
    not loop bodies)."""
    msgs = sym.join(labels, sym["a"] == labels["node"]).select(
        F.col("b").alias("node"), F.col("label")
    )
    return labels.union(msgs).groupBy("node").agg(F.min("label").alias("label"))


def _large_star_frame(e: DataFrame) -> DataFrame:
    """One large-star rewire as a frame (pre-checkpoint): neighborhoods
    over the symmetrized edge set; every strictly larger neighbor v is
    rewired to m(u) = min(Γ(u) ∪ {u})."""
    s = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = s.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    out = (
        s.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def _small_star_frame(e: DataFrame) -> DataFrame:
    """One small-star rewire as a frame (pre-checkpoint): each edge keyed
    on its larger endpoint; the smaller neighbors (and u itself) rewire to
    that neighborhood's min."""
    d = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))  # all v < u here
    out = d.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        mins.select("u", F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 40
) -> DataFrame:
    """Alternating large-star/small-star connected components [Kiveris et
    al., "Connected Components in MapReduce and Beyond"] — O(log² n) rounds
    on ANY graph shape, vs hash-to-min's O(diameter). Same output contract
    as connected_components: (node, component = min reachable id).

    Use this variant when the pair graph can contain long chains (e.g.
    threshold graphs near the percolation point); the near-clique dedup
    graphs the engine usually sees converge in a handful of rounds either
    way, so hash-to-min's cheaper rounds (2 shuffles vs this variant's 2
    shuffles of a frame that star-contracts) win there.

    Round shape: per node u compute m(u) = min over u and its neighbors;
    large-star rewires every neighbor v > u to m(u); small-star rewires
    every neighbor v <= u (and u itself) to m(u). Each is one
    groupBy-min + one join keyed on node id — no driver materialization;
    lineage cut per round with eager localCheckpoint (same OOM rationale
    as above). Convergence = the directed edge set is EXACTLY stable:
    count compared first (1-number action), then a set difference only
    when counts tie — a hashed/summed signature could collide (two edge
    sets swapping endpoints can preserve both count and sum) and a long
    sum can overflow under ANSI mode. Both frames are localCheckpointed,
    so the difference scans materialized leaves."""
    all_nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .where(F.col("u") != F.col("v"))  # self-loops label themselves below
        .distinct()
        .localCheckpoint()
    )

    prev_e, prev_n = sym, sym.count()
    e = sym
    for _ in range(max_iter):
        e = _small_star_frame(
            _large_star_frame(prev_e).localCheckpoint()
        ).localCheckpoint()
        n = e.count()
        # both sides are distinct() + localCheckpointed: equal counts plus an
        # empty difference is exact set equality, no collision risk
        if n == prev_n and e.exceptAll(prev_e).isEmpty():
            break
        prev_e, prev_n = e, n
    else:
        raise RuntimeError(f"connected_components_star did not converge in {max_iter} rounds")
    # after convergence e is a union of stars: every non-root points at its
    # component min; roots (isolated after contraction) label themselves
    labels = e.groupBy("u").agg(F.min("v").alias("label")).select(
        F.col("u").alias("node"), "label"
    )
    roots = all_nodes.join(labels, "node", "left_anti").withColumn(
        "label", F.col("node")
    )
    return labels.union(roots)
