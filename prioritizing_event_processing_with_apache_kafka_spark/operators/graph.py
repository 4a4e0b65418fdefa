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

__all__ = [
    "ConvergenceError",
    "bfs_hops",
    "kcore",
    "connected_components",
    "pagerank",
    "label_propagation",
    "triangle_participation",
    "common_neighbor_counts",
]


class ConvergenceError(RuntimeError):
    """Raised when label propagation hits ``max_rounds`` before the
    fixpoint — returning the non-converged labels would silently merge
    or split components."""


def connected_components(
    edges: DataFrame,
    *,
    src: str = "x",
    dst: str = "y",
    max_rounds: int = 20,
    checkpoint_dir: str | None = None,
    on_max_rounds: str = "raise",
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; the
    component id is the minimum node id of the component (deterministic).

    ``checkpoint_dir`` switches the per-round lineage truncation from
    ``localCheckpoint`` (executor-local blocks — fast, but state dies
    with an executor) to reliable ``checkpoint()`` against that
    directory — the right setting on a real cluster with executor
    churn. Default stays executor-local for single-node sessions.

    If the fixpoint is not reached within ``max_rounds`` the result
    would be silently wrong (components not fully merged), so the
    default is to raise :class:`ConvergenceError`; pass
    ``on_max_rounds="ignore"`` to accept the partial labels (e.g. when
    probing how far a round budget gets on a pathological graph).
    """
    if on_max_rounds not in ("raise", "ignore"):
        raise ValueError(
            f"on_max_rounds must be 'raise' or 'ignore', got {on_max_rounds!r}"
        )
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        # LAZY truncation: each round's convergence aggregate is the
        # first action on the checkpointed frame, so it materializes
        # the checkpoint blocks AND returns the label sum in ONE job —
        # an eager checkpoint here costs a second full pass per round
        # just to re-read what the materialization job already held.
        if checkpoint_dir is not None:
            return df.checkpoint(eager=False)
        return df.localCheckpoint(eager=False)

    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = _truncate(
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    converged = False
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
        compressed = _truncate(
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
        )
        cur_sum = compressed.agg(F.sum("label")).collect()[0][0]
        labels = compressed
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum

    sym.unpersist()
    if not converged and on_max_rounds == "raise":
        raise ConvergenceError(
            f"connected_components did not reach its fixpoint within "
            f"{max_rounds} rounds (label sum still decreasing); raise "
            f"max_rounds or pass on_max_rounds='ignore' for partial labels"
        )
    return labels.select(F.col("node"), F.col("label").alias("component"))


def pagerank(
    edges: DataFrame,
    *,
    src: str = "x",
    dst: str = "y",
    damping: float = 0.85,
    n_iter: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank over the symmetrized edge list —
    centrality inside near-dup clusters ("which variant is the hub
    everything else duplicates?"), and the engine's general iterative-
    dataflow shape beyond connected components / k-means.

    Every iteration is one hash equi-join (ranks ⋈ edges on the source)
    plus one map-side-combinable aggregation on the destination — the
    same distributed primitives as the rest of the engine, nothing
    collected to the driver. ``n_iter`` is fixed (not convergence-
    driven) so the operator is *oracle-checkable*: a SQL engine can
    unroll the same iterations as CTEs and must reproduce every rank
    bit-for-bit. To that end per-edge contributions are rounded to 12
    decimals and summed as ``DECIMAL`` (exact, order-independent), so
    results don't depend on shuffle partitioning; the final ranks are
    rounded to 6.

    Symmetrization means no dangling nodes (every node's out-degree
    ≥ 1), so no dangling-mass redistribution term is needed.

    Returns ``(node, rank)``; ranks sum to ~1 over the graph.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    n = nodes.count()  # one scalar to parameterize the teleport term
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("__outdeg")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = (
            ranks.join(deg, "node")
            .join(sym, F.col("node") == F.col("a"))
            .select(
                F.col("b").alias("node"),
                F.round(F.col("rank") / F.col("__outdeg"), 12)
                .cast("decimal(28,12)")
                .alias("__c"),
            )
        )
        ranks = contrib.groupBy("node").agg(
            (F.lit(teleport) + F.lit(damping) * F.sum("__c").cast("double")).alias(
                "rank"
            )
        )
    # Materialize the final ranks BEFORE releasing sym: the returned
    # plan references sym once per iteration, so unpersisting the
    # still-lazy result would recompute the symmetrize+distinct
    # shuffle n_iter+1 times at action time (connected_components
    # avoids this the same way — its labels are checkpointed while
    # the cache is live).
    out = ranks.select("node", F.round("rank", 6).alias("rank")).localCheckpoint(
        eager=True
    )
    sym.unpersist()
    return out


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "x",
    dst: str = "y",
    node_col: str = "node",
    label_col: str = "label",
    rounds: int = 2,
) -> DataFrame:
    """Semi-supervised label spreading: propagate seed labels over the
    graph by per-round majority vote — the weak-supervision step that
    turns a small hand-labeled set into corpus-scale training labels
    (near-duplicates of a labeled document almost certainly share its
    language/domain/quality label).

    Each round, every still-unlabeled node adopts the most common label
    among its already-labeled neighbors, ties broken by the smallest
    label (a total order, so the result is deterministic and
    oracle-checkable — a SQL engine unrolling the same ``rounds`` as
    CTEs must reproduce it exactly). Labeled nodes are immutable:
    seeds keep their label forever, and a node labeled in round *r*
    votes from round *r+1* on but never re-votes its own label. Nodes
    unreached after ``rounds`` stay unlabeled (the caller decides
    whether to default them).

    ``rounds`` is FIXED, not convergence-driven, for the same reason as
    :func:`pagerank`: a convergence loop's round count depends on data,
    which makes the result un-oracle-able; label spreading in practice
    uses 1-3 rounds before noise dominates. Every round is one hash
    equi-join (edges ⋈ labels on the neighbor end) plus one integer
    groupBy-count and one ``min(struct)`` argmax — all map-side
    combinable, nothing collected to the driver; labels are
    ``localCheckpoint``-ed per round so the reused subtree doesn't
    double the plan (same discipline as :func:`connected_components`).

    Returns ``(node, label, round_assigned)`` with ``round_assigned = 0``
    for seeds. Seeds with a NULL label are dropped up front: an
    unlabeled seed carries no information to spread, and letting NULL
    through would make it votable (and win every tie, since struct-min
    orders NULL first) — poisoning downstream rounds with an immutable
    non-label.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        seeds.filter(F.col(label_col).isNotNull())
        .select(
            F.col(node_col).alias("node"),
            F.col(label_col).alias("label"),
            F.lit(0).alias("round_assigned"),
        )
        .localCheckpoint()
    )
    for r in range(1, rounds + 1):
        votes = (
            sym.join(
                labels.select(F.col("node").alias("b"), "label"), on="b"
            )
            .join(
                labels.select(F.col("node").alias("a")),
                on="a",
                how="left_anti",
            )
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("__votes"))
        )
        # argmax by (votes desc, label asc) as a map-side min(struct):
        # negating the count makes lexicographic MIN pick the majority
        # label with the smallest-label tie-break — no window shuffle.
        winners = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("__votes")).alias("nv"), F.col("label"))
                ).alias("__w")
            )
            .select(
                "node",
                F.col("__w.label").alias("label"),
                F.lit(r).alias("round_assigned"),
            )
        )
        labels = labels.unionByName(winners).localCheckpoint()
    sym.unpersist()
    return labels


def triangle_participation(pairs: DataFrame, a_col: str = "x", b_col: str = "y") -> DataFrame:
    """Per-node triangle count over an undirected edge list given as
    ordered pairs (``a_col < b_col``, one row per edge) — the local
    clustering signal that separates tight duplicate cliques from
    chain-shaped false-positive paths in a near-dup graph (a clique's
    members close triangles; a chain's members do not).

    Algorithm: the classic ordered wedge join. With every edge stored
    only in its ``a < b`` orientation, each triangle ``a < b < c`` is
    found exactly once by joining edge(a,b) ⋈ edge(b,c) ⋈ edge(a,c) —
    no double counting, no symmetrization blow-up. Each triangle then
    credits all three of its corners.

    Scale: two hash equi-joins on node ids over the EDGE list (never
    the node list); wedge fan-out is bounded by the max out-degree in
    the total order, which for near-dup graphs (tiny cliques) stays
    O(cluster size). For skewed general graphs the standard refinement
    is degree-ordering instead of id-ordering; id-ordering is kept
    here because the oracle must replay it exactly.

    Returns ``(node, triangles)`` for nodes in >= 1 triangle.
    """
    from prioritizing_event_processing_with_apache_kafka_spark.operators.caching import (
        scoped_persist,
    )

    # Three references to the edge frame (both wedge sides + the
    # closing join): persist it so an expensive upstream pair
    # generator runs once — the same lesson common_neighbor_counts
    # below measured at 35.8x wall on a 100x replica.
    e = scoped_persist(
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    )
    e_bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e_ac = e.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = (
        e.join(e_bc, "b")
        .join(
            e_ac,
            (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
        )
        .select("a", "b", "c")
    )
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("triangles")
    )


def common_neighbor_counts(
    pairs: DataFrame, a_col: str = "x", b_col: str = "y"
) -> DataFrame:
    """Embeddedness of each edge: how many OTHER nodes are adjacent to
    both endpoints — the classic common-neighbors link score, used on
    a near-dup graph to rank pair confidence (a pair sharing five
    mutual near-dups is a cluster core; a pair sharing none is a
    fragile bridge that single-survivor collapse should treat with
    suspicion).

    Shape: symmetrize the ``a < b`` edge list, wedge-join it on the
    shared neighbor (the same two-hash-join skeleton as
    :func:`triangle_participation`, grouped per pair instead of per
    corner), then LEFT-join the input pairs so zero-embedded edges
    report 0 rather than vanishing. Wedge fan-out is bounded by the
    max degree; everything is an equi-join on node ids.

    Returns ``(a_col, b_col, common_neighbors)`` for every input pair.
    """
    from prioritizing_event_processing_with_apache_kafka_spark.operators.caching import (
        scoped_persist,
    )

    # The edge frame feeds BOTH wedge sides and the final left join;
    # without persistence an expensive upstream pair generator (the
    # shingle join) would run three times — measured 35.8x wall at a
    # 100x replica before this, vs ~linear-in-edges after.
    e = scoped_persist(
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    )
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    w1 = sym.select(F.col("a").alias("x"), F.col("b").alias("n"))
    w2 = sym.select(F.col("a").alias("y"), F.col("b").alias("n"))
    wedges = (
        w1.join(w2, "n")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cn"))
    )
    return (
        e.join(
            wedges,
            (F.col("a") == F.col("x")) & (F.col("b") == F.col("y")),
            "left",
        )
        .select(
            F.col("a").alias(a_col),
            F.col("b").alias(b_col),
            F.coalesce(F.col("__cn"), F.lit(0)).cast("bigint").alias(
                "common_neighbors"
            ),
        )
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "x",
    dst: str = "y",
    node_col: str = "node",
    max_hops: int = 4,
) -> DataFrame:
    """Minimum hop distance from any seed node to every node reachable
    within ``max_hops`` over the UNDIRECTED edge set — bounded BFS as a
    sequence of hash joins (frontier ⋈ edges), the canonical iterative
    graph primitive next to :func:`connected_components`.

    BFS-by-join is the Spark-native shape: each round shuffles only the
    FRONTIER (nodes first reached last round) against the edge list —
    no driver-side traversal, no per-node state. ``max_hops`` is a
    structural bound, not a convergence check: exactly ``max_hops``
    join rounds run, each behind a ``localCheckpoint`` so the lineage
    (and the replanned DAG) stays flat. The result is deterministic —
    min-hop is order-independent — and DuckDB replays it with a
    bounded recursive CTE, so the query carrying it is hash-oracled.

    Typical use at 100 TB: blast-radius queries over the near-dup graph
    ("everything within k hops of a known-bad document"), where the
    frontier collapses after a few hops and each round's shuffle is
    sized by the frontier, not the corpus.

    Returns ``(node, hop)`` with hop in ``[0, max_hops]``; hop 0 rows
    are the seeds themselves (seeds absent from the edge set still
    report hop 0 — a quarantine list does not stop at documents that
    happen to have neighbors).
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    visited = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited
    try:
        for hop in range(1, max_hops + 1):
            nxt = (
                frontier.join(sym, frontier["node"] == sym["a"])
                .select(F.col("b").alias("node"))
                .distinct()
                .join(visited.select("node"), "node", "left_anti")
                .withColumn("hop", F.lit(hop))
                .localCheckpoint()
            )
            if nxt.rdd.isEmpty():
                break
            # Lazy: the next round's frontier-join checkpoint (whose
            # left_anti side reads this frame) materializes it in the
            # same job; `nxt` itself stays EAGER because isEmpty() is a
            # partial scan and must not be the materializing action.
            visited = visited.unionByName(nxt).localCheckpoint(eager=False)
            frontier = nxt
    finally:
        sym.unpersist()
    return visited


def kcore(
    edges: DataFrame,
    *,
    src: str = "x",
    dst: str = "y",
    k: int = 2,
    max_rounds: int = 20,
) -> DataFrame:
    """The k-core of the undirected graph: the maximal node set in
    which every member keeps at least ``k`` neighbors INSIDE the set —
    the standard "dense nucleus" extractor (over the near-dup graph it
    isolates template farms / mirror rings that pairwise counts and
    connected components both blur).

    Classic peeling, Spark-shaped: each round semi-joins the edge list
    to the surviving node set (both endpoints), recounts degrees with
    one map-combined aggregate, and drops nodes under ``k`` — every
    step a hash join or aggregate sized by the SURVIVING subgraph,
    which only shrinks. The round count is bounded by the peel depth
    (how many times removal cascades), not the node count; each round
    sits behind a ``localCheckpoint`` so lineage stays flat, and the
    driver sees one convergence scalar per round (the module's
    :func:`connected_components` discipline). The fixpoint is unique
    (k-core is order-independent), so the result is deterministic and
    the carrying query is hash-oracled against an unrolled peel in
    DuckDB (valid while the fixture converges within the unrolled
    depth — the oracle's documented envelope, same pattern as the
    k-means oracle's n ≤ 40 000 note).

    Raises :class:`ConvergenceError` past ``max_rounds`` (returning a
    half-peeled set would silently overstate the core).

    Returns ``(node, core_degree)`` — members with their in-core
    degree (≥ k by construction).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    # Materialize the (possibly expensive) upstream pair generator ONCE
    # before symmetrizing: a bare union of edges + swapped edges would
    # execute the generator subtree twice inside the first checkpoint
    # (measured 2x wall on the 100x replica, where the near-dup
    # generator dominates).
    base = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint()
    sym = (
        base.unionByName(base.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    )
    # Lazy truncation + a carried count: each round's single count()
    # action materializes BOTH the round's checkpoints (the semi-joined
    # edge set and the surviving node set — the lazy blocks sit in the
    # count's own lineage), and the previous round's size is a Python
    # scalar, not a re-count job. One job per round where the eager
    # formulation ran four (2 checkpoint materializations + 2 counts).
    alive = deg.filter(F.col("core_degree") >= k).localCheckpoint(eager=False)
    alive_count = alive.count()
    live_edges = sym
    for _ in range(max_rounds):
        live_edges = (
            live_edges.join(
                alive.select(F.col("node").alias("a")), "a", "left_semi"
            )
            .join(alive.select(F.col("node").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
        deg = live_edges.groupBy(F.col("a").alias("node")).agg(
            F.count(F.lit(1)).cast("bigint").alias("core_degree")
        )
        nxt = deg.filter(F.col("core_degree") >= k).localCheckpoint(eager=False)
        nxt_count = nxt.count()
        dropped = alive_count - nxt_count
        alive, alive_count = nxt, nxt_count
        if dropped == 0:
            return alive
    raise ConvergenceError(
        f"k-core peel did not converge within {max_rounds} rounds"
    )
