"""Iterative graph analytics over edge tables — PageRank, label-propagation
communities, triangle counts.

The near-dup family already covers one graph algorithm (connected
components via log-round min-label propagation, `dedup.neardup_groups`);
this module adds the other workhorses over an edge-count table, e.g. the
tool→tool transition graph a transcript corpus induces
(`windows_ops.transition_counts` output plugs in directly).

Cross-engine exactness: the whole recurrence is INTEGER arithmetic —
ranks live in parts-per-``scale`` units, every division is an integral
``div``, and the one product that can exceed 63 bits (rank × edge-weight)
is computed in DECIMAL(38,0) (DuckDB mirrors with HUGEINT ``//``), the
same overflow discipline as the KMV estimator (`sketches.py`).  Given the
same edges both engines produce bit-identical ranks at every iteration,
so the DuckDB oracle replays the full n-iteration recurrence as unrolled
CTEs with zero tolerance.

Semantics (documented, deterministic):
* init        r₀(i) = scale div N
* teleport    T = ((100−d_pct)·scale) div (100·N)
* iterate     r_{t+1}(i) = T + (d_pct · Σ_{j→i} ((r_t(j)·w_ji) div out_j)) div 100
* dangling nodes (no out-edges) leak their mass — the classic "sink drop"
  variant; totals therefore decay slightly instead of being redistributed,
  identically in both engines.

Scale shape: each iteration is one equi-join of the edge table with the
|V|-row rank table plus one groupBy(dst) — the canonical distributed
PageRank step.  Ranks are broadcast when ``broadcast_ranks`` (default:
|V| is the node vocabulary — tools, hosts, repos — small by construction);
set it False for web-scale node sets and the join shuffles on src, which
AQE co-partitions across iterations.  ``checkpoint_every`` truncates the
growing lineage for deep iteration counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    n_iters: int = 5,
    damping_pct: int = 85,
    scale: int = 10**9,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    broadcast_ranks: bool = True,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Weighted integer PageRank; returns (node, rank) with rank in
    parts-per-``scale``.  ``damping_pct`` is the damping factor as an
    integer percentage (85 = the classic 0.85)."""
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # one |V|-scalar — the only driver-side value
    if n_nodes == 0:
        raise ValueError("pagerank over an empty edge table")
    teleport = ((100 - damping_pct) * scale) // (100 * n_nodes)

    outw = edges.groupBy(src).agg(F.sum(weight).alias("_out_w"))
    e = (
        edges.join(outw, src)
        .select(
            F.col(src).alias("_esrc"),
            F.col(dst).alias("_edst"),
            F.col(weight).cast("long").alias("_w"),
            F.col("_out_w").cast("long"),
        )
    )

    ranks = nodes.withColumn("rank", F.lit(scale // n_nodes).cast("long"))
    contrib = F.expr(
        "CAST((CAST(rank AS DECIMAL(38,0)) * _w) div _out_w AS LONG)"
    )
    for i in range(n_iters):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        s = (
            e.join(r, e["_esrc"] == r["node"])
            .select(F.col("_edst").alias("node"), contrib.alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = nodes.join(s, "node", "left").select(
            "node",
            F.expr(
                f"CAST({teleport} + ({damping_pct} * coalesce(_s, 0))"
                f" div 100 AS LONG)"
            ).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def label_propagation(
    edges: DataFrame,
    n_iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    broadcast_labels: bool = True,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Community detection by SYNCHRONOUS weighted label propagation
    (Raghavan et al. 2007, made deterministic): returns (node, label) after
    ``n_iters`` rounds, where nodes sharing a label form a community.

    Semantics (all deterministic — no random visit order, no coin-flip
    ties, so the DuckDB oracle replays every round exactly):
    * the graph is treated as UNDIRECTED: each edge contributes its weight
      to both endpoints' views (parallel edges sum; a self-loop votes for
      the node's own current label at 2× its weight);
    * init: label(v) = v;
    * each round, EVERY node simultaneously adopts the label carrying the
      largest total incident weight among its neighbors' current labels;
      ties break to the lexicographically smallest label.
    Synchronous LPA can oscillate on bipartite structures — a fixed
    ``n_iters`` makes the output well-defined regardless (the classic
    async variant is order-dependent, which would be un-oracle-able).

    Scale shape: one symmetrize-and-sum shuffle up front, then per round
    one equi-join of the |E|-row symmetric edge table with the |V|-row
    label table (broadcast when ``broadcast_labels``) and ONE aggregate:
    the argmax is min(struct(-votes, label)) — no per-node window, no
    SinglePartition stage."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"),
                     F.col(weight).cast("long").alias("_w"))
        .union(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"),
                         F.col(weight).cast("long").alias("_w"))
        )
        .groupBy("a", "b")
        .agg(F.sum("_w").alias("_w"))
    )
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for i in range(n_iters):
        lbl = F.broadcast(labels) if broadcast_labels else labels
        votes = (
            sym.join(lbl, sym["b"] == lbl["node"])
            .groupBy("a", "label")
            .agg(F.sum("_w").alias("_v"))
        )
        labels = (
            votes.groupBy("a")
            .agg(F.min(F.struct((-F.col("_v")).alias("_nv"),
                                F.col("label"))).alias("_best"))
            .select(F.col("a").alias("node"), F.col("_best.label").alias("label"))
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=False)
    return labels


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph the edge
    table induces (direction and weights ignored; self-loops dropped) —
    the clustering-structure signal that separates hub-and-spoke tool
    usage from genuinely interlocking workflow cliques.

    Algorithm: canonicalize to a < b edges (dedup), enumerate each
    triangle exactly once as a < b < c via two equi-joins
    (e(a,b) ⋈ e(b,c) ⋈ e(a,c)), then credit all three corners.  This is
    the standard distributed triangle enumeration; both joins are narrow
    (two id columns) — for web-scale graphs the classic refinement is
    degree-ordered orientation, noted here but unnecessary for bounded
    node vocabularies (tools, hosts).  Nodes in no triangle report 0.
    """
    a, b = F.col(src), F.col(dst)
    canon = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    e1 = canon
    e2 = canon.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = canon.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    corners = tri.select(F.col("a").alias("node")).union(
        tri.select(F.col("b").alias("node"))
    ).union(tri.select(F.col("c").alias("node")))
    counts = corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    return nodes.join(counts, "node", "left").select(
        "node",
        F.coalesce("n_triangles", F.lit(0).cast("long")).alias("n_triangles"),
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """The k-core of the undirected simple graph (self-loops dropped):
    iteratively peel nodes of degree < k until none remain — the standard
    degeneracy structure separating a graph's dense backbone from its
    periphery.  Returns the surviving (node, degree) with degree counted
    INSIDE the core.

    The k-core is UNIQUE regardless of peeling order, so although Spark
    peels one full round per iteration and the oracle unrolls a fixed
    round count, both reach the identical fixpoint.  Convergence is
    checked each round with a driver-side count (|V| is a bounded node
    vocabulary here; a web-scale variant would check via an accumulator);
    ``max_rounds`` exhaustion raises loudly rather than returning a
    non-core.

    Scale shape: per round one narrow groupBy-degree over the canonical
    a<b edge table and one semi-join filter — no window, no text, no
    cross product.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    a, b = F.col(src), F.col(dst)
    canon = (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    cur = canon
    prev_edges = cur.count()
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("a").alias("node"))
            .union(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        keep = deg.filter(F.col("degree") >= k).select("node")
        cur = (
            cur.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
        ).localCheckpoint(eager=True)
        n_edges = cur.count()
        if n_edges == prev_edges:
            break
        prev_edges = n_edges
    else:
        raise RuntimeError(
            f"k_core did not converge within {max_rounds} rounds"
        )
    return (
        cur.select(F.col("a").alias("node"))
        .union(cur.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    directed: bool = True,
) -> DataFrame:
    """Multi-source BFS hop distance: for every reachable node, the
    MINIMUM number of edges from any source node — "how many workflow
    steps separate each tool from an error state".  Returns (node, hops)
    for nodes reachable within ``max_hops``; unreachable nodes are absent
    (distance would be unbounded, not 0 — emitting them would be wrong).

    Deterministic fixpoint: distances only decrease, each round is one
    frontier⋈edges equi-join + a min-aggregate against the settled set,
    so round t settles exactly the true distance-t frontier — the oracle
    unrolls the same rounds as MATERIALIZED CTEs (the k-core lesson:
    inlining re-expands multiplicatively) and matches bit-for-bit.

    Scale shape: per round the join carries only (node, hops) — the
    frontier, not the graph; lineage is cut per round (localCheckpoint)
    like every iterative operator here.  ``directed=False`` symmetrizes
    the edge table once up front.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not directed:
        e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    e = e.distinct().cache()
    try:
        settled = sources.select(
            F.col(sources.columns[0]).alias("node"), F.lit(0).alias("hops")
        ).distinct()
        frontier = settled
        for t in range(1, max_hops + 1):
            nxt = (
                frontier.join(e, frontier["node"] == e["s"])
                .select(F.col("d").alias("node"))
                .distinct()
                .join(settled, "node", "left_anti")
                .select("node", F.lit(t).alias("hops"))
            )
            nxt = nxt.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            settled = settled.union(nxt).localCheckpoint(eager=True)
            frontier = nxt
        return settled.select("node", F.col("hops").cast("int").alias("hops"))
    finally:
        e.unpersist()


def _relax(frontier: DataFrame, e: DataFrame) -> DataFrame:
    """One Bellman-Ford relaxation: frontier (node, dist) ⋈ edges (s, d, w)
    → min candidate distance per reached node.  Factored so the plan audit
    asserts the round's exchanges carry ONLY (node, dist)/(s, d, w) rows."""
    return (
        frontier.join(e, frontier["node"] == e["s"])
        .select(
            F.col("d").alias("node"),
            (frontier["dist"] + e["w"]).alias("dist"),
        )
        .groupBy("node")
        .agg(F.min("dist").alias("dist"))
    )


def weighted_shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    directed: bool = True,
) -> DataFrame:
    """Multi-source shortest WEIGHTED distance (positive integer weights):
    for every reachable node the minimum total edge cost from any source —
    ``bfs_hops``' metric cousin, for when hops are not equal (an edge
    weighted by inverse transition frequency makes this "the most-travelled
    route to an error state", not merely the fewest steps).

    Deterministic Bellman-Ford fixpoint on exact integers: distances only
    ever decrease, and round t settles every node whose shortest path uses
    <= t edges, so ``max_rounds`` >= the longest shortest path's edge count
    guarantees convergence — checked, with a LOUD error otherwise (a
    truncated distance table is wrong, not approximate).  The DuckDB
    oracle unrolls the same rounds as MATERIALIZED CTEs (full relax +
    min-aggregate per round — the frontier pruning below is a pure
    optimization that cannot change the fixpoint) and matches bit-for-bit.

    Scale shape: per round the join carries only the IMPROVED frontier
    (node, dist) against the edge table — narrow rows, never the payload;
    lineage is cut per round (localCheckpoint) like every iterative
    operator here.  Weights must be positive: a zero/negative weight
    breaks the "<= t edges settled" invariant and is rejected up front.
    """
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    e = edges.select(
        F.col(src).alias("s"),
        F.col(dst).alias("d"),
        F.col(weight).cast("long").alias("w"),
    )
    if not directed:
        e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"), "w"))
    # parallel edges: only the cheapest can ever matter
    e = e.groupBy("s", "d").agg(F.min("w").alias("w")).cache()
    try:
        bad = e.filter(F.col("w") <= 0).limit(1).collect()
        if bad:
            r = bad[0]
            raise ValueError(
                f"non-positive edge weight {r['w']} on {r['s']!r}->{r['d']!r}; "
                "weighted_shortest_paths requires positive integer weights"
            )
        settled = sources.select(
            F.col(sources.columns[0]).alias("node"),
            F.lit(0).cast("long").alias("dist"),
        ).distinct()
        frontier = settled
        converged = False
        for _ in range(max_rounds):
            cand = _relax(frontier, e)
            old = settled.select("node", F.col("dist").alias("_old"))
            improved = (
                cand.join(old, "node", "left")
                .filter(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
                .select("node", "dist")
                .localCheckpoint(eager=True)
            )
            if improved.isEmpty():
                converged = True
                break
            settled = (
                settled.union(improved)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True)
            )
            frontier = improved
        if not converged:
            # one extra relaxation proving the fixpoint, else the table is a lie
            probe = (
                _relax(frontier, e)
                .join(settled.select("node", F.col("dist").alias("_old")),
                      "node", "left")
                .filter(F.col("_old").isNull() | (F.col("dist") < F.col("_old")))
            )
            if not probe.isEmpty():
                raise RuntimeError(
                    f"weighted_shortest_paths did not converge in {max_rounds} "
                    "rounds — raise max_rounds (distances would be wrong, not "
                    "approximate)"
                )
        return settled.select("node", F.col("dist").cast("long").alias("dist"))
    finally:
        e.unpersist()


def neighborhood_overlap(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 1,
) -> DataFrame:
    """Neighbor-set Jaccard similarity between node pairs — the classic
    common-neighbors family of link-prediction / node-similarity scores
    (Liben-Nowell & Kleinberg 2003): two tools that co-occur with the same
    partners are interchangeable in workflows even if they never appear
    together; two domains linked by the same hosts are mirrors.

    Treats the graph as UNDIRECTED (src↔dst, self-loops dropped, edge
    multiplicity collapsed) and returns one row per unordered pair with at
    least ``min_common`` shared neighbors:
    ``(node_a, node_b, n_common, jaccard_micro)`` with ``node_a < node_b``
    and ``jaccard_micro = (1_000_000 · |Γa ∩ Γb|) div (|Γa| + |Γb| −
    |Γa ∩ Γb|)`` — exact integers, no float, so the oracle replays it
    bit-for-bit.

    Scale shape: the wedge join (adjacency self-joined on the shared
    NEIGHBOR id) is the standard distributed common-neighbor shape — the
    same exchange discipline as ``triangle_counts``: every shuffle carries
    node-id pairs only.  Degrees attach via two narrow node-keyed joins.
    Hub nodes fan out quadratically in the wedge join, exactly like every
    common-neighbor system; at web scale feed ``sketches.skewed_keys`` to
    cap or salt hub neighborhoods first.
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    fwd = edges.select(F.col(src_col).alias("node"), F.col(dst_col).alias("nb"))
    rev = edges.select(F.col(dst_col).alias("node"), F.col(src_col).alias("nb"))
    und = fwd.unionByName(rev).filter(F.col("node") != F.col("nb")).distinct()
    deg = und.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("d"))
    lhs = und.select(F.col("node").alias("node_a"), "nb")
    rhs = und.select(F.col("node").alias("node_b"), "nb")
    common = (
        lhs.join(rhs, "nb")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .filter(F.col("n_common") >= F.lit(int(min_common)))
    )
    da = deg.select(F.col("node").alias("node_a"), F.col("d").alias("_da"))
    db = deg.select(F.col("node").alias("node_b"), F.col("d").alias("_db"))
    return (
        common.join(da, "node_a")
        .join(db, "node_b")
        .select(
            "node_a",
            "node_b",
            "n_common",
            F.expr(
                "CAST((1000000 * n_common) DIV (_da + _db - n_common) AS BIGINT)"
            ).alias("jaccard_micro"),
        )
    )
