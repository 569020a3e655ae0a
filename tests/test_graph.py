"""PageRank: integer recurrence vs a pure-Python mirror, structural
properties, and the broadcast/shuffle path equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_analysis_spark.operators import graph


def _py_pagerank(edges, n_iters=5, d=85, scale=10**9):
    """Driver-side mirror of the documented integer recurrence."""
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    n = len(nodes)
    teleport = ((100 - d) * scale) // (100 * n)
    out: dict = {}
    for s, _, w in edges:
        out[s] = out.get(s, 0) + w
    r = {v: scale // n for v in nodes}
    for _ in range(n_iters):
        sums = {v: 0 for v in nodes}
        for s, t, w in edges:
            sums[t] += (r[s] * w) // out[s]
        r = {v: teleport + (d * sums[v]) // 100 for v in nodes}
    return r


EDGES = [
    ("a", "b", 3),
    ("a", "c", 1),
    ("b", "c", 2),
    ("c", "a", 1),
    ("c", "d", 5),
    ("d", "a", 2),
    ("e", "a", 1),  # e has in-degree 0: rank = teleport only
]


def _edge_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string, w long")


def test_pagerank_matches_python_mirror(spark):
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(_edge_df(spark), n_iters=5).collect()
    }
    assert got == _py_pagerank(EDGES, n_iters=5)


def test_pagerank_shuffle_path_equals_broadcast_path(spark):
    a = graph.pagerank(_edge_df(spark), n_iters=3).collect()
    b = graph.pagerank(
        _edge_df(spark), n_iters=3, broadcast_ranks=False
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pagerank_uniform_cycle_is_uniform(spark):
    cyc = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
    df = spark.createDataFrame(cyc, "src string, dst string, w long")
    ranks = {r["node"]: r["rank"] for r in graph.pagerank(df, n_iters=8).collect()}
    assert len(set(ranks.values())) == 1  # symmetry ⇒ identical ranks


def test_pagerank_source_only_node_gets_teleport(spark):
    ranks = {
        r["node"]: r["rank"]
        for r in graph.pagerank(_edge_df(spark), n_iters=5).collect()
    }
    n = 5
    teleport = (15 * 10**9) // (100 * n)
    assert ranks["e"] == teleport
    # heavier in-link mass outranks the teleport floor
    assert ranks["a"] > ranks["e"]


def test_pagerank_mass_conserved_upper_bound(spark):
    """Sink-drop semantics: total rank never exceeds scale (+N rounding)."""
    out = graph.pagerank(_edge_df(spark), n_iters=5).agg(F.sum("rank")).first()[0]
    assert 0 < out <= 10**9


def test_pagerank_checkpoint_every_preserves_result(spark):
    a = graph.pagerank(_edge_df(spark), n_iters=4).collect()
    b = graph.pagerank(_edge_df(spark), n_iters=4, checkpoint_every=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def _py_lpa(edges, n_iters):
    """Mirror of the documented synchronous LPA: symmetrized weighted votes,
    argmax with (votes desc, label asc) tie-break."""
    sym: dict = {}
    for s, t, w in edges:
        sym[(s, t)] = sym.get((s, t), 0) + w
        sym[(t, s)] = sym.get((t, s), 0) + w
    nodes = sorted({a for a, _ in sym})
    lbl = {v: v for v in nodes}
    for _ in range(n_iters):
        new = {}
        for v in nodes:
            votes: dict = {}
            for (a, b), w in sym.items():
                if a == v:
                    votes[lbl[b]] = votes.get(lbl[b], 0) + w
            new[v] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lbl = new
    return lbl


def test_lpa_matches_python_mirror(spark):
    got = {
        r["node"]: r["label"]
        for r in graph.label_propagation(_edge_df(spark), n_iters=4).collect()
    }
    assert got == _py_lpa(EDGES, n_iters=4)


def test_lpa_two_cliques_split_across_weak_bridge(spark):
    tri1 = [("a", "b", 3), ("b", "c", 3), ("c", "a", 3)]
    tri2 = [("d", "e", 3), ("e", "f", 3), ("f", "d", 3)]
    bridge = [("c", "d", 1)]
    df = spark.createDataFrame(
        tri1 + tri2 + bridge, "src string, dst string, w long"
    )
    lbl = {
        r["node"]: r["label"]
        for r in graph.label_propagation(df, n_iters=6).collect()
    }
    assert lbl["a"] == lbl["b"] == lbl["c"]
    assert lbl["d"] == lbl["e"] == lbl["f"]
    assert lbl["a"] != lbl["d"]


def test_lpa_shuffle_path_equals_broadcast_path(spark):
    a = graph.label_propagation(_edge_df(spark), n_iters=3).collect()
    b = graph.label_propagation(
        _edge_df(spark), n_iters=3, broadcast_labels=False
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_lpa_self_loop_votes_for_self_at_double_weight(spark):
    # b's self-loop (2×4=8) outvotes a's pull (5): b keeps its own label
    df = spark.createDataFrame(
        [("a", "b", 5), ("b", "b", 4)], "src string, dst string, w long"
    )
    lbl = {
        r["node"]: r["label"]
        for r in graph.label_propagation(df, n_iters=1).collect()
    }
    assert lbl["b"] == "b"
    assert lbl["a"] == "b"  # a's only neighbor is b


def test_triangle_counts_known_graph(spark):
    """K4 minus one edge: nodes of the two triangles sharing an edge."""
    edges = [
        ("a", "b", 1), ("b", "c", 1), ("c", "a", 1),
        ("b", "d", 1), ("d", "c", 1),
        # direction/weight/duplicate noise the canonicalization must absorb
        ("c", "b", 9), ("a", "a", 5),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {
        r["node"]: r["n_triangles"]
        for r in graph.triangle_counts(df).collect()
    }
    # triangles: (a,b,c) and (b,c,d); b and c sit in both
    assert got == {"a": 1, "b": 2, "c": 2, "d": 1}


def test_triangle_counts_triangle_free_graph_is_zero(spark):
    star = [("hub", f"leaf{i}", 1) for i in range(5)]
    df = spark.createDataFrame(star, "src string, dst string, w long")
    got = {r["node"]: r["n_triangles"] for r in graph.triangle_counts(df).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 6


def _py_k_core(edges, k):
    """Mirror: peel degree<k until stable over the canonical simple graph."""
    es = {tuple(sorted((s, t))) for s, t, *_ in edges if s != t}
    while True:
        deg: dict = {}
        for x, y in es:
            deg[x] = deg.get(x, 0) + 1
            deg[y] = deg.get(y, 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        nes = {(x, y) for x, y in es if x in keep and y in keep}
        if nes == es:
            break
        es = nes
    deg = {}
    for x, y in es:
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    return deg


def test_k_core_peels_tail_matches_mirror(spark):
    """Triangle with a pendant path: the 2-core is exactly the triangle
    (the path peels away over TWO rounds — d first, then c's degree drops)."""
    edges = [
        ("a", "b", 1), ("b", "x", 1), ("x", "a", 1),   # triangle
        ("x", "c", 1), ("c", "d", 1),                  # pendant path
        ("a", "a", 7),                                 # self-loop noise
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["node"]: r["degree"] for r in graph.k_core(df, k=2).collect()}
    assert got == _py_k_core(edges, 2)
    assert got == {"a": 2, "b": 2, "x": 2}


def test_k_core_empty_when_k_exceeds_graph(spark):
    df = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)], "src string, dst string, w long"
    )
    assert graph.k_core(df, k=3).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must"):
        graph.k_core(df, k=0)


def _bfs_df(spark, edges, sources):
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(x,) for x in sources], "node string")
    return e, s


def test_bfs_hops_directed_chain_and_unreachable(spark):
    """a→b→c→d chain: hops follow edge direction; nodes with no directed
    path (x→a's x) are ABSENT, not 0."""
    e, s = _bfs_df(
        spark, [("a", "b"), ("b", "c"), ("c", "d"), ("x", "a")], ["a"]
    )
    got = {r["node"]: r["hops"] for r in graph.bfs_hops(e, s, 5).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}  # x unreachable
    undirected = {
        r["node"]: r["hops"]
        for r in graph.bfs_hops(e, s, 5, directed=False).collect()
    }
    assert undirected["x"] == 1  # symmetrized: x now one hop away


def test_bfs_hops_multi_source_min_and_cutoff(spark):
    """Two sources: each node gets the MIN distance over sources; max_hops
    truncates the frontier (distance > cutoff -> absent)."""
    e, s = _bfs_df(
        spark,
        [("s1", "m"), ("m", "far"), ("far", "deep"), ("s2", "far")],
        ["s1", "s2"],
    )
    got = {r["node"]: r["hops"] for r in graph.bfs_hops(e, s, 5).collect()}
    assert got == {"s1": 0, "s2": 0, "m": 1, "far": 1, "deep": 2}
    cut = {r["node"]: r["hops"] for r in graph.bfs_hops(e, s, 1).collect()}
    assert cut == {"s1": 0, "s2": 0, "m": 1, "far": 1}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_hops"):
        graph.bfs_hops(e, s, -1)


def _py_dijkstra(edges, sources, directed=True):
    """Brute-force mirror: classic Dijkstra over min-collapsed edges."""
    import heapq

    adj: dict = {}
    for s, d, w in edges:
        pairs = [(s, d)] if directed else [(s, d), (d, s)]
        for a, b in pairs:
            cur = adj.setdefault(a, {})
            cur[b] = min(cur.get(b, w), w)
    dist = {s: 0 for s in sources}
    heap = [(0, s) for s in sources]
    heapq.heapify(heap)
    while heap:
        dv, v = heapq.heappop(heap)
        if dv > dist.get(v, dv):
            continue
        for u, w in adj.get(v, {}).items():
            nd = dv + w
            if nd < dist.get(u, nd + 1):
                dist[u] = nd
                heapq.heappush(heap, (nd, u))
    return dist


WEDGES = [
    ("a", "b", 10),
    ("a", "c", 1),
    ("c", "b", 2),     # a->c->b (3) beats a->b (10)
    ("b", "d", 5),
    ("c", "d", 100),
    ("a", "b", 7),     # parallel edge: min wins -> a->c->b still beats 7
    ("x", "a", 4),     # feeds a; unreachable FROM a when directed
]


def _wdf(spark, edges=WEDGES, sources=("a",)):
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    s = spark.createDataFrame([(x,) for x in sources], "node string")
    return e, s


def test_weighted_sp_matches_dijkstra_directed_and_undirected(spark):
    e, s = _wdf(spark)
    got = {r["node"]: r["dist"]
           for r in graph.weighted_shortest_paths(e, s, 8).collect()}
    assert got == _py_dijkstra(WEDGES, ["a"])
    assert got == {"a": 0, "b": 3, "c": 1, "d": 8}  # x absent: unreachable
    und = {r["node"]: r["dist"]
           for r in graph.weighted_shortest_paths(
               e, s, 8, directed=False).collect()}
    assert und == _py_dijkstra(WEDGES, ["a"], directed=False)
    assert und["x"] == 4


def test_weighted_sp_multi_source_min_and_guards(spark):
    e, s = _wdf(spark, sources=("a", "d"))
    got = {r["node"]: r["dist"]
           for r in graph.weighted_shortest_paths(
               e, s, 8, directed=False).collect()}
    assert got == _py_dijkstra(WEDGES, ["a", "d"], directed=False)
    with pytest.raises(ValueError, match="max_rounds"):
        graph.weighted_shortest_paths(e, s, 0)
    bad = spark.createDataFrame(
        [("a", "b", 0)], "src string, dst string, w long"
    )
    with pytest.raises(ValueError, match="positive"):
        graph.weighted_shortest_paths(bad, s, 4)


def test_weighted_sp_nonconvergence_is_loud_not_truncated(spark):
    """A 5-edge chain cannot settle in 3 rounds: the operator must raise,
    never return a silently-short distance table."""
    chain = [(f"n{i}", f"n{i+1}", 1) for i in range(5)]
    e, s = _wdf(spark, chain, sources=("n0",))
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.weighted_shortest_paths(e, s, 3)
    got = {r["node"]: r["dist"]
           for r in graph.weighted_shortest_paths(e, s, 5).collect()}
    assert got == {f"n{i}": i for i in range(6)}


# ---------------------------------------------------------------------------
# neighborhood overlap (common-neighbor Jaccard)
# ---------------------------------------------------------------------------


def test_neighborhood_overlap_closed_form(spark):
    """Square a-b, a-c, d-b, d-c: the two diagonals (a,d) and (b,c) each
    share BOTH neighbors -> Jaccard exactly 1; no other pair shares any."""
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "b"), ("d", "c")], "src string, dst string"
    )
    out = {
        (r["node_a"], r["node_b"]): (r["n_common"], r["jaccard_micro"])
        for r in graph.neighborhood_overlap(e).collect()
    }
    assert out == {("a", "d"): (2, 1_000_000), ("b", "c"): (2, 1_000_000)}


def test_neighborhood_overlap_undirected_collapse_and_self_loops(spark):
    """Reciprocal edges collapse to one undirected edge; self-loops drop;
    partial overlap divides exactly."""
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "b"), ("a", "a"), ("c", "d")],
        "src string, dst string",
    )
    # neighbors: a:{b} b:{a,c} c:{b,d} d:{c}
    out = {
        (r["node_a"], r["node_b"]): (r["n_common"], r["jaccard_micro"])
        for r in graph.neighborhood_overlap(e).collect()
    }
    # (a,c) share {b}: 1_000_000 * 1 // (1 + 2 - 1) = 500_000
    # (b,d) share {c}: 1_000_000 * 1 // (2 + 1 - 1) = 500_000
    assert out == {("a", "c"): (1, 500_000), ("b", "d"): (1, 500_000)}


def test_neighborhood_overlap_min_common_filters_and_validates(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "b"), ("d", "c"), ("x", "b")],
        "src string, dst string",
    )
    # x joins b's neighborhood: pairs sharing only b — (a,x), (d,x) — exist
    # at min_common=1 but vanish at 2; the diagonals (a,d) via {b,c} and
    # (b,c) via {a,d} keep 2 common neighbors each.
    one = graph.neighborhood_overlap(e, min_common=1)
    assert {("a", "x"), ("d", "x")} <= {
        (r["node_a"], r["node_b"]) for r in one.collect()
    }
    two = graph.neighborhood_overlap(e, min_common=2)
    assert {(r["node_a"], r["node_b"]) for r in two.collect()} == {
        ("a", "d"),
        ("b", "c"),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        graph.neighborhood_overlap(e, min_common=0)
