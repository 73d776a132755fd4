"""PageRank (operators/graph.py): arithmetic pinned against an
independent pure-Python reference, dangling/teleport semantics, and
partitioning-invariance (the exact-integer discipline's whole point)."""

from __future__ import annotations

import pytest

from flumedb_spark.operators.graph import pagerank


def _ref_pagerank(edges, node_ids, iterations=5, damping=85, total=10**9):
    """Independent reference: same spec, dict arithmetic instead of joins."""
    eset = sorted(set(edges))
    outdeg: dict[int, int] = {}
    for s, _ in eset:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(node_ids)
    base = total // n
    rank = {v: base for v in node_ids}
    for _ in range(iterations):
        dangling = sum(r for v, r in rank.items() if v not in outdeg)
        inflow: dict[int, int] = {}
        for s, d in eset:
            inflow[d] = inflow.get(d, 0) + rank[s] // outdeg[s]
        rank = {
            v: ((100 - damping) * base + damping * (inflow.get(v, 0) + dangling // n))
            // 100
            for v in node_ids
        }
    return rank


def _run(spark, edges, node_ids, **kw):
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.limit(0)
    nd = spark.createDataFrame([(v,) for v in node_ids], "node_id long")
    got = pagerank(e, nd, **kw).collect()
    return {r["node_id"]: r["rank"] for r in got}


def test_matches_reference_on_chain_with_dangling(spark):
    # 1 -> 2 -> 3, plus isolated 4: node 3 and 4 are dangling
    edges = [(1, 2), (2, 3)]
    nodes = [1, 2, 3, 4]
    assert _run(spark, edges, nodes) == _ref_pagerank(edges, nodes)


def test_matches_reference_on_dense_multigraph(spark):
    # duplicates in the edge list must dedupe; cycle + hub shape
    edges = [(1, 2), (1, 2), (2, 1), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3)]
    nodes = [1, 2, 3, 4, 5]
    for iters in (0, 1, 3, 7):
        assert _run(spark, edges, nodes, iterations=iters) == _ref_pagerank(
            edges, nodes, iterations=iters
        )


def test_hub_outranks_leaves_and_mass_roughly_conserved(spark):
    edges = [(i, 99) for i in range(1, 9)] + [(99, 1)]
    nodes = list(range(1, 9)) + [99]
    got = _run(spark, edges, nodes)
    assert got[99] == max(got.values())
    # floor-divisions only ever LOSE mass; never exceed total
    assert sum(got.values()) <= 10**9
    assert sum(got.values()) >= int(10**9 * 0.95)


def test_partitioning_invariance(spark):
    edges = [(i, (i * 7) % 23) for i in range(23)] + [(5, 11), (11, 5)]
    nodes = list(range(23))
    e1 = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(v,) for v in nodes], "node_id long")
    a = {r["node_id"]: r["rank"] for r in pagerank(e1, nd).collect()}
    b = {
        r["node_id"]: r["rank"]
        for r in pagerank(e1.repartition(13, "dst"), nd.repartition(7)).collect()
    }
    assert a == b


def test_bad_args_raise(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    nd = spark.createDataFrame([(1,), (2,)], "node_id long")
    with pytest.raises(ValueError):
        pagerank(e, nd, damping_num=101)
    with pytest.raises(ValueError):
        pagerank(e, nd, iterations=-1)


# ---------------------------------------------------------------------
# project_bipartite / triangle_counts
# ---------------------------------------------------------------------

from flumedb_spark.operators.graph import project_bipartite, triangle_counts  # noqa: E402


def test_projection_weights_and_hub_cap(spark):
    # baskets: L1 {a,b,c}, L2 {a,b}, L3 (hub) {a,b,c,d}
    rows = [(1, x) for x in "abc"] + [(2, x) for x in "ab"] + [(3, x) for x in "abcd"]
    df = spark.createDataFrame(rows, "l long, r string")
    got = {
        (r["u"], r["v"]): r["weight"]
        for r in project_bipartite(df, "l", "r").collect()
    }
    assert got == {
        ("a", "b"): 3, ("a", "c"): 2, ("b", "c"): 2,
        ("a", "d"): 1, ("b", "d"): 1, ("c", "d"): 1,
    }
    # cap at 3 drops the hub basket entirely
    capped = {
        (r["u"], r["v"]): r["weight"]
        for r in project_bipartite(df, "l", "r", max_left_degree=3).collect()
    }
    assert capped == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    return {r["node_id"]: r["n_triangles"] for r in triangle_counts(df).collect()}


def test_triangles_k4_path_and_shared_edge(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _tri(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    assert _tri(spark, [(1, 2), (2, 3), (3, 4)]) == {}  # path: none
    # two triangles sharing edge (1,2): 1,2 in both; 3,4 in one each
    shared = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)]
    assert _tri(spark, shared) == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangles_canonicalize_duplicates_and_direction(spark):
    messy = [(2, 1), (1, 2), (1, 3), (3, 1), (2, 3), (3, 3)]
    assert _tri(spark, messy) == {1: 1, 2: 1, 3: 1}


def test_triangles_partitioning_invariance(spark):
    import itertools
    edges = [
        (a, b)
        for a, b in itertools.combinations(range(12), 2)
        if (a * 7 + b * 3) % 4 != 0
    ]
    df = spark.createDataFrame(edges, "u long, v long")
    a = sorted(map(tuple, triangle_counts(df).collect()))
    b = sorted(map(tuple, triangle_counts(df.repartition(9, "v")).collect()))
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------
# shortest_paths
# ---------------------------------------------------------------------

from flumedb_spark.operators.graph import shortest_paths  # noqa: E402


def _sp(spark, edges, srcs, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(v,) for v in srcs], "node_id long")
    return {r["node_id"]: r["dist"] for r in shortest_paths(e, s, **kw).collect()}


def test_bfs_multi_source_and_unreachable(spark):
    # two components: 1-2-3-4 chain (undirected) and isolated pair 8-9
    chain = [(1, 2), (2, 3), (3, 4)]
    edges = [(a, b) for a, b in chain] + [(b, a) for a, b in chain] + [(8, 9)]
    got = _sp(spark, edges, [1, 4])
    assert got == {1: 0, 2: 1, 3: 1, 4: 0}  # min over both sources
    assert 8 not in got and 9 not in got    # unreachable: absent


def test_bfs_directed_vs_reverse(spark):
    edges = [(1, 2), (2, 3)]
    assert _sp(spark, edges, [1]) == {1: 0, 2: 1, 3: 2}
    assert _sp(spark, edges, [3]) == {3: 0}  # no reverse edges


def test_bfs_cycle_terminates_exactly(spark):
    ring = [(i, (i + 1) % 10) for i in range(10)]
    got = _sp(spark, ring, [0])
    assert got == {i: i for i in range(10)}  # directed ring: dist == index


def test_bfs_round_cap_raises(spark):
    edges = [(i, i + 1) for i in range(6)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="did not converge"):
        _sp(spark, edges, [0], max_rounds=3)


def test_bfs_partitioning_invariance(spark):
    edges = [(i, (i * 5 + 1) % 17) for i in range(17)]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(0,)], "node_id long")
    a = sorted(map(tuple, shortest_paths(e, s).collect()))
    b = sorted(map(tuple, shortest_paths(e.repartition(7, "dst"), s).collect()))
    assert a == b and len(a) > 1


def test_weighted_cheap_detour_beats_direct_edge(spark):
    # direct 1->4 weight 10; detour 1->2->3->4 weight 2+3+1 = 6
    edges = [(1, 4, 10), (1, 2, 2), (2, 3, 3), (3, 4, 1)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(1,)], "node_id long")
    got = {
        r["node_id"]: r["dist"]
        for r in shortest_paths(e, s, weight_col="w").collect()
    }
    assert got == {1: 0, 2: 2, 3: 5, 4: 6}


def test_weighted_parallel_edges_keep_cheapest_and_zero_weights(spark):
    edges = [(1, 2, 7), (1, 2, 3), (2, 3, 0), (3, 4, 1)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(1,)], "node_id long")
    got = {
        r["node_id"]: r["dist"]
        for r in shortest_paths(e, s, weight_col="w").collect()
    }
    assert got == {1: 0, 2: 3, 3: 3, 4: 4}


def test_weighted_negative_raises_and_unit_path_unchanged(spark):
    import pytest as _pytest

    e = spark.createDataFrame([(1, 2, -1)], "src long, dst long, w long")
    s = spark.createDataFrame([(1,)], "node_id long")
    with _pytest.raises(ValueError, match="negative edge weights"):
        shortest_paths(e, s, weight_col="w")
    # unit-weight default ignores the weight column entirely
    got = {r["node_id"]: r["dist"] for r in shortest_paths(e, s).collect()}
    assert got == {1: 0, 2: 1}


def test_ppr_reset_vector_semantics(spark):
    """Personalized PageRank: (1) with seeds = all nodes it equals the
    global uniform run bit-for-bit (shared arithmetic path); (2) with a
    single seed on a chain, mass decays away from the seed and nodes
    unreachable from it get zero; (3) an empty reset set raises."""
    import pytest as _pytest

    from flumedb_spark.operators.graph import pagerank

    # chain 0 -> 1 -> 2, plus isolated node 3
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    nd = spark.createDataFrame([(i,) for i in range(4)], "node_id long")

    all_seeds = nd.select("node_id")
    uniform = {r["node_id"]: r["rank"] for r in pagerank(e, nd, iterations=3).collect()}
    seeded_all = {
        r["node_id"]: r["rank"]
        for r in pagerank(e, nd, iterations=3, reset_nodes=all_seeds).collect()
    }
    assert uniform == seeded_all

    seed0 = spark.createDataFrame([(0,)], "node_id long")
    ppr = {
        r["node_id"]: r["rank"]
        for r in pagerank(e, nd, iterations=3, reset_nodes=seed0).collect()
    }
    assert ppr[0] > ppr[1] > ppr[2] > 0  # decay along the walk
    assert ppr[3] == 0  # unreachable from the seed, not in the reset set

    with _pytest.raises(ValueError):
        pagerank(
            e, nd, reset_nodes=spark.createDataFrame([(99,)], "node_id long")
        )
