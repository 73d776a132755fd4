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
