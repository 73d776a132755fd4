"""Behavioral tests for operators/graph.label_propagation — tiny
hand-computable graphs; corpus-scale cross-engine parity is the
catalog row's job (ns_label_prop, unrolled-trajectory oracle re-run
vs DuckDB every suite via tests/test_full_gate.py)."""

import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators.graph import label_propagation


def _graph(spark, edges, nodes):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node_id long")
    return e, n


def _bidir(edges):
    return edges + [(b, a) for (a, b) in edges]


def _run(spark, edges, nodes, rounds):
    e, n = _graph(spark, _bidir(edges), nodes)
    return {
        r.node_id: r.community
        for r in label_propagation(e, n, rounds=rounds).collect()
    }


class TestLabelPropagation:
    def test_zero_rounds_is_identity(self, spark):
        got = _run(spark, [(1, 2)], [1, 2, 3], rounds=0)
        assert got == {1: 1, 2: 2, 3: 3}

    def test_two_triangles_with_bridge_separate(self, spark):
        # triangle {1,2,3} + triangle {4,5,6} + bridge 3-4: within each
        # triangle, every node sees two distinct neighbor labels each
        # round -> min tie-break pulls toward the smallest id; the
        # communities converge to 1-dominated and (bridged) low labels,
        # deterministically. Pin the exact 3-round trajectory.
        edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
        got = _run(spark, edges, [1, 2, 3, 4, 5, 6], rounds=3)
        # hand-computed synchronous min-tie-break trajectory:
        # r1: 1<-min(2,3)=2, 2<-min(1,3)=1, 3<-min(1,2,4)=1,
        #     4<-min(3,5,6)=3, 5<-min(4,6)=4, 6<-min(4,5)=4
        # r2: 1<-mode(1,1)=1, 2<-(2,1)->1, 3<-(2,1,3)->1,
        #     4<-mode(1,4,4)=4, 5<-(3,4)->3, 6<-(3,4)->3
        # r3: 1<-(1,1)=1, 2<-(1,1)=1, 3<-(1,1,4)=1,
        #     4<-(1,3,3)=3, 5<-(4,3)->3, 6<-(4,3)->3
        assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}

    def test_isolated_node_keeps_own_label(self, spark):
        got = _run(spark, [(1, 2)], [1, 2, 99], rounds=3)
        assert got[99] == 99

    def test_tie_breaks_to_smallest_label(self, spark):
        # node 3 sees labels {1, 2} with equal counts -> takes 1
        got = _run(spark, [(1, 3), (2, 3)], [1, 2, 3], rounds=1)
        assert got[3] == 1

    def test_mode_beats_smaller_minority_label(self, spark):
        # round-0 labels are node ids, so two same-labeled neighbors
        # need a prior round: star 5-(6,7) makes 6 and 7 both take
        # label 5 in round 1; in round 2, node 9 (in-neighbors 1, 6, 7)
        # sees labels {1, 5, 5} -> majority 5 wins although 1 < 5.
        e = spark.createDataFrame(
            _bidir([(5, 6), (5, 7)]) + [(1, 9), (6, 9), (7, 9)],
            "src long, dst long",
        )
        n = spark.createDataFrame(
            [(1,), (5,), (6,), (7,), (9,)], "node_id long"
        )
        got = {
            r.node_id: r.community
            for r in label_propagation(e, n, rounds=2).collect()
        }
        assert got[9] == 5

    def test_rounds_negative_rejected(self, spark):
        e, n = _graph(spark, [(1, 2)], [1, 2])
        with pytest.raises(ValueError):
            label_propagation(e, n, rounds=-1)

    def test_foreign_endpoints_ignored(self, spark):
        # r10 wave-2 restructure: edges touching ids absent from
        # ``nodes`` must contribute nothing (old code dropped them
        # implicitly in the per-round label joins; new code filters
        # them at edge build) — and foreign ids must not appear in the
        # output. Without the dst-side filter, node 7's mode row would
        # leak a (7, ...) output row; without the src-side filter,
        # foreign source 8 would vote label 8 onto node 3.
        e = spark.createDataFrame(
            [(1, 3), (2, 3), (8, 3), (8, 3), (1, 7), (2, 7)],
            "src long, dst long",
        )
        n = spark.createDataFrame([(1,), (2,), (3,)], "node_id long")
        got = {
            r.node_id: r.community
            for r in label_propagation(e, n, rounds=1).collect()
        }
        # 3 sees labels {1, 2} only (8 is foreign) -> tie -> 1
        assert got == {1: 1, 2: 2, 3: 1}

    def test_duplicate_edges_deduped(self, spark):
        # a repeated (2,3) edge must not double-count label 2 at node 3:
        # deduped, 3 sees {1, 2} -> tie -> 1; without dedup the dup
        # would make 2 the majority and flip the result to 2.
        e = spark.createDataFrame(
            [(1, 3), (2, 3), (2, 3)], "src long, dst long"
        )
        n = spark.createDataFrame([(1,), (2,), (3,)], "node_id long")
        got = {
            r.node_id: r.community
            for r in label_propagation(e, n, rounds=1).collect()
        }
        assert got[3] == 1
