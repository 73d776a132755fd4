"""Behavioral tests for urls.anchor_text_index — canonical-target
anchor aggregation. Parser-chained corpus parity is the catalog row's
job (ns_anchor_text_index, re-run vs DuckDB every suite via
tests/test_full_gate.py)."""

from flumedb_spark.operators.urls import anchor_text_index


def _links(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, href string, anchor string")


class TestAnchorTextIndex:
    def test_query_param_order_collides_onto_one_target(self, spark):
        links = _links(
            spark,
            [
                (1, "http://a.test/p?b=2&a=1", "x"),
                (2, "http://a.test/p?a=1&b=2", "x"),
            ],
        )
        out = anchor_text_index(links).collect()
        assert len(out) == 1
        assert out[0].n_refs == 2 and out[0].n_src_docs == 2

    def test_top_anchor_majority_then_alpha_tie(self, spark):
        links = _links(
            spark,
            [
                (1, "http://a.test/", "beta"),
                (2, "http://a.test/", "beta"),
                (3, "http://a.test/", "alpha"),
                (4, "http://b.test/", "zeta"),
                (5, "http://b.test/", "alpha"),
            ],
        )
        out = {r.target: r for r in anchor_text_index(links).collect()}
        a = next(v for k, v in out.items() if "a.test" in k)
        b = next(v for k, v in out.items() if "b.test" in k)
        assert a.top_anchor == "beta" and a.top_anchor_refs == 2
        assert a.n_anchors == 2 and a.n_refs == 3
        # b: counts tie at 1 -> lexicographically smallest anchor wins
        assert b.top_anchor == "alpha" and b.top_anchor_refs == 1

    def test_repeat_links_from_one_doc_count_refs_not_docs(self, spark):
        links = _links(
            spark,
            [
                (1, "http://a.test/", "go"),
                (1, "http://a.test/", "go"),
                (1, "http://a.test/", "go"),
            ],
        )
        r = anchor_text_index(links).collect()[0]
        assert r.n_refs == 3 and r.n_src_docs == 1 and r.n_anchors == 1
