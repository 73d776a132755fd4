"""Behavioral tests for operators/boilerplate.py (CCNet-style segment
dedup with reassembly, C4 blocklist gate) and the epoch-capped mixture
planner (operators/sampling.mixture_plan_capped) — hand-computable
fixtures here; corpus-scale cross-engine parity is the catalog rows'
job (ns_line_dedup / ns_blocklist_filter / ns_mixture_capped, re-run
vs DuckDB every suite via tests/test_full_gate.py)."""

import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import boilerplate as B
from flumedb_spark.operators import sampling as S


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSegmentDocs:
    def test_fixed_windows_preserve_positions(self, spark):
        segs = B.segment_docs(
            _docs(spark, [(1, "a b c d e f g")]), seg_words=3
        ).orderBy("seg_id")
        got = [(r.seg_id, r.seg_text) for r in segs.collect()]
        assert got == [(0, "a b c"), (1, "d e f"), (2, "g")]

    def test_single_word_doc_is_one_segment(self, spark):
        segs = B.segment_docs(_docs(spark, [(1, "solo")]), seg_words=3)
        assert [r.seg_text for r in segs.collect()] == ["solo"]

    def test_exact_multiple_no_empty_trailing_segment(self, spark):
        segs = B.segment_docs(_docs(spark, [(1, "a b c d e f")]), seg_words=3)
        assert segs.count() == 2


class TestLineDedupClean:
    def test_boilerplate_removed_and_reassembled_in_order(self, spark):
        # "x y z" appears in all 3 docs (> max_docs=2) -> removed;
        # every other segment is unique -> kept, original order.
        docs = _docs(
            spark,
            [
                (1, "a b c x y z d e f"),
                (2, "x y z g h i"),
                (3, "j k l x y z"),
            ],
        )
        out = {
            r.doc_id: r
            for r in B.line_dedup_clean(docs, seg_words=3, max_docs=2).collect()
        }
        assert out[1].clean_text == "a b c d e f"
        assert out[2].clean_text == "g h i"
        assert out[3].clean_text == "j k l"
        assert out[1].n_segs == 3 and out[1].kept_segs == 2
        assert out[2].removed_frac == 0.5

    def test_within_doc_repetition_is_not_boilerplate(self, spark):
        # Same segment twice in ONE doc: distinct-doc count is 1 -> kept.
        docs = _docs(spark, [(1, "x y z x y z"), (2, "a b c d e f")])
        out = {
            r.doc_id: r
            for r in B.line_dedup_clean(docs, seg_words=3, max_docs=2).collect()
        }
        assert out[1].clean_text == "x y z x y z"
        assert out[1].kept_segs == 2

    def test_fully_boilerplate_doc_survives_as_empty(self, spark):
        docs = _docs(spark, [(1, "x y z"), (2, "x y z"), (3, "x y z")])
        out = {
            r.doc_id: r
            for r in B.line_dedup_clean(docs, seg_words=3, max_docs=2).collect()
        }
        assert len(out) == 3
        assert all(out[i].clean_text == "" for i in (1, 2, 3))
        assert all(out[i].removed_frac == 1.0 for i in (1, 2, 3))

    def test_threshold_boundary_exactly_max_docs_is_kept(self, spark):
        docs = _docs(spark, [(1, "x y z"), (2, "x y z")])
        out = B.line_dedup_clean(docs, seg_words=3, max_docs=2).collect()
        assert all(r.clean_text == "x y z" for r in out)


class TestBlocklistFilter:
    def test_hits_counted_and_sorted_distinct(self, spark):
        docs = _docs(spark, [(1, "spam a dup b dup"), (2, "clean words only")])
        out = {
            r.doc_id: r
            for r in B.blocklist_filter(docs, ["dup", "spam"]).collect()
        }
        assert out[1].n_blocked_hits == 3
        assert out[1].blocked_terms == "dup,spam"
        assert out[1].keep is False
        assert out[2].n_blocked_hits == 0
        assert out[2].blocked_terms == ""
        assert out[2].keep is True

    def test_exact_token_match_not_substring(self, spark):
        docs = _docs(spark, [(1, "duplicate spammer")])
        out = B.blocklist_filter(docs, ["dup", "spam"]).collect()[0]
        assert out.n_blocked_hits == 0 and out.keep is True

    def test_empty_blocklist_rejected(self, spark):
        with pytest.raises(ValueError):
            B.blocklist_filter(_docs(spark, [(1, "a")]), [])


class TestMixtureCapped:
    def _plan(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        return {r.source: r for r in S.mixture_plan_capped(df, **kw).collect()}

    def test_uncapped_sources_get_ideal_allocation(self, spark):
        # Two equal sources, generous cap: each gets floor(budget/2).
        rows = [(1, "a b c d", "s1"), (2, "e f g h", "s2")]
        out = self._plan(spark, rows, budget_tokens=6, epoch_cap_milli=10_000)
        assert out["s1"].final_alloc == 3 and out["s2"].final_alloc == 3
        assert not out["s1"].capped
        assert out["s1"].unalloc_tokens == 0

    def test_cap_binds_and_surplus_redistributes(self, spark):
        # tiny (1 token) + big (16 tokens): sqrt weights 1000 / 4000.
        # budget 10 -> ideal tiny=2, big=8. Cap 1.0 epoch -> tiny clamps
        # to 1; surplus 1 redistributes to big: 8 + floor(1*4000/4000)=9.
        rows = [(1, "t", "tiny"), (2, " ".join(["w"] * 16), "big")]
        out = self._plan(spark, rows, budget_tokens=10, epoch_cap_milli=1_000)
        assert out["tiny"].capped and out["tiny"].final_alloc == 1
        assert out["tiny"].epochs_milli == 1000
        assert not out["big"].capped and out["big"].final_alloc == 9
        assert out["big"].unalloc_tokens == 0

    def test_all_capped_reports_unallocated_residue(self, spark):
        rows = [(1, "a b", "s1"), (2, "c d", "s2")]
        out = self._plan(spark, rows, budget_tokens=100, epoch_cap_milli=1_000)
        assert out["s1"].capped and out["s2"].capped
        assert out["s1"].final_alloc == 2 and out["s2"].final_alloc == 2
        assert out["s1"].unalloc_tokens == 96

    def test_redistribution_respects_receivers_cap(self, spark):
        # Receiver would overflow its own cap -> final least-clamp.
        rows = [
            (1, "t", "tiny"),
            (2, " ".join(["w"] * 16), "big"),
        ]
        out = self._plan(spark, rows, budget_tokens=20, epoch_cap_milli=1_000)
        # ideal tiny=4 big=16; both caps are 1.0 epoch (1 and 16):
        # tiny clamps to 1, big's ideal 16 == cap -> not capped flag?
        # ideal_alloc > cap strictly, 16 > 16 false -> uncapped, then
        # redistribution would push it past its cap -> least() holds 16.
        assert out["big"].final_alloc == 16
        assert out["tiny"].final_alloc == 1

    def test_exactly_one_budget_form_enforced(self, spark):
        df = spark.createDataFrame([(1, "a", "s")], "doc_id long, text string, source string")
        with pytest.raises(ValueError):
            S.mixture_plan_capped(df, budget_tokens=None)
        with pytest.raises(ValueError):
            S.mixture_plan_capped(
                df, budget_tokens=5, budget_permille_of_corpus=100
            )

    def test_relative_budget_matches_absolute(self, spark):
        rows = [(1, "a b c d", "s1"), (2, "e f g h", "s2")]
        rel = self._plan(
            spark, rows, budget_tokens=None, epoch_cap_milli=10_000,
            budget_permille_of_corpus=750,
        )
        ab = self._plan(spark, rows, budget_tokens=6, epoch_cap_milli=10_000)
        assert {s: r.final_alloc for s, r in rel.items()} == {
            s: r.final_alloc for s, r in ab.items()
        }

    def test_bpe_token_count_changes_the_denomination(self, spark):
        # r9 (VERDICT-r8 #7): token_count swaps the budget currency.
        # Under merges [('a','b')] the word "ab" is ONE bpe token but
        # char-split gives 2; whitespace counting sees 1 word either
        # way — so a corpus of "ab ab" has 2 whitespace tokens but
        # 2 bpe tokens, while "cd" has 1 whitespace and 2 bpe tokens.
        import pyspark.sql.functions as F

        from flumedb_spark.operators import bpe

        rows = [(1, "ab ab", "s1"), (2, "cd", "s2")]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        merges = [("a", "b")]
        out = {
            r.source: r
            for r in S.mixture_plan_capped(
                df,
                budget_tokens=4,
                epoch_cap_milli=10_000,
                token_count=F.size(
                    bpe.bpe_tokens_col(F.col("text"), merges)
                ),
            ).collect()
        }
        # bpe counts: s1 = 2 ("ab" merged twice), s2 = 2 ("c","d")
        assert out["s1"].n_tokens == 2 and out["s2"].n_tokens == 2
        # whitespace counts would be 2 / 1 — assert the default differs
        ws = {
            r.source: r.n_tokens
            for r in S.mixture_plan_capped(
                df, budget_tokens=4, epoch_cap_milli=10_000
            ).collect()
        }
        assert ws == {"s1": 2, "s2": 1}
