"""Markdown/LaTeX strippers (operators/markup.py) and conversation/SFT
preparation (operators/conversations.py)."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flumedb_spark.operators import conversations, markup


class TestMarkdownStrip:
    @pytest.mark.parametrize(
        "md,plain",
        [
            ("# Header\nbody", "Header\nbody"),
            ("###### deep header", "deep header"),
            ("**bold** and *ital*", "bold and ital"),
            ("a `code span` b", "a code span b"),
            ("[text](https://corp.test/x)", "text"),
            ("![alt words](https://corp.test/i.png)", "alt words"),
            ("> quoted\n> lines", "quoted\nlines"),
            ("pre\n```\ndropped\n```\npost", "pre\n\npost"),
            ("", ""),
            ("plain stays plain", "plain stays plain"),
        ],
    )
    def test_rules(self, spark, md, plain):
        df = spark.createDataFrame([Row(x=md)])
        got = df.select(markup.strip_markdown(F.col("x")).alias("p")).first().p
        assert got == plain

    def test_image_before_link_order_matters(self, spark):
        # an image inside a link: ![a](u) must resolve before [..](..)
        df = spark.createDataFrame([Row(x="see ![icon](u1) then [go](u2)")])
        got = df.select(markup.strip_markdown(F.col("x")).alias("p")).first().p
        assert got == "see icon then go"


class TestLatexStrip:
    @pytest.mark.parametrize(
        "tex,plain",
        [
            ("\\section{Intro}", "Intro"),
            ("\\textbf{bold} and \\emph{em}", "bold and em"),
            ("pre % comment\npost", "pre \npost"),
            ("a $x^2 + y$ b", "a  b"),
            ("\\begin{itemize}\\item one\\end{itemize}", " one"),
            ("\\par\\noindent text", " text"),
            ("", ""),
        ],
    )
    def test_rules(self, spark, tex, plain):
        df = spark.createDataFrame([Row(x=tex)])
        got = df.select(markup.strip_latex(F.col("x")).alias("p")).first().p
        assert got == plain

    def test_synthesis_exercises_every_rule(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(4)
        md = markup.with_synthetic_markdown(docs).first().markdown
        for needle in ("# ", "**", "![", "](", "> ", "`", "```"):
            assert needle in md
        tex = markup.with_synthetic_latex(docs).first().latex
        for needle in ("\\section{", "% ", "\\textbf{", "$", "\\begin{"):
            assert needle in tex


class TestConversations:
    def _turns(self, spark, sf_dir, n=8):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(n)
        convs = conversations.with_synthetic_conversation(docs)
        return docs, conversations.conversation_turns(convs)

    def test_json_is_valid_and_roles_alternate(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(6)
        for r in conversations.with_synthetic_conversation(docs).collect():
            turns = json.loads(r.conversation_json)
            assert len(turns) == 1 + r.doc_id % 4
            for t, turn in enumerate(turns):
                assert turn["role"] == ("user" if t % 2 == 0 else "assistant")

    def test_flatten_matches_slices(self, spark, sf_dir):
        docs, turns = self._turns(spark, sf_dir)
        texts = {r[0]: r[1] for r in docs.select("doc_id", "text").collect()}
        for r in turns.collect():
            assert r.content == texts[r.doc_id][30 * r.turn_idx : 30 * r.turn_idx + 30]

    def test_malformed_json_yields_zero_rows_not_failure(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, conversation_json="{not json"),
             Row(doc_id=2, conversation_json='[{"role":"user","content":"ok"}]')]
        )
        rows = conversations.conversation_turns(df).collect()
        assert [r.doc_id for r in rows] == [2]

    def test_validate_alternation_flags(self, spark):
        rows = [
            Row(doc_id=1, turn_idx=0, role="user", content="a"),
            Row(doc_id=1, turn_idx=1, role="assistant", content="b"),
            Row(doc_id=2, turn_idx=0, role="assistant", content="a"),
            Row(doc_id=2, turn_idx=1, role="assistant", content="b"),
        ]
        got = {
            r.doc_id: r
            for r in conversations.validate_alternation(
                spark.createDataFrame(rows)
            ).collect()
        }
        assert got[1].starts_with_user and got[1].alternates
        assert got[1].ends_with_assistant
        assert not got[2].starts_with_user and not got[2].alternates

    def test_template_render_order_and_len(self, spark, sf_dir):
        docs, turns = self._turns(spark, sf_dir)
        texts = {r[0]: r[1] for r in docs.select("doc_id", "text").collect()}
        for r in conversations.chat_template_render(turns).collect():
            expect_parts = []
            for t in range(1 + r.doc_id % 4):
                role = "user" if t % 2 == 0 else "assistant"
                expect_parts.append(
                    f"<|{role}|>" + texts[r.doc_id][30 * t : 30 * t + 30]
                )
            assert r.rendered == "\n".join(expect_parts)
            assert r.rendered_len == len(r.rendered)
            assert r.n_turns == 1 + r.doc_id % 4

    def test_turn_dedup_counts_and_first_occurrence(self, spark):
        rows = [
            Row(doc_id=5, turn_idx=0, role="user", content="dup"),
            Row(doc_id=3, turn_idx=1, role="user", content="dup"),
            Row(doc_id=3, turn_idx=0, role="assistant", content="dup"),
            Row(doc_id=9, turn_idx=0, role="user", content="uniq"),
        ]
        got = {
            (r.role, r.n_copies): r
            for r in conversations.turn_dedup(
                spark.createDataFrame(rows)
            ).collect()
        }
        u = got[("user", 2)]
        assert (u.first_doc_id, u.first_turn_idx) == (3, 1)
        assert ("assistant", 1) in got and ("user", 1) in got

    def test_no_python_in_conversation_plan(self, spark, sf_dir):
        # the whole chain is JVM-side: no BatchEvalPython / ArrowEval
        docs, turns = self._turns(spark, sf_dir)
        plan = turns._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, plan


class TestConversationPacking:
    def test_packing_closed_form(self, spark):
        # conv costs: doc 1 = 3 words + 2 sentinels = 5; doc 2 = 1+2 = 3;
        # doc 3 = 4+2+2 = 8 (two turns).  pack_size=8:
        #   doc1 tok_before=0  -> pack 0
        #   doc2 tok_before=5  -> pack 0
        #   doc3 tok_before=8  -> pack 1
        rows = [
            Row(doc_id=1, turn_idx=0, role="user", content="a b c", n_words=3),
            Row(doc_id=2, turn_idx=0, role="user", content="x", n_words=1),
            Row(doc_id=3, turn_idx=0, role="user", content="p q", n_words=2),
            Row(doc_id=3, turn_idx=1, role="assistant", content="r s", n_words=2),
        ]
        got = {
            r.pack_id: r
            for r in conversations.conversation_packing(
                spark.createDataFrame(rows), pack_size=8
            ).collect()
        }
        assert got[0].n_convs == 2 and got[0].pack_tokens == 8
        assert (got[0].first_doc, got[0].last_doc) == (1, 2)
        assert got[1].n_convs == 1 and got[1].pack_tokens == 8
        assert (got[1].first_doc, got[1].last_doc) == (3, 3)

    def test_every_conversation_assigned_once(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        convs = conversations.with_synthetic_conversation(docs)
        turns = conversations.conversation_turns(convs)
        n_convs = turns.select("doc_id").distinct().count()
        packs = conversations.conversation_packing(turns)
        agg = packs.agg(
            F.sum("n_convs").alias("t"), F.sum("pack_tokens").alias("tok")
        ).first()
        assert agg.t == n_convs
        # total tokens conserved: sum over packs == sum over conversations
        total = turns.groupBy("doc_id").agg(
            (F.sum("n_words") + 2 * F.count(F.lit(1))).alias("c")
        ).agg(F.sum("c")).first()[0]
        assert agg.tok == total


class TestPackingEfficiency:
    def test_decile_rollup_closed_form(self, spark):
        packs = spark.createDataFrame(
            [(0, 2, 500, 1, 2), (1, 1, 256, 3, 3), (2, 1, 600, 4, 4)],
            "pack_id long, n_convs long, pack_tokens long, "
            "first_doc long, last_doc long",
        )
        rows = {
            r.fill_decile: r
            for r in conversations.packing_efficiency(
                packs, pack_size=512
            ).collect()
        }
        # 500*10//512 = 9 (90% bucket); 256 -> 5; 600 -> 11 (overfull)
        assert set(rows) == {9, 5, 11}
        assert rows[9].n_packs == 1 and rows[9].min_tokens == 500
        assert rows[11].max_tokens == 600 and rows[11].n_convs == 1

    def test_conserves_packs_and_convs(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        turns = conversations.conversation_turns(
            conversations.with_synthetic_conversation(docs)
        )
        packs = conversations.conversation_packing(turns)
        eff = conversations.packing_efficiency(packs)
        agg = eff.agg(
            F.sum("n_packs").alias("p"), F.sum("n_convs").alias("c")
        ).first()
        assert agg.p == packs.count()
        assert agg.c == turns.select("doc_id").distinct().count()
