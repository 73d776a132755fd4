"""Behavioral tests for the late-r6 scoring/sketching family:
Gopher quality rules, CCNet unigram-LM terciles, sqrt-temperature
source mixing, and KMV set-operation sketches.

The oracle gate (tests/test_full_gate.py) already pins cross-engine
bit-parity for all four; these tests pin the *semantics* — threshold
behavior on constructed documents, estimator accuracy bounds, budget
conservation — which a hash match alone would not explain to a reader.
"""

import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import sampling, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---- Gopher quality ------------------------------------------------------


def test_gopher_rules_fire_individually(spark):
    good = "the " + " ".join(f"word{i:02d}" for i in range(48)) + " a"
    short = "the quick a fox"  # < 50 words
    longwords = "the a " + " ".join("supercalifragilistic" for _ in range(60))
    nostop = " ".join(f"word{i:02d}" for i in range(60))  # no stopwords
    symbols = "the a " + " ".join("1234" for _ in range(60))  # no alpha words
    out = {
        r.doc_id: r
        for r in text.gopher_quality(
            _mkdocs(spark, [good, short, longwords, nostop, symbols])
        ).collect()
    }
    assert out[0].keep == 1
    assert out[1].keep == 0 and out[1].n_words < 50
    assert out[2].keep == 0 and out[2].mean_word_len > 10
    assert out[3].keep == 0 and out[3].n_stopwords < 2
    assert out[4].keep == 0 and out[4].frac_alpha_words < 0.8
    # signal sanity on the passing doc
    assert out[0].n_words == 50
    assert out[0].n_stopwords == 2


def test_gopher_on_corpus_is_nondegenerate(spark, docs):
    agg = (
        text.gopher_quality(docs)
        .agg(
            F.sum("keep").alias("n_keep"),
            F.count("*").alias("n"),
        )
        .first()
    )
    assert 0 < agg.n_keep < agg.n  # both branches exercised


# ---- unigram LM terciles -------------------------------------------------


def test_unigram_logprob_orders_rare_docs_last(spark):
    # 9 docs of common words + 1 doc of singletons: the singleton doc
    # must land in the tail bucket with the highest avg_nll.
    texts = ["alpha beta gamma delta" for _ in range(9)]
    texts.append("zzq xxv wwu yyt")
    out = text.unigram_logprob(_mkdocs(spark, texts)).collect()
    by_id = {r.doc_id: r for r in out}
    rare = by_id[9]
    assert rare.ppl_bucket == 3
    assert rare.avg_nll == max(r.avg_nll for r in out)
    # buckets partition 10 docs as 4/3/3 (ntile remainder-first)
    sizes = sorted(
        [sum(1 for r in out if r.ppl_bucket == b) for b in (1, 2, 3)],
        reverse=True,
    )
    assert sizes == [4, 3, 3]


def test_unigram_logprob_exact_arithmetic(spark):
    # 2 docs, tiny vocab: verify micro-nat arithmetic by hand.
    # corpus: a a b  -> f(a)=2, f(b)=1, T=3, V=2
    import math

    out = {
        r.doc_id: r
        for r in text.unigram_logprob(_mkdocs(spark, ["a a", "b"])).collect()
    }
    ln_a = round(math.log(3) * 1e6)  # f(a)+1 = 3
    ln_b = round(math.log(2) * 1e6)
    ln_tv = round(math.log(5) * 1e6)  # T+V = 5
    assert out[0].avg_nll == round((2 * ln_tv - 2 * ln_a) / 2 / 1e6, 6)
    assert out[1].avg_nll == round((1 * ln_tv - 1 * ln_b) / 1 / 1e6, 6)


# ---- source mixture ------------------------------------------------------


def test_source_mixture_budget_and_temperature(spark):
    rows = []
    did = 0
    for src, n_docs, words in (("big", 90, 100), ("small", 10, 100)):
        for _ in range(n_docs):
            rows.append((did, " ".join("w" for _ in range(words)), src))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in sampling.source_mixture(df, budget_tokens=10_000).collect()}
    # allocation never exceeds the budget; floor loses at most n_sources-1
    total = sum(r.alloc_tokens for r in out.values())
    assert 10_000 - 2 < total <= 10_000
    # sqrt temperature: 9x the tokens -> only 3x the allocation
    ratio = out["big"].alloc_tokens / out["small"].alloc_tokens
    assert abs(ratio - 3.0) < 0.01
    # small source repeats more often than big (that's the point)
    assert out["small"].epochs > out["big"].epochs


def test_source_mixture_covers_all_sources(spark, docs):
    out = sampling.source_mixture(docs).collect()
    assert len(out) == docs.select("source").distinct().count()
    assert all(r.p_mix > 0 and r.alloc_tokens > 0 for r in out)
    assert abs(sum(r.p_mix for r in out) - 1.0) < 1e-4


# ---- KMV set-operation sketch --------------------------------------------


def test_kmv_estimates_within_theory_bounds(spark, sf_dir):
    from flumedb_spark.catalog import register_tables
    from flumedb_spark.catalog_northstar import _KMV_SPARK

    register_tables(spark, sf_dir)
    rows = {r.measure: r for r in spark.sql(_KMV_SPARK).collect()}
    assert set(rows) == {"click", "purchase", "union", "intersection"}
    for m in ("click", "purchase", "union"):
        r = rows[m]
        if r.n_sketch < 256:  # exact path: sketch == set
            assert r.est == float(r.n_exact)
        else:  # estimator path: ~1/sqrt(k) standard error; allow 5 sigma
            rel = abs(r.est - r.n_exact) / r.n_exact
            assert rel < 5 / (256 ** 0.5), (m, r)
    # intersection inherits Jaccard noise; just pin non-insane
    ri = rows["intersection"]
    assert ri.est <= min(rows["click"].est, rows["purchase"].est) + 1
    assert (ri.n_exact == 0) == (ri.est == 0.0)


# ---- streaming HLL window sketch ----------------------------------------


def test_stream_hll_estimates_track_exact(spark, sf_dir):
    """The streaming HLL's per-window estimate must track the exact
    per-window distinct-user count computed over the SAME survive set
    (m=256 registers -> ~6.5% standard error; allow 5 sigma)."""
    from flumedb_spark.catalog import QUERIES, register_tables

    register_tables(spark, sf_dir)
    est = {r.win_start_us: r for r in QUERIES["stream_hll_window"](spark, sf_dir).collect()}
    assert est, "no windows emitted"
    # replay the survive set (the pinned stream_windowed_counts rules)
    ev = spark.table("events")
    exact = {
        r.win_start_us: r.n
        for r in spark.sql(
            """
        WITH b0 AS (SELECT ts FROM events WHERE event_id % 10 NOT IN (3, 7)),
             wm0 AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM b0),
             fw  AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events),
             survive AS (
               SELECT ts, user_id FROM events WHERE event_id % 10 != 3
               UNION ALL
               SELECT ts, user_id FROM events WHERE event_id % 10 = 3
                 AND date_trunc('hour', ts) + INTERVAL 1 HOUR > (SELECT w FROM wm0)
             )
        SELECT unix_micros(date_trunc('hour', ts)) AS win_start_us,
               count(DISTINCT user_id) AS n
        FROM survive
        WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT w FROM fw)
        GROUP BY 1
        """
        ).collect()
    }
    assert set(est) == set(exact)
    for ws, r in est.items():
        n = exact[ws]
        # 5-sigma relative bound, with an absolute floor for tiny
        # windows where a single bucket collision dominates (n=2 in
        # one bucket -> estimate ~1: correct sketch behavior)
        tol = max(5 * 1.04 / (256 ** 0.5) * n, 2.5)
        assert abs(r.hll_estimate - n) <= tol, (ws, n, r.hll_estimate)


# ---- quality-aware canonical keeper --------------------------------------


def test_neardup_canonical_prefers_quality(spark, docs):
    from flumedb_spark.operators import dedup

    out = dedup.neardup_canonical(docs, text.quality_score(docs)).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert sum(1 for rs in by_cluster.values() if len(rs) > 1) > 0
    for cid, rs in by_cluster.items():
        canon = [r for r in rs if r.is_canonical]
        assert len(canon) == 1, cid  # exactly one keeper per cluster
        best = max(rs, key=lambda r: (r.quality, -r.doc_id))
        assert canon[0].doc_id == best.doc_id, cid


def test_script_profile_semantics(spark):
    """Script profiling on hand-built multilingual docs: counts per
    block, dominant-script argmax with SCRIPT_RANGES-order tiebreak,
    'none' when empty of every block."""
    from flumedb_spark.operators.text import script_profile

    rows = [
        (0, "hello world"),                  # latin only
        (1, "привет мир"),                   # cyrillic
        (2, "hello 你好你好"),                # 4 cjk < 5 latin
        (3, "ab яб"),                        # 2 latin vs 2 cyrillic: tie -> latin (range order)
        (4, "!!! ???"),                      # none
        (5, "γλώσσα"),                       # greek
        (6, "2024 데이터"),                   # hangul 3 vs digit 4 -> digit? 4 digits > 3 hangul
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert out[0].dominant_script == "latin" and out[0].n_latin == 10
    assert out[1].dominant_script == "cyrillic" and out[1].n_cyrillic == 9
    assert out[2].dominant_script == "latin" and out[2].n_cjk == 4
    assert out[3].dominant_script == "latin"  # tie broken by range order
    assert out[4].dominant_script == "none"
    assert out[5].dominant_script == "greek"
    assert out[6].dominant_script == "digit" and out[6].n_hangul == 3


# ---------------------------------------------------------------------
# r8: supervised quality classifier (NB closed-form + fixed-iter LR)
# ---------------------------------------------------------------------


def _toy_labeled_docs(spark):
    # two clearly separable vocabularies + unlabeled docs of each style
    rows = [
        (0, "alpha beta alpha beta gamma", "pos"),
        (1, "alpha gamma beta alpha", "pos"),
        (2, "zeta eta theta zeta", "neg"),
        (3, "eta theta zeta eta theta", "neg"),
        (4, "alpha beta gamma alpha", "unl"),   # pos-style
        (5, "zeta theta eta zeta", "unl"),      # neg-style
        (6, "solo", "unl"),                     # < 2 tokens: featureless
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_quality_classifier_nb_separates_and_scores_featureless(spark):
    from flumedb_spark.operators import quality_clf as qc

    docs = _toy_labeled_docs(spark)
    w, bias = qc.train_quality_classifier(docs, "source = 'pos'", "source = 'neg'")
    out = {r.doc_id: r for r in qc.score_quality(docs, w, bias).collect()}
    assert out[0].keep and out[1].keep and out[4].keep
    assert not out[2].keep and not out[3].keep and not out[5].keep
    # featureless doc scores exactly the prior (here ln(2/2) = 0 -> not kept)
    assert out[6].n_grams == 0 and out[6].logit_micro == 0 and not out[6].keep
    # every input doc gets a verdict
    assert len(out) == 7


def test_quality_classifier_lr_separates_and_is_deterministic(spark):
    from flumedb_spark.operators import quality_clf as qc

    docs = _toy_labeled_docs(spark)
    w1, b1 = qc.train_quality_classifier_lr(docs, "source = 'pos'", "source = 'neg'")
    out1 = {r.doc_id: r for r in qc.score_quality_lr(docs, w1, b1).collect()}
    assert out1[0].keep and out1[4].keep and not out1[2].keep and not out1[5].keep
    # p_micro is a valid quantized probability, monotone in margin
    assert 0 <= out1[0].p_micro <= 1_000_000 and out1[0].p_micro > out1[2].p_micro
    # retrain: the fixed-point trajectory is bit-identical
    w2, b2 = qc.train_quality_classifier_lr(docs, "source = 'pos'", "source = 'neg'")
    out2 = {r.doc_id: r for r in qc.score_quality_lr(docs, w2, b2).collect()}
    assert {k: v.margin_micro for k, v in out1.items()} == {
        k: v.margin_micro for k, v in out2.items()
    }


def test_quality_classifier_corpus_separation(spark, docs):
    """On the fixture corpus both trainers must separate their own
    training labels well (NB >= 95% on each class; LR exact at the
    defaults at sf0.01+, >= 0.9 at the tiny suite SF)."""
    from flumedb_spark.operators import quality_clf as qc

    pb = qc.per_bucket_counts(docs)
    w, bias = qc.train_quality_classifier(
        docs, "source = 'src0'", "source = 'src3'", per_bucket=pb
    )
    scored = qc.score_quality(docs, w, bias, per_bucket=pb)
    j = scored.join(docs.select("doc_id", "source"), "doc_id")
    pos_acc = j.where("source = 'src0'").agg(F.avg(F.col("keep").cast("int"))).collect()[0][0]
    neg_acc = j.where("source = 'src3'").agg(F.avg((~F.col("keep")).cast("int"))).collect()[0][0]
    assert pos_acc >= 0.95 and neg_acc >= 0.95, (pos_acc, neg_acc)
    wl, bl = qc.train_quality_classifier_lr(
        docs, "source = 'src0'", "source = 'src3'", per_bucket=pb
    )
    sl = qc.score_quality_lr(docs, wl, bl, per_bucket=pb)
    jl = sl.join(docs.select("doc_id", "source"), "doc_id")
    pos_l = jl.where("source = 'src0'").agg(F.avg(F.col("keep").cast("int"))).collect()[0][0]
    neg_l = jl.where("source = 'src3'").agg(F.avg((~F.col("keep")).cast("int"))).collect()[0][0]
    assert pos_l >= 0.9 and neg_l >= 0.9, (pos_l, neg_l)


class TestKNBigram:
    def test_known_tiny_corpus(self, spark):
        from flumedb_spark.operators import text as text_ops

        # corpus: "a b" and "a b c" -> bigram types: (a,b) c12=2,
        # (b,c) c12=1.  c1(a)=2, n1f(a)=1; c1(b)=1, n1f(b)=1;
        # n1b(b)=1, n1b(c)=1; T=2.
        # p(a,b): term1 = (2000-750)*1e6 // 2000 = 625000
        #         pcont(b) = 1e6 // 2 = 500000
        #         term2 = 750*1*500000 // 2000 = 187500 -> 812500
        # p(b,c): term1 = (1000-750)*1e6 // 1000 = 250000
        #         term2 = 750*1*500000 // 1000 = 375000 -> 625000
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b c")], "doc_id long, text string"
        )
        rows = {
            r.doc_id: r
            for r in text_ops.kn_bigram_logprob(docs).collect()
        }
        import math

        ln = lambda x: round(math.log(x) * 1e6)  # noqa: E731
        l6 = 13_815_511
        # doc 1: one bigram (a,b)
        exp1 = round((1 * l6 - ln(812500)) / 1 / 1e6, 6)
        assert rows[1].n_bigrams == 1 and rows[1].kn_avg_nll == exp1
        # doc 2: (a,b) and (b,c)
        exp2 = round((2 * l6 - ln(812500) - ln(625000)) / 2 / 1e6, 6)
        assert rows[2].n_bigrams == 2 and rows[2].kn_avg_nll == exp2

    def test_short_docs_drop_and_probs_valid(self, spark, sf_dir):
        from flumedb_spark.operators import text as text_ops

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        scored = text_ops.kn_bigram_logprob(docs)
        # every scored doc has >= 1 bigram and a positive finite NLL
        bad = scored.where(
            (F.col("n_bigrams") < 1) | (F.col("kn_avg_nll") <= 0)
        ).count()
        assert bad == 0
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


class TestCharEntropy:
    def test_closed_forms(self, spark):
        from flumedb_spark.operators import text as text_ops
        import math

        docs = spark.createDataFrame(
            [(1, "aaaa"), (2, "abab"), (3, "abcd")],
            "doc_id long, text string",
        )
        rows = {
            r.doc_id: r for r in text_ops.char_entropy(docs).collect()
        }
        # uniform single char: H = 0
        assert rows[1].entropy_nats == 0.0 and rows[1].n_distinct == 1
        # two chars equiprobable over 4: H = ln 2 (via the micro device)
        ln = lambda k: round(math.log(k) * 1e6)  # noqa: E731
        exp2 = round((4 * ln(4) - 2 * (2 * ln(2))) / 4 / 1e6, 6)
        assert rows[2].entropy_nats == exp2
        # four distinct chars: H = ln 4
        exp3 = round((4 * ln(4) - 4 * (1 * ln(1))) / 4 / 1e6, 6)
        assert rows[3].entropy_nats == exp3
        assert abs(rows[3].entropy_nats - math.log(4)) < 1e-5

    def test_prose_band_on_corpus(self, spark, sf_dir):
        from flumedb_spark.operators import text as text_ops

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        scored = text_ops.char_entropy(docs)
        stats = scored.agg(
            F.min("entropy_nats").alias("lo"),
            F.max("entropy_nats").alias("hi"),
        ).first()
        # natural-text corpus sits in the prose band, not at the
        # degenerate extremes
        assert 1.0 < stats.lo and stats.hi < 5.0
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
