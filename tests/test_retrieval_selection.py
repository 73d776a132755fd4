"""Behavioral tests for the late-r6 family #2: BM25 ranked retrieval,
DSIR importance weights, cross-corpus Bloom decontamination, and
alternating-star connected components.

The oracle gate (tests/test_full_gate.py) pins cross-engine bit-parity
for all four; these tests pin the *semantics*: BM25 against an
independent pure-Python scorer, DSIR's target-affinity ordering,
the Bloom no-false-negative guarantee on planted contamination, and
star-CC equality with a union-find ground truth on random graphs.
"""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flumedb_spark.operators import dedup, retrieval, selection


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---- BM25 -----------------------------------------------------------------


def _bm25_reference(texts, terms, k1=1.2, b=0.75):
    """Independent float BM25 (the textbook formula, no integer
    quantization) — scores should agree with the operator to ~1e-4."""
    toks = [t.split(" ") for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    scores = {}
    for term in set(terms):
        df = sum(1 for t in toks if term in t)
        if not df:
            continue
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, t in enumerate(toks):
            tf = t.count(term)
            if not tf:
                continue
            scores[i] = scores.get(i, 0.0) + idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(t) / avgdl)
            )
    return scores


def test_bm25_matches_reference_scorer(spark):
    texts = [
        "spark join window merge sort",
        "spark spark spark filter",
        "window window join",
        "completely unrelated words here",
        "join",
    ]
    terms = ["spark", "window", "join"]
    got = {
        r.doc_id: r
        for r in retrieval.bm25_topk(_mkdocs(spark, texts), terms, k=10).collect()
    }
    want = _bm25_reference(texts, terms)
    assert set(got) == set(want)  # doc 3 (no term) absent
    for d, s in want.items():
        assert got[d].score == pytest.approx(s, abs=2e-4)
    # ranks follow the reference ordering (ties broken by doc_id)
    order = sorted(want, key=lambda d: (-want[d], d))
    assert [got[d].rank for d in order] == list(range(1, len(order) + 1))
    assert got[0].n_terms == 3 and got[4].n_terms == 1


def test_bm25_rank_contract(spark, docs):
    out = retrieval.bm25_topk(docs, ["spark", "window", "join"], k=15).collect()
    assert len(out) == 15
    assert [r.rank for r in out] == list(range(1, 16))
    scores = [r.score_micro for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r.n_terms <= 3 for r in out)


# ---- DSIR -----------------------------------------------------------------


def test_dsir_prefers_target_like_docs(spark):
    target = "alpha beta gamma delta " * 8
    offtgt = "omega psi chi phi " * 8
    texts = (
        [target.strip()] * 3  # the target slice
        + [target.strip()] * 2  # raw docs identical to target
        + [offtgt.strip()] * 5  # raw docs unlike target
    )
    sdf = spark.createDataFrame(
        [(i, t, "tgt" if i < 3 else "raw") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: r
        for r in selection.dsir_logweights(sdf, "source = 'tgt'").collect()
    }
    assert len(out) == 10
    tgt_like = [out[i].logw_micro for i in range(5)]
    off = [out[i].logw_micro for i in range(5, 10)]
    assert min(tgt_like) > max(off)
    # the kept quartile is drawn from the target-like docs
    kept = [d for d, r in out.items() if r.iw_quartile == 1]
    assert kept and all(d < 5 for d in kept)


def test_dsir_corpus_nondegenerate(spark, docs):
    out = selection.dsir_logweights(docs, "source = 'src0'")
    agg = out.agg(
        F.countDistinct("iw_quartile").alias("nq"),
        F.count("*").alias("n"),
        F.min("logw_micro").alias("lo"),
        F.max("logw_micro").alias("hi"),
    ).first()
    assert agg.nq == 4 and agg.n == docs.count()
    assert agg.lo < agg.hi  # the weights actually discriminate


# ---- cross-corpus Bloom dedup ---------------------------------------------


def test_bloom_no_false_negatives_on_planted_contamination(spark):
    ref_span = "one two three four five six seven eight"
    ref = spark.createDataFrame(
        [(0, ref_span + " tail words beyond the span")],
        "doc_id long, text string",
    )
    cand = _mkdocs(
        spark,
        [
            "prefix stuff " + ref_span + " suffix stuff",  # contaminated
            "totally different words with no overlap at all",  # clean
            "one two three four five six seven DIFFERENT",  # near miss
        ],
    )
    out = {r.doc_id: r for r in dedup.bloom_cross_dedup(ref, cand, window=8).collect()}
    assert out[0].contaminated and out[0].n_exact_hits >= 1
    assert not out[1].contaminated
    assert not out[2].contaminated  # 8th token differs -> no 8-gram match
    # the Bloom guarantee: every exact hit is a bloom hit
    for r in out.values():
        assert r.n_bloom_hits >= r.n_exact_hits


@given(
    st.lists(
        st.lists(st.integers(0, 7), min_size=8, max_size=12),
        min_size=1,
        max_size=4,
    ),
    st.lists(
        st.lists(st.integers(0, 7), min_size=8, max_size=12),
        min_size=1,
        max_size=4,
    ),
)
@settings(max_examples=10, deadline=None)
def test_bloom_superset_property(spark, ref_toks, cand_toks):
    mk = lambda toks: " ".join(f"w{t}" for t in toks)
    ref = _mkdocs(spark, [mk(t) for t in ref_toks])
    cand = _mkdocs(spark, [mk(t) for t in cand_toks])
    for r in dedup.bloom_cross_dedup(ref, cand, window=8).collect():
        assert r.n_bloom_hits >= r.n_exact_hits
        assert r.contaminated == (r.n_exact_hits > 0)


# ---- alternating-star connected components ---------------------------------


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min label per component
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in comp.items() for v in vs}


@given(
    st.integers(2, 14).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
                max_size=25,
            ),
        )
    )
)
@settings(max_examples=25, deadline=None)
def test_star_cc_matches_union_find(spark, case):
    n, raw_edges = case
    edges = [(a, b) for a, b in raw_edges if a != b]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edf = spark.createDataFrame(
        edges or [(0, 0)], "doc_a long, doc_b long"
    )
    if not edges:
        edf = edf.where(F.lit(False))
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components_star(edf, nodes).collect()
    }
    assert got == _union_find_components(n, edges)


def test_star_cc_long_chain_beats_fixed_k(spark):
    """A 40-node path: fixed-K label propagation with K=4 CANNOT label
    the far end correctly; star contraction converges to the true
    component in O(log n) rounds."""
    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    out = dedup.connected_components_star(edges, nodes).collect()
    assert all(r.cluster_id == 0 for r in out)


def test_neardup_components_agrees_with_clusters_on_corpus(spark, docs):
    """On the test corpus the LSH graph's clusters are small, so the
    fixed-K=4 propagation already reaches the true components — the
    star result must agree exactly there."""
    a = {r.doc_id: r.cluster_id for r in dedup.neardup_components(docs).collect()}
    b = {r.doc_id: r.cluster_id for r in dedup.neardup_clusters(docs, iters=4).collect()}
    assert a == b


# ---- quantization-margin audit ---------------------------------------------


def test_ln_quantization_margins(spark, sf_dir):
    """The cross-engine exactness of BM25/DSIR rests on round(ln(x) *
    1e6) agreeing between the JVM and DuckDB. A 1-ulp ln divergence is
    ~|ln| * 2^-52 ~ 1e-15, i.e. ~1e-9 micro-units — it can only flip a
    rounding if some quantized value sits within ~1e-9 of a .5
    boundary. Audit every ln the two operators quantize at this SF and
    assert a million-fold margin (1e-3 micro-units)."""
    import math

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    vals = []
    # BM25 per-term IDF inputs
    n, t = con.execute(
        "SELECT count(*), sum(len(string_split(text,' '))) FROM documents"
    ).fetchone()
    for term in ("spark", "window", "join"):
        (df,) = con.execute(
            "SELECT count(*) FROM documents WHERE ' '||text||' ' LIKE ?",
            (f"% {term} %",),
        ).fetchone()
        vals.append(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6)
    # DSIR per-bucket log-probs, both LMs + both floors
    rows = con.execute(
        """
        WITH grams AS (
          SELECT doc_id,
            CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 15) AS BIGINT)
              % 256 AS b
          FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents
                WHERE len(string_split(text,' ')) >= 2) base,
          LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) gs
        ),
        cq AS (SELECT b, count(*) AS c FROM grams GROUP BY b),
        cp AS (SELECT g.b, count(*) AS c FROM grams g
               JOIN documents d ON d.doc_id = g.doc_id AND d.source = 'src0'
               GROUP BY g.b)
        SELECT c, (SELECT sum(c) FROM cq) FROM cq
        UNION ALL
        SELECT c, (SELECT sum(c) FROM cp) FROM cp
        UNION ALL
        SELECT 0, (SELECT sum(c) FROM cq)
        UNION ALL
        SELECT 0, (SELECT sum(c) FROM cp)
        """
    ).fetchall()
    vals += [math.log((c + 1) / (tot + 256)) * 1e6 for c, tot in rows]
    margins = [abs(v - math.floor(v) - 0.5) for v in vals]
    # worst-case cross-engine ln drift for |v| ~ 6e6 micro-units is a
    # few ulp ~ |v| * 2^-52 ~ 1.3e-9; require a 1000x cushion. (The
    # observed minimum at sf0.001 is ~1.4e-4 — five orders of magnitude
    # above the drift — so no value is anywhere near flippable.)
    assert min(margins) > 1e-6, (
        f"quantization margin too small: {min(margins)} "
        f"(value {vals[margins.index(min(margins))]})"
    )


# ---- exact set-similarity join (prefix filtering) ---------------------------


def test_setsim_prefix_equals_bruteforce_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from flumedb_spark.operators.dedup import ngram_jaccard_pairs, setsim_join_prefix

    fast = {
        (r.doc_a, r.doc_b): (r.n_common, r.jaccard)
        for r in setsim_join_prefix(docs, n=3, t_num=1, t_den=5).collect()
    }
    brute = {
        (r.doc_a, r.doc_b): (r.n_common, r.jaccard)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.2).collect()
    }
    assert fast == brute  # complete AND precise — the prefix theorem, attested


@given(
    st.lists(
        st.lists(st.integers(0, 5), min_size=3, max_size=10),
        min_size=2,
        max_size=6,
    )
)
@settings(max_examples=15, deadline=None)
def test_setsim_prefix_equals_bruteforce_random(spark, token_docs):
    from flumedb_spark.operators.dedup import ngram_jaccard_pairs, setsim_join_prefix

    docs = _mkdocs(spark, [" ".join(f"w{t}" for t in toks) for toks in token_docs])
    fast = {
        (r.doc_a, r.doc_b) for r in setsim_join_prefix(docs, t_num=1, t_den=5).collect()
    }
    brute = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    assert fast == brute


@pytest.mark.parametrize("n", [0, 1, 2, 3, 4, 5, 7, 8, 97, 100])
def test_global_ntile_matches_window_ntile(spark, n):
    """The distributed rank path (range repartition + pid-partitioned
    row_number + broadcast offsets + closed-form tile arithmetic) must
    reproduce SQL ntile(4) bit-for-bit across every n % 4 residue,
    including the degenerate n < tiles cases."""
    from pyspark.sql.window import Window

    rows = [(i, (i * 37) % 53) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, score long") if rows else (
        spark.createDataFrame([], "doc_id long, score long")
    )
    got = (
        selection.global_ntile(
            df, [F.col("score").desc(), F.col("doc_id")], 4, "t"
        )
        .select("doc_id", "t")
        .collect()
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    want = df.select("doc_id", F.ntile(4).over(w).cast("int").alias("t")).collect()
    assert sorted((r.doc_id, r.t) for r in got) == sorted(
        (r.doc_id, r.t) for r in want
    )


def test_global_ntile_plan_has_no_unpartitioned_window(spark):
    """The scale contract itself: no single-partition WindowExec in the
    distributed ntile's plan (the only Window is partitioned by the
    range-shuffle pid), and the metadata-side offsets join broadcasts."""
    import contextlib
    import io

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17).alias("score")
    )
    out = selection.global_ntile(
        df, [F.col("score").desc(), F.col("doc_id")], 4, "t"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "ntile" not in p
    assert "row_number" in p
    # the data-sized window is partitioned (its spec lists _pid); an
    # unpartitioned window would plan an Exchange SinglePartition over
    # the full input instead of the pid hash exchange
    assert "_pid" in p


def test_curriculum_deciles_semantics(spark, docs):
    """Curriculum deciles: monotone in avg_nll (an easier doc never
    lands in a harder decile than a harder doc), near-balanced decile
    sizes (ntile contract), full corpus covered."""
    out = selection.curriculum_deciles(docs).collect()
    assert len(out) == docs.count()
    by_nll = sorted(out, key=lambda r: (r["avg_nll"], r["doc_id"]))
    deciles = [r["difficulty_decile"] for r in by_nll]
    assert deciles == sorted(deciles), "decile not monotone in difficulty"
    assert set(deciles) == set(range(1, 11))
    from collections import Counter

    sizes = Counter(deciles)
    assert max(sizes.values()) - min(sizes.values()) <= 1  # ntile balance
