"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the baseline. All arithmetic
  is JVM higher-order functions (zip_with/aggregate); no UDF.
- ``lsh_ann_topk``: random-hyperplane LSH bucketing — the scale path:
  candidates share a hash bucket, so the join is equi on the sketch, not
  a cross product. Hyperplanes are derived deterministically from
  xxhash64, so results are reproducible without a stored model.

Exact cross-engine arithmetic: embeddings are float32; we scale each
component to an integer (round(x * 1e6)) so dot products and norms are
exact BIGINT sums in any engine; cosine is then one deterministic double
expression. This is the same exact-int strategy the relational catalog
uses for money columns.

At 100 TB: broadcast the (small) query set, keep the corpus partitioned;
for all-pairs near-dup use the LSH buckets and verify only candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._util import spread as _spread
from pyspark.sql.window import Window

SCALE = 1_000_000  # float32 has ~7 significant digits




def _iscale(x: Column) -> Column:
    return F.round(x.cast("double") * SCALE).cast("long")


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two float vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _iscale(x) * _iscale(y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def int_norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: _iscale(x) * _iscale(x)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_expr(dot_i: Column, n2a: Column, n2b: Column) -> Column:
    return dot_i.cast("double") / (
        F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Brute force: |Q| x |corpus| scored pairs, ranked per query. The
    query side is broadcast (it is small by construction).
    """
    embeddings = _spread(embeddings)
    norms = embeddings.select(
        F.col("vec_id"), F.col(vec_col).alias("vec"), int_norm2(F.col(vec_col)).alias("n2")
    )
    q = norms.select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"), F.col("n2").alias("qn2")
    )
    if query_ids is not None:
        q = q.where(F.col("query_id").isin(query_ids))
    pairs = norms.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_expr(int_dot(F.col("qvec"), F.col("vec")), F.col("qn2"), F.col("n2")).alias(
            "cos_raw"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos_raw"), 6).alias("cosine"),
            F.col("rn").cast("int").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


def near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.9, vec_col: str = "embedding"
) -> DataFrame:
    """All pairs with cosine >= threshold (exact, quadratic — verifier
    for LSH candidates; bench path uses lsh_ann buckets first)."""
    embeddings = _spread(embeddings)
    norms = embeddings.select(
        F.col("vec_id"), F.col(vec_col).alias("vec"), int_norm2(F.col(vec_col)).alias("n2")
    )
    a = norms.select(
        F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"), F.col("n2").alias("na")
    )
    b = norms.select(
        F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"), F.col("n2").alias("nb")
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = cosine_expr(int_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cos_raw"))
        .where(F.col("cos_raw") >= threshold)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


# ---- LSH ANN (scale path) ------------------------------------------


def _hyperplane_sign(vec: Column, table: int, plane: int) -> Column:
    """Sign of <vec, r> where r[i] = ±1 derived from
    xxhash64(table, plane, i) — a deterministic random hyperplane,
    independent per (table, plane)."""
    signed = F.transform(
        vec,
        lambda x, i: F.when(
            F.xxhash64(F.lit(table), F.lit(plane), i).bitwiseAND(F.lit(1)) == 1,
            _iscale(x),
        ).otherwise(-_iscale(x)),
    )
    total = F.aggregate(signed, F.lit(0).cast("long"), lambda acc, v: acc + v)
    return (total >= 0).cast("long")


def lsh_bucket(vec: Column, n_planes: int = 8, table: int = 0) -> Column:
    """n-bit random-hyperplane sketch -> bucket id (one hash table)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        bucket = bucket * 2 + _hyperplane_sign(vec, table, p)
    return bucket


def lsh_buckets(vec: Column, n_planes: int, n_tables: int) -> Column:
    """array of (table, bucket) structs — one sketch per hash table.

    AND over ``n_planes`` bits within a table (precision), OR across
    ``n_tables`` tables (recall): the same AND/OR amplification as
    MinHash banding. A single table has no recall knob — a true
    neighbor that flips one of its 8 bits is lost forever; with L
    tables it is found unless it misses in every one.

    JVM/expression form — fine for a handful of planes; the hot path
    (:func:`lsh_sketch_np`) computes the same structure as one BLAS
    matmul per Arrow batch, because L*b interpreted higher-order-
    function passes per vector dominate runtime long before the hash
    math does.
    """
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                lsh_bucket(vec, n_planes, t).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )


def lsh_sketch_np(
    embeddings: DataFrame,
    n_planes: int,
    n_tables: int,
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """(vec_id, table, bucket) via one matmul per Arrow batch.

    The plane matrix R (d x L*b, entries ±1) derives from a fixed-seed
    Mersenne Twister — deterministic run-to-run and machine-to-machine.
    sign(X @ R) yields every table's every bit in a single BLAS call;
    bits pack into per-table bucket ids. At 100 TB this is the shape
    that survives: R is broadcast once inside the closure and each
    executor does (batch x d) @ (d x L*b).
    """
    import numpy as np
    import pandas as pd

    total = n_planes * n_tables

    def run(batches):
        R = None
        for pdf in batches:
            mat = np.array([list(v) for v in pdf["emb"]], dtype=np.float64)
            if R is None:
                d = mat.shape[1]
                rng = np.random.RandomState(seed)
                R = rng.randint(0, 2, size=(d, total)) * 2 - 1
            bits = (mat @ R) >= 0  # (batch, L*b)
            weights = 1 << np.arange(n_planes - 1, -1, -1)
            buckets = bits.reshape(-1, n_tables, n_planes) @ weights  # (batch, L)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].values, n_tables),
                    "table": np.tile(np.arange(n_tables), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    return (
        _spread(embeddings)
        .select("vec_id", F.col(vec_col).alias("emb"))
        .mapInPandas(run, "vec_id long, table int, bucket long")
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only pairs sharing a bucket in ANY of
    ``n_tables`` hyperplane hash tables (OR-amplification).

    Recall/cost knobs: more planes = smaller buckets = fewer candidates
    (precision); more tables = more chances to catch a true neighbor
    (recall). Defaults 6/8 measure >=0.9 recall@10 vs exact cosine on
    the synthetic embeddings. The per-table bucket join replaces the
    cross product, and candidate pairs are deduplicated BEFORE scoring,
    so each pair is scored once no matter how many tables matched — at
    100x corpus growth the cost is (candidates x d), never N^2.

    The sketch table is MATERIALIZED once (localCheckpoint) before the
    bucket self-join — the broadcast query side would otherwise
    recompute the full corpus sketch (the self-join recompute trap,
    docs/SCALING.md #4). Candidate scoring stays on the exact-int JVM
    path deliberately: it is the SAME scoring expression as
    :func:`cosine_topk`, so any (query, neighbor) pair the two paths
    share carries a bit-identical cosine (pinned by
    tests/test_operators.py) — a BLAS variant measured only ~0.15s
    faster at sf0.1 and loses that property to ulps.
    """
    embeddings = _spread(embeddings)
    sketches = lsh_sketch_np(embeddings, n_planes, n_tables, vec_col).localCheckpoint(
        eager=True
    )
    q = sketches.select(
        F.col("vec_id").alias("query_id"),
        F.col("table").alias("qtable"),
        F.col("bucket").alias("qbucket"),
    )
    if query_ids is not None:
        q = q.where(F.col("query_id").isin(query_ids))
    # candidate ids per query, deduped across tables before any scoring
    cand = (
        sketches.join(
            F.broadcast(q),
            (F.col("table") == F.col("qtable"))
            & (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id")
        .distinct()
    )
    corpus = embeddings.select(
        F.col("vec_id"), F.col(vec_col).alias("vec"), int_norm2(F.col(vec_col)).alias("n2")
    )
    qvecs = corpus.select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"), F.col("n2").alias("qn2")
    )
    if query_ids is not None:
        qvecs = qvecs.where(F.col("query_id").isin(query_ids))
    scored = (
        cand.join(corpus, "vec_id")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_expr(
                int_dot(F.col("qvec"), F.col("vec")), F.col("qn2"), F.col("n2")
            ).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos_raw"), 6).alias("cosine"),
            F.col("rn").cast("int").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


# ---- IVF ANN (alternative scale path) -------------------------------


def ivf_train(
    embeddings: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 3,
    vec_col: str = "embedding",
) -> DataFrame:
    """Spherical k-means (Lloyd) with deterministic seeding.

    Init = the ``n_centroids`` lowest-vec_id vectors; each iteration
    broadcasts the (k x d) centroid matrix, assigns every vector to its
    max-cosine centroid JVM-side, and recomputes each centroid as the
    element-wise mean of its members (one groupBy over exploded
    positions). Only the k x d centroid matrix visits the driver per
    iteration — the classic distributed k-means shape; at 100 TB each
    iteration is one broadcast + one shuffle of k*d partial sums per
    partition (map-side combined), never a vector collect. No RNG
    anywhere, so the trained model is reproducible run-to-run.

    Returns (cent_id int, cvec array<double>) — empty clusters keep
    their previous centroid.
    """
    spark = embeddings.sparkSession
    base = _spread(embeddings).select("vec_id", F.col(vec_col).alias("vec"))
    cents = [
        [float(x) for x in r.vec]
        for r in base.orderBy("vec_id").limit(n_centroids).collect()
    ]
    for _ in range(n_iters):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cent_id int, cvec array<double>"
        )
        pairs = base.join(F.broadcast(cdf)).select(
            "vec_id",
            "vec",
            "cent_id",
            cosine_expr(
                int_dot(F.col("vec"), F.col("cvec")),
                int_norm2(F.col("vec")),
                int_norm2(F.col("cvec")),
            ).alias("ccos"),
        )
        wv = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
        assigned = pairs.withColumn("rn", F.row_number().over(wv)).where(F.col("rn") == 1)
        means = (
            assigned.select("cent_id", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cent_id", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cent: dict[int, dict[int, float]] = {}
        for r in means:
            by_cent.setdefault(r.cent_id, {})[r.pos] = r.m
        for cid, dims in by_cent.items():
            cents[cid] = [dims[p] for p in sorted(dims)]
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cent_id int, cvec array<double>"
    )


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-flat assignment against trained (or supplied) centroids.

    Centroids come from :func:`ivf_train` (deterministic k-means) unless
    a ``(cent_id, cvec)`` DataFrame is passed in. The centroid set is
    broadcast and assignment is one map-side pass; the posting lists
    (centroid -> members) are the inverted file.
    """
    embeddings = _spread(embeddings)
    base = embeddings.select(
        "vec_id", F.col(vec_col).alias("vec"), int_norm2(F.col(vec_col)).alias("n2")
    )
    if centroids is None:
        centroids = ivf_train(embeddings, n_centroids, vec_col=vec_col)
    cents = centroids.select(
        "cent_id", "cvec", int_norm2(F.col("cvec")).alias("cn2")
    )
    scored = base.join(F.broadcast(cents)).select(
        "vec_id",
        "vec",
        "n2",
        "cent_id",
        cosine_expr(int_dot(F.col("vec"), F.col("cvec")), F.col("n2"), F.col("cn2")).alias(
            "ccos"
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "vec", "n2", "cent_id")
    )


def ivf_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via inverted-file probing: each query scores
    only the members of its ``n_probe`` closest centroid lists —
    |Q| x (n_probe/n_centroids) x |corpus| work instead of the full
    cross product. Recall rises with n_probe (== exact when
    n_probe == n_centroids). Centroids are k-means-trained
    (deterministically) so posting lists reflect the data's actual
    cluster structure, not an arbitrary seed sample."""
    centroids = ivf_train(embeddings, n_centroids, vec_col=vec_col)
    assigned = ivf_assign(embeddings, n_centroids, vec_col, centroids=centroids)
    base = _spread(embeddings).select(
        "vec_id", F.col(vec_col).alias("vec"), int_norm2(F.col(vec_col)).alias("n2")
    )
    cents = centroids.select("cent_id", "cvec", int_norm2(F.col("cvec")).alias("cn2"))
    q = base.select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"), F.col("n2").alias("qn2")
    )
    if query_ids is not None:
        q = q.where(F.col("query_id").isin(query_ids))
    # per query: its n_probe closest centroids
    qc = q.join(F.broadcast(cents)).select(
        "query_id",
        "qvec",
        "qn2",
        "cent_id",
        cosine_expr(int_dot(F.col("qvec"), F.col("cvec")), F.col("qn2"), F.col("cn2")).alias(
            "ccos"
        ),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qvec", "qn2", "cent_id")
    )
    # score only members of the probed lists
    cands = probes.join(assigned, "cent_id").where(F.col("vec_id") != F.col("query_id"))
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_expr(int_dot(F.col("qvec"), F.col("vec")), F.col("qn2"), F.col("n2")).alias(
            "cos_raw"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos_raw"), 6).alias("cosine"),
            F.col("rn").cast("int").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


# ---- vectorized Pandas-UDF path -------------------------------------


def cosine_topk_np(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 10,
    vec_col: str = "embedding",
    exact_int: bool = False,
    max_query_rows: int = 10_000,
) -> DataFrame:
    """Exact top-k via numpy matmul inside mapInPandas — the vectorized
    Python alternative to the JVM zip_with/aggregate path.

    The (small) query matrix ships inside the closure; each Arrow batch
    of corpus vectors scores against all queries with one BLAS matmul.
    ~10-100x fewer interpreter ops than per-element lambdas.

    ``exact_int=True`` quantizes components with the SAME round(x*1e6)
    rule as the JVM ``int_dot`` path before the matmul; integer-valued
    float64 products are exact while ``d * (SCALE*max|x|)^2 < 2^53``
    (d=64 unit-ish vectors: ~2e13, comfortably inside), so scores equal
    ``cosine_topk`` / the DuckDB oracle bit-for-bit. The default float
    path is for serving: summation order differs from the sequential
    JVM fold by ulps (~1e-12; rank ties broken identically).

    Scale guard: the query matrix is built with a driver ``collect``.
    With ``query_ids=None`` that would collect the WHOLE table — a
    driver OOM at 100 TB — so unbounded calls are rejected above
    ``max_query_rows`` rows; route big all-pairs jobs to ``cosine_topk``
    (JVM broadcast) or ``lsh_ann_topk`` / ``near_dup_pairs`` instead.
    """
    import numpy as np
    import pandas as pd

    q_df = (
        embeddings.where(F.col("vec_id").isin(query_ids))
        if query_ids is not None
        else embeddings
    ).select("vec_id", vec_col)
    if query_ids is None:
        n = q_df.limit(max_query_rows + 1).count()
        if n > max_query_rows:
            raise ValueError(
                f"cosine_topk_np with query_ids=None would collect the full "
                f"embeddings table (> {max_query_rows} rows) to the driver; "
                "pass query_ids, raise max_query_rows explicitly, or use the "
                "distributed cosine_topk / lsh_ann_topk paths"
            )
    q_rows = q_df.collect()

    def quant(m: "np.ndarray") -> "np.ndarray":
        # Spark F.round / DuckDB round: half AWAY from zero. Neither
        # np.round (half-to-even) nor floor(v+0.5) is equivalent — the
        # latter fails at v = 0.49999999999999994 (largest double < .5),
        # where v+0.5 rounds UP to exactly 1.0 and floor gives 1 while
        # HALF_UP gives 0. Compare the fractional part in exact binary
        # instead: frac = v - floor(v) is exact for |v| < 2^52, and the
        # >= 0.5 test matches both engines' decision on the true double.
        v = m * float(SCALE)
        f = np.floor(v)
        up = np.where(v - f >= 0.5, f + 1.0, f)  # half-up for v >= 0
        c = np.ceil(v)
        dn = np.where(c - v >= 0.5, c - 1.0, c)  # half-down->away for v < 0
        return np.where(v >= 0, up, dn)

    q_ids = np.array([r.vec_id for r in q_rows])
    q_mat = np.array([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    if exact_int:
        q_mat = quant(q_mat)
    q_norm = np.linalg.norm(q_mat, axis=1)

    def run(batches):
        for pdf in batches:
            mat = np.array([list(v) for v in pdf["emb"]], dtype=np.float64)
            if exact_int:
                mat = quant(mat)
            norms = np.linalg.norm(mat, axis=1)
            sims = (mat @ q_mat.T) / np.outer(norms, q_norm)  # (batch, nq)
            n_rows, n_q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n_rows),
                    "neighbor_id": np.tile(pdf["vec_id"].values, n_q),
                    "cos_raw": sims.T.reshape(-1),
                }
            )

    spread = _spread(embeddings)
    scored = (
        spread.select("vec_id", F.col(vec_col).alias("emb"))
        .mapInPandas(run, "query_id long, neighbor_id long, cos_raw double")
        .where(F.col("neighbor_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cos_raw"), 6).alias("cosine"),
            F.col("rn").cast("int").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )
