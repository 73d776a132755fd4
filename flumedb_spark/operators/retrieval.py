"""Ranked retrieval over the documents table — BM25 (Robertson &
Zaragoza 2009, "The Probabilistic Relevance Framework: BM25 and
Beyond", Found. Trends IR 3(4)), the scoring function the reference's
flumeview-search AND-intersection (README.md:95) stops short of: not
just *which* docs match, but which match *best*.

Arithmetic discipline (the repo's oracle standard): BM25's only
irrational step is the per-term IDF log — it is quantized to integer
micro-nats ONCE per term (vocabulary granularity, same device as
operators/text.unigram_logprob). Everything after that is exact
integers: with rational k1 = K1N/K1D and b = BN/BD, the per-(doc,term)
contribution

    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),   avgdl = T/N

multiplies out (num and den scaled by K1D*BD*T) to

    idf_micro * tf * (K1N+K1D)*BD*T
    --------------------------------------------------
    K1D*BD*T*tf + K1N*(BD-BN)*T + K1N*BN*dl*N

— a ratio of two BIGINTs, evaluated with one IEEE double division
(correctly rounded, engine-identical) and re-quantized to micro-units
before the per-doc sum, so the accumulated score is exact BIGINT math
and order-independent.

100 TB shape: one token explode feeding two aggregates (df per term,
tf per doc,term — both map-side combinable), a one-row corpus-stats
aggregate broadcast by crossJoin, and a per-query top-k. The query
side is a handful of terms, so the tf table is pre-filtered by an
`isin` pushed into the scan; no join touches the full corpus twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# k1 = 1.2, b = 0.75 as exact rationals (the canonical defaults)
K1N, K1D = 6, 5
BN, BD = 3, 4


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 15,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 over whitespace tokens (OR
    semantics; ties broken by doc_id). Returns
    (rank, doc_id, n_terms, score_micro, score)."""
    terms = sorted(set(terms))
    words = F.split(F.col(text_col), " ")
    base = docs.where(F.size(words) >= 1).select(
        "doc_id", words.alias("_w")
    )
    tok = base.select(
        "doc_id", F.size("_w").alias("dl"), F.explode("_w").alias("w")
    )
    # corpus stats: one row (n docs, total tokens) — broadcast via crossJoin
    stats = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size("_w")).cast("long").alias("t_tokens"),
    )
    # per-term document frequency -> IDF in integer micro-nats
    dfreq = (
        tok.where(F.col("w").isin(terms))
        .groupBy("w")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        .crossJoin(F.broadcast(stats).select("n_docs"))
        .select(
            "w",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * 1_000_000
            )
            .cast("long")
            .alias("idf_micro"),
        )
    )
    tf = (
        tok.where(F.col("w").isin(terms))
        .groupBy("doc_id", "dl", "w")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    c_num = (K1N + K1D) * BD  # 44
    c_tf = K1D * BD  # 20
    c_t = K1N * (BD - BN)  # 6
    c_dl = K1N * BN  # 18
    contrib = (
        tf.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "w",
            F.round(
                (
                    F.col("idf_micro") * F.col("tf") * F.lit(c_num) * F.col("t_tokens")
                ).cast("double")
                / (
                    F.lit(c_tf) * F.col("t_tokens") * F.col("tf")
                    + F.lit(c_t) * F.col("t_tokens")
                    + F.lit(c_dl) * F.col("dl") * F.col("n_docs")
                ).cast("double")
            )
            .cast("long")
            .alias("c_micro"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.countDistinct("w").cast("long").alias("n_terms"),
        F.sum("c_micro").cast("long").alias("score_micro"),
    )
    from pyspark.sql.window import Window

    # orderBy().limit(k) compiles to TakeOrderedAndProject — per-partition
    # partial top-k merged on the driver, never a single-partition global
    # sort; the rank window then runs over k rows only.
    top = scored.orderBy(F.col("score_micro").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "doc_id",
        "n_terms",
        "score_micro",
        F.round(F.col("score_micro") / 1_000_000.0, 6).alias("score"),
    ).orderBy("rank")


def bm25_oracle_sql(terms: list[str], k: int = 15) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical integer constants,
    identical quantization points."""
    terms = sorted(set(terms))
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    c_num = (K1N + K1D) * BD
    c_tf = K1D * BD
    c_t = K1N * (BD - BN)
    c_dl = K1N * BN
    return f"""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      WHERE len(string_split(text, ' ')) >= 1
    ),
    tok AS (
      SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, unnest(ws) AS w FROM base
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(ws)) AS BIGINT) AS t_tokens
      FROM base
    ),
    dfreq AS (
      SELECT w, CAST(round(ln(
          (s.n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1000000) AS BIGINT)
        AS idf_micro
      FROM (
        SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok WHERE w IN ({in_list}) GROUP BY w
      ) d, stats s
    ),
    tf AS (
      SELECT doc_id, dl, w, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE w IN ({in_list}) GROUP BY doc_id, dl, w
    ),
    contrib AS (
      SELECT t.doc_id, t.w,
        CAST(round(
          CAST(d.idf_micro * t.tf * {c_num} * s.t_tokens AS DOUBLE)
          / CAST({c_tf} * s.t_tokens * t.tf + {c_t} * s.t_tokens
                 + {c_dl} * t.dl * s.n_docs AS DOUBLE)
        ) AS BIGINT) AS c_micro
      FROM tf t JOIN dfreq d USING (w), stats s
    ),
    scored AS (
      SELECT doc_id, CAST(count(DISTINCT w) AS BIGINT) AS n_terms,
             CAST(sum(c_micro) AS BIGINT) AS score_micro
      FROM contrib GROUP BY doc_id
    )
    SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS INT)
        AS rank,
      doc_id, n_terms, score_micro,
      round(score_micro / 1000000.0, 6) AS score
    FROM scored
    ORDER BY score_micro DESC, doc_id
    LIMIT {k}
    """
