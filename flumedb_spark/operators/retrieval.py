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

100 TB shape: zero data-sized shuffles. Per-term tf is a per-row JVM
array expression (size(filter(words, == term)) — the query has a
handful of terms, so no token explode and no (doc, term) shuffle is
ever needed); corpus stats AND per-term document frequencies come from
ONE one-row aggregate (map-side combined to a row per partition),
broadcast back by crossJoin; the top-k compiles to
TakeOrderedAndProject. The only rows that cross the network are one
stats row per partition and k results.
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
    (rank, doc_id, n_terms, score_micro, score).

    Zero data-sized shuffles: per-term tf is ``size(filter(words, ==
    term))`` — a per-row JVM array expression, no token explode — so
    the whole computation is (scan -> one-row stats aggregate ->
    broadcast back -> scan of the materialized tf table ->
    TakeOrderedAndProject). The only rows that ever cross the network
    are the one stats row and k results.

    r10 OPTIMIZATION (guide §2.4 / the materialization device): the
    per-doc tf projection feeds BOTH the stats aggregate and the
    scoring pass, and Spark re-executes a lazily shared subtree once
    per reference — i.e. the text was split and term-filtered TWICE.
    The projection is all-integer and term-count narrow (doc_id, dl,
    one tf per term), so it is localCheckpointed once and both
    consumers read the materialized rows.
    """
    terms = sorted(set(terms))
    words = F.split(F.col(text_col), " ")

    def _tf(term: str):
        # NB: single-parameter lambda — a second (defaulted) parameter
        # would make pyspark pass the array INDEX into it
        return F.size(F.filter("_w", lambda w: w == F.lit(term)))

    tf_cols = [
        _tf(t).cast("long").alias(f"_tf{i}") for i, t in enumerate(terms)
    ]
    pt = (
        docs.where(F.size(words) >= 1)
        .select("doc_id", words.alias("_w"))
        .select("doc_id", F.size("_w").cast("long").alias("dl"), *tf_cols)
        .localCheckpoint(eager=True)
    )
    # corpus stats + per-term df: ONE one-row aggregate, broadcast back
    stats = pt.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("t_tokens"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    c_num = (K1N + K1D) * BD  # 44
    c_tf = K1D * BD  # 20
    c_t = K1N * (BD - BN)  # 6
    c_dl = K1N * BN  # 18

    def idf_micro(i: int):
        return F.round(
            F.log(
                (F.col("n_docs") - F.col(f"_df{i}") + F.lit(0.5))
                / (F.col(f"_df{i}") + F.lit(0.5))
                + F.lit(1.0)
            )
            * 1_000_000
        ).cast("long")

    def contrib(i: int):
        tf = F.col(f"_tf{i}")
        return F.when(
            tf > 0,
            F.round(
                (idf_micro(i) * tf * F.lit(c_num) * F.col("t_tokens")).cast("double")
                / (
                    F.lit(c_tf) * F.col("t_tokens") * tf
                    + F.lit(c_t) * F.col("t_tokens")
                    + F.lit(c_dl) * F.col("dl") * F.col("n_docs")
                ).cast("double")
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    n_terms = sum(
        ((F.col(f"_tf{i}") > 0).cast("long") for i in range(len(terms))),
        F.lit(0).cast("long"),
    )
    score = sum((contrib(i) for i in range(len(terms))), F.lit(0).cast("long"))
    scored = (
        pt.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            n_terms.alias("n_terms"),
            score.alias("score_micro"),
        )
        .where(F.col("n_terms") > 0)
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
