"""Byte-pair encoding: a real trained subword tokenizer (roadmap #5 —
replaces the regex approximation ``text.n_bpe_tokens`` for workloads
that need an actual vocabulary).

Two halves, both engine-idiomatic:

- **Training** (:func:`bpe_train`) is the classic BPE algorithm
  (Sennrich, Haddow, Birch 2016, "Neural Machine Translation of Rare
  Words with Subword Units") run
  as Spark aggregations: the corpus collapses to a ``(word, count)``
  dictionary ONCE (one shuffle), then each merge iteration is a
  pair-count ``groupBy`` over the dictionary (map-side combinable) plus
  a JVM higher-order-function fold that applies the winning merge to
  the symbol arrays. Only the single winning pair visits the driver per
  iteration; the dictionary stays distributed and is re-materialized
  per iteration (``localCheckpoint``) so the plan doesn't grow with the
  merge count — the same lazy-self-reference trap fixed in
  ``dedup.minhash_lsh_candidates``.
- **Application** (:func:`bpe_tokens_col`) is pure column expressions:
  per word, render the token stream fully space-delimited (every token
  wrapped — see the function docstring for why the delimitation is
  load-bearing), then apply the learned merges in rank order as chained
  ``replace`` calls (leftmost non-overlapping — exactly the trainer's
  fold semantics). No Python in the hot path; at 100 TB this is
  whole-stage codegen on the scan, shuffle-free, linear.

Determinism: merge selection tiebreaks on (count DESC, left ASC, right
ASC); application order is merge rank. Both are total orders, so
training is reproducible and application is bit-identical across
engines — :data:`PINNED_MERGES` ships a vocabulary learned from the
sf0.001 documents corpus, and the ``ns_bpe_tokens`` catalog entry's
DuckDB oracle replays the identical chained replaces.

Convention note (documented divergence from marker-based BPE): no
end-of-word marker is appended; merges never cross word boundaries
because words are pre-split before pairing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "bpe_train", "bpe_tokens_col", "bpe_tokens", "bpe_token_count_sql",
    "token_fertility_by_lang", "token_fertility_oracle_sql",
    "PINNED_MERGES",
]


_WORD_RE = "[^ ]+"  # corpus words are space-separated (text.py convention)


def _chars(word: Column) -> Column:
    # (?s): DOTALL, so words containing newlines/controls still split
    # to their full char sequence (round-trip invariant holds on any
    # space-separated text, not just the clean corpus)
    return F.regexp_extract_all(word, F.lit("(?s)."), 0)


def _fold_merge(symbols: Column, left: str, right: str) -> Column:
    """Apply one merge to a symbol array: leftmost non-overlapping fold."""
    merged = left + right
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a corpus, distributed.

    The corpus is collapsed to its ``(symbols, count)`` word dictionary
    up front; every subsequent iteration runs over that (much smaller)
    dictionary. Stops early when no pair reaches ``min_freq``.
    """
    words = (
        docs.select(
            F.explode(F.regexp_extract_all(F.col(text_col), F.lit(_WORD_RE), 0)).alias(
                "word"
            )
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .select(_chars(F.col("word")).alias("symbols"), "cnt")
        .localCheckpoint()
    )

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        n = F.size("symbols")
        pairs = (
            words.where(n >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice("symbols", 1, n - 1).alias("a"),
                        F.slice("symbols", 2, n - 1).alias("b"),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), "a", "b")
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["freq"] < min_freq:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))
        # materialize: keeps the per-iteration plan flat (no n_merges-deep
        # lineage re-executed by every later pair count)
        words = words.select(
            _fold_merge(F.col("symbols"), a, b).alias("symbols"), "cnt"
        ).localCheckpoint()
    return merges


def bpe_tokens_col(text: Column, merges: list[tuple[str, str]]) -> Column:
    """``array<string>`` of BPE tokens for a text column — pure JVM.

    Per word: render the token stream in DELIMITED form — every token
    wrapped in single spaces, so adjacent tokens are separated by
    exactly two (`` a  b ``) — then apply merges in rank order as
    chained global replaces of `` a  b `` -> `` ab ``, and split back
    on the double-space boundary.

    The full delimitation is load-bearing: the earlier bare
    space-join form let ``replace("a b", ...)`` match ACROSS a token
    boundary when the right symbol was a prefix of the next token
    (tokens ``[a, ba]`` render ``"a ba"`` and contain ``"a b"``),
    silently merging pairs the trainer's fold never would. With both
    tokens fully flanked, a match requires exactly the two whole
    tokens, and leftmost non-overlapping replacement reproduces the
    fold's greedy left-to-right semantics (each match's replacement
    `` ab `` restores the wrap invariant, so consecutive pairs still
    match — ``tests/test_bpe.py`` pins the adversarial cases).
    """

    def apply_word(w: Column) -> Column:
        s = F.regexp_replace(w, "(?s)(.)", " $1 ")
        for a, b in merges:
            s = F.replace(s, F.lit(f" {a}  {b} "), F.lit(f" {a + b} "))
        return F.split(F.trim(s), "  ")

    return F.flatten(
        F.transform(F.regexp_extract_all(text, F.lit(_WORD_RE), 0), apply_word)
    )


def bpe_tokens(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    head: int = 12,
) -> DataFrame:
    """Per-document BPE stats: real token count + the head of the token
    stream (pipe-joined — list columns don't canonicalize cross-engine)."""
    toks = bpe_tokens_col(F.col(text_col), merges)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_real_tokens"),
        F.concat_ws("|", F.slice(toks, 1, head)).alias("head_tokens"),
    )


def bpe_token_count_sql(
    merges: list[tuple[str, str]], text_expr: str = "text"
) -> str:
    """DuckDB expression: REAL BPE token count of ``text_expr`` under
    ``merges`` — the per-doc count :func:`bpe_tokens_col` + ``F.size``
    produce, as a scalar SQL expression (used by the real-token budget
    variant of ``sampling.mixture_plan_capped_oracle_sql``)."""
    inner = rf"regexp_replace(w, '(?s)(.)', ' \1 ', 'g')"
    for a, b in merges:
        inner = f"replace({inner}, ' {a}  {b} ', ' {a}{b} ')"
    return (
        f"len(flatten(list_transform(regexp_extract_all({text_expr}, "
        f"'[^ ]+'), w -> str_split(trim({inner}), '  '))))"
    )


def bpe_oracle_sql(
    merges: list[tuple[str, str]], table: str = "documents", head: int = 12
) -> str:
    """DuckDB SQL replaying the identical tokenization (oracle side) —
    the same delimited representation as :func:`bpe_tokens_col`."""
    inner = r"regexp_replace(w, '(?s)(.)', ' \1 ', 'g')"
    for a, b in merges:
        inner = f"replace({inner}, ' {a}  {b} ', ' {a}{b} ')"
    return f"""
    SELECT doc_id,
      CAST(len(toks) AS BIGINT) AS n_bpe_real_tokens,
      array_to_string(toks[1:{head}], '|') AS head_tokens
    FROM (
      SELECT doc_id,
        flatten(list_transform(regexp_extract_all(text, '[^ ]+'),
                w -> str_split(trim({inner}), '  '))) AS toks
      FROM {table}
    ) ORDER BY doc_id
    """


#: Vocabulary learned by ``bpe_train`` over /root/testdata/sf0.001
#: documents (n_merges=32, min_freq=2) — pinned so the catalog entry is
#: cross-engine checkable; ``tests/test_bpe.py`` re-derives it from the
#: corpus to prove the trainer is deterministic.
PINNED_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an"),
    ("s", "can"), ("c", "o"), ("co", "lu"), ("colu", "m"), ("colum", "n"),
    ("d", "ow"), ("in", "dow"), ("w", "indow"), ("d", "er"), ("or", "der"),
    ("or", "t"), ("s", "ort"), ("par", "t"), ("u", "p"), ("a", "g"),
    ("ag", "g"), ("a", "lu"), ("alu", "e"), ("v", "alue"), ("in", "e"),
]


def token_fertility_by_lang(
    docs: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Tokenizer fertility per language — the standard multilingual
    vocabulary-coverage diagnostic (a tokenizer trained on one
    language pays 2-4x more tokens per word on unseen scripts; recipe
    planners budget per-language token costs from exactly this table).

    Per language: document count, total chars / whitespace words /
    REAL trained-BPE tokens (:func:`bpe_tokens_col` under ``merges``,
    default :data:`PINNED_MERGES`), and the two fertility ratios in
    exact micro-units (DECIMAL(38,0) widening before the integral
    divide — char counts pass int64 well below the 100 TB posture):

        chars_per_token_micro  = chars  * 1e6 div bpe_tokens
        tokens_per_word_micro  = tokens * 1e6 div words

    One aggregation pass (map-side combinable; keys = languages), the
    merge fold riding as chained JVM replaces at scan speed."""
    if merges is None:
        merges = PINNED_MERGES
    per_doc = docs.select(
        F.col(lang_col).alias("lang"),
        F.length(F.col(text_col)).cast("long").alias("chars"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[^ ]+"), 0))
        .cast("long")
        .alias("words"),
        F.size(bpe_tokens_col(F.col(text_col), merges))
        .cast("long")
        .alias("toks"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("chars").cast("long").alias("chars"),
            F.sum("words").cast("long").alias("words"),
            F.sum("toks").cast("long").alias("bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "chars",
            "words",
            "bpe_tokens",
            F.expr(
                "CAST(CAST(chars AS DECIMAL(38,0)) * 1000000 "
                "div bpe_tokens AS BIGINT)"
            ).alias("chars_per_token_micro"),
            F.expr(
                "CAST(CAST(bpe_tokens AS DECIMAL(38,0)) * 1000000 "
                "div words AS BIGINT)"
            ).alias("tokens_per_word_micro"),
        )
    )


def token_fertility_oracle_sql(
    merges: list[tuple[str, str]] | None = None,
) -> str:
    """DuckDB replay: per-language sums with the merge fold applied
    per document via :func:`bpe_token_count_sql`."""
    if merges is None:
        merges = PINNED_MERGES
    toks = bpe_token_count_sql(merges)
    return f"""
    WITH per_doc AS (
      SELECT lang, CAST(length(text) AS BIGINT) AS chars,
        CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS words,
        CAST({toks} AS BIGINT) AS toks
      FROM documents
    ),
    agg AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(chars) AS BIGINT) AS chars,
        CAST(sum(words) AS BIGINT) AS words,
        CAST(sum(toks) AS BIGINT) AS bpe_tokens
      FROM per_doc GROUP BY lang
    )
    SELECT lang, n_docs, chars, words, bpe_tokens,
      CAST(CAST(chars AS HUGEINT) * 1000000 // bpe_tokens AS BIGINT)
        AS chars_per_token_micro,
      CAST(CAST(bpe_tokens AS HUGEINT) * 1000000 // words AS BIGINT)
        AS tokens_per_word_micro
    FROM agg ORDER BY lang
    """
