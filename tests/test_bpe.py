"""Trained BPE tokenizer (operators/bpe.py): trainer determinism,
fold/replace application equivalence, round-trip, and the oracle parity
of the pinned-vocabulary catalog entry."""

import duckdb
import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators.bpe import (
    PINNED_MERGES,
    _fold_merge,
    bpe_oracle_sql,
    bpe_tokens,
    bpe_tokens_col,
    bpe_train,
)

SF0001 = "/root/testdata/sf0.001"


def test_trainer_reproduces_pinned_vocab(spark):
    # the pinned merges ARE bpe_train's output on the sf0.001 corpus —
    # deterministic tiebreaks make training reproducible run-to-run
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    assert bpe_train(docs, n_merges=32, min_freq=2) == PINNED_MERGES


def test_apply_matches_trainer_fold(spark):
    # chained-replace application == the trainer's fold-merge, symbol
    # for symbol (both are leftmost-non-overlapping in merge rank order)
    merges = [("e", "r"), ("m", "er"), ("a", "a")]
    words = ["merge", "merger", "aaa", "aaaa", "x", "", "ramer"]
    df = spark.createDataFrame([(w,) for w in words if w], ["w"])
    via_replace = df.select(
        "w", bpe_tokens_col(F.col("w"), merges).alias("toks")
    )
    folded = F.regexp_extract_all(F.col("w"), F.lit("."), 0)
    for a, b in merges:
        folded = _fold_merge(folded, a, b)
    via_fold = df.select("w", folded.alias("toks"))
    assert {r.w: r.toks for r in via_replace.collect()} == {
        r.w: r.toks for r in via_fold.collect()
    }


def test_roundtrip_and_bounds(spark):
    # tokens concatenate back to the de-spaced text; counts are bounded
    # by chars above and words below
    docs = spark.read.parquet(f"{SF0001}/documents.parquet").limit(50)
    toks = bpe_tokens_col(F.col("text"), PINNED_MERGES)
    r = docs.select(
        (
            F.concat_ws("", toks) == F.regexp_replace("text", " ", "")
        ).alias("roundtrip"),
        (F.size(toks) <= F.length(F.regexp_replace("text", " ", ""))).alias("ub"),
        (
            F.size(toks) >= F.array_size(F.regexp_extract_all("text", F.lit("[^ ]+"), 0))
        ).alias("lb"),
    ).collect()
    assert all(x.roundtrip and x.ub and x.lb for x in r)


def test_merges_reduce_token_count(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet").limit(50)
    n_none = docs.select(
        F.sum(F.size(bpe_tokens_col(F.col("text"), []))).alias("n")
    ).first()["n"]
    n_all = docs.select(
        F.sum(F.size(bpe_tokens_col(F.col("text"), PINNED_MERGES))).alias("n")
    ).first()["n"]
    assert n_all < n_none  # a trained vocab compresses its own corpus


def test_catalog_entry_matches_duckdb_oracle(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    got = {
        r.doc_id: (r.n_bpe_real_tokens, r.head_tokens)
        for r in bpe_tokens(docs, PINNED_MERGES).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF0001}/documents.parquet')"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(bpe_oracle_sql(PINNED_MERGES)).fetchall()
    }
    assert got == want


def test_roundtrip_on_adversarial_corpus(spark):
    # random-ish + edge-case words: control chars (DOTALL), 1-char
    # words, long repeats, merge-overlap chains — round-trip must hold
    # for ANY space-separated text, with any merge list
    import random

    rng = random.Random(7)
    words = ["a", "\n", "ab\ncd", "aaaaaaaa", "ababab", "x" * 40] + [
        "".join(rng.choice("abcz\t.") for _ in range(rng.randint(1, 12)))
        for _ in range(40)
    ]
    text = " ".join(words)
    df = spark.createDataFrame([(text,)], ["text"])
    for merges in ([], [("a", "b"), ("ab", "ab"), ("a", "a")], PINNED_MERGES):
        toks = bpe_tokens_col(F.col("text"), merges)
        r = df.select(
            (F.concat_ws("", toks) == F.regexp_replace("text", " ", "")).alias("ok")
        ).first()
        assert r.ok, f"round-trip broke with merges={merges[:3]}..."


def test_train_early_stops_below_min_freq(spark):
    df = spark.createDataFrame([("ab cd",)], ["text"])
    # every pair occurs once -> min_freq=2 stops immediately
    assert bpe_train(df, n_merges=8, min_freq=2) == []


def test_apply_never_merges_across_token_boundaries(spark):
    """Regression for the bare space-join replace bug: with merges
    [('b','a'), ('a','b')] on 'abab', the first merge yields tokens
    [a, ba, b]; the second merge's pattern must NOT match the 'a'
    followed by the PREFIX of token 'ba'. The fold semantics are the
    ground truth."""
    from pyspark.sql import functions as F

    from flumedb_spark.operators.bpe import _chars, _fold_merge, bpe_tokens_col

    cases = [
        ("abab", [("b", "a"), ("a", "b")]),
        ("aaa", [("a", "a")]),
        ("aaaa", [("a", "a")]),
        ("abab", [("a", "b")]),
        ("aabba", [("a", "b"), ("ab", "b")]),
    ]
    for text, merges in cases:
        df = spark.createDataFrame([(text,)], "text string")
        got = df.select(bpe_tokens_col(F.col("text"), merges).alias("t")).collect()[0].t
        sym = _chars(F.lit(text))
        for a, b in merges:
            sym = _fold_merge(sym, a, b)
        want = df.select(sym.alias("t")).collect()[0].t
        assert got == want, (text, merges, got, want)
        assert "".join(got) == text  # round-trip always holds
