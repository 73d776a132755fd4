"""End-to-end post-training chain over the sf0.001 corpus: drives
examples/post_training_pipeline.prepare_sft / prepare_preference and
checks the cross-stage invariants the example asserts, plus
corpus-specific closed forms (the hygiene gate's keep-set is exactly
the doc_id % 4 == 1 slice on the synthetic conversations; token
conservation through packing; win-rate mass balance)."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
    ),
)

from post_training_pipeline import prepare_preference, prepare_sft  # noqa: E402


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").localCheckpoint(
        eager=True
    )


def test_sft_half_invariants(spark, docs):
    sft = prepare_sft(docs)
    # hygiene gate closed form: synthetic conversations have
    # 1 + doc_id % 4 turns starting with user and alternating, so
    # starts_with_user AND alternates always hold and
    # ends_with_assistant holds iff the turn count is even, i.e.
    # doc_id % 4 in {1, 3}
    clean_ids = {
        r.doc_id for r in sft["clean_turns"].select("doc_id").distinct().collect()
    }
    expect = {
        r.doc_id
        for r in docs.where((F.col("doc_id") % 4).isin(1, 3)).collect()
    }
    assert clean_ids == expect
    # packing conserves conversations and tokens over the clean slice
    n_clean = len(clean_ids)
    agg = sft["packs"].agg(
        F.sum("n_convs").alias("c"), F.sum("pack_tokens").alias("t")
    ).first()
    assert agg.c == n_clean
    total = (
        sft["clean_turns"]
        .groupBy("doc_id")
        .agg((F.sum("n_words") + 2 * F.count(F.lit(1))).alias("ct"))
        .agg(F.sum("ct"))
        .first()[0]
    )
    assert agg.t == total


def test_preference_half_invariants(spark, docs):
    pref = prepare_preference(docs)
    n_pairs = pref["pairs"].count()
    assert n_pairs > 0
    # win-rate matrix mass balance: every pair counted exactly once
    assert pref["winrate"].agg(F.sum("games")).first()[0] == n_pairs
    # BT emits one strength per model seen in the pairs
    models = (
        pref["pairs"].select(F.col("chosen_model").alias("m"))
        .union(pref["pairs"].select("rejected_model"))
        .distinct()
        .count()
    )
    assert pref["bt"].count() == models
    # QC scalars exist and are sane micro-units
    qc = pref["agreement"].first()
    assert -1_000_000 <= qc.kappa_micro <= 1_000_000
    lb = pref["length_bias"].agg(F.sum("n_pairs")).first()[0]
    assert lb == n_pairs
