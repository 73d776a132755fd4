"""End-to-end training-data pipeline — the composed form of the
north-star operators, in dependency order:

    raw docs
      -> language ID + quality scoring     (text.py: JVM columns)
      -> Gopher rule gate                  (text.gopher_quality)
      -> LM perplexity terciles            (text.unigram_logprob:
                                            drop the tail bucket)
      -> PII redaction                     (text.redact_pii)
      -> exact dedup                       (dedup.exact_dup_groups)
      -> near-dup clustering               (MinHash-LSH candidates ->
                                            TRUE components via star
                                            contraction -> keepers)
      -> decontamination vs a holdout      (cross-corpus Bloom probe,
                                            exact FP gap attested)
      -> DSIR data selection               (hashed-bigram importance
                                            weights vs a target LM)
      -> quality-weighted sampling         (exact-int Bernoulli draws)
      -> tokenize + chunk + pack           (BPE apply, sliding windows,
                                            token-budget cumsum packing)
      -> source mixture report             (sampling.source_mixture:
                                            sqrt-temperature weights +
                                            token-budget allocation)

Every stage is a DataFrame -> DataFrame transform (no collect between
stages — one lazy plan per materialization point), which is what makes
the same program a 100 TB program: swap the input path, raise
shuffle.partitions, done.

Run: PYTHONPATH=/root/repo python examples/training_data_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flumedb_spark.operators import bpe, dedup, sampling, text
from flumedb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("training_pipeline", cpus=8)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()

    # 1. language + quality gates (pure JVM column expressions)
    lang = text.lang_id(docs).select("doc_id", "pred_lang")
    quality = text.quality_score(docs).select("doc_id", "quality")
    kept = (
        docs.join(lang, "doc_id")
        .join(quality, "doc_id")
        .where((F.col("pred_lang") == "en") & (F.col("quality") >= 0.3))
    )
    n1 = kept.count()

    # 1b. Gopher rule gate (word-count/word-length/stopword rules) and
    # LM perplexity terciles per language — keep head + middle buckets
    gq = text.gopher_quality(kept).where(F.col("keep") == 1).select("doc_id")
    lm = (
        text.unigram_logprob(kept)
        .where(F.col("ppl_bucket") <= 2)
        .select("doc_id")
    )
    kept = kept.join(gq, "doc_id").join(lm, "doc_id")
    n1b = kept.count()

    # 2. PII redaction (typed tokens; counts kept for auditing)
    red = text.redact_pii(kept)
    kept = kept.drop("text").join(
        red.select("doc_id", F.col("text_redacted").alias("text")), "doc_id"
    )
    # stage boundary: materialize once (localCheckpoint == the local
    # stand-in for writing the intermediate corpus out, which is what a
    # 100 TB run does between curation stages) — without it every later
    # stage re-executes the whole upstream chain per action
    kept = kept.localCheckpoint(eager=True)

    # 3. exact dedup: keep each text's min doc_id
    keepers = dedup.exact_dup_groups(kept).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    kept = kept.join(keepers, "doc_id").localCheckpoint(eager=True)
    n2 = kept.count()

    # 4. near-dup components: LSH candidates -> TRUE connected
    # components via alternating star contraction (exact at any cluster
    # diameter in O(log n) rounds — the 100 TB-safe form) -> keepers
    clusters = dedup.neardup_components(kept)
    kept = kept.join(
        clusters.where(F.col("is_keeper")).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=True)
    n3 = kept.count()

    # 5. decontamination vs the benchmark holdout (the 10 highest
    # doc_ids stand in for it) — the Bloom form: the holdout collapses
    # to a <=2^16-row bit set no matter how large it is, candidates are
    # probed per 8-token shingle, and the exact column beside the
    # sketch shows the FP gap. Contamination is shared word SEQUENCES,
    # never mere vocabulary overlap.
    bench = docs.orderBy(F.col("doc_id").desc()).limit(10).select("doc_id", "text")
    flags = dedup.bloom_cross_dedup(bench, kept, window=8)
    kept = kept.join(
        flags.where(F.col("contaminated")).select("doc_id"), "doc_id", "left_anti"
    ).localCheckpoint(eager=True)
    n4 = kept.count()

    # 5b. DSIR data selection (arXiv:2302.03169): score every survivor
    # by how target-like it is under hashed-bigram LMs (src0 stands in
    # for the quality target) and keep the top half
    from flumedb_spark.operators import selection

    dsir = selection.dsir_logweights(kept, target_filter="source = 'src0'")
    kept = kept.join(
        dsir.where(F.col("iw_quartile") <= 2).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=True)
    n4b = kept.count()

    # 6. quality-weighted deterministic sampling (no RNG: md5 draws)
    sampled = sampling.sample_fraction(kept, key_col="doc_id", fraction=0.9)
    n5 = sampled.count()

    # 7. tokenize with a trained BPE vocab, then pack into sequences
    from pyspark.sql.window import Window

    merges = bpe.bpe_train(docs.limit(200), n_merges=16)
    toks = bpe.bpe_tokens(sampled, merges).select(
        "doc_id", F.col("n_bpe_real_tokens").alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    packed = toks.withColumn(
        "pack_id", F.floor((F.sum("n_tokens").over(w) - 1) / 2048)
    )
    n_packs = packed.select("pack_id").distinct().count()

    # 8. source mixture: how the surviving corpus should be weighted
    # (sqrt temperature up-weights small sources without flattening)
    mixture = sampling.source_mixture(
        sampled.select("doc_id", "text", "source"), budget_tokens=100_000
    ).collect()

    print(f"raw docs:                {n0}")
    print(f"after lang+quality gate: {n1}")
    print(f"after gopher+LM gates:   {n1b}")
    print(f"after exact dedup:       {n2}")
    print(f"after near-dup keepers:  {n3}")
    print(f"after decontamination:   {n4}")
    print(f"after DSIR selection:    {n4b}")
    print(f"after weighted sample:   {n5}")
    print(f"packed into {n_packs} sequences of <=2048 BPE tokens")
    top = sorted(mixture, key=lambda r: -r.alloc_tokens)[:3]
    for r in top:
        print(
            f"mixture: {r.source} p={r.p_mix} alloc={r.alloc_tokens} "
            f"epochs={r.epochs}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
