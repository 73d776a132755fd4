"""End-to-end POST-TRAINING data pipeline — the SFT + preference
composition, in dependency order (the instruction-tuning counterpart
of examples/training_data_pipeline.py's pre-training chain):

    raw docs
      -> synthetic conversations           (conversations.with_*)
      -> flatten to turns                  (from_json + posexplode)
      -> hygiene gate                      (validate_alternation:
                                            starts-with-user AND
                                            alternates AND ends-with-
                                            assistant)
      -> turn-level dedup report           (boilerplate answers)
      -> chat-template render              (one packed string/conv)
      -> SFT batch packing                 (concat-and-chunk cumsum)
      -> candidate generations             (preference.with_*)
      -> preference pair mining            (margin rule, bounded
                                            self-equi-join)
      -> win-rate matrix + Bradley-Terry   (exact micro-unit MM)
      -> verbosity-bias QC                 (length_bias covariance)
      -> annotator agreement QC            (fleiss_kappa)

Every stage is a DataFrame -> DataFrame transform; the only driver
materializations are the final QC scalars. Swap the input path and
raise shuffle.partitions and the same program is the 100 TB program.

Run: PYTHONPATH=/root/repo python examples/post_training_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from flumedb_spark.operators import conversations, preference
from flumedb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def prepare_sft(docs: DataFrame) -> dict[str, DataFrame]:
    """SFT half: conversations -> turns -> hygiene gate -> dedup
    report -> rendered templates -> packed batches."""
    convs = conversations.with_synthetic_conversation(docs)
    turns = conversations.conversation_turns(convs)
    flags = conversations.validate_alternation(turns)
    clean_ids = flags.where(
        F.col("starts_with_user")
        & F.col("alternates")
        & F.col("ends_with_assistant")
    ).select("doc_id")
    clean_turns = turns.join(F.broadcast(clean_ids), "doc_id", "left_semi")
    return {
        "turns": turns,
        "clean_turns": clean_turns,
        "dedup_report": conversations.turn_dedup(clean_turns),
        "rendered": conversations.chat_template_render(clean_turns),
        "packs": conversations.conversation_packing(clean_turns),
    }


def prepare_preference(docs: DataFrame) -> dict[str, DataFrame]:
    """Preference half: generations -> margin-mined pairs -> win-rate
    matrix, Bradley-Terry strengths, verbosity-bias and agreement QC."""
    gens = preference.with_synthetic_generations(docs)
    pairs = preference.preference_pairs(gens)
    return {
        "gens": gens,
        "pairs": pairs,
        "winrate": preference.winrate_matrix(pairs),
        "bt": preference.bt_scores(pairs),
        "length_bias": preference.length_bias(gens),
        "agreement": preference.fleiss_kappa(
            preference.with_synthetic_annotations(docs)
        ),
    }


def main() -> None:
    spark = get_spark("post_training_pipeline", cpus=8)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    sft = prepare_sft(docs)
    n_convs = sft["rendered"].count()
    packs = sft["packs"]
    pack_stats = packs.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_convs").alias("convs_packed"),
    ).first()
    # every clean conversation lands in exactly one pack
    assert pack_stats.convs_packed == n_convs, (pack_stats, n_convs)

    pref = prepare_preference(docs)
    n_pairs = pref["pairs"].count()
    wr = pref["winrate"].agg(F.sum("games").alias("g")).first()
    # the win-rate matrix accounts for every mined pair exactly once
    assert wr.g == n_pairs, (wr.g, n_pairs)
    bt = {r.model_id: r for r in pref["bt"].collect()}
    by_wins = sorted(bt, key=lambda m: bt[m].wins)
    by_bt = sorted(bt, key=lambda m: bt[m].bt_micro)
    # BT order agrees with win order on the near-balanced design
    assert by_wins == by_bt, (by_wins, by_bt)
    qc = pref["agreement"].first()

    print(f"conversations rendered : {n_convs}")
    print(f"packs emitted          : {pack_stats.n_packs}")
    print(f"preference pairs mined : {n_pairs}")
    print(f"BT strengths (micro)   : { {m: bt[m].bt_micro for m in sorted(bt)} }")
    print(f"fleiss kappa (micro)   : {qc.kappa_micro}")
    spark.stop()


if __name__ == "__main__":
    main()
