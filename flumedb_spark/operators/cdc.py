"""CDC / SCD-style snapshot maintenance without a MERGE-capable table
format (the pyspark guide's 'emulate with anti-join + union + window'
pattern; with Delta this becomes one MERGE INTO — see docs/ROADMAP.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_snapshot(current: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Type-1 upsert: updates replace current rows by key, new keys
    append. Emulated as anti-join (survivors) + union (updates win)."""
    survivors = current.join(updates.select(key), key, "left_anti")
    return survivors.unionByName(updates)


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    seq_col: str = "seq",
) -> DataFrame:
    """Type-2 apply: keep full history with validity ranges derived from
    the change sequence — each key's rows get (valid_from, valid_to,
    is_current) via a window over its change seq. ``history`` and
    ``updates`` share the schema (key, seq, attributes...)."""
    allrows = history.unionByName(updates)
    w = Window.partitionBy(key).orderBy(seq_col)
    return (
        allrows.withColumn("valid_from", F.col(seq_col))
        .withColumn("valid_to", F.lead(seq_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
