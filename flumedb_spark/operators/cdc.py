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


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    at_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Feature-store point-in-time join: each fact row is matched to the
    dimension version that was valid AT the fact's own time — the
    correctness rule that prevents feature leakage (training rows must
    never see attribute values from their future) and the query every
    SCD-2 table exists to answer.

    ``history`` carries half-open validity ``[valid_from, valid_to)``
    with NULL ``valid_to`` = still current (exactly ``scd2_apply``'s
    output). Matching: ``valid_from <= at < valid_to``. Plans as an
    equi-join on ``key`` with the range as a post-join filter — at
    100 TB the key shuffle co-locates each entity's facts with its
    (few) versions, so the range filter is local and the join never
    degenerates to a range-only cross product. Validity intervals per
    key are disjoint by construction, so each fact matches at most one
    version (asserted nowhere — it is a property of scd2_apply's lead()
    derivation).
    """
    f = facts.alias("f")
    h = history.alias("h")
    cond = (
        (F.col(f"f.{key}") == F.col(f"h.{key}"))
        & (F.col(f"f.{at_col}") >= F.col(f"h.{valid_from}"))
        & (
            F.col(f"h.{valid_to}").isNull()
            | (F.col(f"f.{at_col}") < F.col(f"h.{valid_to}"))
        )
    )
    dim_cols = [
        c for c in history.columns if c not in (key, valid_from, valid_to)
    ]
    return f.join(h, cond, how).select(
        "f.*", *[F.col(f"h.{c}").alias(f"dim_{c}") for c in dim_cols]
    )
