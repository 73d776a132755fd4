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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | str,
) -> DataFrame:
    """Derive a change feed from two snapshots — the REVERSE of
    ``upsert_snapshot``/``scd2_apply``: rows keyed by ``key_cols``
    classified as ``inserted`` (key only in new), ``deleted`` (key only
    in old), or ``updated`` (key in both, any non-key column differs
    under null-safe comparison). The audit query every versioned table
    exists to answer ("what changed between v3 and v7"), composing with
    the Delta/Iceberg readers' time travel.

    Emits the NEW side's values for inserted/updated and the OLD side's
    for deleted, plus a ``change`` column. Plan: two anti-joins + one
    inner join, all equi on the key (co-partitioned; at 100 TB one key
    shuffle serves all three legs). Schemas must match.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshot schemas must match")
    val_cols = [c for c in new.columns if c not in keys]
    cols = keys + val_cols

    inserted = new.join(old.select(*keys), keys, "left_anti").select(
        *cols, F.lit("inserted").alias("change")
    )
    deleted = old.join(new.select(*keys), keys, "left_anti").select(
        *cols, F.lit("deleted").alias("change")
    )
    n, o = new.alias("n"), old.alias("o")
    changed_pred = None
    for c in val_cols:
        p = ~F.col(f"n.{c}").eqNullSafe(F.col(f"o.{c}"))
        changed_pred = p if changed_pred is None else (changed_pred | p)
    if changed_pred is None:  # key-only schema: nothing can "update"
        return inserted.unionAll(deleted)
    updated = (
        n.join(o, keys)
        .where(changed_pred)
        .select(*[F.col(f"n.{c}").alias(c) if c in val_cols else F.col(c) for c in cols])
        .withColumn("change", F.lit("updated"))
    )
    return inserted.unionAll(deleted).unionAll(updated)
