"""Skew mitigation utilities.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in this engine's sessions) handles most runtime skew; these
helpers cover the cases AQE cannot re-plan:

- ``salted_join``: a hot-key equi-join where one side has pathological
  key concentration (the classic "null key / celebrity user" problem).
  The skewed side gets a deterministic salt derived from a unique
  column; the other side is replicated across all salts. The join key
  becomes (key, salt), spreading each hot key over ``n_salts``
  partitions.
- ``salted_distinct_count``: two-phase distinct aggregation for hot
  groups: partial distinct per (key, salt), then merge.

Salts are deterministic (xxhash64 of a unique column, not rand()), so
results are reproducible run-to-run and resilient to task retries —
rand() salting breaks exactly-once semantics under retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, n_salts: int) -> DataFrame:
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)).cast("int")
    )


def replicate_salts(df: DataFrame, n_salts: int) -> DataFrame:
    return df.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    skewed_unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot values of ``on``.

    ``skewed`` is salted deterministically; ``other`` (usually the
    smaller/dimension side) is replicated n_salts times. Result equals
    the plain join, with each hot key spread over n_salts reducers.

    ``how`` is limited to ``inner``/``left``/``left_semi``/``left_anti``:
    the replication makes right/full outer joins WRONG (an ``other``-only
    key appears as n_salts unmatched copies, emitting n_salts null-padded
    rows where the plain join emits one) — for those, salt the other
    direction or fall back to AQE's skew-join split.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): replicated-side outer joins would "
            "duplicate unmatched keys n_salts times; use inner/left* or AQE skew-join"
        )
    s = with_salt(skewed, skewed_unique_col, n_salts)
    o = replicate_salts(other, n_salts)
    return s.join(o, [on, "_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame, group_col: str, value_col: str, unique_col: str, n_salts: int = 16
) -> DataFrame:
    """count(DISTINCT value) per group with hot groups spread over
    salts: partial distinct within (group, salt), exact merge after."""
    salted = with_salt(df, unique_col, n_salts)
    partial = salted.groupBy(group_col, "_salt").agg(
        F.collect_set(value_col).alias("_vals")
    )
    return (
        partial.select(group_col, F.explode("_vals").alias("_v"))
        .groupBy(group_col)
        .agg(F.countDistinct("_v").alias("n_distinct"))
    )
