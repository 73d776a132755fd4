"""Dataset profiling: per-column statistics in one pass.

The validation stage a training-data pipeline runs at every ingest
boundary (the deequ/"data quality" shape): for each column — row
count, non-null count, exact distinct count, lexical min/max, and a
completeness ratio — emitted as one ROW PER COLUMN so downstream
checks are data, not code (assert over the profile DataFrame).

Plan shape: ONE aggregation pass over the table. Multiple exact
``count(DISTINCT col)`` in a single agg compile to Catalyst's Expand
operator — each input row is replicated once per distinct-aggregate
(x ncols), then partially aggregated map-side before one shuffle.
That is the standard exact plan; it reads the table once and shuffles
only partial aggregate state.

100 TB notes: Expand's x-ncols row amplification happens BEFORE the
map-side combine, so the shuffle stays tiny (distinct partials), but
CPU scales with ncols x rows. For very wide tables at full scale,
profile in column groups, or swap the exact distinct for the package's
mergeable sketches (operators/sketches.py HLL — one pass, no Expand)
when an estimate suffices; the exact path here is the oracle-checkable
reference. min/max are cast to string and truncated to ``repr_len``
so profiles of long text columns stay bounded.

Caveat: min/max string casts of DOUBLE columns are engine-specific
formatting; profile numeric continuous columns with numeric min/max
(or round first) when cross-engine parity of the repr matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, repr_len: int = 32
) -> DataFrame:
    """Profile ``cols`` (default: all columns) of ``df`` in one pass.

    Returns one row per column: (col_name, n_rows, n_nonnull,
    n_distinct, min_repr, max_repr, completeness) with completeness =
    round(n_nonnull / n_rows, 6); NULLs are excluded from n_distinct
    and min/max (standard SQL aggregate semantics, engine-portable).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.countDistinct(F.col(c)).alias(f"{c}__nd"),
            F.substring(F.min(F.col(c)).cast("string"), 1, repr_len).alias(
                f"{c}__min"
            ),
            F.substring(F.max(F.col(c)).cast("string"), 1, repr_len).alias(
                f"{c}__max"
            ),
        ]
    one = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', `{c}__nn`, `{c}__nd`, `{c}__min`, `{c}__max`" for c in cols
    )
    stacked = one.selectExpr(
        "_n_rows",
        f"stack({len(cols)}, {parts}) AS "
        "(col_name, n_nonnull, n_distinct, min_repr, max_repr)",
    )
    return stacked.select(
        "col_name",
        F.col("_n_rows").alias("n_rows"),
        "n_nonnull",
        "n_distinct",
        "min_repr",
        "max_repr",
        F.round(
            F.col("n_nonnull").cast("double") / F.col("_n_rows"), 6
        ).alias("completeness"),
    )
