"""Time-series regularization: gap-fill to a fixed grid + LOCF.

The canonical "resample" stage every metrics/feature pipeline runs
before modeling: observations arrive at irregular event times; the
consumer wants one row per (key, bucket) on a regular grid, with
missing buckets filled by the last observation carried forward
(LOCF / pandas ``ffill`` — but distributed, exact, and deterministic).

Shape (all built-in JVM expressions, no Python in the path):

1. bucket each event: ``unix_micros(ts) div bucket_us`` (exact BIGINT);
2. pick the bucket's closing observation with one row_number window
   (ORDER BY ts DESC, <tiebreak> DESC — total order, so retries and
   partitioning cannot flip which value "closes" a bucket);
3. per-key span (min/max bucket) -> ``explode(sequence(lo, hi))`` grid;
4. left-join observations onto the grid (co-partitioned on the key);
5. ``last(value, ignorenulls=True)`` over (key ORDER BY bucket ROWS
   UNBOUNDED PRECEDING) — Spark's running LOCF.

100 TB notes: every shuffle in the plan is keyed by the series key
(window, groupBy, join all co-partition — AQE coalesces the rest), and
the grid is generated per key WITHOUT a global calendar cross-join
(the classic blowup: calendar x keys materializes rows for keys that
never span the range). ``sequence()`` materializes one array per key
per span, so a key alive for years at second granularity would build a
huge in-memory array: for those, pre-split spans into bounded chunks
(e.g. per-day rows first, then explode hours within the chunk) — the
operator raises if a span exceeds ``max_buckets_per_key`` rather than
silently OOMing an executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gapfill_locf", "mad_outliers", "quantile_clip", "rank_quantile"]


def gapfill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_us: int = 3_600_000_000,
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Regularize ``df`` to one row per (key, bucket) with LOCF fill.

    Returns (key_col, bucket, observed, value_locf): ``bucket`` =
    ``unix_micros(ts) div bucket_us``; ``observed`` marks buckets that
    had at least one event; ``value_locf`` is the bucket's closing
    value, carried forward across empty buckets (NULL until the key's
    first non-null observation). The grid spans each key's own
    [min(bucket), max(bucket)] — no global calendar.
    """
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    ev = df.select(
        F.col(key_col),
        F.expr(f"unix_micros({ts_col}) div {bucket_us}").alias("bucket"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(value_col).alias("_val"),
    )
    w_close = Window.partitionBy(key_col, "bucket").orderBy(
        F.desc("_ts"), F.desc("_tb")
    )
    obs = (
        ev.withColumn("_rn", F.row_number().over(w_close))
        .where(F.col("_rn") == 1)
        # the marker column keeps observed-with-NULL-value distinct from
        # no-event-in-bucket after the left join below
        .select(
            key_col,
            "bucket",
            F.col("_val").alias("_obs_val"),
            F.lit(True).alias("_observed"),
        )
    )
    span = obs.groupBy(key_col).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    # refuse to build pathological per-key arrays (see module docstring)
    over = span.where(
        (F.col("_hi") - F.col("_lo")) >= F.lit(max_buckets_per_key)
    ).limit(1)
    if over.count() > 0:
        raise ValueError(
            f"a key spans >= {max_buckets_per_key} buckets; chunk the span "
            "(e.g. explode days, then hours) before gap-filling"
        )
    grid = span.select(
        key_col, F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket")
    )
    j = grid.join(obs, [key_col, "bucket"], "left").select(
        key_col,
        "bucket",
        F.coalesce(F.col("_observed"), F.lit(False)).alias("observed"),
        F.col("_obs_val"),
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        key_col,
        "bucket",
        "observed",
        F.last("_obs_val", ignorenulls=True).over(w_fill).alias("value_locf"),
    )


def _lower_median(
    df: DataFrame, key_col: str, val_col: str, tiebreak_col: str, out_col: str
) -> DataFrame:
    """Per-key LOWER median of ``val_col``: the value at row
    (n+1) div 2 under the total order (val, tiebreak). A deterministic,
    engine-portable median — no interpolation, no approx — at the cost
    of one per-key sort (a row_number window, i.e. one keyed shuffle)."""
    w = Window.partitionBy(key_col).orderBy(val_col, tiebreak_col)
    wk = Window.partitionBy(key_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .where(F.expr("_rn = (_n + 1) div 2"))
        .select(key_col, F.col(val_col).alias(out_col))
    )


def mad_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    tiebreak_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-key outlier detection: |x - median| > k * MAD.

    Median/MAD (median absolute deviation) instead of mean/stddev: one
    pathological burst in a key's series does not drag the threshold
    with it (the breakdown-point argument for robust statistics; the
    reason metrics pipelines alert on MAD, not z-scores). Both medians
    are the deterministic LOWER median under a total order, so results
    are partitioning- and engine-independent; the only float ops are
    IEEE subtract/abs/multiply/compare, identical across engines.

    Plan (r10 OPTIMIZATION, guide §2.4): a pure window pipeline — ONE
    exchange by ``key_col``, then two in-partition sorts. Each median
    is broadcast to its key's rows as a conditional max over the
    unordered key window (exactly one row per key satisfies the
    rank predicate, so the max IS that row's value) instead of a
    median-table join-back. The old two-join shape also re-executed
    the scan→median→join subtree twice (the ``ad`` frame fed both the
    MAD build and the final join). At 100 TB this is two sorts within
    key partitions — the honest cost of an EXACT median; switch to
    approxQuantile when an estimate suffices.

    Returns outlier rows only: (key, tiebreak, value, med, mad).
    """
    wk = Window.partitionBy(key_col)
    w1 = Window.partitionBy(key_col).orderBy("_v", tiebreak_col)
    t = (
        df.select(key_col, tiebreak_col, F.col(value_col).alias("_v"))
        .withColumn("_rn", F.row_number().over(w1))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .withColumn(
            "_med",
            F.max(F.when(F.expr("_rn = (_n + 1) div 2"), F.col("_v"))).over(wk),
        )
        .withColumn("_absdev", F.abs(F.col("_v") - F.col("_med")))
    )
    w2 = Window.partitionBy(key_col).orderBy("_absdev", tiebreak_col)
    t = t.withColumn("_rn2", F.row_number().over(w2)).withColumn(
        "_mad",
        F.max(F.when(F.expr("_rn2 = (_n + 1) div 2"), F.col("_absdev"))).over(wk),
    )
    return t.where(F.col("_absdev") > F.lit(k) * F.col("_mad")).select(
        key_col,
        tiebreak_col,
        F.col("_v").alias("value"),
        F.col("_med").alias("med"),
        F.col("_mad").alias("mad"),
    )


def rank_quantile(
    df: DataFrame,
    key_col: str,
    val_col: str,
    tiebreak_col: str,
    q_num: int,
    q_den: int,
    out_col: str,
) -> DataFrame:
    """Per-key EXACT rank-based quantile: the value at rank
    ceil(n * q_num/q_den) (clamped to >= 1) under the total order
    (val, tiebreak). No interpolation, no approx — the deterministic,
    engine-portable quantile (q = 1/2 gives the upper-leaning variant
    of ``_lower_median``'s rule; both are fine, pick one and replay it
    in the oracle). One row_number window = one keyed shuffle."""
    if not (0 < q_num <= q_den):
        raise ValueError("quantile must be in (0, 1]")
    w = Window.partitionBy(key_col).orderBy(val_col, tiebreak_col)
    wk = Window.partitionBy(key_col)
    rank_expr = f"greatest(1*1, (_n * {q_num} + {q_den} - 1) div {q_den})"
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wk))
        .where(F.expr(f"_rn = {rank_expr}"))
        .select(key_col, F.col(val_col).alias(out_col))
    )


def quantile_clip(
    df: DataFrame,
    key_col: str,
    value_col: str,
    tiebreak_col: str,
    lo_num: int = 5,
    hi_num: int = 95,
    den: int = 100,
) -> DataFrame:
    """Winsorization: clip each value to its key's exact [p_lo, p_hi]
    rank quantiles — the standard feature-normalization stage before
    training (outliers saturate instead of dominating the loss).
    Exact quantiles via ``rank_quantile``; the clip itself is
    least/greatest, so output values are always values that exist in
    the data or the originals (no synthesized interpolants — the
    property that makes the op engine-portable bit-for-bit).

    Plan: two rank windows + two small per-key joins, all keyed by
    ``key_col`` (one co-partitioning reused). Returns the input rows
    plus (lo, hi, value_clipped, was_clipped)."""
    base = df.select(key_col, tiebreak_col, F.col(value_col).alias("_v"))
    lo = rank_quantile(base, key_col, "_v", tiebreak_col, lo_num, den, "_lo")
    hi = rank_quantile(base, key_col, "_v", tiebreak_col, hi_num, den, "_hi")
    return (
        base.join(lo, key_col)
        .join(hi, key_col)
        .select(
            key_col,
            tiebreak_col,
            F.col("_v").alias("value"),
            F.col("_lo").alias("lo"),
            F.col("_hi").alias("hi"),
            F.least(F.greatest(F.col("_v"), F.col("_lo")), F.col("_hi")).alias(
                "value_clipped"
            ),
            ((F.col("_v") < F.col("_lo")) | (F.col("_v") > F.col("_hi"))).alias(
                "was_clipped"
            ),
        )
    )
