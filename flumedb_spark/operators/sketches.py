"""Mergeable quantile sketch — the third member of the sketch family
(HLL = cardinality, count-min = frequency, this = quantiles; the first
two live as catalog entries `ns_hll_user_estimate` /
`ns_countmin_event_counts`).

The sketch is a fixed-grid equi-width histogram over a declared integer
domain: 64 BIGINT bin counters. That is the honest deterministic
formulation of a quantile sketch — mergeable by elementwise add (== the
groupBy-sum shape, so Spark's map-side partial aggregation IS the merge
operator), O(1) update, and rank queries answered from the cumulative
histogram with bounded error (one bin width). KLL/t-digest trade the
fixed grid for adaptivity but lose cross-engine determinism; at 100 TB
the map-side-combinable groupBy below shuffles exactly 64 rows per
partition regardless of input size.

All arithmetic is exact integers (cents-scaled values, integer `div`
binning, ceil-rank via (q*n + 9999) div 10000), so a SQL oracle
reproduces every row bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BINS = 64


def histogram_sketch(
    df: DataFrame,
    value_col: str = "value",
    lo_c: int = 0,
    hi_c: int = 51_200,
    n_bins: int = N_BINS,
) -> DataFrame:
    """Bin counts over [lo_c, hi_c) cents; values outside clamp to the
    edge bins. Returns (bin, n) with BIGINT counts — mergeable by
    summing `n` per bin."""
    span = hi_c - lo_c
    if span % n_bins:
        raise ValueError("hi_c - lo_c must be divisible by n_bins (integer bin edges)")
    b = F.expr(
        f"least({n_bins - 1}, greatest(0, CAST("
        f"(CAST(round({value_col} * 100) AS BIGINT) - {lo_c}) * {n_bins} div {span}"
        f" AS BIGINT)))"
    )
    return df.groupBy(b.alias("bin")).agg(F.count("*").cast("long").alias("n"))


def histogram_quantiles(
    sketch: DataFrame,
    quantiles_10k: list[int] = (5000, 9000, 9900),
    lo_c: int = 0,
    hi_c: int = 51_200,
    n_bins: int = N_BINS,
) -> DataFrame:
    """Rank queries over the sketch: for each q (in 1/10000ths) emit the
    ceil-rank and the upper cent-edge of the first bin whose cumulative
    count reaches it. The 64-row cumulative window is a no-shuffle
    single-partition pass — the sketch, not the data, pays it."""
    span = hi_c - lo_c
    from pyspark.sql.window import Window

    cum = sketch.select(
        "bin",
        "n",
        F.sum("n").over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("n").over(Window.partitionBy()).alias("total"),
    )
    qdf = cum.sparkSession.createDataFrame(
        [(int(q),) for q in quantiles_10k], "q10k long"
    )
    ranked = qdf.crossJoin(cum).where(
        F.col("cum") >= F.expr("CAST((q10k * total + 9999) div 10000 AS BIGINT)")
    )
    return (
        ranked.groupBy("q10k")
        .agg(
            F.min("bin").cast("long").alias("bin"),
            F.max("total").cast("long").alias("n_rows"),
        )
        .select(
            "q10k",
            "bin",
            "n_rows",
            (F.lit(lo_c) + (F.col("bin") + 1) * F.lit(span // n_bins))
            .cast("long")
            .alias("est_hi_edge_c"),
        )
        .orderBy("q10k")
    )
