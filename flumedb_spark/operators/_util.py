"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition to core count only when the SOURCE LAYOUT is
    under-split (CPU-bound per-row work on a single-split input pins to
    one core). Decided from the scan's file list — plan metadata, never
    ``df.rdd``; cached/in-memory inputs report no files and keep the
    partitioning already chosen for them."""
    want = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if 0 < n_files * 2 < want:
        return df.repartition(want)
    return df
