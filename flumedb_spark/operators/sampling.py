"""Deterministic sampling operators for training-data pipelines.

All sampling here is **content/key-hash based, not RNG based**: a row's
fate depends only on its key, so samples are reproducible across runs,
partitionings, engines, and retries — the property that matters when a
100 TB pipeline must be resumable and auditable (`rand()` sampling
breaks all of that under task retry).

The hash idiom is md5-hex-prefix compare (cross-engine portable, same
trick as the MinHash operator): md5's first 4 hex chars give a uniform
16-bit bucket in [0, 65536).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucket_expr(key_col: str) -> str:
    """16-bit uniform bucket of md5(key) as a SQL string (portable:
    identical text runs on DuckDB with // for div)."""
    alphabet = "0123456789abcdef"
    digits = [
        f"(position(substr(md5(CAST({key_col} AS STRING)), {i}, 1) IN '{alphabet}') - 1)"
        for i in range(1, 5)
    ]
    return f"((({digits[0]} * 16 + {digits[1]}) * 16 + {digits[2]}) * 16 + {digits[3]})"


def sample_fraction(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, chosen by key hash — stable under reruns
    and engine changes; a row is in or out forever."""
    threshold = int(fraction * 65536)
    return df.where(F.expr(f"{_bucket_expr(key_col)} < {threshold}"))


def dataset_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Assign each row to train/val/test by key hash (default 80/10/10).

    Returns the input plus a ``split`` column. Deterministic: the same
    example never migrates between splits across pipeline runs — the
    leakage guarantee hash-splitting exists for.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = _bucket_expr(key_col)
    edges = []
    acc = 0.0
    items = list(weights.items())
    for i, (name, w) in enumerate(items):
        acc += w
        edge = int(acc * 65536)
        # float accumulation can land epsilon BELOW 1.0 (0.7+0.2+0.1 ==
        # 0.9999999999999999 -> edge 65535): when the weights are meant
        # to cover everything, force the last edge to the full range so
        # bucket 65535 can't silently leak into '_rest'
        if i == len(items) - 1 and abs(acc - 1.0) < 1e-9:
            edge = 65536
        edges.append((name, edge))
    cases = " ".join(
        f"WHEN {bucket} < {edge} THEN '{name}'" for name, edge in edges
    )
    return df.withColumn("split", F.expr(f"CASE {cases} ELSE '_rest' END"))


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, n_per_stratum: int
) -> DataFrame:
    """Exactly n rows per stratum, chosen by hash order (not arrival
    order): a deterministic shuffle within each group, so the sample is
    unbiased w.r.t. storage order and reproducible."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )
