"""Z-order (Morton) data layout — multi-dimensional file pruning for
the managed ingest layout (the Delta ``OPTIMIZE ZORDER BY`` analog,
public protocol: interleave the bits of rank-bucketed sort keys so
files are min/max-tight in EVERY keyed dimension, not just the first).

Why it matters at 100 TB: a layout range-sorted on one hot key gives
parquet min/max pruning on that key only — a predicate on a second
column touches every file. Interleaving b bits of each key's rank makes
each file a small hyper-rectangle in key space, so a conjunctive box
predicate intersects O(few) files. Everything here is JVM column
arithmetic (rank buckets via approxQuantile cutpoints + a HOF fold,
interleave via shiftleft/bitwise-or) — no Python in the write path,
no global sort, one range-shuffle total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BITS = 10  # rank buckets per dimension (1024) — plenty for file-level pruning


def _interleave(cols: list[Column], n_bits: int = N_BITS) -> Column:
    """Morton code: bit j of dimension d lands at position j*len(cols)+d."""
    z = F.lit(0).cast("long")
    n = len(cols)
    for d, c in enumerate(cols):
        for j in range(n_bits):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + d))
    return z


def zorder_value(df: DataFrame, cols: list[str], n_bits: int = N_BITS) -> DataFrame:
    """Append a ``_z`` Morton column over the rank-buckets of ``cols``.

    Rank-buckets (quantile cutpoints) rather than raw values: Z-order
    needs uniformly occupied buckets, and real keys are skewed. The
    cutpoints come from distributed ``approxQuantile`` (Greenwald-
    Khanna: one pass, only the 2^n_bits boundary values visit the
    driver), and bucket assignment is a JVM higher-order-function fold
    over the broadcast boundary array — no global sort, no
    single-partition window, nothing that breaks at 100 TB."""
    out = df
    buckets = []
    nb = 1 << n_bits
    # ONE Greenwald-Khanna pass computes every dimension's cutpoints
    # (approxQuantile accepts a column list) — k dimensions must not
    # mean k full-dataset scans
    all_cuts = df.stat.approxQuantile(
        cols, [j / nb for j in range(1, nb)], 1.0 / (4 * nb)
    )
    for i, c in enumerate(cols):
        bounds = sorted(set(float(x) for x in all_cuts[i]))
        arr = F.array(*[F.lit(x) for x in bounds])
        b = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.col(c).cast("double") >= t, F.lit(1)).otherwise(F.lit(0)),
        )
        out = out.withColumn(f"_b{i}", b.cast("long"))
        buckets.append(F.col(f"_b{i}"))
    out = out.withColumn("_z", _interleave(buckets, n_bits))
    return out.drop(*[f"_b{i}" for i in range(len(cols))])


def write_zordered(
    df: DataFrame, cols: list[str], path: str, n_files: int, n_bits: int = N_BITS
) -> None:
    """Write ``df`` as ``n_files`` parquet splits clustered by Z-value:
    range-partition on ``_z`` (equal-height, skew-proof), sort within
    partitions, drop the helper column on write."""
    zdf = zorder_value(df, cols, n_bits)
    (
        zdf.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_intersecting_box(
    path: str, box: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(n_intersecting, n_total) parquet files whose column min/max
    statistics intersect the conjunctive box predicate — the file-level
    pruning a scan of ``AND``-ed range filters achieves. Reads only
    footers (metadata), no data pages."""
    import os

    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    n_hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        hit = True
        for col, (lo, hi) in box.items():
            cmin = cmax = None
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    c = row_group.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        cmin = s.min if cmin is None else min(cmin, s.min)
                        cmax = s.max if cmax is None else max(cmax, s.max)
            if cmin is not None and (cmax < lo or cmin > hi):
                hit = False
                break
        n_hit += hit
    return n_hit, len(files)
