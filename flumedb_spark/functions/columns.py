"""Shared column-expression helpers — the engine's scalar-function
surface. All pure JVM expressions (codegen'd, vectorized); the
cross-engine-exactness idioms used throughout the catalog, packaged for
reuse.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..views.search import TOKEN_PATTERN


def cents(col: Column | str, scale: int = 100) -> Column:
    """Exact integer representation of a fixed-decimal double.

    ``sum(cents(x))`` is exact integer arithmetic — immune to float
    summation-order differences across engines/partitionings. Derive
    doubles back out with a single division.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale).cast("long")


def scaled_int(col: Column | str, scale: int = 1_000_000) -> Column:
    """float32-safe integer scaling for embedding components (~7
    significant digits)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double") * scale).cast("long")


def epoch_us(col: Column | str) -> Column:
    """Microsecond epoch — the portable timestamp representation
    (DuckDB: ``epoch_us``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c)


def tokens(col: Column | str) -> Column:
    """Lowercased word tokens (the engine-wide tokenizer contract,
    shared with views.search and the oracle word-boundary regex)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.lower(c), TOKEN_PATTERN), "")
