"""Source readers — load external data into engine tables.

The reference delegates storage formats to pluggable logs/codecs
(`README.md:85-88,103`); here the analogous surface is "any format Spark
reads, normalized into the engine's managed layout". Parquet is the
primary path (sources/ingest.py); these helpers cover csv/json/jsonl
drops and appending external rows into a ParquetLog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..log import ParquetLog


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Format-dispatched read with sane defaults (explicit schema
    preferred — inference is a full extra pass at scale)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "csv":
        options.setdefault("header", "true")
        return reader.options(**options).csv(path)
    if fmt in ("json", "jsonl"):
        return reader.options(**options).json(path)
    raise ValueError(f"unsupported format: {fmt}")


def append_df_to_log(log: ParquetLog, df: DataFrame, order_by: str | None = None) -> int:
    """Bulk-load a DataFrame's rows into the log as one atomic batch.

    Rows become JSON values (the log is schema-less); ``order_by``
    fixes the seq assignment order. The collect is driver-side — this
    is the small-batch path; a 100 TB bulk load writes seq-assigned
    parquet directly via a distributed job and commits the manifest
    once (same protocol, bigger files).
    """
    if order_by is not None:
        df = df.orderBy(order_by)
    json_rows = df.select(F.to_json(F.struct(*df.columns)).alias("j")).collect()
    import json as _json

    return log.append([_json.loads(r.j) for r in json_rows])
