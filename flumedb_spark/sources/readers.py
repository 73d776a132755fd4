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
    if fmt == "orc":
        # ORC is JVM-native in Spark: same predicate-pushdown +
        # column-pruning story as parquet (stripe/row-group min-max)
        return reader.options(**options).orc(path)
    if fmt == "csv":
        options.setdefault("header", "true")
        return reader.options(**options).csv(path)
    if fmt in ("json", "jsonl"):
        return reader.options(**options).json(path)
    raise ValueError(f"unsupported format: {fmt}")


def append_df_to_log(log: ParquetLog, df: DataFrame, order_by: str | None = None) -> int:
    """Bulk-load a DataFrame's rows into the log as one atomic batch.

    Fully distributed: rows are JSON-encoded JVM-side (``to_json``),
    seq-assigned and written to parquet by executors, and committed
    with ONE manifest swap (``ParquetLog.bulk_append_df``) — no row
    ever visits the driver. ``order_by`` fixes the seq-assignment
    order via range partitioning + in-partition sort, so seqs follow
    the key's global order; without it, seqs follow the input's
    partition order.
    """
    if order_by is not None:
        df = df.repartitionByRange(order_by).sortWithinPartitions(order_by)
    return log.bulk_append_df(
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    )


def make_log_batch_writer(log: ParquetLog, order_by: str | None = None):
    """The foreachBatch function used by :func:`log_stream_sink` —
    exposed so the retry-idempotence guard is directly testable."""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        # reload committed state: the previously-committed epoch marker
        # may have been written by a pre-crash incarnation (or another
        # process), which the in-memory snapshot wouldn't reflect
        log.refresh_since()
        if int(log._meta.get("sink_epoch", -1)) >= int(epoch_id):
            return  # crash-retried epoch: already committed atomically
        if order_by is not None:
            batch = batch.orderBy(order_by)
        json_rows = batch.select(
            F.to_json(F.struct(*batch.columns)).alias("j")
        ).collect()
        import json as _json

        log.append(
            [_json.loads(r.j) for r in json_rows],
            meta_updates={"sink_epoch": int(epoch_id)},
        )

    return write_batch


def log_stream_sink(
    stream_df: DataFrame,
    log: ParquetLog,
    checkpoint_dir: str,
    order_by: str | None = None,
    trigger_seconds: float | None = None,
):
    """``writeStream`` INTO the log — the sink direction of the custom
    flumelog source (stream -> append-only log; the source is log ->
    stream). Completes the reference's "any stream in, any view out"
    loop with Structured Streaming on both ends.

    Exactly-once: each micro-batch's rows and the batch's epoch id
    commit in ONE atomic meta rename (``append(meta_updates=...)``), so
    a crash-retried epoch is recognized and skipped — rows can never
    double-append. At 100 TB the same shape lands on a transactional
    table (Delta/Iceberg txn carries the epoch) — the idempotence
    contract is identical.
    """

    write_batch = make_log_batch_writer(log, order_by)
    writer = (
        stream_df.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .outputMode("append")
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
