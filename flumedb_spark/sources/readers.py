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
    if fmt == "delta":
        return read_delta_table(spark, path, version=options.pop("version", None))
    if fmt == "iceberg":
        return read_iceberg_table(
            spark, path, snapshot_id=options.pop("snapshot_id", None)
        )
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


# ---------------------------------------------------------------------
# Open-table-format READERS (r6): resolve a Delta transaction log or an
# Iceberg metadata tree to its live (or time-traveled) file set and
# read it as a DataFrame — no connector jars, just the spec walks in
# delta_export/iceberg_export plus spark.read.parquet over the
# resolved files. Works on any spec-conformant table, not only ones
# this package exported.
# ---------------------------------------------------------------------


def _iceberg_type_to_spark(t) -> str:
    """Iceberg schema JSON type -> Spark DDL fragment (table-spec
    primitive names; struct/list/map recurse)."""
    if isinstance(t, str):
        prim = {
            "boolean": "boolean", "int": "int", "long": "long",
            "float": "float", "double": "double", "date": "date",
            "time": "long",  # Spark has no TimeType; micros since midnight
            "timestamp": "timestamp_ntz", "timestamptz": "timestamp",
            "string": "string", "uuid": "string", "binary": "binary",
        }
        if t in prim:
            return prim[t]
        if t.startswith("decimal("):
            return t
        if t.startswith("fixed["):
            return "binary"
        raise ValueError(f"iceberg: unsupported type {t!r}")
    kind = t.get("type")
    if kind == "struct":
        inner = ", ".join(
            f"`{f['name']}`: {_iceberg_type_to_spark(f['type'])}"
            for f in t["fields"]
        )
        return f"struct<{inner}>"
    if kind == "list":
        return f"array<{_iceberg_type_to_spark(t['element'])}>"
    if kind == "map":
        return (
            f"map<{_iceberg_type_to_spark(t['key'])}, "
            f"{_iceberg_type_to_spark(t['value'])}>"
        )
    raise ValueError(f"iceberg: unsupported complex type {kind!r}")


def iceberg_schema_to_ddl(schema: dict) -> str:
    """Iceberg table schema JSON -> Spark DDL column list."""
    return ", ".join(
        f"`{f['name']}` {_iceberg_type_to_spark(f['type'])}"
        for f in schema["fields"]
    )


def read_delta_table(
    spark: SparkSession, table_root: str, version: int | None = None
) -> DataFrame:
    """Read a Delta table (optionally ``VERSION AS OF version``) by
    replaying its transaction log — checkpoint-aware, no delta jars.
    The schema comes from the log's own metaData action (schemaString
    IS a Spark StructType JSON), so column types survive exactly."""
    from pyspark.sql.types import StructType

    from .delta_export import read_delta_snapshot

    snap = read_delta_snapshot(table_root, at_version=version)
    if snap["version"] < 0 or not snap["files"]:
        raise ValueError(f"delta: no committed snapshot under {table_root}")
    import json as _json
    import os as _os

    paths = [_os.path.join(table_root, p) for p in sorted(snap["files"])]
    reader = spark.read
    meta = snap.get("metaData") or {}
    if meta.get("schemaString"):
        reader = reader.schema(
            StructType.fromJson(_json.loads(meta["schemaString"]))
        )
    return reader.parquet(*paths)


def read_iceberg_table(
    spark: SparkSession,
    table_root: str,
    snapshot_id: int | None = None,
    seq_min: int | None = None,
    seq_max: int | None = None,
) -> DataFrame:
    """Read an Iceberg v2 table (optionally a historical snapshot) by
    walking its metadata tree — manifest-list and manifest Avro files
    decoded with this package's own Avro reader, no iceberg jars. The
    schema comes from the table metadata, mapped to Spark types.

    ``seq_min``/``seq_max`` prune at the MANIFEST level: files whose
    recorded seq bounds (field-id 1 lower/upper_bounds, spec Appendix D
    little-endian longs) cannot intersect the range are never handed to
    Spark at all — the skip happens before any footer is opened, which
    is the entire point of Iceberg column bounds at 100 TB. Files
    without bounds are conservatively kept, and the row-level filter is
    applied on top so results are exact either way."""
    from .iceberg_export import read_iceberg_snapshot

    snap = read_iceberg_snapshot(table_root, snapshot_id=snapshot_id)
    if not snap["files"]:
        raise ValueError(f"iceberg: no committed snapshot under {table_root}")
    paths = sorted(snap["files"])
    if seq_min is not None or seq_max is not None:
        kept = []
        for p in paths:
            bounds = snap["files"][p][3]
            b = (bounds or {}).get(1)
            if b is not None:
                lo = int.from_bytes(b[0], "little", signed=True)
                hi = int.from_bytes(b[1], "little", signed=True)
                if (seq_max is not None and lo > seq_max) or (
                    seq_min is not None and hi < seq_min
                ):
                    continue  # provably disjoint: skip the file
            kept.append(p)
        paths = kept
    if not paths:
        # range provably empty: zero-row frame with the table schema
        ddl = iceberg_schema_to_ddl(snap["schema"]) if snap.get("schema") else "seq long"
        return spark.createDataFrame([], ddl)
    reader = spark.read
    if snap.get("schema"):
        reader = reader.schema(iceberg_schema_to_ddl(snap["schema"]))
    df = reader.parquet(*paths)
    if seq_min is not None:
        df = df.where(F.col("seq") >= seq_min)
    if seq_max is not None:
        df = df.where(F.col("seq") <= seq_max)
    return df
