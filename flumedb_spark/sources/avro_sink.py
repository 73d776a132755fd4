"""Distributed Avro OCF sink: write a DataFrame as Avro object
container files, one shard per partition, using the package's own
spec encoder (`operators/archives.encode_avro_ocf`) — no Avro library
exists in this container, which is exactly why the encoder exists.

Executors each encode and write their partition to
``<path>/part-<pid>-<uuid>.avro`` (shared storage in a cluster — the
same assumption ParquetLog's distributed bulk writer makes), and the
driver collects only the tiny per-shard manifest (file, record count).
Schema mapping (Spark -> Avro, nullable -> union with null):

  long/int/short/byte -> long/int  double/float -> double/float
  string -> string                 binary -> bytes
  boolean -> boolean               date -> int + logicalType date
  timestamp -> long + logicalType timestamp-micros
  decimal(p,s) -> bytes + logicalType decimal
  array/map/struct -> array/map/record (recursive)

Round-trips are pinned by tests/test_avro_sink.py via
``archives.avro_records_logical`` over every written shard.
"""

from __future__ import annotations

import os
import uuid
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def spark_to_avro_schema(schema: T.StructType, name: str = "row") -> dict:
    """Map a Spark StructType to an Avro record schema (JSON dict)."""
    counter = [0]

    def field_type(dt: T.DataType, nullable: bool, path: str):
        avro = base_type(dt, path)
        return ["null", avro] if nullable else avro

    def base_type(dt: T.DataType, path: str):
        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            return "long" if isinstance(dt, T.LongType) else "int"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DecimalType):
            return {
                "type": "bytes", "logicalType": "decimal",
                "precision": dt.precision, "scale": dt.scale,
            }
        if isinstance(dt, T.ArrayType):
            return {
                "type": "array",
                "items": field_type(dt.elementType, dt.containsNull, path),
            }
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise ValueError("avro sink: map keys must be strings")
            return {
                "type": "map",
                "values": field_type(dt.valueType, dt.valueContainsNull, path),
            }
        if isinstance(dt, T.StructType):
            counter[0] += 1
            return {
                "type": "record",
                "name": f"{name}_r{counter[0]}",
                "fields": [
                    {
                        "name": f.name,
                        "type": field_type(f.dataType, f.nullable, f"{path}.{f.name}"),
                    }
                    for f in dt.fields
                ],
            }
        raise ValueError(f"avro sink: unsupported Spark type {dt} at {path}")

    top = base_type(schema, "$")
    top["name"] = name
    return top


def _to_avro_value(v, dt: T.DataType, tz: str = "UTC"):
    """Convert a pandas/python cell to the value shape the encoder
    expects for the mapped Avro type.

    ``tz``: the Spark session timezone. Arrow batches hand timestamps
    to Python NAIVE in the session zone (Spark's documented toPandas/
    mapInPandas conversion), so a naive value must be localized to
    ``tz`` before taking epoch micros — treating it as UTC shifted
    every written timestamp-micros by the zone offset whenever
    spark.sql.session.timeZone != UTC (ADVICE r6)."""
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and v != v):  # NaN-as-null
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(dt, T.DateType):
        if isinstance(v, pd.Timestamp):
            v = v.date()
        return (v - datetime.date(1970, 1, 1)).days
    if isinstance(dt, T.TimestampType):
        ts = pd.Timestamp(v)
        if ts is pd.NaT:
            return None
        if ts.tz is None:
            # naive == session-local, per Arrow. Deterministic DST policy
            # (ADVICE r7): a wall time inside a fall-back fold resolves to
            # the DST (earlier) instant, one inside a spring-forward gap
            # shifts forward to the first valid instant — a bare
            # tz_localize raises Ambiguous/NonExistentTimeError and kills
            # the whole export for one such row.
            ts = ts.tz_localize(tz, ambiguous=True, nonexistent="shift_forward")
        return int(ts.value // 1000)  # ns (UTC epoch) -> us
    if isinstance(dt, T.DecimalType):
        d = decimal.Decimal(v).scaleb(dt.scale)
        unscaled = int(d.to_integral_value())
        n = max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(n, "big", signed=True)
    if isinstance(dt, T.ArrayType):
        return [_to_avro_value(x, dt.elementType, tz) for x in v]
    if isinstance(dt, T.MapType):
        return {str(k): _to_avro_value(x, dt.valueType, tz) for k, x in dict(v).items()}
    if isinstance(dt, T.StructType):
        if hasattr(v, "asDict"):
            v = v.asDict()
        return {
            f.name: _to_avro_value(dict(v).get(f.name), f.dataType, tz)
            for f in dt.fields
        }
    if isinstance(dt, T.BinaryType):
        return bytes(v)
    return v


def write_avro_ocf(
    df: DataFrame,
    path: str,
    codec: str = "deflate",
    block_records: int = 1000,
    record_name: str = "row",
) -> list[dict]:
    """Write ``df`` as Avro OCF shards under ``path`` (one file per
    non-empty partition, executor-side — fully distributed; no row
    visits the driver). Returns the shard manifest
    ``[{"file", "n_records"}, ...]``."""
    import pandas as pd

    from ..operators.archives import encode_avro_ocf

    os.makedirs(path, exist_ok=True)
    schema = df.schema
    avro_schema = spark_to_avro_schema(schema, name=record_name)
    fields = [(f.name, f.dataType) for f in schema.fields]
    # captured on the driver, closed over into the executor kernel:
    # Arrow hands timestamps to Python naive in THIS zone
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[dict] = []
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                rows.append(
                    {n: _to_avro_value(rec.get(n), dt, session_tz)
                     for n, dt in fields}
                )
        if not rows:
            yield pd.DataFrame({"file": [], "n_records": []})
            return
        payload = encode_avro_ocf(
            avro_schema, rows, codec=codec, block_records=block_records
        )
        fname = f"part-{os.getpid()}-{uuid.uuid4().hex}.avro"
        tmp = os.path.join(path, f".tmp.{fname}")
        with open(tmp, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, os.path.join(path, fname))
        yield pd.DataFrame({"file": [fname], "n_records": [len(rows)]})

    manifest = df.mapInPandas(run, "file string, n_records long").collect()
    return [
        {"file": r.file, "n_records": r.n_records}
        for r in manifest
        if r.file is not None
    ]


def read_avro_ocf(spark, path: str, logical: bool = True):
    """Read back OCF shards under ``path`` as a list of dicts (driver-
    side convenience reader for manifests and tests — for big data,
    load the shards as binary payloads and use
    ``archives.avro_records_df`` distributed)."""
    from ..operators.archives import avro_records, avro_records_logical

    decode = avro_records_logical if logical else avro_records
    out: list[dict] = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".avro") and not name.startswith("."):
            with open(os.path.join(path, name), "rb") as f:
                out.extend(decode(f.read()))
    return out
