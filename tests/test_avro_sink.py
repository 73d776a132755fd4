"""Distributed Avro OCF sink (sources/avro_sink.py): schema mapping,
executor-side shard writes, and exact round-trips through the
package's own decoder."""

import datetime
import decimal

import pytest

from flumedb_spark.operators.archives import avro_meta, avro_records_df
from flumedb_spark.sources.avro_sink import (
    read_avro_ocf,
    spark_to_avro_schema,
    write_avro_ocf,
)


def test_schema_mapping_covers_types(spark):
    df = spark.createDataFrame(
        [],
        "a long, b int, c double, d string, e boolean, f binary, "
        "g date, h timestamp, i decimal(9,2), "
        "arr array<long>, m map<string,string>, "
        "s struct<x: long, y: string>",
    )
    sch = spark_to_avro_schema(df.schema, name="t")
    by_name = {f["name"]: f["type"] for f in sch["fields"]}
    assert by_name["a"] == ["null", "long"]
    assert by_name["b"] == ["null", "int"]
    assert by_name["g"][1] == {"type": "int", "logicalType": "date"}
    assert by_name["h"][1] == {"type": "long", "logicalType": "timestamp-micros"}
    assert by_name["i"][1]["logicalType"] == "decimal"
    assert by_name["i"][1]["scale"] == 2
    assert by_name["arr"][1]["type"] == "array"
    assert by_name["m"][1]["type"] == "map"
    assert by_name["s"][1]["type"] == "record"
    with pytest.raises(ValueError):
        spark_to_avro_schema(
            spark.createDataFrame([], "m map<int,string>").schema
        )


def test_roundtrip_scalars_and_logical(spark, tmp_path):
    rows = [
        (1, "x", 2.5, True, b"\x01\x02",
         datetime.date(2024, 1, 1),
         datetime.datetime(2023, 11, 14, 22, 13, 20, 123000),
         decimal.Decimal("-123.45")),
        (2, None, None, None, None, None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "a long, s string, d double, b boolean, raw binary, "
        "dt date, ts timestamp, dec decimal(9,2)",
    ).repartition(3)
    out = str(tmp_path / "avro_out")
    manifest = write_avro_ocf(df, out, codec="deflate")
    assert sum(m["n_records"] for m in manifest) == 2
    back = read_avro_ocf(spark, out)
    back_by_a = {r["a"]: r for r in back}
    r1 = back_by_a[1]
    assert r1["s"] == "x" and r1["d"] == 2.5 and r1["b"] is True
    assert bytes(r1["raw"]) == b"\x01\x02"
    assert r1["dt"] == datetime.date(2024, 1, 1)
    assert r1["ts"].replace(tzinfo=None) == datetime.datetime(
        2023, 11, 14, 22, 13, 20, 123000
    )
    assert r1["dec"] == decimal.Decimal("-123.45")
    r2 = back_by_a[2]
    assert all(r2[k] is None for k in ("s", "d", "b", "raw", "dt", "ts", "dec"))


def test_roundtrip_nested_and_codecs(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [1, 2, 3], {"k": "v"}, (10, "in")),
         (2, [], {}, (20, None))],
        "a long, arr array<long>, m map<string,string>, s struct<x: long, y: string>",
    )
    for codec in ("null", "deflate", "snappy"):
        out = str(tmp_path / f"avro_{codec}")
        write_avro_ocf(df.coalesce(1), out, codec=codec)
        back = sorted(read_avro_ocf(spark, out), key=lambda r: r["a"])
        assert back[0]["arr"] == [1, 2, 3]
        assert back[0]["m"] == {"k": "v"}
        assert back[0]["s"] == {"x": 10, "y": "in"}
        assert back[1]["arr"] == [] and back[1]["m"] == {}
        assert back[1]["s"] == {"x": 20, "y": None}
        import glob
        import os

        (shard,) = glob.glob(os.path.join(out, "*.avro"))
        with open(shard, "rb") as f:
            assert avro_meta(f.read())["codec"] == codec


def test_sink_feeds_distributed_reader(spark, tmp_path):
    """The full loop: DF -> OCF shards -> binary payload column ->
    avro_records_df (the distributed read path) -> same rows."""
    import glob
    import os

    import pandas as pd

    df = spark.range(100).selectExpr("id AS c0", "CAST(id AS STRING) AS c1")
    out = str(tmp_path / "loop")
    write_avro_ocf(df.repartition(4), out, codec="snappy")
    payloads = []
    for i, p in enumerate(sorted(glob.glob(os.path.join(out, "*.avro")))):
        with open(p, "rb") as f:
            payloads.append((i, f.read()))
    pdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": [i for i, _ in payloads],
                      "payload": [b for _, b in payloads]})
    )
    back = avro_records_df(pdf, "c0 long, c1 string")
    got = sorted((r.c0, r.c1) for r in back.collect())
    assert got == [(i, str(i)) for i in range(100)]


def test_empty_partitions_write_no_shards(spark, tmp_path):
    df = spark.range(3).repartition(8)  # most partitions empty
    out = str(tmp_path / "sparse")
    manifest = write_avro_ocf(df, out)
    assert sum(m["n_records"] for m in manifest) == 3
    import glob
    import os

    shards = glob.glob(os.path.join(out, "*.avro"))
    assert len(shards) == len(manifest) <= 3
