"""Archive enumeration (operators/archives.py): stdlib zip/tar listing
over binary payloads, exploded Spark surface, corrupt-blob contract."""

import io
import tarfile
import zipfile

import pandas as pd
import pytest

from flumedb_spark.operators import archives as ar


def test_zip_listing_matches_synth_formulas():
    for d in (0, 3, 4, 17, 104):
        ms = ar.list_members(ar.synth_zip(d))
        assert len(ms) == 1 + d % 5
        for i, m in enumerate(ms):
            assert m["member"] == f"f{i}.txt"
            assert m["size_u"] == 10 + (d * 7 + i * 13) % 90
            assert m["method"] == "stored"
    assert ar.synth_zip(5) == ar.synth_zip(5)  # byte-deterministic


def test_zip_methods_and_compression():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("a.txt", b"hello " * 100)
    (m,) = ar.zip_listing(buf.getvalue())
    assert m["method"] == "deflated"
    assert m["size_c"] < m["size_u"] == 600


def test_tar_listing_including_gz():
    for mode in ("w", "w:gz"):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode=mode) as tf:
            for name, data in (("a.txt", b"hello"), ("sub/b.bin", b"\x00" * 100)):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
            d = tarfile.TarInfo("just_a_dir/")
            d.type = tarfile.DIRTYPE
            tf.addfile(d)  # dirs excluded from the listing
        ms = ar.tar_listing(buf.getvalue())
        assert [(m["member"], m["size_u"]) for m in ms] == [
            ("a.txt", 5),
            ("sub/b.bin", 100),
        ]


def test_corrupt_archives_raise_valueerror():
    good = ar.synth_zip(3)
    for bad in (b"", b"PK\x03\x04garbage", b"not an archive", good[:20]):
        with pytest.raises(ValueError):
            ar.list_members(bad)


def test_spark_archive_listing_explodes_and_survives_corruption(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2, 3]}))
    payloads = ar.with_synthetic_zip_payload(docs).toPandas()
    payloads.loc[payloads["doc_id"] == 2, "payload"] = b"garbage"
    pdf = (
        ar.archive_listing(spark.createDataFrame(payloads))
        .orderBy("doc_id", "member")
        .toPandas()
    )
    # doc 1 -> 2 members, doc 2 -> one ok=False row, doc 3 -> 4 members
    assert len(pdf[pdf["doc_id"] == 1]) == 2
    bad = pdf[pdf["doc_id"] == 2]
    assert len(bad) == 1 and not bad["ok"].item() and bad["member"].item() is None
    assert len(pdf[pdf["doc_id"] == 3]) == 4
    assert pdf[pdf["ok"]]["method"].eq("stored").all()


# ---------------------------------------------------------------------
# WARC
# ---------------------------------------------------------------------


def test_warc_records_plain_and_gzip():
    for d in (0, 1, 3, 10):
        for gz in (False, True):
            recs = ar.warc_records(ar.synth_warc(d, gzipped=gz))
            assert recs[0]["record_type"] == "warcinfo"
            assert recs[0]["target_uri"] is None
            assert len(recs) == 2 + d % 4
            for i, r in enumerate(recs[1:]):
                assert r["record_type"] == "response"
                assert r["target_uri"] == f"http://ex.test/{d}/{i}"
                assert r["record_id"] == f"<urn:test:{d}:{i}>"
                assert r["content_length"] == 20 + (d * 11 + i * 17) % 180
    assert ar.synth_warc(5, True) == ar.synth_warc(5, True)  # deterministic


def test_warc_corrupt_raises_valueerror():
    good = ar.synth_warc(3)
    for bad in (
        b"",
        b"HTTP/1.1 200 OK\r\n\r\n",
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\n",  # no Content-Length
        good[: len(good) // 2],                       # truncated body
        b"\x1f\x8bgarbage-not-gzip",
    ):
        with pytest.raises(ValueError):
            ar.warc_records(bad)


def test_spark_warc_listing_explodes(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2]}))
    pdf = (
        ar.warc_listing(ar.with_synthetic_warc_payload(docs))
        .orderBy("doc_id", "record_id")
        .toPandas()
    )
    # doc 1: warcinfo + 2 responses; doc 2: warcinfo + 3 responses
    assert len(pdf[pdf["doc_id"] == 1]) == 3
    assert len(pdf[pdf["doc_id"] == 2]) == 4
    assert pdf["ok"].all()
    # record_id sort puts responses (':<i>') before warcinfo (':info')
    assert list(pdf[pdf["doc_id"] == 1]["record_type"]) == [
        "response", "response", "warcinfo",
    ]


# ---------------------------------------------------------------------
# data-file triage (avro OCF headers, parquet footers)
# ---------------------------------------------------------------------


def test_avro_ocf_header_and_block_walk():
    m = ar.avro_meta(ar.encode_avro_skeleton("mytbl", 4, (5, 7, 2), codec="deflate"))
    assert m == {
        "schema_name": "mytbl", "schema_type": "record", "n_fields": 4,
        "codec": "deflate", "n_blocks": 3, "n_records": 14,
    }


def test_parquet_footer_meta_and_dispatch():
    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(
        pa.table({"a": list(range(100)), "b": ["x"] * 100}), buf, row_group_size=40
    )
    m = ar.parquet_meta(buf.getvalue())
    assert (m["n_rows"], m["n_row_groups"], m["n_columns"]) == (100, 3, 2)
    d = ar.datafile_meta(buf.getvalue())
    assert d["format"] == "parquet" and d["n_rows"] == 100
    d2 = ar.datafile_meta(ar.encode_avro_skeleton())
    assert d2["format"] == "avro" and d2["n_rows"] == 12


def test_datafile_corrupt_and_fuzz():
    """Truncation/byte-flip fuzz for the avro and warc walkers — both
    had (now-guarded) corrupt-length paths that could move the stream
    position BACKWARDS into an infinite loop."""
    import random

    for bad in (b"", b"PAR1junk", b"Obj\x01\xff\xff", b"whatever"):
        with pytest.raises(ValueError):
            ar.datafile_meta(bad)
    rng = random.Random(7)
    for fn, good in (
        (ar.avro_meta, ar.encode_avro_skeleton("t", 2, (3,))),
        (ar.warc_records, ar.synth_warc(6, gzipped=False)),
    ):
        for cut in range(len(good)):
            try:
                fn(good[:cut])
            except ValueError:
                pass
        for _ in range(1500):
            b = bytearray(good)
            for _ in range(rng.randint(1, 3)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                fn(bytes(b))
            except ValueError:
                pass


# ---------------------------------------------------------------------
# round-6: extraction stage (listing -> content rows) + datafile df
# ---------------------------------------------------------------------


def test_extract_members_roundtrips_and_caps():
    for d in (0, 3, 9):
        ms = ar.extract_members(ar.synth_zip(d))
        assert len(ms) == 1 + d % 5
        for m in ms:
            assert m["content"] == b"x" * m["size"]
            assert not m["truncated"]
    capped = ar.extract_members(ar.synth_zip(9), cap=5)
    assert all(len(m["content"]) == 5 and m["truncated"] and m["size"] > 5
               for m in capped)
    # size reports the TRUE size even when capped
    assert [m["size"] for m in capped] == [m["size"] for m in ar.extract_members(ar.synth_zip(9))]


def test_extract_members_tar_and_pattern():
    import io as _io
    import tarfile as _tar

    buf = _io.BytesIO()
    with _tar.open(fileobj=buf, mode="w:gz") as tf:
        for name, data in (("a/keep.txt", b"K" * 30), ("a/skip.bin", b"S" * 10)):
            ti = _tar.TarInfo(name)
            ti.size = len(data)
            tf.addfile(ti, _io.BytesIO(data))
    ms = ar.extract_members(buf.getvalue(), member_pattern=r"\.txt$")
    assert [(m["member"], m["content"]) for m in ms] == [("a/keep.txt", b"K" * 30)]


def test_warc_bodies_strip_http_and_types():
    # handcrafted response whose block is a full HTTP message
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello corpus"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:x:1>\r\n"
        b"WARC-Target-URI: http://e.test/\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode() + http + b"\r\n\r\n"
    )
    recs = ar.warc_records(rec, with_bodies=True)
    assert recs[0]["body"] == http
    assert ar.strip_http_payload(recs[0]["body"]) == b"hello corpus"


def test_spark_warc_bodies_and_archive_extract(spark):
    docs = spark.range(0, 8).selectExpr("id AS doc_id")
    payloads = ar.with_synthetic_warc_payload(docs)
    rows = ar.warc_bodies(payloads).orderBy("doc_id", "record_id").collect()
    # warcinfo records filtered: only responses, bodies intact
    assert all(r.ok for r in rows)
    assert len(rows) == sum(1 + d % 4 for d in range(8))
    for r in rows:
        assert bytes(r.body) == b"y" * r.content_length
        assert not r.truncated
    zrows = ar.archive_extract(ar.with_synthetic_zip_payload(docs)).collect()
    assert len(zrows) == sum(1 + d % 5 for d in range(8))
    assert all(bytes(r.content) == b"x" * r.size for r in zrows)
    # corrupt payload -> single ok=False row, not a partition failure
    bad = spark.createDataFrame([(99, bytearray(b"PK\x03\x04garbage"))],
                                "doc_id long, payload binary")
    brows = ar.archive_extract(bad).collect()
    assert len(brows) == 1 and not brows[0].ok


def test_spark_datafile_meta_df(spark):
    docs = spark.range(0, 10).selectExpr("id AS doc_id")
    rows = (
        ar.datafile_meta_df(ar.with_synthetic_datafile_payload(docs))
        .orderBy("doc_id")
        .collect()
    )
    assert [r.format for r in rows] == ["parquet", "avro"] * 5
    for r in rows:
        d = r.doc_id
        if d % 2 == 0:
            assert r.n_rows == 1 + d % 10 and r.n_columns == 1 + d % 3
            assert r.n_row_groups == (4 + d % 10) // 4
            assert r.codec == ("uncompressed" if d % 4 == 0 else "snappy")
        else:
            assert r.n_rows == 2 + d % 5 + d % 3 and r.n_row_groups == 2
            assert r.created_by == "rec"
    bad = spark.createDataFrame([(7, bytearray(b"Obj\x01\xff\xff"))],
                                "doc_id long, payload binary")
    brows = ar.datafile_meta_df(bad).collect()
    assert len(brows) == 1 and not brows[0].ok


def test_extraction_fuzz_truncation_and_byteflips():
    """Same fuzz contract for the r6 extraction stage: extract_members
    and warc_records(with_bodies=True) raise only _MALFORMED types on
    corrupt input (the Spark kernels map those to ok=False rows)."""
    import random

    zip_good = ar.synth_zip(9)
    warc_good = ar.synth_warc(7, gzipped=True)
    for good, fn in (
        (zip_good, ar.extract_members),
        (warc_good, lambda p: ar.warc_records(p, with_bodies=True)),
    ):
        for cut in range(0, len(good), 5):
            try:
                fn(good[:cut])
            except ar._MALFORMED:
                pass
        rng = random.Random(13)
        for _ in range(300):
            b = bytearray(good)
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                fn(bytes(b))
            except ar._MALFORMED:
                pass


def test_datafile_synth_fuzz():
    import random

    rng = random.Random(17)
    for d in (0, 1, 2, 3):
        good = ar.synth_datafile(d)
        for cut in range(0, len(good), 9):
            try:
                ar.datafile_meta(good[:cut])
            except ar._MALFORMED:
                pass
        for _ in range(150):
            b = bytearray(good)
            for _ in range(rng.randint(1, 3)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                ar.datafile_meta(bytes(b))
            except ar._MALFORMED:
                pass


# ---------------------------------------------------------------------
# Avro record decoding (r6: the load stage after datafile triage)
# ---------------------------------------------------------------------


def test_avro_records_roundtrip_both_codecs_multiblock():
    rows = [
        {"c0": i * 10 - 5, "c1": "s" * (i % 4), "c2": i / 8.0, "b": i % 2 == 0}
        for i in range(11)
    ]
    fields = [("c0", "long"), ("c1", "string"), ("c2", "double"), ("b", "boolean")]
    for codec in ("null", "deflate"):
        p = ar.encode_avro_records(rows, fields, codec=codec, block_records=3)
        assert ar.avro_records(p) == rows  # 4 blocks, exact round-trip
        m = ar.avro_meta(p)
        assert (m["n_records"], m["n_blocks"], m["codec"]) == (11, 4, codec)


def test_avro_records_complex_types_and_named_refs():
    """Hand-built buffer: union/array/map/enum/fixed decode plus a
    named-type reference (spec: Binary Encoding + Names)."""
    sch = {
        "type": "record",
        "name": "outer",
        "fields": [
            {"name": "u", "type": ["null", "long"]},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "e", "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "FX", "size": 3}},
            {"name": "fx2", "type": "FX"},  # named reference
        ],
    }
    names = {}
    ar._register_named(sch, names)
    z = ar._avro_zz
    buf = (
        z(1) + z(42)                      # union branch 1 -> long 42
        + z(2) + z(1) + z(2) + z(0)       # array [1, 2]
        + z(1) + z(1) + b"k" + z(2) + b"vv" + z(0)  # map {k: vv}
        + z(1)                            # enum B
        + b"xyz" + b"abc"                 # fixed + named-ref fixed
    )
    v, pos = ar._decode_avro_value(buf, 0, sch, names)
    assert pos == len(buf)
    assert v == {"u": 42, "arr": [1, 2], "m": {"k": "vv"}, "e": "B",
                 "fx": b"xyz", "fx2": b"abc"}
    # negative array block count (size-prefixed form) decodes too
    buf2 = z(-2) + z(2) + z(3) + z(4) + z(0)
    arr, p2 = ar._decode_avro_value(buf2, 0, {"type": "array", "items": "int"}, {})
    assert arr == [3, 4] and p2 == len(buf2)


def test_avro_records_guards_bombs_and_trailing_bytes():
    z = ar._avro_zz
    # array claiming 2^40 zero-byte (null) items must raise, not loop
    with pytest.raises(ValueError):
        ar._decode_avro_value(z(1 << 40), 0, {"type": "array", "items": "null"}, {})
    # a block whose declared record count leaves trailing bytes is corrupt
    rows = [{"c0": 1}, {"c0": 2}]
    p = ar.encode_avro_records(rows, [("c0", "long")], block_records=2)
    tampered = p.replace(z(2) + z(2), z(1) + z(2), 1)  # claim 1 rec, 2 bytes
    with pytest.raises(ValueError):
        ar.avro_records(tampered)
    # non-record top-level schema rejected
    bad = ar.encode_avro_records([{"c0": 1}], [("c0", "long")])
    bad = bad.replace(b'"type": "record"', b'"type": "recorX"', 1)
    with pytest.raises(ValueError):
        ar.avro_records(bad)


def test_avro_records_fuzz_never_hangs():
    import random

    rng = random.Random(23)
    for d in (0, 3, 7):  # covers null and deflate synth payloads
        good = ar.synth_avro_records(d)
        assert ar.avro_records(good) == ar.avro_records(good)
        for cut in range(0, len(good), 7):
            try:
                ar.avro_records(good[:cut])
            except ar._MALFORMED:
                pass
        for _ in range(300):
            b = bytearray(good)
            for _ in range(rng.randint(1, 3)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                ar.avro_records(bytes(b))
            except ar._MALFORMED:
                pass


def test_spark_avro_records_df(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1, 3, 5, 8]}))
    payloads = ar.with_synthetic_avro_payload(docs)
    out = ar.avro_records_df(payloads, "c0 long, c1 string, c2 double")
    rows = {(r.doc_id, r.rec_idx): r for r in out.collect()}
    assert len(rows) == sum(1 + d % 6 for d in (0, 1, 3, 5, 8))
    r = rows[(5, 2)]
    assert (r.c0, r.c1, r.c2, r.ok) == (502, "a", 17 / 4.0, True)
    # corrupt payload -> single ok=False row, fields null
    bad = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "payload": [b"Obj\x01garbage"]})
    )
    (row,) = ar.avro_records_df(bad, "c0 long, c1 string, c2 double").collect()
    assert (row.ok, row.c0, row.c1) == (False, None, None)


def test_parquet_records_roundtrip_and_projection():
    for d in (0, 1, 4, 9):
        recs = ar.parquet_records(ar.synth_parquet_records(d))
        assert len(recs) == 1 + d % 7
        assert recs[0] == {"c0": d * 1000, "c1": "b" * (1 + d % 5)}
    # column projection pushes into the pyarrow read
    only_c0 = ar.parquet_records(ar.synth_parquet_records(3), columns=["c0"])
    assert only_c0[0] == {"c0": 3000}
    import pytest as _pytest

    for bad in (b"", b"PAR1", b"PAR1" + b"x" * 40, ar.synth_parquet_records(2)[:-5]):
        with _pytest.raises(ValueError):
            ar.parquet_records(bad)


def test_spark_parquet_records_df(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 2, 5]}))
    payloads = ar.with_synthetic_parquet_payload(docs)
    out = ar.parquet_records_df(payloads, "c0 long, c1 string")
    rows = {(r.doc_id, r.rec_idx): r for r in out.collect()}
    assert len(rows) == sum(1 + d % 7 for d in (0, 2, 5))
    assert rows[(5, 1)].c0 == 5002 and rows[(5, 1)].c1 == "bb"
    bad = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "payload": [b"PAR1 not parquet"]})
    )
    (row,) = ar.parquet_records_df(bad, "c0 long, c1 string").collect()
    assert (row.ok, row.c0) == (False, None)


def test_avro_logical_types():
    """Spec 'Logical Types': decimal/date/time/timestamp/uuid decode to
    proper Python values; unknown logical types and un-annotated fields
    fall back to base values; union-wrapped logical branches resolve."""
    import datetime
    import decimal

    sch = {
        "type": "record", "name": "lt", "fields": [
            {"name": "d", "type": {"type": "int", "logicalType": "date"}},
            {"name": "tmu", "type": {"type": "long", "logicalType": "time-micros"}},
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
            {"name": "dec", "type": {"type": "bytes", "logicalType": "decimal",
                                     "precision": 9, "scale": 2}},
            {"name": "u", "type": ["null", {"type": "long",
                                            "logicalType": "timestamp-millis"}]},
            {"name": "mystery", "type": {"type": "long",
                                         "logicalType": "not-a-real-one"}},
            {"name": "plain", "type": "string"},
        ],
    }
    rows = [
        {"d": 19723, "tmu": 3_600_000_000, "ts": 1_700_000_000_000_000,
         "dec": (-12345).to_bytes(3, "big", signed=True),
         "u": 1_700_000_000_123, "mystery": 9, "plain": "x"},
        {"d": 0, "tmu": 0, "ts": 0, "dec": (255).to_bytes(2, "big"),
         "u": None, "mystery": -1, "plain": ""},
    ]
    for codec in ("null", "snappy"):
        out = ar.avro_records_logical(ar.encode_avro_ocf(sch, rows, codec=codec))
        assert out[0]["d"] == datetime.date(2024, 1, 1)
        assert out[0]["tmu"] == datetime.time(1, 0)
        assert out[0]["ts"] == datetime.datetime(
            2023, 11, 14, 22, 13, 20, tzinfo=datetime.timezone.utc
        )
        assert out[0]["dec"] == decimal.Decimal("-123.45")
        assert out[0]["u"].microsecond == 123000 and out[1]["u"] is None
        assert out[0]["mystery"] == 9  # unknown logical -> base value
        assert out[1]["d"] == datetime.date(1970, 1, 1)
        assert out[1]["dec"] == decimal.Decimal("2.55")
    # files without logical annotations take the identity fast path
    p = ar.synth_avro_records(4)
    assert ar.avro_records_logical(p) == ar.avro_records(p)
