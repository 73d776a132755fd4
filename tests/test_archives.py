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
