"""WebDataset-style tar-shard sink (sources/tar_sink.py): byte
determinism, member layout (sorted keys, adjacent same-key members),
and round-trip content equality through the package's own archive
extraction. The oracle row (src_tar_roundtrip) pins the cross-engine
aggregates; these pin the shard bytes and the webdataset conventions.
"""

import io
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from flumedb_spark.sources.tar_sink import read_tar_shards, write_tar_shards


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (7, "seven text", b"\x00\x01seven", "es"),
            (1, "one text", b"\xffbinary1", "en"),
            (30, "thirty", b"", "de"),
        ],
        "doc_id long, text string, blob binary, lang string",
    )


def _shard_paths(path):
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".tar")
    )


def test_member_layout_and_contents(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    manifest = write_tar_shards(
        docs.coalesce(1), out, key_col="doc_id",
        members={"text": "txt", "blob": "bin", "lang": "lang"},
    )
    assert len(manifest) == 1
    assert manifest[0]["n_samples"] == 3 and manifest[0]["n_members"] == 9
    with tarfile.open(_shard_paths(out)[0]) as tf:
        names = tf.getnames()
        # sorted by key, members of one sample adjacent, exts sorted
        assert names == [
            "000000000001.bin", "000000000001.lang", "000000000001.txt",
            "000000000007.bin", "000000000007.lang", "000000000007.txt",
            "000000000030.bin", "000000000030.lang", "000000000030.txt",
        ]
        assert tf.extractfile("000000000001.bin").read() == b"\xffbinary1"
        assert tf.extractfile("000000000007.txt").read() == b"seven text"
        assert tf.extractfile("000000000030.bin").read() == b""
        for m in tf.getmembers():
            assert (m.mtime, m.uid, m.gid, m.mode) == (0, 0, 0, 0o644)


def test_shard_bytes_deterministic(spark, docs, tmp_path):
    blobs = []
    for d in ("a", "b"):
        out = str(tmp_path / d)
        write_tar_shards(docs.coalesce(1), out, key_col="doc_id")
        blobs.append(open(_shard_paths(out)[0], "rb").read())
    assert blobs[0] == blobs[1]


def test_roundtrip_through_archive_extract(spark, docs, tmp_path):
    out = str(tmp_path / "rt")
    write_tar_shards(
        docs.repartition(2), out, key_col="doc_id", members={"text": "txt"}
    )
    back = {
        r.member: bytes(r.content)
        for r in read_tar_shards(spark, out).collect()
    }
    want = {
        f"{r.doc_id:012d}.txt": r.text.encode()
        for r in docs.collect()
    }
    assert back == want


def test_unknown_member_column_raises(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="unknown member columns"):
        write_tar_shards(
            docs, str(tmp_path / "x"), key_col="doc_id", members={"nope": "n"}
        )


def test_non_string_columns_json_encoded(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [3, 1], 2.5)], "doc_id long, arr array<long>, x double"
    )
    out = str(tmp_path / "j")
    write_tar_shards(df, out, key_col="doc_id")
    with tarfile.open(_shard_paths(out)[0]) as tf:
        assert tf.extractfile("000000000001.arr").read() == b"[3, 1]"
        assert tf.extractfile("000000000001.x").read() == b"2.5"
