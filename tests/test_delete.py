"""Record redaction (right-to-be-forgotten): ``ParquetLog.delete_seqs``
+ ``Flume.delete_where``. Pins the full contract: reads exclude
redacted rows immediately, views rebuild to the redacted state,
``since`` does not move, appends continue, the redaction survives
reopen, physical bytes are erased at vacuum, and the behavior holds
across all three log backends."""

from __future__ import annotations

import os

import pytest

from flumedb_spark.engine import Flume
from flumedb_spark.log import OffsetLog, ParquetLog, VersionedLog
from flumedb_spark.views.reduce import Reduce


def sum_foo(a, i):
    return (a or 0) + i["foo"]


def _scan_bytes(data_dir: str, needle: bytes) -> bool:
    for f in os.listdir(data_dir):
        p = os.path.join(data_dir, f)
        if os.path.isfile(p):
            with open(p, "rb") as fh:
                if needle in fh.read():
                    return True
    return False


def test_delete_where_redacts_reads_views_and_bytes(spark, tmp_log_dir):
    db = Flume(tmp_log_dir + "/db", spark=spark)
    db.use("sum", Reduce(1, sum_foo))
    marker = "FORGET-ME-7f3a"
    seqs = [
        db.append({"foo": i, "who": marker if i % 3 == 0 else "keep"})
        for i in range(9)
    ]
    assert db.sum.get() == sum(range(9))
    head_before = db.since

    n = db.delete_where(f"get_json_object(value, '$.who') = '{marker}'")
    assert n == 3  # i = 0, 3, 6

    # since is the append watermark: redaction must not move it
    assert db.since == head_before
    # reads exclude redacted rows immediately (engine get: KeyError)
    for victim in (seqs[0], seqs[3]):
        with pytest.raises(KeyError):
            db.get(victim)
    assert [i["value"]["foo"] for i in db.stream()] == [1, 2, 4, 5, 7, 8]
    # the view REBUILT to the redacted state (not a stale fold)
    assert db.sum.get() == 1 + 2 + 4 + 5 + 7 + 8
    # appends continue past redaction; seqs stay monotonic
    s_new = db.append({"foo": 100, "who": "keep"})
    assert s_new > seqs[-1]
    assert db.sum.get() == 1 + 2 + 4 + 5 + 7 + 8 + 100

    # physical erasure: pre-vacuum the old files still exist (reader
    # retention), post-vacuum the marker bytes are GONE from disk
    data_dir = db.log.data_dir
    assert _scan_bytes(data_dir, marker.encode())
    assert db.log.vacuum(older_than_seconds=0) > 0
    assert not _scan_bytes(data_dir, marker.encode())
    db.close()


def test_delete_survives_reopen(spark, tmp_log_dir):
    path = tmp_log_dir + "/db"
    db = Flume(path, spark=spark)
    seqs = [db.append({"foo": i}) for i in range(5)]
    assert db.delete_seqs([seqs[1], seqs[3]]) == 2
    db.close()

    db2 = Flume(path, spark=spark)
    with pytest.raises(KeyError):
        db2.get(seqs[1])
    assert [i["value"]["foo"] for i in db2.stream()] == [0, 2, 4]
    # deleted counter persisted in the manifest
    assert db2.log._load_meta().get("deleted") == 2
    db2.close()


def test_delete_unknown_and_empty_are_noops(spark, tmp_log_dir):
    db = Flume(tmp_log_dir + "/db", spark=spark)
    s = db.append({"foo": 1})
    assert db.delete_seqs([]) == 0
    assert db.delete_seqs([s + 999]) == 0
    assert db.get(s)["foo"] == 1
    db.close()


@pytest.mark.parametrize("backend", [ParquetLog, OffsetLog, VersionedLog])
def test_delete_contract_across_backends(spark, tmp_log_dir, backend):
    log = backend(tmp_log_dir + f"/log_{backend.__name__}")
    seqs = [log.append({"foo": i}) for i in range(12)]
    victims = [seqs[i] for i in (0, 5, 11)]
    assert log.delete_seqs(spark, victims) == 3
    left = log.stream_df(spark).collect()
    left_seqs = [r["seq"] for r in left]
    assert set(left_seqs) == set(seqs) - set(victims)
    assert log.since == seqs[-1]  # watermark unmoved even for tail delete
    # redaction composes with compaction (same file-swap protocol)
    log.compact(spark)
    assert [r["seq"] for r in log.stream_df(spark).collect()] == sorted(left_seqs)
    log.destroy()


def test_delete_then_compact_then_delete(spark, tmp_log_dir):
    log = ParquetLog(tmp_log_dir + "/log")
    seqs = [log.append({"foo": i}) for i in range(10)]
    assert log.delete_seqs(spark, seqs[:2]) == 2
    log.compact(spark)
    assert log.delete_seqs(spark, [seqs[5]]) == 1
    assert [r["seq"] for r in log.stream_df(spark).collect()] == seqs[2:5] + seqs[6:]
    log.destroy()


def test_delete_propagates_through_delta_export(spark, tmp_log_dir):
    """Redaction maps to Delta remove+add like compaction does: after a
    delete + export sync, an external reader's snapshot reconstruction
    sees exactly the redacted row set."""
    import os as _os

    from flumedb_spark.log import LOG_SCHEMA
    from flumedb_spark.sources.delta_export import (
        export_delta_log,
        read_delta_snapshot,
    )

    log = ParquetLog(tmp_log_dir + "/dlog")
    seqs = [log.append({"foo": i}) for i in range(8)]
    export_delta_log(log)
    assert log.delete_seqs(spark, [seqs[2], seqs[6]]) == 2
    v = export_delta_log(log, operation="DELETE")
    assert v >= 1

    snap = read_delta_snapshot(log.path)
    paths = [_os.path.join(log.path, p) for p in sorted(snap["files"])]
    via_delta = spark.read.schema(LOG_SCHEMA).parquet(*paths)
    assert {r.seq for r in via_delta.select("seq").collect()} == (
        set(seqs) - {seqs[2], seqs[6]}
    )
    log.destroy()


def test_delete_seqs_dataframe_targets_equivalent(spark, tmp_log_dir):
    """The bulk-redaction form (DataFrame target set, anti-join rewrite)
    must behave exactly like the list form — including the empty-set
    no-op — with the target seqs never collected to the driver."""
    la = ParquetLog(tmp_log_dir + "/list_form")
    lb = ParquetLog(tmp_log_dir + "/df_form")
    seqs_a = [la.append({"foo": i}) for i in range(15)]
    seqs_b = [lb.append({"foo": i}) for i in range(15)]
    victims = [s for i, s in enumerate(seqs_a) if i % 4 == 0]

    assert la.delete_seqs(spark, victims) == len(victims)
    vdf = spark.createDataFrame([(s,) for s in victims], "seq long")
    assert lb.delete_seqs(spark, vdf) == len(victims)

    left_a = sorted(r["seq"] for r in la.stream_df(spark).collect())
    left_b = sorted(r["seq"] for r in lb.stream_df(spark).collect())
    assert left_a == left_b == sorted(set(seqs_b) - set(victims))

    empty = spark.createDataFrame([], "seq long")
    assert lb.delete_seqs(spark, empty) == 0
    la.destroy()
    lb.destroy()
