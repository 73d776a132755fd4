"""One log, two open-table-format exports — Delta AND Iceberg.

The reference's interop story is "the log is just a directory"
(`/root/reference/README.md:30-44`); at lakehouse scale the analogous
contract is "the log is a table any engine can read". This example
appends through the engine, compacts, and syncs BOTH metadata trees —
`_delta_log/` NDJSON actions and Iceberg `metadata/` (Avro manifests
written by this package's own spec encoder) — then replay-reads each
tree the way an external reader would and proves all three views of
the data (log, Delta snapshot, Iceberg snapshot) are row-identical.

Run: PYTHONPATH=/root/repo python examples/lakehouse_export_pipeline.py
"""

import sys
import tempfile

sys.path.insert(0, "/root/repo")

import flumedb_spark as fs
from flumedb_spark.log import LOG_SCHEMA
from flumedb_spark.sources.delta_export import read_delta_snapshot
from flumedb_spark.sources.iceberg_export import read_iceberg_snapshot


def main() -> None:
    spark = fs.get_spark("lakehouse_export", cpus=8)
    root = tempfile.mkdtemp(prefix="flume_lakehouse_") + "/db"
    db = fs.Flume(root, spark=spark)

    for i in range(500):
        db.append({"user": i % 17, "amount": i})
    out = db.maintain(export_delta=True, export_iceberg=True)
    print(f"after compaction: delta v{out['delta_version']}, "
          f"iceberg v{out['iceberg_version']}")

    # a second batch -> both exports advance incrementally (O(new files))
    for i in range(500, 600):
        db.append({"user": i % 17, "amount": i})
    out = db.maintain(export_delta=True, export_iceberg=True)
    print(f"after second batch: delta v{out['delta_version']}, "
          f"iceberg v{out['iceberg_version']}")

    own = db.log.df(spark).orderBy("seq")

    delta = read_delta_snapshot(db.log.path)
    delta_paths = [f"{db.log.path}/{p}" for p in sorted(delta["files"])]
    via_delta = spark.read.schema(LOG_SCHEMA).parquet(*delta_paths).orderBy("seq")

    ice = read_iceberg_snapshot(db.log.path)
    via_iceberg = (
        spark.read.schema(LOG_SCHEMA).parquet(*sorted(ice["files"])).orderBy("seq")
    )

    rows = own.count()
    assert rows == 600
    assert via_delta.collect() == own.collect()
    assert via_iceberg.collect() == own.collect()
    ice_records = sum(rc for rc, *_ in ice["files"].values())
    assert ice_records == rows  # manifest record counts are real
    print(f"log == delta snapshot == iceberg snapshot: {rows} rows; "
          f"iceberg manifests account for {ice_records} records")

    # time travel: both formats resolve the first snapshot (500 rows)
    from flumedb_spark.sources.readers import read_any

    d_v0 = read_any(spark, db.log.path, "delta", version=0)
    i_s1 = read_any(spark, db.log.path, "iceberg", snapshot_id=1)
    assert d_v0.count() == i_s1.count() == 500
    print("time travel: delta VERSION AS OF 0 == iceberg snapshot 1 "
          f"== {d_v0.count()} rows")

    # retention maintenance: bound both metadata trees
    from flumedb_spark.sources.delta_export import (
        clean_delta_log,
        write_delta_checkpoint,
    )
    from flumedb_spark.sources.iceberg_export import expire_snapshots

    write_delta_checkpoint(db.log.path)
    print("retention:",
          {"delta": clean_delta_log(db.log.path, keep_versions=1),
           "iceberg": expire_snapshots(db.log.path, keep_last=1)})
    assert read_any(spark, db.log.path, "delta").count() == 600
    assert read_any(spark, db.log.path, "iceberg").count() == 600

    db.close()
    print("OK")


if __name__ == "__main__":
    main()
