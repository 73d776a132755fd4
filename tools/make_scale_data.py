"""Synthesize an sf1.0 dataset by key-shifted 10x replication of sf0.1.

The driver ships sf{0.001,0.01,0.1}; the scale-up proof point (VERDICT
r2 item 7) needs one decade more. Replication rules keep the data
SHAPED like organic growth, so per-query scaling factors are meaningful:

- every table's primary key (and the fact tables' foreign keys into
  replicated dimensions) shifts by ``replica * (max_key + 1)`` —
  referential integrity preserved, key cardinality grows 10x
  (nation/region stay fixed, like real TPC-H scaling keeps 25 nations);
- events shift event_id AND user_id — growth = more users, not hotter
  ones (session/window group sizes stay constant);
- documents get a per-replica token prepended — replicas are NOT
  near-duplicates, so dedup candidate counts scale ~linearly instead of
  quadratically exploding on 10 exact copies of everything;
- embeddings get a small deterministic per-replica perturbation — same
  reason, for the cosine/ANN family.

Each table lands as a single parquet FILE at <dst>/<table>.parquet so
the bench harness + DuckDB oracle read it exactly like the driver's
testdata. Usage: python tools/make_scale_data.py [dst] [replicas]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")

KEY_SHIFTS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# which table's max defines each shifted column's stride
STRIDE_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flumedb_testdata_sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from flumedb_spark.session import get_spark
    from flumedb_spark.sources.ingest import _fix_ns_timestamps

    spark = get_spark("make_scale_data", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or 32)
    # write plain us timestamps (Spark's default INT96 reads back as ns
    # in pyarrow metadata and would trip the ingest ns-normalization)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    os.makedirs(dst, exist_ok=True)

    strides: dict[str, int] = {}
    for col, (tbl, src_col) in STRIDE_OF.items():
        if col not in strides:
            mx = (
                spark.read.parquet(f"{SRC}/{tbl}.parquet")
                .agg(F.max(src_col))
                .collect()[0][0]
            )
            strides[col] = int(mx) + 1

    for table, shift_cols in KEY_SHIFTS.items():
        base = _fix_ns_timestamps(spark, f"{SRC}/{table}.parquet")
        if not shift_cols:  # fixed dimensions: copy once
            out = base
        else:
            parts = []
            for r in range(replicas):
                d = base
                for c in shift_cols:
                    d = d.withColumn(c, F.col(c) + F.lit(r * strides[c]))
                if table == "documents" and r > 0:
                    d = d.withColumn("text", F.concat(F.lit(f"r{r} "), F.col("text")))
                    d = d.withColumn("n_chars", F.length("text"))
                if table == "embeddings" and r > 0:
                    # deterministic tiny rotation-ish perturbation: keeps
                    # vectors valid floats, breaks exact-duplicate cosine
                    d = d.withColumn(
                        "embedding",
                        F.transform(
                            "embedding",
                            lambda x, i: (
                                x
                                + (
                                    ((F.col("vec_id") + i) % 13 - 6).cast("double")
                                    * (0.001 * r)
                                )
                            ).cast("float"),
                        ),
                    )
                parts.append(d)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        tmp = tempfile.mkdtemp(prefix=f"scale_{table}_")
        out.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), os.path.join(dst, f"{table}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)
        print(f"{table}: written", flush=True)
    print(f"done: {dst}")


if __name__ == "__main__":
    main()
