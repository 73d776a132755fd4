"""A/B the minhash LSH self-join strategy under bench-like conditions.

Variants: current (shuffle_hash hint), no-hint (AQE picks), merge_join
pin, broadcast-one-side. Cached documents table, 3 passes, min time.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from flumedb_spark.session import get_spark
from flumedb_spark.operators import dedup
from flumedb_spark.sources.ingest import ensure_ingested

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def candidates(bands_a, bands_b):
    return (
        bands_a.alias("a")
        .join(
            bands_b.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def main():
    spark = get_spark("ab_minhash", cpus=32)
    path = ensure_ingested(spark, SF_DIR, "documents")
    spark.read.parquet(path).createOrReplaceTempView("documents")
    spark.catalog.cacheTable("documents")
    spark.table("documents").count()
    docs = spark.table("documents")

    def bands():
        return dedup.lsh_bands(dedup.minhash_signatures(docs))

    variants = {
        "shuffle_hash_hint": lambda: candidates(
            bands().hint("shuffle_hash"), bands().hint("shuffle_hash")
        ),
        "no_hint": lambda: candidates(bands(), bands()),
        "merge_hint": lambda: candidates(bands().hint("merge"), bands().hint("merge")),
        "cached_bands_nohint": None,  # special-cased below
        "cached_bands_shuffle_hash": None,
    }

    results = {}
    for name, mk in variants.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            if name.startswith("cached_bands"):
                b = bands().localCheckpoint(eager=True)
                if name.endswith("shuffle_hash"):
                    b = b.hint("shuffle_hash")
                n = candidates(b, b).count()
            else:
                n = mk().count()
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 3)
        print(f"{name}: {best:.3f}s ({n} rows)", flush=True)
    print(results)


if __name__ == "__main__":
    main()


def main2():
    spark = get_spark("ab_minhash2", cpus=32)
    path = ensure_ingested(spark, SF_DIR, "documents")
    spark.read.parquet(path).createOrReplaceTempView("documents")
    spark.catalog.cacheTable("documents")
    spark.table("documents").count()
    docs = spark.table("documents")

    def groupby_pairs():
        bands = dedup.lsh_bands(dedup.minhash_signatures(docs))
        buckets = bands.groupBy("band", "bsig").agg(
            F.array_sort(F.collect_set("doc_id")).alias("ids")
        ).where(F.size("ids") > 1)
        pairs = buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), y -> struct(x as doc_a, y as doc_b))))"
                )
            ).alias("p")
        ).select("p.doc_a", "p.doc_b")
        return pairs.distinct().orderBy("doc_a", "doc_b")

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        n = groupby_pairs().count()
        best = min(best, time.perf_counter() - t0)
    print(f"groupby_pairs: {best:.3f}s ({n} rows)", flush=True)


if __name__ == "__main__" and os.environ.get("AB2"):
    main2()
