"""Incremental curation — the reference's log -> view idiom
(/root/reference/index.js:24-80: append, since, catch-up, gated reads)
applied to a training-data pipeline: curation state is a SET OF VIEWS
over a document log, maintained incrementally as batches arrive, never
recomputed from scratch.

    document batches --(decontaminate at the door)--> append to log
        log --> keeper view      (Hashtable keep='first' on md5(text):
                                  the INCREMENTAL exact-dedup table —
                                  first writer wins, forever)
        log --> corpus stats     (GroupedStats per source)

The invariants demonstrated (and asserted, not just printed):

1. Read-your-writes: after append() returns, the views HAVE folded the
   new seqs (the reference's gate semantics, wrap.js:40-60).
2. Incremental == batch: the keeper view's state after N appends
   equals dedup.exact_dup_groups over the full accumulated corpus.
3. Rebuild converges: destroying and rebuilding the view from the log
   reproduces the same state (the reference's rebuild contract).

Run: PYTHONPATH=/root/repo python examples/incremental_curation.py
"""

from __future__ import annotations

import json
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import flumedb_spark as fs
from flumedb_spark.operators import dedup
from flumedb_spark.views.grouped import GroupedStats
from flumedb_spark.views.hashtable import Hashtable

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = fs.get_spark("incremental_curation", cpus=8)
    root = tempfile.mkdtemp(prefix="inc_cur_")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # the benchmark holdout we must never train on (stand-in: top ids)
    holdout = docs.orderBy(F.col("doc_id").desc()).limit(10).select("doc_id", "text")

    db = fs.Flume(fs.ParquetLog(f"{root}/db", codec="json"), spark=spark)
    db.use(
        "keeper",
        Hashtable(
            "first-v1",
            key_expr="md5(get_json_object(value, '$.text'))",
            keep="first",
        ),
    )
    db.use(
        "by_source",
        GroupedStats(1, "get_json_object(value, '$.source')", field="n_chars"),
    )

    appended = []
    for i, pred in enumerate(
        (F.col("doc_id") % 3 == 0, F.col("doc_id") % 3 == 1, F.col("doc_id") % 3 == 2)
    ):
        batch = docs.where(pred)
        # decontaminate AT THE DOOR: Bloom-probe the incoming batch
        # against the holdout's 8-token shingles; only clean docs enter
        flags = dedup.bloom_cross_dedup(holdout, batch, window=8)
        clean = batch.join(
            flags.where(F.col("contaminated")).select("doc_id"), "doc_id", "left_anti"
        )
        rows = [
            {
                "doc_id": r.doc_id, "text": r.text,
                "lang": r.lang, "source": r.source, "n_chars": r.n_chars,
            }
            for r in clean.collect()
        ]
        if i == 1:
            # re-crawled copies of five batch-0 documents: the keeper
            # view must keep the FIRST appearance, forever
            rows += [dict(r, doc_id=r["doc_id"] + 10_000) for r in appended[:5]]
        db.append(rows)
        appended.extend(rows)
        # 1. read-your-writes: the views answer AT this seq, now
        n_keys = len(db.keeper.keys())
        print(f"batch {i}: appended {len(rows)}, distinct texts so far {n_keys}")

    # 2. incremental == batch: the view's keeper set equals a from-
    # scratch exact dedup over everything appended
    view_state = {
        r.key: r.seq for r in db.keeper.df_snapshot().collect()
    }
    full = spark.createDataFrame(
        [(i, r["text"]) for i, r in enumerate(appended)], "doc_id long, text string"
    )
    batch_state = {
        r.text_hash: r.keep_doc_id for r in dedup.exact_dup_groups(full).collect()
    }
    assert view_state == batch_state, "incremental keeper diverged from batch dedup"
    print(f"incremental == batch over {len(view_state)} distinct texts ✓")

    # 3. rebuild converges to the same state (O16: destroy + replay)
    db.rebuild()
    rebuilt = {r.key: r.seq for r in db.keeper.df_snapshot().collect()}
    assert rebuilt == view_state, "rebuild diverged"
    print("rebuild reproduces the incremental state ✓")

    # corpus stats stayed live the whole time
    stats = db.by_source.snapshot().collect()
    print(f"sources tracked: {len(stats)}; total chars "
          f"{int(sum(r.s for r in stats))}")

    # 4. right-to-be-forgotten: a takedown request arrives for one
    # source — redact it from the LOG (not just the views), rebuild,
    # and vacuum so the bytes are physically gone
    victim_src = appended[0]["source"]
    before = len(db.keeper.keys())
    n_gone = db.delete_where(
        f"get_json_object(value, '$.source') = '{victim_src}'"
    )
    assert n_gone > 0
    assert len(db.keeper.keys()) <= before  # views rebuilt over redacted log
    db.log.vacuum(older_than_seconds=0)
    left = {
        r["value"]["source"] for r in db.stream()
    }
    assert victim_src not in left, "redacted source still readable"
    print(f"redacted {n_gone} docs from source {victim_src!r}; "
          f"{len(db.keeper.keys())} distinct texts remain ✓")
    db.close()
    spark.stop()


if __name__ == "__main__":
    main()
