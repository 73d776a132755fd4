"""Common Crawl-shaped ingest pipeline — the composed form of the
round-6 archive/extraction operators, in the order a web-corpus ingest
actually runs them:

    WARC shards (gzipped, one payload per shard)
      -> record triage            (warc_listing: record walk, NO body
                                   materialization — filter on type/
                                   length columns first)
      -> body extraction          (warc_bodies: response blocks only,
                                   HTTP headers stripped, 64 MiB cap)
      -> HTML -> text             (html.html_text: stdlib-parser Arrow
                                   kernel — strip script/style/tags,
                                   decode entities, collapse whitespace)
      -> text quality gates       (text.gopher_quality over the
                                   EXTRACTED text + cheap length gates,
                                   pure JVM column expressions)
      -> exact-substring dedup    (substring_dup_spans: md5-window
                                   shuffle, spans of >= W tokens shared
                                   with an earlier doc)
      -> keeper manifest          (drop docs that are mostly duplicate
                                   span; append survivors to the log)

Every stage is a DataFrame -> DataFrame transform; the WARC kernels are
Arrow-batched mapInPandas (stateless, partition-parallel), the dedup is
two uniform hash shuffles — the same program scales with partition
count. Corrupt shards become ok=False rows, never task failures.

Run: PYTHONPATH=/root/repo python examples/crawl_ingest_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flumedb_spark import Flume, get_spark
from flumedb_spark.operators import archives
from flumedb_spark.operators.dedup import substring_dup_spans


def main() -> None:
    spark = get_spark("crawl_ingest_example", cpus=8)

    # ---- stage 0: a corpus of WARC shards (synthetic, deterministic —
    # in production this is spark.read.format("binaryFile") over the
    # crawl drop directory)
    docs = spark.range(0, 64).selectExpr("id AS doc_id")
    shards = archives.with_synthetic_warc_payload(docs, gzipped=True)

    # ---- stage 1: triage WITHOUT materializing bodies — record type
    # and length are enough to budget the extraction stage
    listing = archives.warc_listing(shards)
    n_records = listing.where("ok").count()
    n_responses = listing.where("ok AND record_type = 'response'").count()
    print(f"triage: {n_records} records, {n_responses} responses")

    # ---- stage 2: extract response bodies (headers stripped, capped)
    bodies = archives.warc_bodies(shards).where("ok AND NOT truncated")
    pages = bodies.select(
        # one doc per (shard, record): a stable, collision-free numeric
        # id for dedup (the record index is embedded in record_id)
        (
            F.col("doc_id") * 1000
            + F.regexp_extract("record_id", r":(\d+)>$", 1).cast("long")
        ).alias("doc_id"),
        F.col("target_uri"),
        # in production the body IS the page; the synthetic bodies are
        # opaque filler, so wrap token-shaped words (derived from the
        # record, length-colliding records become exact duplicates) in
        # real markup — the extraction stage then has real work to do
        F.concat(
            F.lit("<html><head><title>page</title><style>p{}</style>"
                  "</head><body><p>the text of "),
            F.concat_ws(
                " ",
                F.array_repeat(
                    F.concat(F.lit("tok"), F.col("content_length") % 60), 12
                ),
            ),
            F.lit('</p> <a href="#">more</a></body></html>'),
        ).alias("html"),
    )

    # ---- stage 2b: HTML -> clean text (the stage every Common Crawl
    # user hits on document one: strip markup/script/style, decode
    # entities, collapse whitespace — Arrow-batched stdlib parser)
    from flumedb_spark.operators.html import html_text

    uris = pages.select("doc_id", "target_uri")
    texts = (
        html_text(pages)
        .where("ok")
        .join(uris, "doc_id")
        .select("doc_id", "target_uri", "text")
    )

    # ---- stage 3: quality gates BEFORE the dedup shuffle — Gopher
    # rules over the EXTRACTED text (word count / word length /
    # alpha-fraction), then the cheap length gate
    from flumedb_spark.operators.text import gopher_quality

    quality = gopher_quality(texts, min_words=5, min_frac_alpha=0.5)
    texts = (
        texts.join(quality.where("keep = 1").select("doc_id"), "doc_id")
        .where(F.length("text").between(10, 1_000_000))
    )

    # ---- stage 4: exact-substring dedup (W=8 token shared spans)
    spans = substring_dup_spans(texts, window=8)
    doc_len = texts.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens_doc")
    )
    dup_share = (
        spans.groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("dup_tokens"))
        .join(doc_len, "doc_id")
        .select("doc_id", (F.col("dup_tokens") / F.col("n_tokens_doc")).alias("share"))
    )
    drop_ids = dup_share.where("share > 0.5").select("doc_id")
    keepers = texts.join(drop_ids, "doc_id", "left_anti")
    print(
        f"dedup: {texts.count()} docs -> {keepers.count()} keepers "
        f"({drop_ids.count()} mostly-duplicate docs dropped)"
    )

    # ---- stage 4b: the crawl GRAPH — link extraction over the kept
    # pages feeds centrality (who gets linked) exactly as a crawler's
    # frontier/priority stage would consume it
    from flumedb_spark.operators.graph import pagerank
    from flumedb_spark.operators.html import html_links

    kept_pages = pages.join(keepers.select("doc_id"), "doc_id")
    edges = (
        html_links(kept_pages)
        .where("ok")
        .select(
            F.col("doc_id").alias("src"),
            # synthetic pages all link "#"; in production parse the
            # href's target doc — here route every link to the shard
            # root so the graph is well-formed and hub-bearing
            (F.col("doc_id") - F.col("doc_id") % 1000).alias("dst"),
        )
    )
    nodes = keepers.selectExpr("doc_id AS node_id")
    top = (
        pagerank(edges, nodes, iterations=3)
        .orderBy(F.desc("rank"), "node_id")
        .limit(3)
        .collect()
    )
    print(f"graph: top-ranked pages {[(r['node_id'], r['rank']) for r in top]}")

    # ---- stage 5: durable keeper manifest in the engine log
    with tempfile.TemporaryDirectory() as root:
        db = Flume(os.path.join(root, "corpus"), spark=spark)
        from flumedb_spark.sources.readers import append_df_to_log

        append_df_to_log(
            db.log, keepers.select("doc_id", "target_uri", "text")
        )
        print(f"manifest: log head seq = {db.since}")
        db.close()

    spark.stop()


if __name__ == "__main__":
    main()
