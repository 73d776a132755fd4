"""Common Crawl-shaped ingest pipeline, wired END-TO-END (VERDICT-r7
#5) — every stage a real operator from this repo, in the order a
web-corpus ingest runs them, with ASSERTED row-count invariants between
stages (tests/test_crawl_pipeline.py drives the same chain over the
sf0.001 documents corpus):

    WARC shards (gzipped)
      -> record triage            (archives.warc_listing: record walk,
                                   no body materialization)
      -> body extraction          (archives.warc_bodies: response
                                   blocks, headers stripped, capped)
      -> HTML -> text             (html.html_text: Arrow stdlib parser)
      -> blocklist gate           (boilerplate.blocklist_filter: C4
                                   bad-words, scan-speed array literal)
      -> quality gates            (text.gopher_quality rules
                                   + corpus-global perplexity terciles
                                   + the TRAINED quality classifier —
                                   quality_clf NB log-odds, labeled
                                   slices, broadcast inference)
      -> eval decontamination     (dedup.minhash_cross_decontaminate:
                                   broadcast eval bands + signature
                                   verify — benchmark leakage out)
      -> MinHash-LSH candidates   (dedup.minhash_lsh_candidates:
                                   bucketed band self-join)
      -> TRUE components          (dedup.connected_components_star)
      -> canonical keeper         (keep each cluster's HIGHEST-quality
                                   copy by classifier logit, tiebreak
                                   doc_id — the FineWeb decision rule)
      -> URL canonicalization     (urls.canonicalize_url sorted-param
                                   keys over the kept pages)
      -> host crawl graph         (html.html_links -> urls.host_graph
                                   -> graph.pagerank over hosts)
      -> keeper manifest          (append survivors to the engine log)

Every stage is a DataFrame -> DataFrame transform; the only Python is
the two Arrow HTML kernels. Corrupt shards become ok=False rows, never
task failures. The same program scales with partition count.

Run: PYTHONPATH=/root/repo python examples/crawl_ingest_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate_pages(
    spark: SparkSession,
    pages: DataFrame,
    pos_filter: str = "source = 'src0'",
    neg_filter: str = "source = 'src3'",
    min_words: int = 5,
    blocklist: tuple[str, ...] = ("casino", "viagra"),
    eval_docs: DataFrame | None = None,
) -> dict:
    """The post-extraction curation chain over (doc_id, url, html,
    source) pages: extraction -> C4 blocklist gate -> gopher ->
    perplexity tercile -> trained classifier -> MinHash eval-set
    decontamination (when ``eval_docs`` is given) -> LSH near-dup
    components -> quality-aware canonical keeper -> URL canonical keys
    + host graph. Returns the stage outputs and counts; raises
    AssertionError if any stage invariant breaks (monotone survivors,
    total extraction, exactly one canonical per cluster)."""
    from flumedb_spark.operators import quality_clf as qclf
    from flumedb_spark.operators import urls
    from flumedb_spark.operators.boilerplate import blocklist_filter
    from flumedb_spark.operators.dedup import (
        connected_components_star,
        minhash_cross_decontaminate,
        minhash_lsh_candidates,
    )
    from flumedb_spark.operators.html import html_links, html_text
    from flumedb_spark.operators.selection import global_ntile
    from flumedb_spark.operators.text import gopher_quality, unigram_logprob

    out: dict = {}
    n_pages = pages.count()

    # ---- extraction: total on well-formed pages (ok=False rows are
    # corrupt-page contracts, not crashes)
    texts = (
        html_text(pages)
        .where("ok")
        .join(pages.select("doc_id", "url", "source"), "doc_id")
        .select("doc_id", "url", "source", "text")
        .localCheckpoint(eager=True)  # three gates + dedup reuse it
    )
    n_texts = texts.count()
    assert n_texts == n_pages, f"extraction dropped pages: {n_texts}/{n_pages}"
    out["n_pages"] = n_pages

    # ---- gate 0: C4 bad-words blocklist (scan-speed, no shuffle; the
    # decision is a column so the drop is auditable per doc)
    bl = blocklist_filter(texts, list(blocklist))
    after_bl = texts.join(bl.where("keep").select("doc_id"), "doc_id")
    n_bl = after_bl.count()
    assert 0 < n_bl <= n_texts
    out["n_blocklist"] = n_bl

    # ---- gate 1: Gopher rules over the EXTRACTED text
    g_keep = gopher_quality(after_bl, min_words=min_words, min_frac_alpha=0.5)
    after_gopher = after_bl.join(
        g_keep.where("keep = 1").select("doc_id"), "doc_id"
    )
    n_gopher = after_gopher.count()
    assert 0 < n_gopher <= n_bl
    out["n_gopher"] = n_gopher

    # ---- gate 2: corpus-global perplexity terciles (drop the hardest
    # tercile — the CCNet shape, distributed rank, never a global window)
    ppl = unigram_logprob(after_gopher).select("doc_id", "avg_nll")
    terciles = global_ntile(
        ppl, order_cols=[F.col("avg_nll"), F.col("doc_id")], n_tiles=3,
        out_col="tercile",
    )
    after_ppl = after_gopher.join(
        terciles.where("tercile <= 2").select("doc_id"), "doc_id"
    )
    n_ppl = after_ppl.count()
    assert 0 < n_ppl <= n_gopher
    out["n_ppl"] = n_ppl

    # ---- gate 3: the TRAINED quality classifier (labeled slices ->
    # NB log-odds weights -> broadcast inference over the survivors)
    pb = qclf.per_bucket_counts(texts)
    w, bias = qclf.train_quality_classifier(
        texts, pos_filter, neg_filter, per_bucket=pb
    )
    scores = qclf.score_quality(texts, w, bias, per_bucket=pb).select(
        "doc_id", "logit_micro", "keep"
    )
    survivors = (
        after_ppl.join(scores, "doc_id")
        .where("keep OR " + pos_filter)  # never drop the trusted slice
        .select("doc_id", "url", "source", "text", "logit_micro")
        .localCheckpoint(eager=True)
    )
    n_clf = survivors.count()
    assert 0 < n_clf <= n_ppl
    out["n_classifier"] = n_clf

    # ---- gate 4 (optional): MinHash NEAR-dup decontamination against
    # the eval benchmark — any survivor whose signature agrees >=50%
    # with an eval doc is benchmark leakage and must not train
    if eval_docs is not None:
        decon = minhash_cross_decontaminate(
            survivors.select("doc_id", "text"), eval_docs
        )
        survivors = survivors.join(
            decon.where("NOT contaminated").select("doc_id"), "doc_id"
        ).localCheckpoint(eager=True)
        n_decon = survivors.count()
        assert 0 < n_decon <= n_clf
        out["n_decontaminated"] = n_decon

    # ---- near-dup: LSH candidates -> TRUE components -> keep each
    # cluster's highest-quality copy (classifier logit, tiebreak id)
    edges = minhash_lsh_candidates(survivors)
    comps = connected_components_star(edges, survivors.select("doc_id"))
    from pyspark.sql.window import Window

    ranked = comps.join(survivors.select("doc_id", "logit_micro"), "doc_id")
    wspec = Window.partitionBy("cluster_id").orderBy(
        F.col("logit_micro").desc(), F.col("doc_id")
    )
    canonical = ranked.select(
        "doc_id", "cluster_id",
        (F.row_number().over(wspec) == 1).alias("is_canonical"),
    ).localCheckpoint(eager=True)
    n_clusters = canonical.select("cluster_id").distinct().count()
    n_keep = canonical.where("is_canonical").count()
    assert n_keep == n_clusters, "exactly one canonical per cluster"
    assert n_keep <= n_clf
    out["n_clusters"] = n_clusters
    out["n_keepers"] = n_keep
    keepers = survivors.join(
        canonical.where("is_canonical").select("doc_id"), "doc_id"
    )

    # ---- URL canonical keys over the kept pages (the dedup key a
    # crawl frontier shares across fetches)
    kept_urls = keepers.select(
        "doc_id", urls.canonicalize_url(F.col("url")).alias("canonical_url")
    )
    assert kept_urls.where("canonical_url IS NULL").count() == 0
    out["urls"] = kept_urls

    # ---- host crawl graph: links of the kept pages -> resolve ->
    # host rollup -> host-level PageRank (who gets linked)
    kept_pages = pages.join(keepers.select("doc_id"), "doc_id")
    links = html_links(kept_pages).where("ok")
    hgraph = urls.host_graph(
        kept_pages.select("doc_id", "url"), links.select("doc_id", "href")
    ).localCheckpoint(eager=True)
    out["host_edges"] = hgraph.agg(F.sum("n_links")).collect()[0][0] or 0
    out["keepers"] = keepers
    out["host_graph"] = hgraph
    return out


def main() -> None:
    from flumedb_spark import Flume, get_spark
    from flumedb_spark.operators import archives
    from flumedb_spark.operators import urls as _urls
    from flumedb_spark.operators.graph import pagerank

    spark = get_spark("crawl_ingest_example", cpus=8)

    # ---- stage 0: a corpus of WARC shards (synthetic, deterministic —
    # in production this is spark.read.format("binaryFile") over the
    # crawl drop directory)
    docs = spark.range(0, 64).selectExpr("id AS doc_id")
    shards = archives.with_synthetic_warc_payload(docs, gzipped=True)

    # ---- stage 1: triage WITHOUT materializing bodies
    listing = archives.warc_listing(shards)
    n_records = listing.where("ok").count()
    n_responses = listing.where("ok AND record_type = 'response'").count()
    print(f"triage: {n_records} records, {n_responses} responses")
    assert 0 < n_responses < n_records

    # ---- stage 2: extract response bodies (headers stripped, capped),
    # then wrap deterministic two-vocabulary page text around them (the
    # synthetic bodies are opaque filler; source s{k} docs use
    # vocabulary k so the classifier gate has real signal, and
    # length-colliding records become near-duplicates for the LSH gate)
    bodies = archives.warc_bodies(shards).where("ok AND NOT truncated")
    rec_id = (
        F.col("doc_id") * 1000
        + F.regexp_extract("record_id", r":(\d+)>$", 1).cast("long")
    )
    src = F.concat(F.lit("src"), (F.col("doc_id") % 4).cast("string"))
    # stopwords woven BETWEEN doc-specific content words: Gopher's
    # stopword rule passes, but every shingle contains content — docs
    # share shingles only when their (source, content_length) classes
    # match, so the LSH stage sees true duplicate classes, not one giant
    # filler-driven cluster
    stops = ["the", "of", "and", "to", "in", "is", "was", "for",
             "on", "that", "as", "at"]
    body_words = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(stops[i] + " "),
                src,
                F.lit("tok"),
                ((F.col("content_length") * (i + 1)) % 23).cast("string"),
            )
            for i in range(12)
        ],
    )
    pages = bodies.select(
        rec_id.alias("doc_id"),
        src.alias("source"),
        F.concat(
            F.lit("https://host"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".crawl.test/d/"),
            rec_id.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("<html><head><title>page</title><style>p{}</style>"
                  "</head><body><p>"),
            body_words,
            F.lit('</p> <a href="//hub.crawl.test/x">hub</a></body></html>'),
        ).alias("html"),
    )

    # ---- stage 2b (r9): the PDF leg — real crawls carry
    # application/pdf responses the HTML extractor can't read; route a
    # deterministic subset through the stdlib PDF codec (body text ->
    # real multi-page FlateDecode PDF bytes -> full xref/Tj/TJ parse
    # back out, operators/pdf.py) so no response type silently drops
    from flumedb_spark.operators import pdf as pdfops

    pdf_docs = pages.where(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.col("html").alias("text")
    )
    pdf_pages = pdfops.pdf_text_pages(
        pdfops.with_synthetic_pdf_payload(pdf_docs)
    )
    n_pdf_docs = pdf_docs.count()
    ok_pages = pdf_pages.where("ok").count()
    assert ok_pages >= n_pdf_docs > 0  # every PDF parsed, >=1 page each
    print(f"pdf leg: {n_pdf_docs} pdf responses -> {ok_pages} pages")

    # the office leg (same contract, OPC zip + WordprocessingML)
    from flumedb_spark.operators import docx as docxops

    docx_docs = pages.where(F.col("doc_id") % 7 == 1).select(
        "doc_id", F.col("html").alias("text")
    )
    docx_paras = docxops.docx_text_paragraphs(
        docxops.with_synthetic_docx_payload(docx_docs)
    )
    n_docx = docx_docs.count()
    ok_paras = docx_paras.where("ok").count()
    assert ok_paras >= n_docx > 0
    print(f"docx leg: {n_docx} docx responses -> {ok_paras} paragraphs")

    # the spreadsheet leg (r10: SpreadsheetML — sharedStrings, typed
    # cells, cached formula values; operators/xlsx.py): tabular data a
    # crawl would otherwise lose to the HTML path
    from flumedb_spark.operators import xlsx as xlsxops

    xlsx_docs = pages.where(F.col("doc_id") % 7 == 2).select(
        "doc_id", F.col("html").alias("text")
    )
    xlsx_rows = xlsxops.xlsx_cells(
        xlsxops.with_synthetic_xlsx_payload(xlsx_docs)
    )
    n_xlsx = xlsx_docs.count()
    ok_cells = xlsx_rows.where("ok").count()
    assert ok_cells >= 4 * n_xlsx > 0  # 4 typed cells per sheet row
    print(f"xlsx leg: {n_xlsx} xlsx responses -> {ok_cells} cells")

    # the OpenDocument and e-book legs (r10: operators/odt.py,
    # operators/epub.py — ODF content.xml walk; OCF container -> OPF
    # spine -> XHTML chapters)
    from flumedb_spark.operators import epub as epubops
    from flumedb_spark.operators import odt as odtops

    odt_docs = pages.where(F.col("doc_id") % 7 == 3).select(
        "doc_id", F.col("html").alias("text")
    )
    ok_odt = (
        odtops.odt_text_paragraphs(
            odtops.with_synthetic_odt_payload(odt_docs)
        ).where("ok").count()
    )
    epub_docs = pages.where(F.col("doc_id") % 7 == 4).select(
        "doc_id", F.col("html").alias("text")
    )
    ok_epub = (
        epubops.epub_chapter_texts(
            epubops.with_synthetic_epub_payload(epub_docs)
        ).where("ok").count()
    )
    assert ok_odt > 0 and ok_epub > 0
    print(f"odt leg: {ok_odt} paragraphs; epub leg: {ok_epub} chapters")

    # the mail and legacy-office legs (r10: operators/eml.py — RFC
    # 5322/MIME with encoded-word headers and QP/base64 transfer
    # decode; operators/rtf.py — the RTF 1.9 tokenizer): mailing-list
    # archives and .rtf attachments are real crawl response types
    from flumedb_spark.operators import eml as emlops
    from flumedb_spark.operators import rtf as rtfops

    eml_docs = pages.where(F.col("doc_id") % 7 == 5).select(
        "doc_id", F.col("html").alias("text")
    )
    ok_eml = (
        emlops.eml_part_texts(
            emlops.with_synthetic_eml_payload(eml_docs)
        ).where("ok").count()
    )
    rtf_docs = pages.where(F.col("doc_id") % 7 == 6).select(
        "doc_id", F.col("html").alias("text")
    )
    ok_rtf = (
        rtfops.rtf_paragraphs(
            rtfops.with_synthetic_rtf_payload(rtf_docs)
        ).where("ok").count()
    )
    assert ok_eml > 0 and ok_rtf > 0
    print(f"eml leg: {ok_eml} parts; rtf leg: {ok_rtf} paragraphs")

    # ---- stages 3-9, pass 1: the shared curation chain (extraction,
    # blocklist, three quality gates, LSH components, canonical keeper,
    # URLs, host graph). 'src3tok1' plays the spam vocabulary: the
    # blocklist gate drops the src3 docs whose content class emits it.
    result0 = curate_pages(
        spark, pages, pos_filter="source = 'src0'",
        neg_filter="source = 'src3'",
        blocklist=("src3tok1", "casino"),
    )

    # ---- benchmark-leakage fixture: yesterday's CURATED corpus became
    # today's benchmark — re-curating the same crawl with that eval set
    # must drop every keeper-class doc at the decontamination gate
    # (exact self-copies agree at 1000 milli), provably shrinking the
    # survivor set
    bench = (
        result0["keepers"]
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        .orderBy("doc_id")
        .limit(5)
        .localCheckpoint(eager=True)
    )
    result = curate_pages(
        spark, pages, pos_filter="source = 'src0'",
        neg_filter="source = 'src3'",
        blocklist=("src3tok1", "casino"), eval_docs=bench,
    )
    assert result["n_decontaminated"] < result["n_classifier"], (
        "benchmark self-copies must be dropped"
    )
    print(
        f"curation: {result['n_pages']} pages"
        f" -> blocklist {result['n_blocklist']}"
        f" -> gopher {result['n_gopher']}"
        f" -> ppl {result['n_ppl']} -> classifier {result['n_classifier']}"
        f" -> decon {result['n_decontaminated']}"
        f" -> {result['n_keepers']} keepers in {result['n_clusters']} clusters"
        f" (pass 1 kept {result0['n_keepers']})"
    )

    # ---- host-level PageRank over the rolled-up crawl graph
    hg = result["host_graph"]
    hosts = (
        hg.select(F.col("src_host").alias("h"))
        .unionByName(hg.select(F.col("dst_host").alias("h")))
        .distinct()
    )
    hid = hosts.select(
        "h", F.expr("CAST(conv(substring(md5(h), 1, 15), 16, 10) AS BIGINT)").alias("node_id")
    ).localCheckpoint(eager=True)
    edges = (
        hg.join(hid.select(F.col("h").alias("src_host"), F.col("node_id").alias("src")), "src_host")
        .join(hid.select(F.col("h").alias("dst_host"), F.col("node_id").alias("dst")), "dst_host")
        .select("src", "dst")
    )
    top = (
        pagerank(edges, hid.select("node_id"), iterations=3)
        .join(hid, "node_id")
        .orderBy(F.desc("rank"), "h")
        .limit(3)
        .collect()
    )
    print(f"host graph: {result['host_edges']} cross-host links; "
          f"top hosts {[(r['h'], r['rank']) for r in top]}")

    # ---- stage 9: durable keeper manifest in the engine log
    with tempfile.TemporaryDirectory() as root:
        db = Flume(os.path.join(root, "corpus"), spark=spark)
        from flumedb_spark.sources.readers import append_df_to_log

        append_df_to_log(
            db.log, result["keepers"].select("doc_id", "url", "text")
        )
        n_rows = db.log.df(spark).count()
        assert n_rows == result["n_keepers"], (n_rows, result["n_keepers"])
        # seqs are 0-based (flumelog-offset semantics): head == n-1
        print(f"manifest: {n_rows} rows, log head seq = {db.log.refresh_since()}")
        db.close()

    spark.stop()


if __name__ == "__main__":
    main()
