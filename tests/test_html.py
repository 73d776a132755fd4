"""Behavioral tests for operators/html.py — HTML -> clean-text
extraction. The oracle gate (test_full_gate) pins cross-engine parity
of ns_html_text; these pin the extraction SEMANTICS on hand-written
pages: script/style/template/noscript skipping (nested), entity
decoding, whitespace normalization, title capture, link counting,
binary input, the corrupt-page contract, and the truncation cap."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import html as H


def _run(spark, pages, **kw):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "doc_id long, html string"
    )
    out = H.html_text(df, **kw).orderBy("doc_id").collect()
    return out


def test_basic_extraction(spark):
    [r] = _run(
        spark,
        ["<html><head><title> A  B </title></head>"
         "<body><h1>Hi</h1><p>one two</p></body></html>"],
    )
    assert r.title == "A B"
    assert r.text == "Hi one two"
    assert r.n_links == 0 and r.ok and not r.truncated


def test_script_style_and_nesting_skipped(spark):
    [r] = _run(
        spark,
        ["<body>keep1 <script>var a = '<p>fake</p>';</script>"
         "<style>p { color: red }</style>"
         "<noscript>no <b>js</b></noscript>"
         "<template><div>tpl</div></template> keep2</body>"],
    )
    assert r.text == "keep1 keep2"


def test_entities_and_charrefs_decoded(spark):
    [r] = _run(
        spark,
        ["<body>&lt;tag&gt; &amp; &quot;q&quot; &#65;&#x42; &nbsp;end</body>"],
    )
    # &nbsp; decodes to U+00A0 which is whitespace for str.split()
    assert r.text == '<tag> & "q" AB end'


def test_inline_tags_transparent_and_blocks_split(spark):
    [r] = _run(
        spark,
        ["<body><p>one <b>bold</b> two</p>\n<p>three</p></body>"],
    )
    assert r.text == "one bold two three"


def test_links_counted_only_with_href(spark):
    [r] = _run(
        spark,
        ['<body><a href="/x">x</a><a name="anchor">y</a>'
         '<a href="">z</a></body>'],
    )
    assert r.n_links == 2
    assert r.text == "x y z"


def test_title_first_nonempty_wins(spark):
    [r] = _run(
        spark,
        ["<head><title>first</title></head><body>"
         "<svg><title>second</title></svg>body</body>"],
    )
    assert r.title == "first"
    assert "body" in r.text


def test_missing_title_is_null(spark):
    [r] = _run(spark, ["<body>just text</body>"])
    assert r.title is None and r.text == "just text"


def test_binary_pages_decoded_utf8(spark):
    df = spark.createDataFrame(
        [(1, "<body>café &amp; bar</body>".encode())],
        "doc_id long, html binary",
    )
    [r] = H.html_text(df).collect()
    assert r.text == "café & bar" and r.ok


def test_null_page_is_corrupt_row(spark):
    df = spark.createDataFrame([(7, None)], "doc_id long, html string")
    [r] = H.html_text(df).collect()
    assert r.doc_id == 7 and not r.ok and r.text is None


def test_truncation_cap(spark):
    page = "<body>" + ("word " * 100) + "</body>"
    [r] = _run(spark, [page], cap=30)
    assert r.truncated
    assert r.ok  # truncated is flagged, not failed
    assert len(r.text) <= 30


def test_malformed_markup_recovers(spark):
    # unclosed tags, stray <, bogus entity: parser recovers, no crash
    [r] = _run(spark, ["<body><p>a < b &bogus; <i>c</body>"])
    assert r.ok
    assert "a" in r.text and "c" in r.text


def test_plan_is_single_python_stage_no_shuffle(spark):
    """100 TB shape: the extraction is one Arrow-batched Python stage
    inheriting upstream partitioning — no Exchange in the plan."""
    import contextlib
    import io

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("<body>"), F.col("id").cast("string"), F.lit("</body>")).alias("html"),
    )
    out = H.html_text(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert p.count("MapInPandas (") == 1  # one kernel node (tree + detail listing)


# ---- link extraction (crawl-graph stage) ------------------------------


def _links(spark, pages):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "doc_id long, html string"
    )
    return H.html_links(df).orderBy("doc_id", "href", "anchor").collect()


def test_links_href_anchor_and_order(spark):
    rows = _links(
        spark,
        ['<body><a href="/b">Beta</a> <a href="/a">Alpha &amp; Co</a>'
         '<a name="x">no href</a></body>'],
    )
    assert [(r.href, r.anchor) for r in rows] == [
        ("/a", "Alpha & Co"),
        ("/b", "Beta"),
    ]
    assert all(r.ok for r in rows)


def test_links_nested_markup_in_anchor(spark):
    [r] = _links(spark, ['<a href="/x">see <b>bold</b> text</a>'])
    assert r.anchor == "see bold text"


def test_links_empty_href_kept_and_pageless_page(spark):
    rows = _links(spark, ['<a href="">self</a>', "no links here"])
    assert [(r.doc_id, r.href) for r in rows] == [(0, "")]


def test_links_null_page_is_corrupt_row(spark):
    df = spark.createDataFrame([(3, None)], "doc_id long, html string")
    [r] = H.html_links(df).collect()
    assert r.doc_id == 3 and not r.ok and r.href is None


def test_linked_synthesis_feeds_pagerank(spark):
    """The crawl-graph chain end-to-end: formula pages -> html_links ->
    integer edge list -> pagerank. The formula digraph has in-degree
    hubs at (d*7 + i*13 + 1) % 97, so ranks must differ and every rank
    is positive (all 97 residues are reachable or teleported)."""
    from flumedb_spark.operators.graph import pagerank

    docs = spark.range(200).selectExpr("id AS doc_id")
    edges = (
        H.html_links(H.with_synthetic_linked_html(docs))
        .where("ok")
        .select(
            F.col("doc_id").alias("src"),
            F.regexp_extract("href", r"/doc/(\d+)$", 1).cast("long").alias("dst"),
        )
    )
    nodes = docs.selectExpr("doc_id AS node_id")
    ranks = pagerank(edges, nodes, iterations=3)
    vals = [r["rank"] for r in ranks.collect()]
    assert len(vals) == 200 and min(vals) > 0 and len(set(vals)) > 1


# ---- adversarial robustness (hypothesis fuzz) --------------------------


from hypothesis import given, settings
from hypothesis import strategies as st

_soup = st.text(
    alphabet=st.sampled_from(list("<>&;/= \"'abtitlescriptyle!-\n\té世")),
    max_size=300,
)


@settings(max_examples=150, deadline=None)
@given(_soup)
def test_extract_one_never_crashes_on_tag_soup(page):
    """The kernel contract: arbitrary tag soup (unterminated tags,
    stray &, nested quotes, partial entities, unicode) must extract,
    never raise — stdlib HTMLParser is recovery-oriented and the
    wrapper must not defeat that."""
    title, text, n_links = H._extract_one(page)
    assert isinstance(text, str)
    assert n_links >= 0
    assert title is None or title == " ".join(title.split())
    assert text == " ".join(text.split())


@settings(max_examples=150, deadline=None)
@given(_soup)
def test_links_parser_never_crashes_on_tag_soup(page):
    """Same contract for the link collector: arbitrary soup never
    raises, every collected link has a string href and list chunks,
    and unclosed <a> tags don't corrupt the open-stack."""
    p = H._link_parser_class()()
    p.feed(page)
    p.close()
    for href, chunks in p.links:
        assert isinstance(href, str)
        assert all(isinstance(c, str) for c in chunks)
