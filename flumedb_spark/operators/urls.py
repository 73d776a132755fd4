"""URL canonicalization, relative-reference resolution, and host-level
crawl-graph rollup (VERDICT-r7 #4) — the normalization stage between
link extraction (``operators/html.html_links``) and graph analytics
(``operators/graph.pagerank`` / ``connected_components_star``).

Reference scope note: the reference engine (index.js:1-286) has no URL
layer; this module is part of the LLM-pipeline extension surface, built
from public pipeline descriptions (C4 / CCNet URL dedup keys, Common
Crawl host-graph releases) and RFC 3986's reference-resolution
algorithm (§5.2, implemented bounded — see :func:`resolve_url`).

Design rules shared with ``operators/text.canonicalize_url``:

- **RE2-safe regexes only** (no lookarounds, no backslash classes) so
  every pattern runs identically in Spark's Java regex and DuckDB's
  RE2, and an oracle can replay the exact transformation.
- **Pure JVM column expressions** — zero Python in the hot path; at
  100 TB canonicalization/resolution run at scan speed with no shuffle,
  and the only shuffle in :func:`host_graph` is the final
  (src_host, dst_host) aggregate (host-cardinality-sized, map-side
  combined).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SCHEME = "[a-zA-Z][a-zA-Z0-9+.-]*"


def sort_query_params(url: Column) -> Column:
    """Alphabetically sort the ``&``-separated query parameters (the
    canonical-key property ``text.canonicalize_url`` lacked: ``?b=2&a=1``
    and ``?a=1&b=2`` must collide). Duplicate params are kept (sorted
    adjacently); URLs without a non-empty query pass through."""
    base = F.regexp_extract(url, r"^([^?]*)", 1)
    q = F.regexp_replace(url, r"^[^?]*[?]?", "")
    return F.when(
        q != "",
        F.concat(base, F.lit("?"), F.array_join(F.array_sort(F.split(q, "&")), "&")),
    ).otherwise(url)


def canonicalize_url(url: Column) -> Column:
    """Full crawl-corpus canonical key: everything
    ``text.canonicalize_url`` does (fragment strip, scheme/host
    lowercase, default-port drop, tracking-param strip, separator
    collapse, trailing-slash strip) PLUS sorted query params."""
    from .text import canonicalize_url as _canon0

    return sort_query_params(_canon0(url))


def strip_dot_segments(url: Column, max_depth: int = 8) -> Column:
    """Remove ``/./`` and ``/../`` path segments (RFC 3986 §5.2.4),
    bounded: nesting deeper than ``max_depth`` levels is left partially
    collapsed (document corpora never legitimately exceed it; a bound
    keeps the transform a fixed regex chain both engines replay
    identically instead of an iterative loop). Parent segments that
    would climb above the root clamp to the root, per the RFC. Query
    and fragment are never touched (segment patterns exclude ``?#``)."""
    # a "parent-able" segment is anything except exactly '.' or '..' —
    # spelled out as RE2-safe alternations ('..'-as-segment must never
    # match as the parent of another '..', or chains deeper than two
    # levels collapse the wrong segments)
    seg = r"(\.\.[^/?#]+|\.[^/?#.][^/?#]*|[^/?#.][^/?#]*)"
    u = url
    for _ in range(3):
        u = F.regexp_replace(u, r"/\.(/|$)", "/")
    for _ in range(max_depth):
        # clamp leading ../ at the root first, then collapse one
        # seg/../ level per contiguous chain; passes converge for
        # depth <= max_depth
        u = F.regexp_replace(u, r"(://[^/?#]*)/(\.\.(/|$))+", "$1/")
        u = F.regexp_replace(u, "/" + seg + r"/\.\.(/|$)", "/")
    return u


def resolve_url(base: Column, href: Column) -> Column:
    """Resolve an ``<a href>`` reference against its page URL — RFC
    3986 §5.2-lite: absolute, protocol-relative (``//host/..``),
    root-relative (``/path``), query-only (``?q``), fragment-only
    (``#f``), empty (self), and relative-path references (with bounded
    dot-segment removal). Out of scope (documented): userinfo, IDN,
    percent-encoding normalization. Returns the resolved URL with the
    fragment still attached (``canonicalize_url`` strips it)."""
    origin = F.regexp_extract(base, f"^({_SCHEME}://[^/?#]*)", 1)
    scheme = F.regexp_extract(base, f"^({_SCHEME}):", 1)
    path_full = F.regexp_extract(base, r"^([^?#]*)", 1)  # origin + path
    no_frag = F.regexp_extract(base, r"^([^#]*)", 1)
    path_only = F.regexp_extract(
        F.regexp_replace(base, f"^{_SCHEME}://[^/?#]*", ""), r"^([^?#]*)", 1
    )
    dir_part = F.regexp_extract(path_only, r"^(.*/)", 1)  # '' when no '/'
    base_dir = F.concat(origin, F.when(dir_part == "", F.lit("/")).otherwise(dir_part))
    # dot segments are removed only where RFC 5.2.2 merges/uses the
    # reference path (root-relative and relative branches) — an
    # absolute or authority-bearing reference keeps its path verbatim,
    # and query/fragment/empty references keep the BASE path verbatim
    # (urljoin parity, pinned by tests/test_urls.py's battery)
    return (
        F.when(href.rlike(f"^{_SCHEME}:"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), strip_dot_segments(F.concat(origin, href)))
        .when(href == "?", no_frag)  # lone '?' == empty ref sans fragment (urljoin)
        .when(href.startswith("?"), F.concat(path_full, href))
        .when(href.startswith("#"), F.concat(no_frag, href))
        .when(href == "", base)
        .otherwise(strip_dot_segments(F.concat(base_dir, href)))
    )


def host_of(url: Column, strip_www: bool = True) -> Column:
    """Lowercased registrable host of an absolute URL — no port, no
    userinfo, optionally (default) without a single leading ``www.``
    label (host-graph releases conventionally fold www into the apex).
    Empty string for URLs with no authority."""
    h = F.lower(
        F.regexp_extract(url, f"^{_SCHEME}://([^/?#@]*@)?" + r"([^/?#:]*)", 2)
    )
    if strip_www:
        h = F.regexp_replace(h, r"^www\.", "")
    return h


def host_graph(
    pages: DataFrame,
    links: DataFrame,
    url_col: str = "url",
    href_col: str = "href",
    id_col: str = "doc_id",
    include_self: bool = False,
) -> DataFrame:
    """Host-level crawl-graph rollup: join extracted link rows back to
    their page URLs, resolve + canonicalize every href, and aggregate
    to ``(src_host, dst_host, n_links)`` — the input shape for
    host-level PageRank / components (the Common Crawl host-graph
    product). Only http(s) destinations are kept (mailto:, javascript:,
    data: references resolve to themselves and are filtered here);
    ``include_self=False`` (default) drops intra-host edges, which
    dominate raw counts and carry no cross-site signal.

    100 TB shape: the ``doc_id`` equi-join co-locates a page's edges
    (both inputs derive from the same crawl scan, so AQE typically
    reuses the exchange); resolution/canonicalization are scan-speed
    column expressions; the only data-sized shuffle is the final
    (src_host, dst_host) hash aggregate — map-side combined, output
    bounded by host-pair cardinality, not edge count."""
    joined = links.join(
        pages.select(F.col(id_col), F.col(url_col).alias("_page_url")), id_col
    )
    resolved = canonicalize_url(
        resolve_url(F.col("_page_url"), F.col(href_col))
    )
    edges = joined.select(
        host_of(F.col("_page_url")).alias("src_host"),
        host_of(resolved).alias("dst_host"),
        resolved.alias("_resolved"),
    ).where(F.col("_resolved").rlike("^https?://"))
    if not include_self:
        edges = edges.where(F.col("src_host") != F.col("dst_host"))
    return (
        edges.groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("long").alias("n_links"))
        .orderBy("src_host", "dst_host")
    )


# ---------------------------------------------------------------------
# Deterministic multi-host fixtures + closed-form oracles: the catalog
# rows attest resolution/canonicalization/rollup by replaying the href
# FORMULAS (not the regex chains), so any transform bug breaks the hash.
# ---------------------------------------------------------------------


def page_url_expr() -> Column:
    """Page d lives at https://site{d%7}.example.test/d{d%5}/p{d%40}."""
    return F.concat(
        F.lit("https://site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.test/d"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("/p"),
        (F.col("doc_id") % 40).cast("string"),
    )


def link_href_expr(i: int) -> Column:
    """Link ``i`` of page d — one href per reference class:

    - i=0 absolute, mixed case + unsorted params + fragment, to host
      site{(d+1)%7}
    - i=1 root-relative with trailing slash (same host -> self edge)
    - i=2 protocol-relative with a tracking param, to host site{(d+3)%7}
    - i=3 relative path with a parent dot-segment (same host)"""
    d, k = F.col("doc_id"), F.col("doc_id") % 7
    if i == 0:
        return F.concat(
            F.lit("HTTP://Site"),
            ((k + 1) % 7).cast("string"),
            F.lit(".Example.TEST/abs/"),
            (d % 40).cast("string"),
            F.lit("?b=2&a=1#frag"),
        )
    if i == 1:
        return F.concat(F.lit("/r/"), (d % 9).cast("string"), F.lit("/"))
    if i == 2:
        return F.concat(
            F.lit("//site"),
            ((k + 3) % 7).cast("string"),
            F.lit(".example.test/pp?utm_source=f&q=1"),
        )
    return F.concat(F.lit("../up/"), (d % 11).cast("string"))


def with_synthetic_multihost_pages(docs: DataFrame) -> DataFrame:
    """(doc_id, url, html): real pages over the multi-host link fixture
    — each page carries the four reference-class links above as actual
    ``<a>`` elements (entity + inline tag in the anchors, same parser
    stress as ``html.with_synthetic_linked_html``)."""
    a = lambda i: F.concat(  # noqa: E731
        F.lit('<p><a href="'),
        link_href_expr(i),
        F.lit(f'">link &amp; <i>no {i}</i></a></p>\n'),
    )
    html = F.concat(
        F.lit("<html><head><title>Page "),
        F.col("doc_id").cast("string"),
        F.lit("</title></head>\n<body>\n"),
        a(0),
        a(1),
        a(2),
        a(3),
        F.lit("</body></html>\n"),
    )
    return docs.select("doc_id", page_url_expr().alias("url"), html.alias("html"))


def resolved_canonical_oracle_sql() -> str:
    """DuckDB closed-form of resolve+canonicalize over the four-link
    fixture: the EXPECTED output strings computed from the formulas."""
    return """
    SELECT doc_id, link_i, resolved_url FROM (
      SELECT doc_id, 0 AS link_i,
        'http://site' || CAST((doc_id % 7 + 1) % 7 AS VARCHAR)
          || '.example.test/abs/' || CAST(doc_id % 40 AS VARCHAR)
          || '?a=1&b=2' AS resolved_url
      FROM documents
      UNION ALL
      SELECT doc_id, 1,
        'https://site' || CAST(doc_id % 7 AS VARCHAR)
          || '.example.test/r/' || CAST(doc_id % 9 AS VARCHAR)
      FROM documents
      UNION ALL
      SELECT doc_id, 2,
        'https://site' || CAST((doc_id % 7 + 3) % 7 AS VARCHAR)
          || '.example.test/pp?q=1'
      FROM documents
      UNION ALL
      SELECT doc_id, 3,
        'https://site' || CAST(doc_id % 7 AS VARCHAR)
          || '.example.test/up/' || CAST(doc_id % 11 AS VARCHAR)
      FROM documents
    ) ORDER BY doc_id, link_i
    """


def host_graph_oracle_sql() -> str:
    """DuckDB closed-form of the host rollup over the fixture: only
    i=0 and i=2 cross hosts (i=1/i=3 resolve to the page's own host and
    are dropped by include_self=False), so the expected graph is the
    two host-formula edges aggregated."""
    return """
    SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links FROM (
      SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.test' AS src_host,
             'site' || CAST((doc_id % 7 + 1) % 7 AS VARCHAR) || '.example.test' AS dst_host
      FROM documents
      UNION ALL
      SELECT 'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.test',
             'site' || CAST((doc_id % 7 + 3) % 7 AS VARCHAR) || '.example.test'
      FROM documents
    ) GROUP BY src_host, dst_host ORDER BY src_host, dst_host
    """


def anchor_text_index(
    links: DataFrame,
    href_col: str = "href",
    anchor_col: str = "anchor",
    id_col: str = "doc_id",
) -> DataFrame:
    """Anchor-text aggregation per canonical link target — the crawl
    signal search/quality pipelines mine (the anchor corpus is a
    human-written description of the TARGET page; Common Crawl ships it
    as a dedicated product). Input is ``html.html_links`` output rows
    (doc_id, href, anchor); every href is canonicalized so
    ``?b=2&a=1`` / ``?a=1&b=2`` references collide onto one target.

    Output per target: n_refs (total in-links), n_src_docs (distinct
    referring documents), n_anchors (distinct anchor strings),
    top_anchor + top_anchor_refs (most frequent anchor text, ties to
    the lexicographically smallest — the deterministic "best label"
    for the target).

    100 TB shape: one map-side-combinable (target, anchor) aggregate,
    one target-partitioned window over DISTINCT-ANCHOR rows (frames
    bounded by a target's anchor vocabulary, never global), one final
    per-target merge. Canonicalization is scan-speed; nothing is
    quadratic in links. The canonicalized link table is MATERIALIZED
    once before fanning into the three aggregates — the minhash
    band-table lesson (``dedup.minhash_lsh_candidates``): on a lazy
    input each branch would re-run the whole upstream plan, tripling
    the html.parser kernel (plan-gated to exactly one Python stage).
    """
    canon = canonicalize_url(F.col(href_col))
    base = links.select(
        canon.alias("target"),
        F.col(anchor_col).alias("anchor"),
        F.col(id_col).alias("src_doc"),
    ).localCheckpoint(eager=True)
    per_anchor = base.groupBy("target", "anchor").agg(
        F.count("*").cast("long").alias("n"),
    )
    win = Window.partitionBy("target").orderBy(F.desc("n"), F.asc("anchor"))
    ranked = per_anchor.withColumn("rn", F.row_number().over(win))
    # r10 OPTIMIZATION (guide §2.4): the per-target totals, anchor
    # count, and top-anchor pick all fold into ONE aggregate over the
    # ranked rows (the rn = 1 row is unique per target, so max() over
    # the when()-guarded struct selects exactly it) — the old shape
    # re-aggregated per_anchor on a second branch and joined three
    # frames. The window, the aggregate, and the join all share the
    # `target` key, so the partitioning is established once (§2.4
    # "window functions partitioned by the same key as a preceding
    # aggregation do not need a second shuffle").
    per_target = ranked.groupBy("target").agg(
        F.sum("n").cast("long").alias("n_refs"),
        F.count("*").cast("long").alias("n_anchors"),
        F.max(
            F.when(
                F.col("rn") == 1,
                F.struct(F.col("anchor").alias("top_anchor"),
                         F.col("n").alias("top_anchor_refs")),
            )
        ).alias("_top"),
    )
    srcs = base.groupBy("target").agg(
        F.count_distinct("src_doc").cast("long").alias("n_src_docs")
    )
    return (
        per_target.join(srcs, "target")
        .select(
            "target",
            "n_refs",
            "n_src_docs",
            "n_anchors",
            F.col("_top.top_anchor").alias("top_anchor"),
            F.col("_top.top_anchor_refs").alias("top_anchor_refs"),
        )
        .orderBy("target")
    )
