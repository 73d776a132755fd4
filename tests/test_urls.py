"""operators/urls — canonicalization, RFC-lite resolution, host graph.

The resolution tests use urllib.parse.urljoin as GROUND TRUTH (CPython's
RFC 3986 implementation): every (base, href) pair in the battery must
resolve identically, executed as ONE Spark job over the whole battery.
"""

from itertools import product
from urllib.parse import urljoin

import pytest
from pyspark.sql import functions as F

from flumedb_spark.operators import urls


def _resolve_all(spark, pairs):
    df = spark.createDataFrame(pairs, "base string, href string")
    rows = (
        df.select(
            "base",
            "href",
            urls.resolve_url(F.col("base"), F.col("href")).alias("got"),
        )
        .collect()
    )
    return [(r.base, r.href, r.got) for r in rows]


def test_resolve_matches_urljoin_battery(spark):
    bases = [
        "https://a.test",
        "https://a.test/",
        "https://a.test/x",
        "https://a.test/x/",
        "https://a.test/x/y",
        "https://a.test/x/y/z/w",
        "https://a.test/x/y?q=1",
        "https://a.test/x/y#f",
        "https://a.test/x/../y",  # unnormalized base: both sides normalize
        "http://b.test:8080/p/q",
    ]
    hrefs = [
        "z", "z/", "./z", "../z", "../../z", "../../../z", "..", ".",
        "/r", "/r/s/", "?p=2", "?", "#g", "", "z?a=1#b",
        "//c.test/w", "//c.test", "http://d.test/v", "mailto:u@e.test",
    ]
    pairs = [(b, h) for b, h in product(bases, hrefs)]
    diffs = [
        (b, h, got, urljoin(b, h))
        for b, h, got in _resolve_all(spark, pairs)
        if got != urljoin(b, h)
    ]
    assert not diffs, f"{len(diffs)} disagreements with urljoin: {diffs[:5]}"


def test_resolve_deep_nesting_within_bound(spark):
    # 8-level parent chains (the documented bound) still match urljoin
    base = "https://a.test/" + "/".join(f"s{i}" for i in range(9))
    pairs = [(base, "../" * n + "z") for n in range(1, 9)]
    for b, h, got in _resolve_all(spark, pairs):
        assert got == urljoin(b, h), (h, got, urljoin(b, h))


def test_canonicalize_sorts_params_and_keeps_duplicates(spark):
    df = spark.createDataFrame(
        [
            ("https://A.test/p?b=2&a=10&a=1",),
            ("https://a.test/p?z=1",),
            ("https://a.test/p",),
            ("HTTPS://a.test:443/p/?utm_source=x&b=1&a=2",),
        ],
        "u string",
    )
    got = [r.c for r in df.select(urls.canonicalize_url(F.col("u")).alias("c")).collect()]
    assert got == [
        "https://a.test/p?a=1&a=10&b=2",  # sorted, dups kept, binary order
        "https://a.test/p?z=1",
        "https://a.test/p",
        "https://a.test/p/?a=2&b=1",  # port dropped, tracking stripped
    ]


def test_host_of_strips_port_userinfo_www(spark):
    df = spark.createDataFrame(
        [
            ("https://WWW.Example.TEST:8443/p",),
            ("http://user:pw@host.test/x",),
            ("https://www.only.test",),
            ("not-a-url",),
        ],
        "u string",
    )
    got = [r.h for r in df.select(urls.host_of(F.col("u")).alias("h")).collect()]
    assert got == ["example.test", "host.test", "only.test", ""]
    got2 = [
        r.h
        for r in df.select(urls.host_of(F.col("u"), strip_www=False).alias("h")).collect()
    ]
    assert got2[0] == "www.example.test"


def test_host_graph_filters_and_self_edges(spark):
    pages = spark.createDataFrame(
        [(1, "https://a.test/x/"), (2, "https://b.test/y")],
        "doc_id long, url string",
    )
    links = spark.createDataFrame(
        [
            (1, "http://b.test/z"),     # cross-host
            (1, "other"),               # relative -> same host, self edge
            (1, "mailto:u@c.test"),     # non-http scheme: dropped
            (2, "//a.test/w"),          # protocol-relative cross-host
            (2, "https://b.test/self"), # absolute self edge
        ],
        "doc_id long, href string",
    )
    got = {
        (r.src_host, r.dst_host): r.n_links
        for r in urls.host_graph(pages, links).collect()
    }
    assert got == {("a.test", "b.test"): 1, ("b.test", "a.test"): 1}
    with_self = {
        (r.src_host, r.dst_host): r.n_links
        for r in urls.host_graph(pages, links, include_self=True).collect()
    }
    assert with_self[("a.test", "a.test")] == 1
    assert with_self[("b.test", "b.test")] == 1


def test_multihost_fixture_chain_matches_closed_form(spark, sf_dir):
    """End-to-end fixture sanity at the suite's SF: pages through the
    real html parser into the rollup equals the closed-form edge count
    (the full-gate re-checks the value hash vs DuckDB every run)."""
    from flumedb_spark.catalog import register_tables
    from flumedb_spark.operators import html as _html

    register_tables(spark, sf_dir)
    docs = spark.table("documents")
    pages = urls.with_synthetic_multihost_pages(docs)
    links = _html.html_links(pages, html_col="html").where(F.col("ok"))
    assert links.count() == 4 * docs.count()
    hg = urls.host_graph(pages.select("doc_id", "url"), links.select("doc_id", "href"))
    # every doc contributes exactly 2 cross-host edges (i=0 and i=2)
    assert hg.agg(F.sum("n_links")).collect()[0][0] == 2 * docs.count()


@pytest.mark.parametrize("q", ["ns_url_canonical", "ns_url_resolve"])
def test_url_rows_stay_jvm_side(spark, sf_dir, q):
    import contextlib
    import io

    import __spark_entry__ as entry

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        entry.queries()[q](spark, sf_dir).explain("formatted")
    p = buf.getvalue()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, (
        f"{q} fell into Python"
    )
    assert "MapInPandas" not in p, f"{q} gained a Python stage"
    assert "CartesianProduct" not in p


def test_host_graph_row_single_python_stage(spark, sf_dir):
    """ns_host_graph's only Python is the html parser kernel (one
    MapInPandas); resolution/rollup stay JVM-side, no cartesian."""
    import contextlib
    import io

    import __spark_entry__ as entry

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        entry.queries()["ns_host_graph"](spark, sf_dir).explain("formatted")
    p = buf.getvalue()
    assert p.count("MapInPandas (") == 1, "rollup must not add Python stages"
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p


# ---------------------------------------------------------------------
# r8: robots.txt parsing + crawl-permission decisions
# ---------------------------------------------------------------------


def test_robots_parse_group_semantics(spark):
    from flumedb_spark.operators import robots

    body = "\n".join([
        "# policy",
        "User-agent: googlebot",
        "Disallow: /google-only",
        "",
        "USER-AGENT: bingbot",          # consecutive UA lines: one group
        "user-agent: *",
        "Allow: /shared",
        "DISALLOW: /priv",               # case-insensitive fields
        "Disallow:",                     # empty value: dropped",
        "",
        "User-agent: yandex",
        "Disallow: /yandex-only",
    ])
    df = spark.createDataFrame([("h.test", body)], "host string, robots_txt string")
    rules = {(r.allow, r.path) for r in robots.parse_robots_rules(df).collect()}
    # only the group CONTAINING '*' contributes; googlebot/yandex rules
    # and the empty Disallow are excluded
    assert rules == {(True, "/shared"), (False, "/priv")}


def test_robots_decisions_longest_match_and_ties(spark):
    from flumedb_spark.operators import robots

    body = "\n".join([
        "User-agent: *",
        "Disallow: /a/",
        "Allow: /a/pub",
        "Disallow: /a/pub",  # same length as Allow: tie -> Allow wins
    ])
    rb = spark.createDataFrame([("h.test", body)], "host string, robots_txt string")
    rules = robots.parse_robots_rules(rb)
    urls_df = spark.createDataFrame(
        [
            (1, "https://h.test/a/secret"),     # /a/ disallows
            (2, "https://h.test/a/public"),     # /a/pub allows (longest + tie)
            (3, "https://h.test/other"),        # no match -> allowed
            (4, "https://nohost.test/x"),       # host without rules -> allowed
            (5, "https://h.test"),              # empty path -> '/' -> allowed
        ],
        "doc_id long, url string",
    )
    got = {r.doc_id: (r.allowed, r.rule_path)
           for r in robots.robots_decisions(urls_df, rules).collect()}
    assert got[1] == (False, "/a/")
    assert got[2] == (True, "/a/pub")
    assert got[3] == (True, "")
    assert got[4] == (True, "")
    assert got[5] == (True, "")
    assert len(got) == 5  # no URL ever drops out of the decision


def test_robots_row_stays_jvm_side(spark, sf_dir):
    import contextlib
    import io

    import __spark_entry__ as entry

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        entry.queries()["ns_robots_decisions"](spark, sf_dir).explain("formatted")
    p = buf.getvalue()
    assert "Python" not in p
    assert "CartesianProduct" not in p
    # the only windows are per-host over robots LINES (partitioned)
    assert "No Partition Defined" not in p


# ---------------------------------------------------------------------
# r8: sitemap parsing (URL discovery)
# ---------------------------------------------------------------------


def test_sitemap_parse_shapes_and_normalization(spark):
    from flumedb_spark.operators import sitemaps

    urlset = (
        '<?xml version="1.0"?>\n<urlset>\n'
        "<url><loc>https://a.test/p1</loc><lastmod>2024-01-05</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>\n"
        "<url><loc>https://a.test/p2</loc></url>\n"  # bare: all optional absent
        "<url><priority>0.9</priority></url>\n"       # no loc: dropped
        "</urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://a.test/s1.xml</loc>"
        "<lastmod>2024-02-01</lastmod></sitemap>"
        "<sitemap><loc>https://a.test/s2.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [(1, urlset), (2, index)], "doc_id long, xml string"
    )
    rows = {
        (r.doc_id, r.kind, r.loc): (r.lastmod_us, r.changefreq, r.priority_milli)
        for r in sitemaps.parse_sitemaps(df).collect()
    }
    import datetime

    us = lambda d: int(  # noqa: E731
        datetime.datetime.fromisoformat(d + "T00:00:00+00:00").timestamp() * 1e6
    )
    assert rows[(1, "url", "https://a.test/p1")] == (us("2024-01-05"), "daily", 800)
    assert rows[(1, "url", "https://a.test/p2")] == (-1, "", -1)
    assert rows[(2, "sitemap", "https://a.test/s1.xml")] == (us("2024-02-01"), "", -1)
    assert rows[(2, "sitemap", "https://a.test/s2.xml")] == (-1, "", -1)
    assert len(rows) == 4  # the loc-less entry dropped


def test_sitemap_row_stays_jvm_side(spark, sf_dir):
    import contextlib
    import io

    import __spark_entry__ as entry

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        entry.queries()["ns_sitemap_urls"](spark, sf_dir).explain("formatted")
    p = buf.getvalue()
    assert "Python" not in p, "from_xml must stay a JVM expression"
    assert "CartesianProduct" not in p


def test_sitemap_malformed_inputs_auditable(spark):
    """Malformed sitemap XML yields no rows (from_xml PERMISSIVE -> null
    -> explode drops); the documented audit — anti-join input ids vs
    output ids — must surface exactly the corrupt docs."""
    from flumedb_spark.operators import sitemaps

    df = spark.createDataFrame(
        [
            (1, "<urlset><url><loc>https://a.test/x</loc></url></urlset>"),
            (2, "not xml at all <<<"),
            (3, None),
        ],
        "doc_id long, xml string",
    )
    out = sitemaps.parse_sitemaps(df)
    assert [r.doc_id for r in out.collect()] == [1]
    missing = sorted(
        r.doc_id
        for r in df.join(out.select("doc_id").distinct(), "doc_id", "left_anti").collect()
    )
    assert missing == [2, 3]
