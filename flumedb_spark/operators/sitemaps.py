"""Sitemap parsing (sitemaps.org XML) — the URL-DISCOVERY stage of the
crawl stack, beside the robots.txt politeness gate
(``operators/robots.py``): parse ``<urlset>`` page entries and
``<sitemapindex>`` shard pointers into flat URL rows a frontier can
rank and fetch.

Spark-first: the XML is parsed by the BUILT-IN ``from_xml`` expression
(JVM-side, whole-stage-codegen-compatible — no Python, no UDF), one
schema per root shape, exploded into rows. At 100 TB sitemaps are one
small document per host — metadata next to the crawl — and the parse
runs at scan speed with no shuffle.

Normalization for engine-exact oracles: ``lastmod`` dates become epoch
micros (UTC midnight; -1 when absent), ``priority`` becomes exact
integer millis (-1 when absent), so every output column is an integer
or string both engines hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

URLSET_SCHEMA = (
    "url array<struct<loc string, lastmod string, changefreq string,"
    " priority double>>"
)
INDEX_SCHEMA = "sitemap array<struct<loc string, lastmod string>>"


def parse_sitemaps(
    df: DataFrame, xml_col: str = "xml", id_col: str = "doc_id"
) -> DataFrame:
    """One row per discovered URL: (id, kind, loc, lastmod_us,
    changefreq, priority_milli) where kind is 'url' for ``<urlset>``
    page entries and 'sitemap' for ``<sitemapindex>`` shard pointers
    (a real fetcher enqueues the latter for recursive fetch). Entries
    with no <loc> are dropped (nothing to fetch); absent lastmod /
    changefreq / priority normalize to -1 / '' / -1.

    Malformed XML parses to null under from_xml's PERMISSIVE default
    and yields NO rows for that document (unlike the archive kernels'
    ok=False contract, from_xml cannot emit a marker row) — audit by
    anti-joining input ids against output ids, as
    tests/test_urls.py::test_sitemap_malformed_inputs_auditable does."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(xml_col).alias("x"))
    is_index = F.col("x").contains("<sitemapindex")
    urls = (
        src.where(~is_index)
        .select("doc_id", F.from_xml("x", URLSET_SCHEMA).alias("p"))
        .select("doc_id", F.explode("p.url").alias("u"))
        .select(
            "doc_id",
            F.lit("url").alias("kind"),
            F.col("u.loc").alias("loc"),
            F.coalesce(
                F.unix_micros(F.to_timestamp("u.lastmod")), F.lit(-1)
            ).alias("lastmod_us"),
            F.coalesce(F.col("u.changefreq"), F.lit("")).alias("changefreq"),
            F.coalesce(
                F.round(F.col("u.priority") * 1000).cast("long"), F.lit(-1)
            ).alias("priority_milli"),
        )
    )
    shards = (
        src.where(is_index)
        .select("doc_id", F.from_xml("x", INDEX_SCHEMA).alias("p"))
        .select("doc_id", F.explode("p.sitemap").alias("u"))
        .select(
            "doc_id",
            F.lit("sitemap").alias("kind"),
            F.col("u.loc").alias("loc"),
            F.coalesce(
                F.unix_micros(F.to_timestamp("u.lastmod")), F.lit(-1)
            ).alias("lastmod_us"),
            F.lit("").alias("changefreq"),
            F.lit(-1).cast("long").alias("priority_milli"),
        )
    )
    return urls.unionByName(shards).where(F.col("loc").isNotNull())


# ---------------------------------------------------------------------
# deterministic fixture + closed-form oracle
# ---------------------------------------------------------------------

_FREQ = ["daily", "weekly", "monthly"]


def with_synthetic_sitemaps(docs: DataFrame) -> DataFrame:
    """(doc_id, xml): docs with d % 11 == 0 carry a two-shard
    ``<sitemapindex>``; every other doc a ``<urlset>`` with 1 + d % 4
    entries — entry i at
    https://site{d%7}.example.test/d{d%5}/p{(d*3+i)%40} with
    lastmod 2024-01-{1+(d+i)%28} present iff (d+i) % 5 != 0,
    changefreq cycling daily/weekly/monthly by (d+i) % 3, and
    priority ((d+i)%10)/10 always present."""
    d = F.col("doc_id")
    k = (d % 7).cast("string")

    def entry(i: int):
        di = d + F.lit(i)
        lastmod = F.when(
            di % 5 != 0,
            F.concat(
                F.lit("<lastmod>2024-01-"),
                F.lpad((di % 28 + 1).cast("string"), 2, "0"),
                F.lit("</lastmod>"),
            ),
        ).otherwise(F.lit(""))
        freq = (
            F.when(di % 3 == 0, F.lit(_FREQ[0]))
            .when(di % 3 == 1, F.lit(_FREQ[1]))
            .otherwise(F.lit(_FREQ[2]))
        )
        prio = F.concat(F.lit("0."), (di % 10).cast("string"))
        return F.when(
            d % 4 >= i,
            F.concat(
                F.lit("<url><loc>https://site"), k, F.lit(".example.test/d"),
                (d % 5).cast("string"), F.lit("/p"),
                ((d * 3 + i) % 40).cast("string"), F.lit("</loc>"),
                lastmod,
                F.lit("<changefreq>"), freq, F.lit("</changefreq>"),
                F.lit("<priority>"), prio, F.lit("</priority></url>\n"),
            ),
        ).otherwise(F.lit(""))

    urlset = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>\n<urlset>\n'),
        entry(0), entry(1), entry(2), entry(3),
        F.lit("</urlset>\n"),
    )
    index = F.concat(
        F.lit("<sitemapindex>\n<sitemap><loc>https://site"), k,
        F.lit(".example.test/sitemap0.xml</loc>"
              "<lastmod>2024-02-01</lastmod></sitemap>\n"
              "<sitemap><loc>https://site"), k,
        F.lit(".example.test/sitemap1.xml</loc></sitemap>\n</sitemapindex>\n"),
    )
    return docs.select(
        "doc_id", F.when(d % 11 == 0, index).otherwise(urlset).alias("xml")
    )


def sitemap_oracle_sql() -> str:
    """DuckDB closed-form of parse_sitemaps(with_synthetic_sitemaps):
    the expected rows computed from the fixture formulas."""
    return """
    SELECT doc_id, kind, loc, lastmod_us, changefreq, priority_milli
    FROM (
      SELECT d.doc_id, 'url' AS kind,
        'https://site' || CAST(d.doc_id % 7 AS VARCHAR) || '.example.test/d'
          || CAST(d.doc_id % 5 AS VARCHAR) || '/p'
          || CAST((d.doc_id * 3 + s.i) % 40 AS VARCHAR) AS loc,
        CASE WHEN (d.doc_id + s.i) % 5 != 0
          THEN epoch_us(CAST('2024-01-'
            || lpad(CAST((d.doc_id + s.i) % 28 + 1 AS VARCHAR), 2, '0')
            AS TIMESTAMP))
          ELSE -1 END AS lastmod_us,
        CASE (d.doc_id + s.i) % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
          ELSE 'monthly' END AS changefreq,
        CAST(round(CAST((d.doc_id + s.i) % 10 AS DOUBLE) / 10.0 * 1000)
          AS BIGINT) AS priority_milli
      FROM documents d, generate_series(0, 3) s(i)
      WHERE d.doc_id % 11 != 0 AND s.i <= d.doc_id % 4
      UNION ALL
      SELECT d.doc_id, 'sitemap',
        'https://site' || CAST(d.doc_id % 7 AS VARCHAR)
          || '.example.test/sitemap' || CAST(s.i AS VARCHAR) || '.xml',
        CASE WHEN s.i = 0
          THEN epoch_us(CAST('2024-02-01' AS TIMESTAMP)) ELSE -1 END,
        '', CAST(-1 AS BIGINT)
      FROM documents d, generate_series(0, 1) s(i)
      WHERE d.doc_id % 11 = 0
    ) ORDER BY doc_id, kind, loc, priority_milli
    """
