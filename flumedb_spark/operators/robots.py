"""robots.txt parsing + crawl-permission evaluation — the politeness
gate between the host graph (``operators/urls.py``) and the fetch
frontier, completing the crawl stack (triage -> extract -> URLs ->
hosts -> MAY-I-FETCH).

Scope (documented subset of RFC 9309): per-host robots.txt bodies are
parsed into the ``User-agent: *`` group's Allow/Disallow PREFIX rules
(wildcard ``*``/``$`` patterns are out of scope — the original 1994
prefix semantics, which the overwhelming majority of real rules use),
and a URL is permitted by the LONGEST matching rule, ties broken in
favor of Allow (both per RFC 9309 §2.2.2). No matching rule, an empty
``Disallow:`` value, or a missing/empty robots body → allowed.

Engine-parity rules as everywhere in this repo: the parse is pure JVM
column expressions (split/posexplode/regexp with RE2-safe patterns —
no Python), the per-host group tracking uses a window PARTITIONED BY
HOST over line positions (a robots.txt is a few KB — the window frame
is file-sized, never corpus-sized), and the longest-match decision is
one max-of-struct aggregate per URL.

100 TB shape: robots bodies are one small blob per HOST (millions of
rows, kilobytes each — metadata next to the crawl); the rules table is
a few rows per host and broadcast-joins onto the URL stream when hosts
fit, or hash-joins on host otherwise; the decision aggregate is
map-side combinable on (url).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots_rules(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """(host, allow, path, plen): the ``User-agent: *`` group's rules.

    Group semantics per RFC 9309 §2.2.1: consecutive ``User-agent:``
    lines open ONE group that all following rules attach to, so a rule
    line belongs to the star group iff the maximal run of User-agent
    lines immediately above it contains ``*``. Rule lines with an empty
    value (``Disallow:``) are dropped (an empty Disallow means
    allow-everything — representable as no rule). Comments (#...) and
    blank lines are ignored; field names are case-insensitive."""
    from pyspark.sql.window import Window

    lines = (
        robots.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"),
        )
        # strip comments + surrounding whitespace
        .withColumn("line", F.trim(F.regexp_replace(F.col("raw"), "#.*$", "")))
        .where(F.col("line") != "")
        .withColumn(
            "field", F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1)))
        )
        .withColumn("value", F.trim(F.regexp_replace("line", "^[^:]*:", "")))
        .where(F.col("field").isin("user-agent", "allow", "disallow"))
    )
    w = Window.partitionBy("host").orderBy("pos")
    grouped = (
        lines
        # a NEW group starts at a user-agent line NOT preceded by
        # another user-agent line (consecutive UA lines share a group)
        .withColumn("prev_field", F.lag("field").over(w))
        .withColumn(
            "new_group",
            (
                (F.col("field") == "user-agent")
                & (F.coalesce(F.col("prev_field"), F.lit("")) != "user-agent")
            ).cast("int"),
        )
        .withColumn("gid", F.sum("new_group").over(w))
    )
    star_groups = (
        grouped.where((F.col("field") == "user-agent") & (F.col("value") == "*"))
        .select("host", "gid")
        .distinct()
    )
    return (
        grouped.where(F.col("field").isin("allow", "disallow"))
        .join(star_groups, ["host", "gid"], "left_semi")
        .where(F.col("value") != "")
        .select(
            "host",
            (F.col("field") == "allow").alias("allow"),
            F.col("value").alias("path"),
            F.length("value").cast("long").alias("plen"),
        )
    )


def robots_decisions(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Per-URL fetch permission under the parsed rules: (url columns...,
    allowed, rule_path). The URL's host selects its rule set; the
    longest rule whose path is a PREFIX of the URL's path decides,
    Allow winning length ties; no match (or no rules for the host) →
    allowed with rule_path ''."""
    from .urls import host_of

    u = urls.select(
        "*",
        host_of(F.col(url_col)).alias("_host"),
        F.regexp_extract(
            F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1
        ).alias("_path"),
    ).withColumn("_path", F.when(F.col("_path") == "", "/").otherwise(F.col("_path")))
    hits = u.join(
        rules.select(
            F.col("host").alias("_host"), "allow", "path", "plen"
        ),
        "_host",
        "left",
    )
    # a NON-matching rule row must still keep its URL in the aggregate
    # (a host whose rules all miss the path is ALLOWED, not absent), so
    # matching is a column, never a filter
    matched = F.col("path").isNotNull() & F.col("_path").startswith(
        F.col("path")
    )
    # longest match wins; tie -> allow wins (allow=1 sorts above 0)
    best = F.max(
        F.struct(
            F.when(matched, F.col("plen")).otherwise(F.lit(-1)).alias("plen"),
            F.when(matched, F.col("allow").cast("int"))
            .otherwise(F.lit(1))
            .alias("allow_i"),
            F.when(matched, F.col("path")).otherwise(F.lit("")).alias("path"),
        )
    ).alias("best")
    out_cols = [c for c in urls.columns]
    return (
        hits.groupBy(*[F.col(c) for c in out_cols], F.col("_host"))
        .agg(best)
        .select(
            *out_cols,
            F.col("_host").alias("host"),
            (F.col("best.plen") < 0) | (F.col("best.allow_i") == 1),
            F.col("best.path"),
        )
        .toDF(*out_cols, "host", "allowed", "rule_path")
    )


# ---------------------------------------------------------------------
# deterministic fixture + closed-form oracle
# ---------------------------------------------------------------------


def synthetic_robots_df(spark) -> "DataFrame":
    """One robots.txt per fixture host site{k}.example.test (k = 0..6):

        # crawl policy for site{k}
        User-agent: googlebot
        Disallow: /g{k}
        User-agent: *
        Disallow: /d{k}/
        Allow: /d{k}/p1
        Disallow:
        Disallow: /x

    so for the star group: pages /d{a}/p{m} of host k are disallowed
    iff a == k UNLESS the path continues '/p1...' (m == 1 or 10..19);
    the googlebot group must be ignored; the empty Disallow dropped."""
    hosts = spark.range(0, 7).select(
        F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".example.test")).alias("host"),
        F.concat(
            F.lit("# crawl policy\nUser-agent: googlebot\nDisallow: /g"),
            F.col("id").cast("string"),
            F.lit("\n\nUser-agent: *\nDisallow: /d"),
            F.col("id").cast("string"),
            F.lit("/\nAllow: /d"),
            F.col("id").cast("string"),
            F.lit("/p1\nDisallow:\nDisallow: /x\n"),
        ).alias("robots_txt"),
    )
    return hosts


def robots_oracle_sql() -> str:
    """Closed-form DuckDB twin of parse+decide over the fixture URLs
    (page d at https://site{d%7}.example.test/d{d%5}/p{d%40}): the page
    is governed by host k=d%7; its path /d{a}/p{m} (a=d%5, m=d%40)
    matches 'Disallow: /d{k}/' iff a == k, and the longer
    'Allow: /d{k}/p1' iff a == k AND the p-segment starts with '1'
    (m == 1 or 10 <= m <= 19)."""
    return """
    SELECT doc_id, url,
      'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.test' AS host,
      (doc_id % 5 != doc_id % 7)
        OR (doc_id % 40 = 1 OR (doc_id % 40 >= 10 AND doc_id % 40 <= 19))
        AS allowed,
      CASE
        WHEN doc_id % 5 != doc_id % 7 THEN ''
        WHEN doc_id % 40 = 1 OR (doc_id % 40 >= 10 AND doc_id % 40 <= 19)
          THEN '/d' || CAST(doc_id % 7 AS VARCHAR) || '/p1'
        ELSE '/d' || CAST(doc_id % 7 AS VARCHAR) || '/'
      END AS rule_path
    FROM (
      SELECT doc_id,
        'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.test/d'
          || CAST(doc_id % 5 AS VARCHAR) || '/p' || CAST(doc_id % 40 AS VARCHAR)
          AS url
      FROM documents
    ) ORDER BY doc_id
    """
