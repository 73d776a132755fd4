"""HTML -> clean text extraction — the Common Crawl ingest stage
between ``archives.warc_bodies`` (raw HTTP bodies) and the text-quality
filters (``text.gopher_quality``, ``selection.dsir_logweights``): turn
markup into the visible text those stages are defined over.

Kernel: a real incremental HTML parser (stdlib ``html.parser``, the
robust tokenizer behind BeautifulSoup's 'html.parser' backend —
character-reference decoding, attribute parsing, broken-markup
recovery), run as an Arrow-batched ``mapInPandas`` kernel over binary
or string pages (the codec-kernel shape of operators/archives.py and
operators/jpegcodec.py: one Python dip total, Arrow both ways, corrupt
pages yield ok=False rows instead of failing the job).

Extraction spec (deterministic, engine-replayable):
  * ``title``  — character data inside the first non-empty <title>,
    whitespace-collapsed.
  * ``text``   — all character data NOT inside <script>/<style>/
    <title>/<template>/<noscript>, in document order, whitespace-
    normalized: split on any whitespace run, join with single spaces.
    Tags in the INLINE set (b/i/em/strong/u/s/span/sub/sup/code/
    abbr/mark/small/big/wbr) are transparent — ``a<b>b</b>c`` stays
    one word; every other tag is a word separator, so ``</h1><p>``
    never glues a heading into the next paragraph (the lynx/
    trafilatura convention). Comments, declarations, and processing
    instructions contribute nothing.
  * ``n_links`` — count of <a> start tags carrying an href attribute.
  * entity decoding — full HTML5 named + numeric character references
    (the parser's ``convert_charrefs``), i.e. html.unescape semantics.

100 TB shape: per-page embarrassingly parallel (no shuffle at all —
the stage inherits the upstream partitioning), Arrow-batched, input
capped at ``cap`` bytes per page so a pathological page bounds memory;
oversized pages are truncated at the cap and flagged rather than
dropped (the warc_bodies contract). This is a Python-kernel stage by
necessity — there is no Catalyst expression for stateful tag nesting —
and it sits exactly where the pipeline already pays its one Python dip
(the decode/extract stage), not in any relational hot path.

Oracle strategy (the synth_zip/synth_warc pattern of
operators/archives.py:92,531): ``with_synthetic_html_payload`` builds
REAL pages from the documents table with pure SQL string functions —
head/style/script/comment blocks, entity references, inline tags
wrapping corpus words — so the DuckDB oracle replays what extraction
MUST produce arithmetically from the same formula, and any kernel bug
(script leakage, entity mishandling, whitespace gluing) breaks the
value hash.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: per-page input cap — same bound as archives.MAX_MEMBER_BYTES
MAX_PAGE_BYTES = 64 * 1024 * 1024

_SKIP_CONTENT = {"script", "style", "template", "noscript"}

#: tags transparent to word boundaries — everything else separates
_INLINE = {
    "b", "i", "em", "strong", "u", "s", "span", "sub", "sup", "code",
    "abbr", "mark", "small", "big", "wbr",
}

HTML_TEXT_SCHEMA = (
    "doc_id long, title string, text string, n_links long, "
    "truncated boolean, ok boolean"
)


def _extract_one(page: str) -> tuple[str | None, str, int]:
    """(title, text, n_links) per the module extraction spec."""
    from html.parser import HTMLParser

    class _X(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.chunks: list[str] = []
            self.title_chunks: list[str] = []
            self.n_links = 0
            self._skip = 0  # nesting depth of skipped containers
            self._in_title = False
            self._title_done = False

        def handle_starttag(self, tag, attrs):
            if tag in _SKIP_CONTENT:
                self._skip += 1
            elif tag == "title":
                self._in_title = True
            elif tag not in _INLINE and not self._skip:
                self.chunks.append(" ")
            if tag == "a" and any(k == "href" for k, _ in attrs):
                self.n_links += 1

        def handle_endtag(self, tag):
            if tag in _SKIP_CONTENT and self._skip:
                self._skip -= 1
            elif tag == "title":
                self._in_title = False
                if self.title_chunks:
                    self._title_done = True
            elif tag not in _INLINE and not self._skip:
                self.chunks.append(" ")

        def handle_data(self, data):
            if self._in_title:
                if not self._title_done:
                    self.title_chunks.append(data)
            elif not self._skip:
                self.chunks.append(data)

    p = _X()
    p.feed(page)
    p.close()
    title = " ".join("".join(p.title_chunks).split()) or None
    text = " ".join("".join(p.chunks).split())
    return title, text, p.n_links


def html_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    cap: int = MAX_PAGE_BYTES,
) -> DataFrame:
    """(id, html) -> (id, title, text, n_links, truncated, ok).

    ``html_col`` may be binary (WARC body bytes — decoded as UTF-8
    with replacement, the Common Crawl default) or string. Pages past
    ``cap`` bytes are truncated at the cap and flagged; a page the
    parser cannot process yields one ok=False row (the corrupt-blob
    contract of operators/archives.py)."""
    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(html_col).alias("page")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in ("doc_id", "title", "text", "n_links", "truncated", "ok")
            }
            for doc_id, page in zip(pdf["doc_id"], pdf["page"]):
                try:
                    if page is None:
                        raise ValueError("null page")
                    if isinstance(page, (bytes, bytearray, memoryview)):
                        raw = bytes(page)
                        truncated = len(raw) > cap
                        s = raw[:cap].decode("utf-8", errors="replace")
                    else:
                        s = str(page)
                        truncated = len(s) > cap
                        s = s[:cap]
                    title, text, n_links = _extract_one(s)
                    out["doc_id"].append(doc_id)
                    out["title"].append(title)
                    out["text"].append(text)
                    out["n_links"].append(n_links)
                    out["truncated"].append(truncated)
                    out["ok"].append(True)
                except Exception:
                    out["doc_id"].append(doc_id)
                    out["title"].append(None)
                    out["text"].append(None)
                    out["n_links"].append(0)
                    out["truncated"].append(False)
                    out["ok"].append(False)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, HTML_TEXT_SCHEMA)


def with_synthetic_html_payload(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, html) REAL pages built from the corpus with pure SQL
    string functions — deterministic, so a DuckDB oracle rebuilds the
    expected extraction output from the same formula (the synth_warc
    pattern). The page exercises every extraction hazard: head
    noise (style/script with <, >, && inside), comments, entity
    references (named + numeric), an inline tag wrapping corpus words,
    multi-line whitespace, and a link.

    Expected extraction (replayed by the oracle):
      title   = 'Doc <id> & Co'
      text    = 'Heading "<id>" <text with single spaces> tail <kept> '
                '& fin link-<id%7>'
      n_links = 1
    """
    d = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<!DOCTYPE html>\n<html>\n<head>\n  <title>\n  Doc "),
        d,
        F.lit(" &amp; Co\n  </title>\n"),
        F.lit("  <style>\n    p { color: red; }\n  </style>\n"),
        F.lit('  <script>\n    if (1 < 2 && 3 > 1) { x("<p>"); }\n  </script>\n'),
        F.lit("</head>\n<body>\n  <!-- hidden "),
        d,
        F.lit(' -->\n  <h1 class="h">Heading &quot;'),
        d,
        F.lit("&quot;</h1>\n  <p>"),
        # an inline tag wrapping a corpus word: transparent to text
        F.regexp_replace(F.col(text_col), " the ", " <b>the</b> "),
        F.lit("</p>\n  <p>tail &lt;kept&gt; &#38; fin</p>\n"),
        F.lit('  <a href="http://ex.test/'),
        d,
        F.lit('">link-'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("</a>\n</body>\n</html>\n"),
    )
    return docs.select("doc_id", html.alias("html"))


def synthetic_html_oracle_sql() -> str:
    """DuckDB twin: replay the expected extraction output of
    ``html_text(with_synthetic_html_payload(documents))`` from the
    synthesis formula (title/text/links arithmetic — no HTML parsing
    in the oracle, exactly the archives-family pattern)."""
    return """
    SELECT doc_id,
      'Doc ' || CAST(doc_id AS VARCHAR) || ' & Co' AS title,
      'Heading "' || CAST(doc_id AS VARCHAR) || '" '
        || regexp_replace(trim(text), ' +', ' ', 'g')
        || ' tail <kept> & fin link-' || CAST(doc_id % 7 AS VARCHAR) AS text,
      CAST(1 AS BIGINT) AS n_links,
      false AS truncated,
      true AS ok
    FROM documents
    ORDER BY doc_id
    """


# ---------------------------------------------------------------------
# link extraction: the crawl-graph stage (pages -> edges)
# ---------------------------------------------------------------------

HTML_LINKS_SCHEMA = "doc_id long, href string, anchor string, ok boolean"


def _link_parser_class():
    """The <a href> collector (module-level factory so tests can fuzz
    the parser directly; class body needs the stdlib import local to
    keep executor pickling dependency-free)."""
    from html.parser import HTMLParser

    class _L(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.links: list[tuple[str, list]] = []
            self._open: list[list] = []  # anchor-text chunks per open <a>

        def handle_starttag(self, tag, attrs):
            if tag == "a":
                href = next((v for k, v in attrs if k == "href"), None)
                if href is not None:
                    chunks: list = []
                    self.links.append((href, chunks))
                    self._open.append(chunks)

        def handle_endtag(self, tag):
            if tag == "a" and self._open:
                self._open.pop()

        def handle_data(self, data):
            for chunks in self._open:
                chunks.append(data)

    return _L


def html_links(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    cap: int = MAX_PAGE_BYTES,
) -> DataFrame:
    """(id, html) -> one row per <a href=...> in document order:
    (doc_id, href, anchor, ok) — the stage that turns a crawl into a
    LINK GRAPH (feed (doc_id, href) into ``graph.pagerank`` /
    ``connected_components_star`` for centrality and site clustering).

    ``anchor`` is the link's visible text (whitespace-collapsed, same
    normalization as :func:`html_text`, entity-decoded). Empty-string
    hrefs are kept (they are real self-links in HTML semantics);
    anchors may be empty. Pages past ``cap`` are truncated at the cap
    before parsing; corrupt pages yield a single ok=False row so the
    edge count per page stays auditable. Same 100 TB shape as
    html_text: one Arrow-batched kernel, no shuffle, inherits the
    upstream partitioning."""
    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(html_col).alias("page")
    )
    _L = _link_parser_class()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "href", "anchor", "ok")}
            for doc_id, page in zip(pdf["doc_id"], pdf["page"]):
                try:
                    if page is None:
                        raise ValueError("null page")
                    if isinstance(page, (bytes, bytearray, memoryview)):
                        s = bytes(page)[:cap].decode("utf-8", errors="replace")
                    else:
                        s = str(page)[:cap]
                    p = _L()
                    p.feed(s)
                    p.close()
                    for href, chunks in p.links:
                        out["doc_id"].append(doc_id)
                        out["href"].append(href)
                        out["anchor"].append(" ".join("".join(chunks).split()))
                        out["ok"].append(True)
                except Exception:
                    out["doc_id"].append(doc_id)
                    out["href"].append(None)
                    out["anchor"].append(None)
                    out["ok"].append(False)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, HTML_LINKS_SCHEMA)


def with_synthetic_linked_html(docs: DataFrame, n_docs_mod: int = 97) -> DataFrame:
    """(doc_id, html) pages whose link structure is a deterministic
    FORMULA graph: page d carries 1 + d % 3 links, link i pointing at
    document (d * 7 + i * 13 + 1) % ``n_docs_mod`` — a connected,
    hub-bearing digraph an oracle replays arithmetically and
    ``graph.pagerank`` can rank. Anchors carry entities + inline tags
    so anchor-text extraction is exercised, not just attribute
    parsing."""
    d = F.col("doc_id").cast("string")
    link = lambda i: F.when(  # noqa: E731
        F.col("doc_id") % 3 >= i,
        F.concat(
            F.lit(f'<p>see <a href="http://corp.test/doc/'),
            ((F.col("doc_id") * 7 + i * 13 + 1) % n_docs_mod).cast("string"),
            F.lit(f'">ref &amp; <b>note</b> {i}</a></p>\n'),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        d,
        F.lit("</title></head>\n<body>\n<h1>Doc "),
        d,
        F.lit("</h1>\n"),
        link(0),
        link(1),
        link(2),
        F.lit("</body></html>\n"),
    )
    return docs.select("doc_id", html.alias("html"))


def synthetic_links_oracle_sql(n_docs_mod: int = 97) -> str:
    """DuckDB twin of ``html_links(with_synthetic_linked_html(...))``:
    replay the link formula arithmetically."""
    return f"""
    SELECT d.doc_id,
      'http://corp.test/doc/'
        || CAST((d.doc_id * 7 + s.i * 13 + 1) % {n_docs_mod} AS VARCHAR)
        AS href,
      'ref & note ' || CAST(s.i AS VARCHAR) AS anchor,
      true AS ok
    FROM documents d, generate_series(0, 2) s(i)
    WHERE s.i <= d.doc_id % 3
    ORDER BY d.doc_id, href, anchor
    """


# ---------------------------------------------------------------------
# table extraction (r10)
# ---------------------------------------------------------------------


def _table_parser_class():
    """<table>/<tr>/<td|th> cell collector (factory for the same
    executor-pickling reason as _link_parser_class). Cells are
    attributed to the INNERMOST open table; nested tables do not leak
    cells into their parent. Cell text is flattened through inline
    tags with entities decoded — the html_text semantics."""
    from html.parser import HTMLParser

    class _T(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            # one row per cell: (table_idx, row_idx, col_idx,
            #                    is_header, chunks)
            self.cells: list[tuple[int, int, int, bool, list]] = []
            self._n_tables = 0
            # stack of [table_idx, row_counter, col_counter]
            self._tables: list[list[int]] = []
            self._cell: list | None = None
            self._cell_depth = 0

        def handle_starttag(self, tag, attrs):
            if tag == "table":
                self._tables.append([self._n_tables, -1, -1])
                self._n_tables += 1
                self._cell = None
            elif tag == "tr" and self._tables:
                t = self._tables[-1]
                t[1] += 1
                t[2] = -1
                self._cell = None
            elif tag in ("td", "th") and self._tables:
                t = self._tables[-1]
                t[2] += 1
                chunks: list = []
                self.cells.append((t[0], t[1], t[2], tag == "th", chunks))
                self._cell = chunks
                self._cell_depth = len(self._tables)

        def handle_endtag(self, tag):
            if tag == "table" and self._tables:
                self._tables.pop()
                self._cell = None
            elif tag in ("td", "th", "tr"):
                self._cell = None

        def handle_data(self, data):
            if self._cell is not None and len(self._tables) == self._cell_depth:
                self._cell.append(data)

    return _T


def html_tables(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    cap: int = MAX_PAGE_BYTES,
) -> DataFrame:
    """(id, html) -> one row per table CELL in document order:
    (doc_id, table_idx, row_idx, col_idx, is_header, cell_text, ok) —
    the stage that turns crawled pages into tabular training data
    (relational QA, table-to-text). Whitespace inside a cell is
    collapsed like :func:`html_text`; corrupt pages yield one
    ok=False row. Same 100 TB shape as html_text: one Arrow-batched
    kernel, linear, no shuffle."""
    src = df.select(
        F.col(id_col).alias("doc_id"), F.col(html_col).alias("page")
    )
    _T = _table_parser_class()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "table_idx", "row_idx", "col_idx",
                    "is_header", "cell_text", "ok",
                )
            }

            def emit(doc_id, ti, ri, ci, hdr, txt, ok):
                out["doc_id"].append(doc_id)
                out["table_idx"].append(ti)
                out["row_idx"].append(ri)
                out["col_idx"].append(ci)
                out["is_header"].append(hdr)
                out["cell_text"].append(txt)
                out["ok"].append(ok)

            for doc_id, page in zip(pdf["doc_id"], pdf["page"]):
                try:
                    if page is None:
                        raise ValueError("null page")
                    if isinstance(page, (bytes, bytearray, memoryview)):
                        s = bytes(page)[:cap].decode("utf-8", errors="replace")
                    else:
                        s = str(page)[:cap]
                    p = _T()
                    p.feed(s)
                    p.close()
                    for ti, ri, ci, hdr, chunks in p.cells:
                        txt = " ".join("".join(chunks).split())
                        emit(doc_id, ti, ri, ci, hdr, txt, True)
                except Exception:
                    emit(doc_id, -1, -1, -1, False, "", False)
            yield pd.DataFrame(out)

    return src.mapInPandas(
        run,
        "doc_id long, table_idx int, row_idx int, col_idx int, "
        "is_header boolean, cell_text string, ok boolean",
    )


TABLE_CELL_CHARS = 20
TABLE_COLS = 2


def with_synthetic_table_html(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, html) pages each holding ONE table of 1 + d%3 body
    rows x 2 cols plus a <th> header row: header cell c is
    'col <c>'; body cell (r, c) carries text[20*(2r+c) : +20) with
    row 0's first cell split across a <b> span (inline-tag flattening
    exercised). The oracle replays cells as substr arithmetic."""
    t = F.col(text_col).cast("string")

    def cell(r: int, c: int) -> F.Column:
        s = F.substring(t, TABLE_CELL_CHARS * (TABLE_COLS * r + c) + 1,
                        TABLE_CELL_CHARS)
        if r == 0 and c == 0:
            inner = F.concat(
                F.lit("<b>"), F.substring(s, 1, 7), F.lit("</b>"),
                F.substring(s, 8, TABLE_CELL_CHARS - 7),
            )
        else:
            inner = s
        return F.concat(F.lit("<td>"), inner, F.lit("</td>"))

    def row(r: int) -> F.Column:
        return F.when(
            F.col("doc_id") % 3 >= r,
            F.concat(F.lit("<tr>"), cell(r, 0), cell(r, 1), F.lit("</tr>\n")),
        ).otherwise(F.lit(""))

    html = F.concat(
        F.lit("<html><body><p>prose outside tables</p>\n<table>\n"
              "<tr><th>col 0</th><th>col 1</th></tr>\n"),
        row(0), row(1), row(2),
        F.lit("</table>\n</body></html>\n"),
    )
    return docs.select("doc_id", html.alias("html"))


def synthetic_tables_oracle_sql() -> str:
    """DuckDB twin of ``html_tables(with_synthetic_table_html(...))``:
    the header row plus 1 + d%3 body rows, cells by substr formula."""
    n, k = TABLE_CELL_CHARS, TABLE_COLS
    return f"""
    WITH cells AS (
      SELECT d.doc_id, 0 AS table_idx, CAST(r.r AS INT) AS row_idx,
        CAST(c.c AS INT) AS col_idx,
        (r.r = 0) AS is_header,
        CASE WHEN r.r = 0 THEN 'col ' || CAST(c.c AS VARCHAR)
          ELSE trim(regexp_replace(
            coalesce(substr(d.text, {n} * ({k} * (r.r - 1) + c.c) + 1, {n}), ''),
            ' +', ' ', 'g'))
        END AS cell_text
      FROM documents d,
           generate_series(0, 3) r(r), generate_series(0, {k - 1}) c(c)
      WHERE r.r <= 1 + d.doc_id % 3
    )
    SELECT doc_id, CAST(table_idx AS INT) AS table_idx, row_idx, col_idx,
      is_header, cell_text, true AS ok
    FROM cells ORDER BY doc_id, table_idx, row_idx, col_idx
    """
