"""Markdown and LaTeX plain-texting — the markup legs of the ingest
stack. Web crawls and paper corpora (wiki dumps, READMEs, arXiv
sources) arrive as lightweight markup; the pre-training pass strips it
to plain text. Both strippers are pure JVM-side ``regexp_replace``
chains over ``pyspark.sql.functions`` — no Python per row, whole-stage
codegen end to end, linear scans with zero shuffle, so they are
trivially 100 TB-safe.

The strip orders are fixed and documented because they are semantics:

Markdown (:func:`strip_markdown`):
  1. fenced code blocks dropped (content is code, not prose)
  2. images ``![alt](url)`` -> alt
  3. links ``[text](url)`` -> text
  4. ATX headers: leading ``#{1,6}`` stripped
  5. bold ``**x**`` -> x, then italic ``*x*`` -> x
  6. inline code ```` `x` ```` -> x
  7. blockquote markers ``> `` stripped

LaTeX (:func:`strip_latex`):
  1. ``%`` line comments dropped
  2. argument-keeping commands (``\\section``, ``\\textbf``,
     ``\\emph``, ...) -> their argument
  3. inline math ``$...$`` dropped (math is not prose)
  4. ``\\begin{env}`` / ``\\end{env}`` dropped
  5. remaining bare commands (``\\item``, ``\\par``, ...) dropped

The catalog rows synthesize marked-up documents FROM the corpus with
pure SQL string concatenation (slice k of the text lands in markup
construct k), so the DuckDB oracle states the expected plain text
CLOSED-FORM — substr concatenation, independent of the regex chain. A
pattern-order or capture-group bug breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "strip_markdown",
    "strip_latex",
    "with_synthetic_markdown",
    "with_synthetic_latex",
    "markdown_strip_oracle_sql",
    "latex_strip_oracle_sql",
]

SLICE = 12  # synthesis geometry: slice k = text[12k : 12k+12)


def _s(text: Column, k: int) -> Column:
    """Slice k of the corpus text (1-based substr, 12 chars)."""
    return F.substring(text, SLICE * k + 1, SLICE)


# ---------------------------------------------------------------------
# strippers (pure regexp_replace chains)
# ---------------------------------------------------------------------


def strip_markdown(col: Column) -> Column:
    """Markdown -> plain text (see module doc for the strip order)."""
    c = F.regexp_replace(col, r"(?s)```.*?```", "")
    c = F.regexp_replace(c, r"!\[([^\]]*)\]\([^)]*\)", r"$1")
    c = F.regexp_replace(c, r"\[([^\]]*)\]\([^)]*\)", r"$1")
    c = F.regexp_replace(c, r"(?m)^#{1,6} ?", "")
    c = F.regexp_replace(c, r"\*\*([^*]*)\*\*", r"$1")
    c = F.regexp_replace(c, r"\*([^*]*)\*", r"$1")
    c = F.regexp_replace(c, r"`([^`]*)`", r"$1")
    c = F.regexp_replace(c, r"(?m)^> ?", "")
    return c


_ARG_COMMANDS = "section|subsection|subsubsection|textbf|textit|emph|caption|title"


def strip_latex(col: Column) -> Column:
    """LaTeX -> plain text (see module doc for the strip order)."""
    c = F.regexp_replace(col, r"(?m)%[^\n]*", "")
    c = F.regexp_replace(c, r"\\(?:" + _ARG_COMMANDS + r")\{([^}]*)\}", r"$1")
    c = F.regexp_replace(c, r"\$[^$]*\$", "")
    c = F.regexp_replace(c, r"\\(?:begin|end)\{[^}]*\}", "")
    c = F.regexp_replace(c, r"\\[a-zA-Z]+\*?", "")
    return c


# ---------------------------------------------------------------------
# synthesis (pure SQL concat — slice k lands in construct k)
# ---------------------------------------------------------------------


def with_synthetic_markdown(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id -> a markdown document exercising every strip rule:
    header(s0), bold(s1)/italic(s2), image-alt(s3) + link-text(s4),
    blockquote(s5), inline code(s6), a dropped fence, body(s7)."""
    t = F.col(text_col).cast("string")
    md = F.concat(
        F.lit("# "), _s(t, 0), F.lit("\n\n"),
        F.lit("**"), _s(t, 1), F.lit("** and *"), _s(t, 2), F.lit("*\n"),
        F.lit("!["), _s(t, 3), F.lit("](https://corp.test/i.png) ["),
        _s(t, 4), F.lit("](https://corp.test/p)\n"),
        F.lit("> "), _s(t, 5), F.lit("\n"),
        F.lit("`"), _s(t, 6), F.lit("`\n"),
        F.lit("```\ncode block dropped\n```\n"),
        _s(t, 7),
    )
    return docs.select("doc_id", md.alias("markdown"))


def with_synthetic_latex(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id -> a LaTeX document exercising every strip rule:
    section(s0), a dropped comment line, body(s2) + textbf(s3) +
    emph(s4), dropped inline math then s5, an itemize item(s6),
    tail(s7)."""
    t = F.col(text_col).cast("string")
    tex = F.concat(
        F.lit("\\section{"), _s(t, 0), F.lit("}\n"),
        F.lit("% "), _s(t, 1), F.lit(" comment dropped\n"),
        _s(t, 2), F.lit(" \\textbf{"), _s(t, 3), F.lit("} \\emph{"),
        _s(t, 4), F.lit("}\n"),
        F.lit("$x^2 + y_i$ "), _s(t, 5), F.lit("\n"),
        F.lit("\\begin{itemize}\\item "), _s(t, 6),
        F.lit("\\end{itemize}\n"),
        _s(t, 7),
    )
    return docs.select("doc_id", tex.alias("latex"))


# ---------------------------------------------------------------------
# the two catalog-row bodies (synth -> strip -> lengths)
# ---------------------------------------------------------------------


def markdown_plain(docs: DataFrame, text_col: str = "text") -> DataFrame:
    md = with_synthetic_markdown(docs, text_col)
    plain = strip_markdown(F.col("markdown"))
    return md.select(
        "doc_id",
        F.length("markdown").alias("md_len"),
        plain.alias("plain_text"),
        F.length(plain).alias("plain_len"),
    )


def latex_plain(docs: DataFrame, text_col: str = "text") -> DataFrame:
    tex = with_synthetic_latex(docs, text_col)
    plain = strip_latex(F.col("latex"))
    return tex.select(
        "doc_id",
        F.length("latex").alias("tex_len"),
        plain.alias("plain_text"),
        F.length(plain).alias("plain_len"),
    )


# ---------------------------------------------------------------------
# DuckDB oracles — closed-form expected text (substr concatenation),
# independent of the regex chain
# ---------------------------------------------------------------------

_SL = "coalesce(substr(d.text, {off}, {n}), '')"


def _sl(k: int) -> str:
    return _SL.format(off=SLICE * k + 1, n=SLICE)


def markdown_strip_oracle_sql() -> str:
    """The markup string is rebuilt with the SAME concatenation the
    Spark synthesis uses (so md_len checks the synthesis), while the
    plain text is stated closed-form (so the regex chain is checked
    against an independent expectation)."""
    nl = "chr(10)"
    md = (
        f"'# ' || {_sl(0)} || {nl} || {nl}"
        f" || '**' || {_sl(1)} || '** and *' || {_sl(2)} || '*' || {nl}"
        f" || '![' || {_sl(3)} || '](https://corp.test/i.png) ['"
        f" || {_sl(4)} || '](https://corp.test/p)' || {nl}"
        f" || '> ' || {_sl(5)} || {nl}"
        f" || '`' || {_sl(6)} || '`' || {nl}"
        f" || '```' || {nl} || 'code block dropped' || {nl} || '```' || {nl}"
        f" || {_sl(7)}"
    )
    plain = (
        f"{_sl(0)} || {nl} || {nl} || {_sl(1)} || ' and ' || {_sl(2)}"
        f" || {nl} || {_sl(3)} || ' ' || {_sl(4)} || {nl} || {_sl(5)}"
        f" || {nl} || {_sl(6)} || {nl} || {nl} || {_sl(7)}"
    )
    return f"""
    SELECT d.doc_id,
      CAST(len({md}) AS INT) AS md_len,
      {plain} AS plain_text,
      CAST(len({plain}) AS INT) AS plain_len
    FROM documents d ORDER BY d.doc_id
    """


def latex_strip_oracle_sql() -> str:
    """Same device as :func:`markdown_strip_oracle_sql`."""
    nl = "chr(10)"
    tex = (
        f"'\\section{{' || {_sl(0)} || '}}' || {nl}"
        f" || '% ' || {_sl(1)} || ' comment dropped' || {nl}"
        f" || {_sl(2)} || ' \\textbf{{' || {_sl(3)} || '}} \\emph{{'"
        f" || {_sl(4)} || '}}' || {nl}"
        f" || '$x^2 + y_i$ ' || {_sl(5)} || {nl}"
        f" || '\\begin{{itemize}}\\item ' || {_sl(6)}"
        f" || '\\end{{itemize}}' || {nl}"
        f" || {_sl(7)}"
    )
    plain = (
        f"{_sl(0)} || {nl} || {nl} || {_sl(2)} || ' ' || {_sl(3)}"
        f" || ' ' || {_sl(4)} || {nl} || ' ' || {_sl(5)} || {nl}"
        f" || ' ' || {_sl(6)} || {nl} || {_sl(7)}"
    )
    return f"""
    SELECT d.doc_id,
      CAST(len({tex}) AS INT) AS tex_len,
      {plain} AS plain_text,
      CAST(len({plain}) AS INT) AS plain_len
    FROM documents d ORDER BY d.doc_id
    """
