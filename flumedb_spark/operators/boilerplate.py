"""Corpus-level boilerplate removal (CCNet-style segment dedup with
document reassembly) and C4-style blocklist filtering — the two
standard Common-Crawl curation stages still missing after round 8's
quality classifiers: REMOVING repeated content from documents (not just
reporting it, which is ``ns_chunk_dedup``'s job) and gating documents
on a bad-words list.

Reference scope note: the reference engine (index.js:1-286) has no text
layer; this module is part of the LLM-pipeline extension surface, built
from public pipeline descriptions — CCNet's shard-hash paragraph dedup
(arXiv:1911.00359 §3.1), C4's bad-words line filter (arXiv:1910.10683
§2.2), and RefinedWeb's repeated-line removal (arXiv:2306.01116 §3.4).

Design rules (shared with the rest of ``operators/``):

- **Pure built-in column expressions** — zero Python anywhere; the
  segmenting explode, the frequency aggregate, and the ordered
  reassembly are all JVM-side and whole-stage-codegen'd.
- **Exact arithmetic** — frequencies are exact BIGINT counts, removal
  fractions are ``round(x, 6)``, segment identity is md5 — so a DuckDB
  oracle replays the transformation bit-for-bit.
- **100 TB shape** — the only data-sized shuffles are the segment-hash
  frequency aggregate and the per-doc reassembly groupBy, both
  map-side combinable; the frequency side joins back on the uniform
  md5 key (no skew: a boilerplate segment repeated a billion times is
  ONE row on the frequency side, fanned out by the join to exactly the
  docs that contain it). Reassembly state per doc is the doc itself —
  no global window, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def segment_docs(
    docs: DataFrame,
    seg_words: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into fixed ``seg_words``-word segments,
    position-preserving: columns (doc_id, seg_id, seg_text). The
    word-window segmentation is the corpus-agnostic stand-in for
    CCNet's newline paragraphs (the test corpus has no newlines); a
    real crawl corpus would split on ``\\n`` first and fall back to
    windows for wall-of-text pages. The trailing partial window is a
    segment like any other (both Spark's ``slice`` and DuckDB's list
    slicing clamp at the array end)."""
    w = int(seg_words)
    n_segs = F.ceil(F.size(F.col("toks")) / F.lit(float(w))).cast("int")
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("toks"),
        )
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), n_segs - 1)).alias("seg_id"),
        )
        .select(
            "doc_id",
            F.col("seg_id").cast("long").alias("seg_id"),
            F.array_join(
                F.slice(F.col("toks"), F.col("seg_id") * w + 1, w), " "
            ).alias("seg_text"),
        )
    )


def segment_doc_freq(segments: DataFrame) -> DataFrame:
    """Distinct-document frequency per segment: (seg_hash, n_docs_with).
    Distinct-DOC counting (not raw occurrences) is the CCNet semantics:
    a segment repeated inside one document is that document's own
    business (``text.repetition_ratio`` scores it); only cross-document
    repetition marks boilerplate."""
    return segments.groupBy(
        F.md5(F.col("seg_text")).alias("seg_hash")
    ).agg(F.count_distinct("doc_id").cast("long").alias("n_docs_with"))


def line_dedup_clean(
    docs: DataFrame,
    seg_words: int = 3,
    max_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style boilerplate removal WITH reassembly: drop every
    segment that appears in more than ``max_docs`` distinct documents,
    then rebuild each document's text from its surviving segments in
    original order. Every input document survives — a fully-boilerplate
    document comes back with ``clean_text = ''`` and ``kept_segs = 0``
    (the downstream keep/drop decision belongs to the quality gates,
    not to this transform).

    Output: doc_id, clean_text, n_segs, kept_segs, removed_frac
    (exact-count ratio rounded to 6dp)."""
    # r10 OPTIMIZATION (guide §2.4, the minhash band-table lesson): the
    # segment table feeds BOTH the frequency aggregate and the join
    # back — on a lazy plan each reference re-ran the split/explode/
    # slice segmentation. Materialize it once, with the md5 segment
    # hash computed once per row instead of once per reference side.
    segs = (
        segment_docs(docs, seg_words=seg_words, text_col=text_col, id_col=id_col)
        .withColumn("seg_hash", F.md5(F.col("seg_text")))
        .localCheckpoint(eager=True)
    )
    freq = segs.groupBy("seg_hash").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs_with")
    )
    tagged = segs.join(freq, "seg_hash", "inner").select(
        "doc_id",
        "seg_id",
        "seg_text",
        (F.col("n_docs_with") <= F.lit(int(max_docs))).alias("keep"),
    )
    per_doc = tagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_segs"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("kept_segs"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("keep"),
                            F.struct(F.col("seg_id"), F.col("seg_text")),
                        )
                    )
                ),
                lambda s: s["seg_text"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return per_doc.select(
        "doc_id",
        "clean_text",
        "n_segs",
        "kept_segs",
        F.round(
            (F.col("n_segs") - F.col("kept_segs")) / F.col("n_segs"), 6
        ).alias("removed_frac"),
    )


def line_dedup_oracle_sql(
    seg_words: int = 3, max_docs: int = 2, from_clause: str = "documents"
) -> str:
    """DuckDB replay of :func:`line_dedup_clean` — same segmentation,
    same distinct-doc frequency, same ordered reassembly
    (``string_agg ... ORDER BY seg_id`` mirrors the sorted-struct
    collect)."""
    w = int(seg_words)
    return f"""
    WITH t AS (
      SELECT doc_id, str_split(text, ' ') AS toks FROM {from_clause}
    ),
    e AS (
      SELECT doc_id, toks,
        unnest(range(0, CAST(ceil(len(toks) / {w}.0) AS BIGINT))) AS seg_id
      FROM t
    ),
    segs AS (
      SELECT doc_id, seg_id,
        array_to_string(toks[(seg_id * {w} + 1):(seg_id * {w} + {w})], ' ')
          AS seg_text
      FROM e
    ),
    freq AS (
      SELECT md5(seg_text) AS seg_hash,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_with
      FROM segs GROUP BY md5(seg_text)
    ),
    tagged AS (
      SELECT s.doc_id, s.seg_id, s.seg_text,
        (f.n_docs_with <= {int(max_docs)}) AS keep
      FROM segs s JOIN freq f ON md5(s.seg_text) = f.seg_hash
    )
    SELECT doc_id,
      coalesce(string_agg(CASE WHEN keep THEN seg_text END, ' '
                          ORDER BY seg_id), '') AS clean_text,
      CAST(count(*) AS BIGINT) AS n_segs,
      CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_segs,
      round(CAST(count(*) - sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
            / count(*), 6) AS removed_frac
    FROM tagged GROUP BY doc_id ORDER BY doc_id
    """


def blocklist_filter(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style bad-words gate (arXiv:1910.10683 §2.2): flag documents
    containing any blocklisted token. The blocklist rides along as a
    MAP literal (kilobytes — the "List of Dirty, Naughty …" list C4
    uses is ~2k terms), so matching is a pure per-row JVM expression
    with NO join and NO shuffle, and each token costs one hashed map
    probe — O(tokens), not O(tokens × terms) (the r8 ADVICE: the
    earlier array_contains scan degraded ~2000× at real list sizes).
    At 100 TB this runs at scan speed.

    Matching is exact-token (the corpus is pre-tokenized word soup; a
    real pipeline lowercases + strips punctuation first — that is
    ``text.canonicalize``'s job, composed upstream). The hit COUNT and
    the sorted distinct hit list are columns, never a filter, so no
    document silently drops out of the decision (the robots.py rule).

    Output: doc_id, n_blocked_hits, blocked_terms (sorted distinct,
    comma-joined — a string so the driver's value hash covers it),
    keep (no hits)."""
    if not terms:
        raise ValueError("blocklist_filter: terms must be non-empty")
    toks = F.split(F.col(text_col), " ")
    # constant map literal -> per-token lookup is a single hash probe
    pairs: list = []
    for t in sorted(set(terms)):
        pairs += [F.lit(t), F.lit(True)]
    bmap = F.create_map(*pairs)
    hits = F.filter(
        toks, lambda t: F.coalesce(F.element_at(bmap, t), F.lit(False))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(hits).cast("long").alias("n_blocked_hits"),
        F.array_join(F.array_sort(F.array_distinct(hits)), ",").alias(
            "blocked_terms"
        ),
        (F.size(hits) == 0).alias("keep"),
    )


def blocklist_oracle_sql(
    terms: list[str], from_clause: str = "documents"
) -> str:
    """DuckDB replay of :func:`blocklist_filter`."""
    lst = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    return f"""
    WITH h AS (
      SELECT doc_id,
        list_filter(str_split(text, ' '),
                    t -> list_contains([{lst}], t)) AS hits
      FROM {from_clause}
    )
    SELECT doc_id,
      CAST(len(hits) AS BIGINT) AS n_blocked_hits,
      coalesce(array_to_string(list_sort(list_distinct(hits)), ','), '')
        AS blocked_terms,
      (len(hits) = 0) AS keep
    FROM h ORDER BY doc_id
    """
