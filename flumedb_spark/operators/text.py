"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All pure JVM column expressions (no Python in the hot
path) — at 100 TB these run inside whole-stage codegen on the scan.

Cross-engine determinism: counts come from integer string arithmetic
(length/replace), scores from single divisions of exact ints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: whitespace-token count without any split/explode: O(len) in codegen.
#: r10 OPTIMIZATION (guide §1.2 "per-task work"): literal `replace`
#: instead of `regexp_replace` — the pattern has no metacharacters, so
#: the two are semantically identical, but the literal form skips the
#: Java regex engine entirely (a plain substring scan in codegen).
def n_tokens(text: Column) -> Column:
    return F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1


def n_bpe_tokens(text: Column) -> Column:
    """BPE-ish regex token count: letter runs, digit runs, other symbols."""
    return F.array_size(F.regexp_extract_all(text, F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))


def occurrences(text: Column, word: str) -> Column:
    """EXACT whole-word occurrence count via the replace trick.

    The text is padded and every space DOUBLED before counting, so
    adjacent occurrences no longer share a delimiter: the naive
    ``' word '`` count over single-spaced text yields 2 for
    ``'the the the'`` (the middle match consumes both flanking spaces);
    with doubled spaces each word is independently flanked and the
    count is exact. Identical non-overlapping replace semantics in both
    engines.  (The ns_lang_id oracle replays THIS arithmetic; the Spark
    side of lang_id now counts the same whole-word occurrences as
    token-array equality — see :func:`lang_scores` — which is
    provably the same number.)"""
    doubled = F.replace(
        F.concat(F.lit(" "), text, F.lit(" ")), F.lit(" "), F.lit("  ")
    )
    pat = f" {word} "
    return (
        F.length(doubled) - F.length(F.replace(doubled, F.lit(pat), F.lit("")))
    ) / len(pat)


def _tok_eq(word: str):
    # closure (NOT a default arg: a second lambda parameter would make
    # pyspark bind it as the (element, index) two-variable HOF form)
    return lambda x: x == F.lit(word)


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token/char statistics."""
    t = F.col(text_col)
    toks = n_tokens(t)
    return docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars_measured"),
        toks.cast("long").alias("n_tokens"),
        n_bpe_tokens(t).cast("long").alias("n_bpe_tokens"),
        F.round(
            (F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double")) / toks, 6
        ).alias("avg_token_len"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristic: length saturation + token-length
    band — the shape of a real quality filter (fineweb-style length /
    word-length gates), exactly reproducible in SQL."""
    t = F.col(text_col)
    toks = n_tokens(t)
    avg_len = F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double") / toks
    score = (
        F.least(F.lit(1.0), toks.cast("double") / 60.0) * 0.4
        + F.least(F.lit(1.0), F.length(t).cast("double") / 400.0) * 0.4
        + F.when((avg_len >= 3.0) & (avg_len <= 8.0), 0.2).otherwise(0.0)
    )
    return docs.select("doc_id", F.round(score, 6).alias("quality"))


#: tiny per-"language" marker lists over the corpus vocabulary. The
#: synthetic corpus shares one vocabulary across langs, so prediction
#: accuracy is meaningless — what the operator demonstrates (and the
#: oracle checks) is the deterministic scoring pipeline shape.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["customer", "join", "column"],
    "en": ["window", "order", "row"],
    "es": ["slow", "agg", "merge"],
    "fr": ["scan", "data", "query"],
    "zh": ["small", "the", "value"],
}


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language whole-word marker counts.

    r10 OPTIMIZATION (guide §1.2, §4.1 HOFs): one ``split`` of the text
    plus an array-equality ``filter`` count per marker replaces the 30
    full-string replace scans (2 per marker) of the ``occurrences``
    padding trick. A token of ``split(text, ' ')`` equals ``w`` exactly
    when the doubled-space text contains one more ``' w '`` — the same
    whole-word count, so the unchanged oracle (which replays the
    replace arithmetic) still hash-matches. Counts are exact integers
    either way; cast to double to keep the published score schema."""
    toks = F.split(text, " ")
    return {
        lang: sum(F.size(F.filter(toks, _tok_eq(w))) for w in words).cast(
            "double"
        )
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-frequency language ID; argmax with alphabetical tiebreak."""
    t = F.col(text_col)
    scores = lang_scores(t)
    langs = sorted(scores)  # alphabetical = deterministic tiebreak order
    pred = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            # strictly greater than every earlier lang, >= every later one
            c = (
                scores[lang] > scores[other]
                if other < lang
                else scores[lang] >= scores[other]
            )
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    cols = [F.round(scores[lang], 6).alias(f"score_{lang}") for lang in langs]
    return docs.select("doc_id", *cols, pred.alias("pred_lang"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of the case/edge-normalized text."""
    return docs.select(
        "doc_id", F.md5(F.trim(F.lower(F.col(text_col)))).alias("fingerprint")
    )


#: PII patterns, applied in this order. Written without backslash
#: escapes ([0-9] not \d, [.] not \.) so the same literal text is a
#: valid regex in Java (Spark) and RE2 (DuckDB) — both engines use
#: leftmost-first greedy matching for these constructs, so match sets
#: are identical. Order matters only for readability: the four match
#: sets are mutually disjoint (SSN ddd-dd-dddd can't align inside
#: phone ddd-ddd-dddd and vice versa; email/IP need '@'/dots).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}"),
    ("ipv4", "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing — the pre-training redaction pass (emails, SSNs,
    phone numbers, IPv4): per-category match counts on the input text
    plus the redacted text with each match replaced by a typed token
    (``<EMAIL>`` etc). Pure JVM regexp in whole-stage codegen — one
    linear scan per pattern, no shuffle, trivially 100 TB-parallel.
    """
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS
    ]
    red = t
    for name, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return docs.select("doc_id", *counts, red.alias("text_redacted"))


#: tracking query parameters stripped by URL canonicalization — the
#: standard crawl-dedup list (utm_* campaign tags + click identifiers)
TRACKING_PARAM_RE = "(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid|ref_src)"


def canonicalize_url(url: Column) -> Column:
    """Crawl-corpus URL canonicalization (the dedup key for URL-level
    dedup in public pipeline descriptions — CCNet/C4-style):

    - strip the fragment,
    - lowercase scheme://host,
    - drop default ports (:80 http, :443 https),
    - strip tracking params (utm_*, fbclid, gclid, ...),
    - collapse dangling ?/& separators, strip trailing '/'.

    Written with RE2-safe regexes (no lookarounds, no backslash
    classes) so the same patterns run identically in Spark's Java
    regex and DuckDB's RE2 — both global-replace semantics resume
    scanning after each replacement, so match sets align."""
    u = F.trim(url)
    u = F.regexp_replace(u, "#.*$", "")  # fragment
    scheme_host = F.lower(
        F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    )
    rest = F.regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    u = F.concat(scheme_host, rest)
    u = F.regexp_replace(u, "^(http://[^/?#:]*):80([/?]|$)", "$1$2")
    u = F.regexp_replace(u, "^(https://[^/?#:]*):443([/?]|$)", "$1$2")
    u = F.regexp_replace(u, "([?&])" + TRACKING_PARAM_RE + "=[^&]*", "$1")
    u = F.regexp_replace(u, "[?&]+$", "")  # dangling separators at end
    u = F.regexp_replace(u, "[?]&+", "?")  # ?&x -> ?x
    u = F.regexp_replace(u, "&&+", "&")  # x&&y -> x&y
    u = F.regexp_replace(u, "[?&]+$", "")  # re-check after collapses
    u = F.regexp_replace(u, "/$", "")  # trailing slash
    return u


def url_dedup_groups(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-level exact dedup over the canonical form: one group per
    canonical URL with the keeper (min doc_id) and duplicate count —
    the URL analogue of exact_dup_groups, one shuffle, JVM-only."""
    canon = docs.withColumn("canonical_url", canonicalize_url(F.col(url_col)))
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").cast("long").alias("n_dups"),
        )
        .orderBy("canonical_url")
    )


def rare_token_share(
    docs: DataFrame, text_col: str = "text", max_freq: int = 2
) -> DataFrame:
    """Corpus-frequency rarity signal — the unigram-LM-filter analog
    (KenLM-style perplexity filters rank docs by how improbable their
    tokens are; the exact-integer form is the share of tokens whose
    whole-corpus frequency is <= ``max_freq``).

    Shape at 100 TB: one map-side-combinable groupBy builds the corpus
    frequency table (vocab-sized, far smaller than the token stream),
    one equi-join on the token string brings frequencies back to token
    instances, one final per-doc aggregate. Zipf skew on hot tokens is
    handled by AQE's skew-join split; all arithmetic is exact integers
    until the final rounded ratio.
    """
    t = F.col(text_col)
    tok = docs.select("doc_id", F.explode(F.split(t, " ")).alias("w"))
    freq = tok.groupBy("w").agg(F.count("*").cast("long").alias("f"))
    joined = tok.join(freq, "w")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("f") <= max_freq, 1).otherwise(0))
            .cast("long")
            .alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_rare",
            F.round(F.col("n_rare") / F.col("n_tokens"), 6).alias("rare_share"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------
# Gopher-style document quality rules (Rae et al. 2021, arXiv:2112.11446
# Table A1) — the canonical pre-training quality gate: word-count
# bounds, mean-word-length band, alphabetic-word fraction, and required
# stopword presence. Signals are computed with pure built-in column
# expressions (zero Python in the hot path) so the filter runs at scan
# speed; at 100 TB it is a single narrow projection with no shuffle.
# ---------------------------------------------------------------------

#: Gopher's required-stopword list intersected with signals expressible
#: on any corpus; presence of >= GOPHER_MIN_STOPWORDS distinct entries
#: is the "natural language, not boilerplate" test from the paper.
GOPHER_STOPWORDS: list[str] = ["the", "a", "and", "of", "to"]
GOPHER_MIN_STOPWORDS = 2


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wl: float = 3.0,
    max_mean_wl: float = 10.0,
    min_frac_alpha: float = 0.8,
) -> DataFrame:
    """Per-document Gopher rule signals + the combined keep flag.

    All thresholds compare against values already rounded to 6 dp, so a
    SQL oracle applying the same rounded comparisons reproduces every
    row bit-for-bit (same discipline as quality_score/lang_id).
    """
    t = F.col(text_col)
    words = F.split(t, " ")
    n_words = F.size(words).cast("long")
    n_chars = F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double")
    mean_wl = F.round(n_chars / n_words, 6)
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("long")
    frac_alpha = F.round(n_alpha / n_words, 6)
    padded = F.concat(F.lit(" "), t, F.lit(" "))
    n_stop = None
    for w in GOPHER_STOPWORDS:
        hit = F.when(F.instr(padded, f" {w} ") > 0, 1).otherwise(0)
        n_stop = hit if n_stop is None else n_stop + hit
    n_stop = n_stop.cast("long")
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= min_mean_wl)
        & (mean_wl <= max_mean_wl)
        & (frac_alpha >= min_frac_alpha)
        & (n_stop >= GOPHER_MIN_STOPWORDS)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        n_stop.alias("n_stopwords"),
        keep.cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------
# CCNet-style unigram LM scoring (Wenzek et al. 2019, arXiv:1911.00359):
# score each document by its average negative log-likelihood under an
# add-one-smoothed unigram model trained on the corpus itself, then
# bucket into head/middle/tail terciles — the classic perplexity-based
# quality partition. Arithmetic discipline: every ln() is evaluated once
# per DISTINCT vocabulary word (vocab-sized, tiny vs the token stream)
# and immediately quantized to integer micro-nats, so all per-document
# accumulation is exact BIGINT math — float summation order can never
# diverge across engines or partitionings. At 100 TB: one
# map-side-combinable groupBy for the frequency table, one vocab-sized
# broadcast join back to (doc, word) counts, one final aggregate.
# ---------------------------------------------------------------------


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", bucket_by: str = "lang"
) -> DataFrame:
    """Per-doc avg negative log-likelihood (micro-nat-exact) + tercile.

    bucket 1 = head (lowest nll / most probable), 3 = tail. Terciles
    are assigned PER ``bucket_by`` GROUP (CCNet buckets per language,
    arXiv:1911.00359 §3.2), which also keeps the ntile window
    partitioned — a distributed sort per group, never a global
    single-partition sort. For corpora whose largest group still
    exceeds one executor's sort budget, production swaps the exact
    ntile for threshold comparison against quantile cutpoints
    (operators/sketches.histogram_quantiles is the mergeable
    exact-integer sketch for that); the tercile semantics here stay
    oracle-exact.
    """
    from pyspark.sql.window import Window

    tok = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    # r10 OPTIMIZATION (guide §2.3/§2.4): the token explode used to
    # feed BOTH the corpus frequency table and the per-doc counts as a
    # lazily shared subtree, and the frequency table fed the ln() term
    # table and the totals — Spark re-executed the corpus explode once
    # per reference (20-Exchange plan). Now the ONE data-sized pass is
    # the (doc, w) count — materialized once — and the corpus frequency
    # is derived from it by a vocab-sized second aggregate
    # (sum of per-doc counts == the direct count, exactly).
    dw = (
        tok.groupBy("doc_id", "w")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    freq = (
        dw.groupBy("w")
        .agg(F.sum("c").cast("long").alias("f"))
        .localCheckpoint(eager=True)  # vocab-sized; feeds term AND totals
    )
    tot = freq.agg(
        F.sum("f").cast("long").alias("t_tokens"),
        F.count("*").cast("long").alias("v_vocab"),
    )
    # ln quantized to integer micro-nats at vocab granularity
    term = freq.select(
        "w",
        F.round(F.log(F.col("f") + 1) * 1_000_000)
        .cast("long")
        .alias("lnf_micro"),
    )
    per_doc = (
        dw.join(F.broadcast(term), "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lnf_micro")).cast("long").alias("s_micro"),
        )
    )
    scored = per_doc.crossJoin(
        F.broadcast(
            tot.select(
                F.round(F.log(F.col("t_tokens") + F.col("v_vocab")) * 1_000_000)
                .cast("long")
                .alias("lntv_micro")
            )
        )
    ).select(
        "doc_id",
        "n_tokens",
        F.round(
            (F.col("n_tokens") * F.col("lntv_micro") - F.col("s_micro")).cast(
                "double"
            )
            / F.col("n_tokens")
            / 1_000_000.0,
            6,
        ).alias("avg_nll"),
    )
    if bucket_by in docs.columns:
        scored = scored.join(docs.select("doc_id", bucket_by), "doc_id")
        w = Window.partitionBy(bucket_by).orderBy("avg_nll", "doc_id")
        grp_cols = [bucket_by]
    else:  # tiny/unlabeled corpora: one group (kept for unit tests)
        w = Window.partitionBy(F.lit(1)).orderBy("avg_nll", "doc_id")
        grp_cols = []
    return scored.select(
        "doc_id",
        *grp_cols,
        "n_tokens",
        "avg_nll",
        F.ntile(3).over(w).cast("int").alias("ppl_bucket"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------
# Unicode script profiling: the multilingual routing signal lang_id's
# marker-word heuristic cannot give (markers are Latin-alphabet words;
# a CJK or Cyrillic document scores zero on every marker). Counting
# codepoints per script block is the standard first router in a
# multilingual corpus pipeline (which tokenizer, which LM, which
# quality thresholds) and is pure column arithmetic — no tables, no
# shuffle, engine-exact.
# ---------------------------------------------------------------------

#: (script, regex character class) — class syntax chosen to parse
#: identically as a Java regex (Spark) and RE2 (DuckDB uses \x{hhhh};
#: Spark uses the literal range via \u escapes in the Python source).
#: Ranges are the blocks' cores, not exhaustive Unicode script data —
#: documented subset, deterministic on both engines.
SCRIPT_RANGES: list[tuple[str, str, str]] = [
    # (name, spark_class, duckdb_class)
    ("latin", "[A-Za-z]", "[A-Za-z]"),
    ("cyrillic", "[Ѐ-ӿ]", r"[\x{0400}-\x{04FF}]"),
    ("greek", "[Ͱ-Ͽ]", r"[\x{0370}-\x{03FF}]"),
    ("arabic", "[؀-ۿ]", r"[\x{0600}-\x{06FF}]"),
    ("hebrew", "[֐-׿]", r"[\x{0590}-\x{05FF}]"),
    ("cjk", "[一-鿿]", r"[\x{4E00}-\x{9FFF}]"),
    ("kana", "[぀-ヿ]", r"[\x{3040}-\x{30FF}]"),
    ("hangul", "[가-힯]", r"[\x{AC00}-\x{D7AF}]"),
    ("devanagari", "[ऀ-ॿ]", r"[\x{0900}-\x{097F}]"),
    ("digit", "[0-9]", "[0-9]"),
]


def script_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document codepoint counts for each script block in
    ``SCRIPT_RANGES`` plus the dominant script.

    ``n_<script>`` = number of codepoints in the block (exact BIGINT:
    length(text) minus length(text with the block removed) — both
    engines count CHARACTERS, not bytes). ``dominant_script`` = the
    block with the greatest count, ties broken by ``SCRIPT_RANGES``
    order (fixed, documented); 'none' when every count is zero.

    100 TB shape: one narrow projection — no join, no aggregate, no
    Python; scales like any column expression."""
    t = F.col(text_col)
    counts = {
        name: (
            F.length(t) - F.length(F.regexp_replace(t, cls, ""))
        ).cast("long")
        for name, cls, _ in SCRIPT_RANGES
    }
    m = None
    for c in counts.values():
        m = c if m is None else F.greatest(m, c)
    dominant = F.when(m == 0, "none")
    for name, _, _ in SCRIPT_RANGES:
        dominant = dominant.when(counts[name] == m, name)
    return docs.select(
        "doc_id",
        *[counts[name].alias(f"n_{name}") for name, _, _ in SCRIPT_RANGES],
        dominant.alias("dominant_script"),
    )


def script_profile_oracle_sql(from_clause: str = "documents") -> str:
    """DuckDB twin of :func:`script_profile` over ``from_clause``
    (a table name or a parenthesized subquery aliased ``d`` exposing
    doc_id + text). RE2 needs the 'g' flag and \\x{hhhh} escapes; the
    arithmetic and tiebreak order replicate the Spark side exactly."""
    cnt = {
        name: (
            f"CAST(length(text) - length(regexp_replace(text, '{dcls}', '', 'g'))"
            f" AS BIGINT)"
        )
        for name, _, dcls in SCRIPT_RANGES
    }
    names = [name for name, _, _ in SCRIPT_RANGES]
    greatest = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    dom = "CASE WHEN " + greatest + " = 0 THEN 'none' "
    dom += " ".join(
        f"WHEN n_{n} = {greatest} THEN '{n}'" for n in names
    )
    dom += " END"
    cols = ",\n      ".join(f"{cnt[n]} AS n_{n}" for n in names)
    return f"""
    WITH base AS (
      SELECT doc_id,
      {cols}
      FROM {from_clause}
    )
    SELECT doc_id, {", ".join(f"n_{n}" for n in names)},
      {dom} AS dominant_script
    FROM base ORDER BY doc_id
    """


# ---------------------------------------------------------------------
# Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen & Goodman
# 1999 "An empirical study of smoothing techniques for language
# modeling"): the standard n-gram quality scorer one order above
# unigram_logprob's CCNet-style model. Absolute discount d = 0.75:
#
#   P(w2|w1) = max(c(w1w2) - d, 0)/c(w1)
#            + (d * N1+(w1,.)/c(w1)) * N1+(.,w2)/T
#
# with N1+ the continuation-type counts and T the bigram-type total.
# All probabilities are assembled as exact integer micro-units
# (d as 750 milli; DECIMAL(38,0)/HUGEINT widening before each integral
# divide), so the only cross-engine float surface is the same
# round(ln(integer)*1e6) micro-nat quantization unigram_logprob
# already relies on, plus the one final rounded division.
# ---------------------------------------------------------------------

KN_DISCOUNT_MILLI = 750
_LN_MICRO_OF_MICRO = 13_815_511  # round(ln(1e6) * 1e6)


def kn_bigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc average negative log-likelihood under the interpolated
    Kneser-Ney bigram model trained on the corpus itself.

    Shape at 100 TB: the bigram-type table is built by one groupBy
    over the exploded bigrams (map-side combinable; types <<
    occurrences), the three smoothing statistics are groupBys over
    THAT table, and scoring is one equi-join of per-doc bigram counts
    against the type table on (w1, w2) — co-partitioned shuffle,
    nothing driver-side, no window. Documents with fewer than two
    words carry no bigrams and drop out (the oracle replays the same
    rule).

    r10 OPTIMIZATION (guide §2.4 / the batch-1 CTE-materialization
    device): ``per_doc_big`` is referenced twice (type build + final
    scoring join) and ``types`` three times (left/right continuation
    stats + the scored join), so both are localCheckpointed eagerly —
    without that Spark re-executes the doc-sized explode+groupBy once
    per reference (the plan showed Exchange x32); the three smoothing
    statistics then read the materialized type table, not the raw
    corpus."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    big = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(words, 1, n - 1).alias("w1"),
                F.slice(words, 2, n - 1).alias("w2"),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))

    per_doc_big = (
        big.groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    types = (
        per_doc_big.groupBy("w1", "w2")
        .agg(F.sum("c").cast("long").alias("c12"))
        .localCheckpoint(eager=True)
    )
    left = types.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1f"),
    )
    right = types.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1b")
    )
    tot = types.agg(F.count(F.lit(1)).cast("long").alias("t_types"))

    d = KN_DISCOUNT_MILLI
    scored_types = (
        types.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(
                    f"CAST(CAST(greatest(c12 * 1000 - {d}, 0) AS DECIMAL(38,0))"
                    " * 1000000 div (CAST(c1 AS DECIMAL(38,0)) * 1000)"
                    " AS BIGINT)"
                )
                + F.expr(
                    f"CAST(CAST({d} AS DECIMAL(38,0)) * n1f * "
                    "(CAST(n1b AS DECIMAL(38,0)) * 1000000 div t_types) "
                    "div (CAST(c1 AS DECIMAL(38,0)) * 1000) AS BIGINT)"
                ),
            ).alias("p_micro"),
        )
        .select(
            "w1",
            "w2",
            F.round(F.log(F.col("p_micro")) * 1_000_000)
            .cast("long")
            .alias("lnp_micro"),
        )
    )
    return (
        per_doc_big.join(scored_types, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("lnp_micro")).cast("long").alias("s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                (
                    F.col("n_bigrams") * F.lit(_LN_MICRO_OF_MICRO)
                    - F.col("s")
                ).cast("double")
                / F.col("n_bigrams")
                / 1_000_000.0,
                6,
            ).alias("kn_avg_nll"),
        )
    )


def kn_bigram_oracle_sql(from_clause: str = "documents") -> str:
    d = KN_DISCOUNT_MILLI
    return f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM {from_clause}
    ),
    big AS (
      SELECT doc_id, words[gs.i] AS w1, words[gs.i + 1] AS w2
      FROM tok, LATERAL (
        SELECT unnest(generate_series(1, len(words) - 1)) AS i
      ) gs
      WHERE len(words) >= 2
    ),
    per_doc_big AS (
      SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c
      FROM big GROUP BY 1, 2, 3
    ),
    types AS (
      SELECT w1, w2, CAST(sum(c) AS BIGINT) AS c12
      FROM per_doc_big GROUP BY 1, 2
    ),
    lft AS (
      SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        CAST(count(*) AS BIGINT) AS n1f
      FROM types GROUP BY 1
    ),
    rgt AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM types GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS t_types FROM types),
    scored AS (
      SELECT t.w1, t.w2,
        CAST(round(ln(greatest(CAST(1 AS BIGINT),
          CAST(CAST(greatest(t.c12 * 1000 - {d}, 0) AS HUGEINT)
               * 1000000 // (CAST(l.c1 AS HUGEINT) * 1000) AS BIGINT)
          + CAST(CAST({d} AS HUGEINT) * l.n1f *
                 (CAST(r.n1b AS HUGEINT) * 1000000 // o.t_types)
                 // (CAST(l.c1 AS HUGEINT) * 1000) AS BIGINT)
        )) * 1000000) AS BIGINT) AS lnp_micro
      FROM types t
      JOIN lft l ON l.w1 = t.w1
      JOIN rgt r ON r.w2 = t.w2
      CROSS JOIN tot o
    )
    SELECT p.doc_id, CAST(sum(p.c) AS BIGINT) AS n_bigrams,
      round((sum(p.c) * {_LN_MICRO_OF_MICRO}
             - sum(p.c * s.lnp_micro)) / sum(p.c) / 1000000.0, 6)
        AS kn_avg_nll
    FROM per_doc_big p JOIN scored s ON s.w1 = p.w1 AND s.w2 = p.w2
    GROUP BY p.doc_id ORDER BY p.doc_id
    """


def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document character-level Shannon entropy in nats — the
    gibberish / encoding-noise detector (natural prose sits in a
    narrow entropy band; base64 blobs and key-mash sit far above,
    repeated-character spam far below):

        H = ln(n) - (1/n) * sum_c count(c) * ln(count(c))

    assembled from integer character counts with the micro-nat ln
    quantization (round(ln(k)*1e6) — the unigram_logprob device) and
    ONE final rounded division, so the result is engine-exact. Shape:
    explode to (doc, char) pairs, two groupBys — linear, no window.

    (r10 optimization note: a zero-shuffle per-row HOF rewrite —
    array_sort + run-length fold — was A/B'd and REJECTED on
    measurement: 0.77x at sf0.1. Higher-order functions evaluate
    interpreted, while this explode+groupBy path is whole-stage
    codegen'd with map-side partial aggregation, so the shuffle it
    removes is cheaper than the interpreter it adds.)"""
    ch = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit("(?s)."), 0)
        ).alias("ch"),
    )
    counts = ch.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars"),
        F.sum(
            F.col("c") * F.round(F.log("c") * 1_000_000).cast("long")
        )
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    return per_doc.select(
        "doc_id",
        "n_chars",
        "n_distinct",
        F.round(
            (
                F.col("n_chars")
                * F.round(F.log("n_chars") * 1_000_000).cast("long")
                - F.col("s")
            ).cast("double")
            / F.col("n_chars")
            / 1_000_000.0,
            6,
        ).alias("entropy_nats"),
    )


def char_entropy_oracle_sql(from_clause: str = "documents") -> str:
    return f"""
    WITH ch AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS ch
      FROM {from_clause}
    ),
    counts AS (
      SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
      FROM ch GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
        CAST(sum(c * CAST(round(ln(c) * 1000000) AS BIGINT)) AS BIGINT)
          AS s,
        CAST(count(*) AS BIGINT) AS n_distinct
      FROM counts GROUP BY 1
    )
    SELECT doc_id, n_chars, n_distinct,
      round((n_chars * CAST(round(ln(n_chars) * 1000000) AS BIGINT) - s)
            / n_chars / 1000000.0, 6) AS entropy_nats
    FROM per_doc ORDER BY doc_id
    """
