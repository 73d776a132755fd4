"""Query catalog — the driver-contract surface.

One entry per operator declared in SURVEY.md §2: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent DuckDB oracle SQL. The `events` table stands in for the log
(``seq := event_id``, per FIXTURES.md §B1).

Cross-engine hash-matching rules used throughout (IMPORTANT):

- **Exact-integer aggregation**: every SUM/AVG/STDDEV over doubles is
  computed on ``CAST(round(x * 100) AS BIGINT)`` cents (all value
  columns are cent-granular — verified against the data), so both
  engines do exact integer arithmetic; final doubles are derived by the
  same single division, which is deterministic IEEE on identical inputs.
  No float-summation-order divergence can occur.
- **Timestamps** are emitted as microsecond epochs (`unix_micros` /
  `epoch_us`) — integers, no tz/format drift.
- **Ordering ties** always carry a unique tiebreak column.
- Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


_REGISTERED: dict[int, str] = {}  # session id -> currently-registered sf_dir


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (memoized per
    session+dir).

    Tables are served from the engine's managed layout (see
    ``sources/ingest.py``): loaded once from the single-row-group source
    files into multi-split, range-sorted parquet so scans parallelize
    and seq-range predicates prune files; TIMESTAMP(NANOS) columns are
    normalized to µs at load (matching DuckDB's ns->us read of the same
    sources, so oracle comparisons see identical values).
    """
    # temp-view names are global per session: memoize on what is
    # CURRENTLY registered, so interleaving sf_dirs (driver smoke at
    # sf0.001, correctness at sf0.01) always re-points the views
    key = id(spark)
    if _REGISTERED.get(key) == sf_dir:
        return
    # timestamp semantics (date_trunc/year/...) must match the UTC-naive
    # oracle regardless of how the caller built the session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from .sources.ingest import _fix_ns_timestamps, ensure_ingested

    for t in TABLES:
        try:
            managed = ensure_ingested(spark, sf_dir, t)
            spark.read.parquet(managed).createOrReplaceTempView(t)
        except Exception:
            # warehouse not writable / ingest failed: serve the source
            # file directly (correct, just single-split)
            _fix_ns_timestamps(spark, f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    _REGISTERED[key] = sf_dir


# The driver executes only the FIRST 50 entries of ``queries()`` (dict
# order).  Round 1 burned that budget on redundant scalar/window
# variants while every north-star op sat unrun at positions 50-80;
# rounds 2-8 curated the window by hand with per-rotation comments.
#
# r9 REBUILDS THE WINDOW MECHANIZED, STALE-FIRST (VERDICT-r8 #1):
#
#   DRIVER_WINDOW = WINDOW_NEW        (rows added this round — no
#                                      driver record exists yet)
#                 + WINDOW_CHANGED    (rows whose implementation or
#                                      oracle text changed this round —
#                                      their old attestation is stale)
#                 + stale-first backfill: every remaining slot goes to
#                   the entry whose most recent DRIVER-green round
#                   (computed from the committed CORRECTNESS_r*.json
#                   artifacts) is oldest, ties broken by registry
#                   order.
#
# The policy is EXECUTABLE, not prose: tests/test_driver_window.py
# re-derives the backfill from the artifacts and fails if any window
# slot is spent on a fresher entry while a staler one waits outside —
# so the catalog-wide minimum driver-green age rises every round (r9:
# the 29 r01-frozen entries and the 14 oldest r02 entries cycle back
# through; minimum age rises r01 -> r02). Correctness freshness of
# rotated-OUT entries stays covered by tests/test_full_gate.py, which
# re-runs the ENTIRE catalog against DuckDB at sf0.001 every suite
# run.

# The round this window was BUILT FOR (ADVICE r9, artifact-cutoff
# awareness): the stale-first backfill below is derived from the
# committed CORRECTNESS_r*.json artifacts with round < this value, so
# the driver dropping CORRECTNESS_r{N}.json mid/post-round no longer
# invalidates the window tests. Bump this (and regenerate the backfill
# with tools/window_rotation.py) at the start of every round.
WINDOW_BUILT_FOR_ROUND: int = 10

# rows added in r10 (video/audio perceptual dedup, XLSX extraction,
# image-neardup recall gate, streaming PDF ingest leg)
WINDOW_NEW: list[str] = [
    "ns_video_keyframe_sig",
    "ns_video_neardup",
    "ns_audio_fingerprint",
    "ns_audio_neardup",
    "ns_xlsx_cells",
    "ns_image_neardup_recall",
    "stream_pdf_text",
    "ns_video_image_match",
    "ns_pptx_text",
    "ns_audio_clip_search",
    "ns_odt_text",
    "ns_epub_text",
    # second r10 batch: email/RTF/markup ingest legs + conversation/SFT
    "ns_eml_text",
    "ns_mbox_messages",
    "ns_rtf_text",
    "ns_markdown_strip",
    "ns_latex_strip",
    "ns_sft_turns",
    "ns_chat_template",
    "ns_turn_dedup",
    "ns_tiff_decode",
    "ns_html_tables",
    "ns_eml_attachment_decode",
    "stream_eml_text",
    "ns_sft_packing",
    # preference / RLHF data-prep family
    "ns_preference_pairs",
    "ns_winrate_matrix",
    "ns_bt_scores",
    "ns_fleiss_kappa",
    "ns_length_bias",
    "ns_token_fertility",
    "stream_preference_pairs",
    "ns_best_of_n",
    "ns_group_advantage",
    "ns_packing_efficiency",
    "ns_kn_bigram_lm",
    "ns_char_entropy",
]

# rows whose code or oracle text changed in r10 and must re-attest:
# pdf.py's /Length-bounded stream objects (ADVICE r10 — _obj_body no
# longer scans for "endobj" inside stream data), docx.py's DTD
# rejection before parse
WINDOW_CHANGED: list[str] = [
    "ns_pdf_text",
    "ns_docx_text",
]

# oldest-driver-green first (r01 entries, then r02 in registry order) —
# regenerate with tools/window_rotation.py; verified by
# tests/test_driver_window.py against the CORRECTNESS artifacts
_WINDOW_BACKFILL: list[str] = [
    "window_rank_dense",
    "sliding_window_counts",
    "q10_returned_items",
    "q14_promo_revenue",
    "q19_discounted_revenue",
    "array_functions",
    "join_left_outer",
    "join_full_outer",
    "union_dedup_vs_all",
    "regexp_functions",
    "argmin_argmax",
]

DRIVER_WINDOW: list[str] = WINDOW_NEW + WINDOW_CHANGED + _WINDOW_BACKFILL


def driver_ordered(registry: dict) -> dict:
    """Reorder a query/oracle registry so DRIVER_WINDOW comes first.

    The missing-name guard checks against QUERIES deliberately (not the
    passed registry): every window name must be a registered QUERY — a
    silent drop there would waste a driver slot invisibly — while
    absence from ORACLES is legitimate and intended for the rows-only
    entries (approximate/engine-hash ops declare no oracle by design).
    """
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    if missing:
        raise KeyError(f"DRIVER_WINDOW names not registered: {missing}")
    out = {n: registry[n] for n in DRIVER_WINDOW if n in registry}
    out.update((n, v) for n, v in registry.items() if n not in out)
    return out


def query(name: str, oracle: str | None = None):
    """Decorator: register a Spark query + optional DuckDB oracle."""

    def wrap(fn):
        def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
            register_tables(spark, sf_dir)
            return fn(spark, sf_dir)

        QUERIES[name] = runner
        if oracle is not None:
            ORACLES[name] = oracle
        return runner

    return wrap


def shared_sql(name: str, sql: str, oracle: str | None = None):
    """Register a query whose Spark and DuckDB texts agree (ANSI subset);
    pass ``oracle`` only when the dialects must fork."""

    @query(name, oracle if oracle is not None else sql)
    def _run(spark: SparkSession, sf_dir: str, _sql=sql) -> DataFrame:
        return spark.sql(_sql)

    return _run


# =====================================================================
# §2.A core log operators over `events` (seq := event_id)
# =====================================================================

shared_sql(
    "o1_append_visibility",
    # O1/O2: after N appends the log holds exactly seqs 0..N-1
    # (dense seq assignment; README.md:142-149)
    "SELECT count(*) AS n_records, max(event_id) AS max_seq, "
    "count(DISTINCT event_id) AS n_distinct_seqs FROM events",
)

shared_sql(
    "o3_get_point",
    # O3 point lookup (index.js:157-162)
    "SELECT event_id AS seq, user_id, event_type, "
    "CAST(round(value * 100) AS BIGINT) AS value_c, props "
    "FROM events WHERE event_id = 424",
)


@query(
    "o2_bulk_append",
    # O2 at scale: the DISTRIBUTED bulk append (log.bulk_append_df) —
    # executors write seq-assigned parquet, one manifest commit. The
    # Spark side REALLY drives the path (fresh log, full events table
    # through append_df_to_log); the oracle states the O1/O2 contract
    # the result must satisfy: dense gap-free seqs 0..N-1 in event_id
    # order, every payload round-tripped (README.md:142-149).
    oracle="SELECT count(*) AS n_records, CAST(0 AS BIGINT) AS min_seq, "
    "count(*) - 1 AS max_seq, count(DISTINCT event_id) AS n_payload_ids, "
    "count(*) AS n_seq_eq_eventid FROM events",
)
def o2_bulk_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .log import ParquetLog
    from .sources.readers import append_df_to_log

    log = ParquetLog(tempfile.mkdtemp(prefix="flume_o2_bulk_") + "/log")
    append_df_to_log(log, spark.table("events"), order_by="event_id")
    df = log.df(spark)
    eid = F.get_json_object("value", "$.event_id").cast("long")
    return df.agg(
        F.count("*").alias("n_records"),
        F.min("seq").alias("min_seq"),
        F.max("seq").alias("max_seq"),
        F.countDistinct(eid).alias("n_payload_ids"),
        # seqs were assigned in event_id order over a dense event_id
        # domain, so seq == payload event_id row-for-row
        F.sum((F.col("seq") == eid).cast("long")).alias("n_seq_eq_eventid"),
    )

shared_sql(
    "o4_stream_range",
    # O4 range scan: gt/lte + order + limit (README.md:130-133)
    "SELECT event_id AS seq, user_id, event_type, "
    "CAST(round(value * 100) AS BIGINT) AS value_c "
    "FROM events WHERE event_id > 100 AND event_id <= 800 "
    "ORDER BY event_id LIMIT 500",
)

shared_sql(
    "o4_stream_reverse_topk",
    # O4: reverse + limit = top-k from the tail end
    "SELECT event_id AS seq, event_type "
    "FROM events WHERE event_id >= 200 AND event_id < 900 "
    "ORDER BY event_id DESC LIMIT 300",
)

shared_sql(
    "o5_stream_seqs_only",
    # O5 projection flags: seqs-only stream = column pruning
    "SELECT event_id AS seq FROM events WHERE event_id > 600 AND mod(event_id, 3) = 0 ORDER BY event_id",
)

shared_sql(
    "o7_since",
    # O7: since = -1 when empty else max seq (README.md:197-201)
    "SELECT coalesce(max(event_id), -1) AS since FROM events",
)

shared_sql(
    "o15_mapper_read",
    # O15: a mapper transform on the read path (never persisted) —
    # relational form: derived columns over the scan
    "SELECT event_id AS seq, upper(event_type) AS mapped_type, "
    "CAST(round(value * 100) AS BIGINT) * 2 AS doubled_value_c "
    "FROM events WHERE event_id < 100 ORDER BY event_id",
)

# =====================================================================
# §2.B view families over `events`
# =====================================================================

# V1 flumeview-reduce: whole-log fold -> one accumulator row.
# Exact-cents arithmetic; stddev from integer sum/sumsq (README.md:92,
# test/memlog.js:44-64 computes mean/stdev the same way).
shared_sql(
    "v1_reduce_stats",
    """
    SELECT
      count(*) AS n,
      CAST(sum(value_c) AS BIGINT) AS sum_c,
      CAST(sum(value_c) AS DOUBLE) / (100.0 * count(*)) AS mean,
      round(sqrt(CAST(count(*) * sum(value_c * value_c) - sum(value_c) * sum(value_c) AS DOUBLE))
            / (100.0 * count(*)), 6) AS stdev,
      min(value_c) AS min_c,
      max(value_c) AS max_c
    FROM (SELECT CAST(round(value * 100) AS BIGINT) AS value_c FROM events)
    """,
)

shared_sql(
    "v1_reduce_grouped",
    # grouped variant of the reduce family
    """
    SELECT event_type,
      count(*) AS n,
      CAST(sum(value_c) AS BIGINT) AS sum_c,
      CAST(sum(value_c) AS DOUBLE) / (100.0 * count(*)) AS mean
    FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS value_c FROM events)
    GROUP BY event_type
    ORDER BY event_type
    """,
)

shared_sql(
    "v2_index_point_get",
    # V2 flumeview-level: key -> seq index, resolve back through the log
    # (normalized view; semantics = all records under key, seq order)
    "SELECT event_id AS seq, user_id, event_type, "
    "CAST(round(value * 100) AS BIGINT) AS value_c "
    "FROM events WHERE user_id = 7 ORDER BY event_id",
)

shared_sql(
    "v2_index_key_range",
    # V2 ordered key-range scan (charwise-range analog, typed sort)
    "SELECT user_id AS key, event_id AS seq, event_type "
    "FROM events WHERE user_id >= 10 AND user_id < 20 "
    "ORDER BY user_id, event_id LIMIT 400",
)

shared_sql(
    "v3_query_dsl",
    # V3 flumeview-query: filter+project+sort+paging over value fields
    "SELECT event_id AS seq, user_id, "
    "CAST(round(value * 100) AS BIGINT) AS value_c "
    "FROM events WHERE event_type = 'click' AND value > 300.0 "
    "ORDER BY value_c DESC, event_id LIMIT 25",
)

shared_sql(
    "v5_hashtable_latest",
    # V5 flumeview-hashtable: latest record per uniqueish key =
    # max_by(value, seq) / arg_max(value, seq)
    """
    SELECT user_id AS key,
      max(event_id) AS last_seq,
      max_by(event_type, event_id) AS last_type,
      CAST(round(max_by(value, event_id) * 100) AS BIGINT) AS last_value_c
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    oracle="""
    SELECT user_id AS key,
      max(event_id) AS last_seq,
      arg_max(event_type, event_id) AS last_type,
      CAST(round(arg_max(value, event_id) * 100) AS BIGINT) AS last_value_c
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)

shared_sql(
    "v6_membership_exact",
    # V6 flumeview-bloom: exact-membership fallback oracle (the sketch's
    # no-false-negative property is asserted in tests/test_views.py)
    "SELECT DISTINCT user_id FROM events ORDER BY user_id",
)


@query(
    "v4_search_single_term",
    oracle="""
    SELECT doc_id FROM documents
    WHERE regexp_matches(lower(text), '(^|[^a-z0-9])window([^a-z0-9]|$)')
    ORDER BY doc_id
    """,
)
def v4_search_single_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4 flumeview-search: a doc matches iff the term appears as a whole
    token. The materialized posting-list form lives in views/search.py;
    the relational form here is a shuffle-free array_contains scan over
    the same tokenizer (whole-stage codegen, filter at the scan). Oracle
    uses the word-boundary regex, equivalent for this tokenizer."""
    from pyspark.sql import functions as F

    from .views.search import tokens_expr

    docs = spark.table("documents")
    return (
        docs.where(F.array_contains(tokens_expr(F.col("text")), "window"))
        .select("doc_id")
        .orderBy("doc_id")
    )


@query(
    "v4_search_and_terms",
    oracle="""
    SELECT doc_id FROM documents
    WHERE regexp_matches(lower(text), '(^|[^a-z0-9])shuffle([^a-z0-9]|$)')
      AND regexp_matches(lower(text), '(^|[^a-z0-9])partition([^a-z0-9]|$)')
    ORDER BY doc_id
    """,
)
def v4_search_and_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4 AND-of-terms: conjunction of whole-token membership tests —
    one pass over the scan, no posting-list shuffle."""
    from pyspark.sql import functions as F

    from .views.search import tokens_expr

    docs = spark.table("documents")
    toks = tokens_expr(F.col("text"))
    return (
        docs.where(
            F.array_contains(toks, "shuffle") & F.array_contains(toks, "partition")
        )
        .select("doc_id")
        .orderBy("doc_id")
    )


# =====================================================================
# M5 relational layer — TPC-H-ish queries (Catalyst does the work;
# SURVEY §2.C: joins/aggs/windows/set-ops "free" in the relational layer)
# =====================================================================

# Q1-style pricing summary. Exact-cents arithmetic: disc_price at scale
# 1e4, charge at 1e6 — integer sums are exact in both engines; derived
# doubles come from one identical division. At 100 TB these sums move to
# DECIMAL(38); bigint is exact at bench scale (max |sum| ~7e15 < 2^63,
# and < 2^53 only where we convert to double).
shared_sql(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
      CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
      CAST(sum(price_c) AS BIGINT) AS sum_base_price_c,
      CAST(sum(price_c * disc1_c) AS BIGINT) AS sum_disc_price_c4,
      CAST(sum(price_c * disc1_c * tax1_c) AS BIGINT) AS sum_charge_c6,
      round(CAST(sum(qty_c) AS DOUBLE) / (100.0 * count(*)), 6) AS avg_qty,
      round(CAST(sum(price_c) AS DOUBLE) / (100.0 * count(*)), 6) AS avg_price,
      round(CAST(sum(disc_c) AS DOUBLE) / (100.0 * count(*)), 6) AS avg_disc,
      count(*) AS count_order
    FROM (
      SELECT l_returnflag, l_linestatus,
        CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
        CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
        CAST(round((1 - l_discount) * 100) AS BIGINT) AS disc1_c,
        CAST(round((1 + l_tax) * 100) AS BIGINT) AS tax1_c
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)

# Q3-style shipping priority: 3-way join + grouped revenue + top-k.
# r10 OPTIMIZATION note: q3 deliberately KEEPS the dim-first text.
# Unlike q5/q10 (filters on orders — fact-first measured faster at
# every SF), q3's selective filter is ON LINEITEM (l_shipdate >
# 1998-03-15 keeps only the date-range tail), so the filtered fact IS
# the small side and the planner's broadcast of it is right; the
# fact-first variant A/B'd WORSE at sf10 (interleaved: 11.2/17.4 s vs
# 6.5/5.1 s) and flat at sf0.1 — rejected on measurement (guide §1).
shared_sql(
    "q3_top_revenue_orders",
    """
    SELECT l_orderkey,
      CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c4,
      o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderpriority
    ORDER BY revenue_c4 DESC, l_orderkey LIMIT 10
    """,
)

# Q5-style local-supplier revenue: 6-way star join.
# r10 OPTIMIZATION (guide §3.1): fact-first Spark text — see the
# q3_top_revenue_orders note; the dim-first chain broadcast LINEITEM.
shared_sql(
    "q5_region_revenue",
    """
    SELECT r_name, n_name,
      CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c4
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY r_name, n_name
    ORDER BY revenue_c4 DESC, r_name, n_name
    """,
    oracle="""
    SELECT r_name, n_name,
      CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c4
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY r_name, n_name
    ORDER BY revenue_c4 DESC, r_name, n_name
    """,
)

shared_sql(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey,
      CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c
    FROM orders ORDER BY totalprice_c DESC, o_orderkey LIMIT 10
    """,
)

# Top-3 orders per customer — the Window.partitionBy top-k idiom.
shared_sql(
    "window_top3_per_customer",
    """
    SELECT o_custkey, o_orderkey, totalprice_c, rn FROM (
      SELECT o_custkey, o_orderkey,
        CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_c,
        CAST(row_number() OVER (
          PARTITION BY o_custkey
          ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey
        ) AS BIGINT) AS rn
      FROM orders
    ) t WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
)

# Running (cumulative) revenue per customer — an analytic frame.
shared_sql(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
      CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS BIGINT) AS running_c
    FROM orders WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderkey
    """,
)

# lag(): inter-order gap per customer in whole days.
shared_sql(
    "window_order_gap_days",
    """
    SELECT o_custkey, o_orderkey,
      CAST(datediff(
        o_orderdate,
        lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ) AS BIGINT) AS gap_days
    FROM orders WHERE o_custkey < 50
    ORDER BY o_custkey, o_orderkey
    """,
    oracle="""
    SELECT o_custkey, o_orderkey,
      CAST(datediff('day',
        lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        o_orderdate
      ) AS BIGINT) AS gap_days
    FROM orders WHERE o_custkey < 50
    ORDER BY o_custkey, o_orderkey
    """,
)

shared_sql(
    "set_except",
    # customers with open orders but no finished orders
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY o_custkey
    """,
)

shared_sql(
    "set_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    ORDER BY o_custkey
    """,
)

shared_sql(
    "agg_count_distinct",
    """
    SELECT o_orderpriority,
      count(DISTINCT o_custkey) AS n_customers,
      count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)

shared_sql(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    ORDER BY c_custkey
    """,
)

shared_sql(
    "join_semi_exists",
    # orders having at least one high-value line item
    """
    SELECT o_orderkey FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_extendedprice > 100000
    )
    ORDER BY o_orderkey
    """,
)

shared_sql(
    "scalar_functions",
    # string/math scalar surface — identical ANSI text on both engines
    """
    SELECT o_orderkey,
      upper(o_orderstatus) AS status_u,
      substr(o_orderpriority, 1, 3) AS prio3,
      CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
      abs(CAST(round(o_totalprice * 100) AS BIGINT) - 25000000) AS dist_c,
      mod(o_orderkey, 7) AS m7,
      concat(o_orderstatus, '-', o_orderpriority) AS tag
    FROM orders WHERE o_orderkey < 600 ORDER BY o_orderkey
    """,
)

shared_sql(
    "date_functions",
    """
    SELECT o_orderkey,
      CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
      CAST(day(o_orderdate) AS BIGINT) AS d, CAST(quarter(o_orderdate) AS BIGINT) AS q
    FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey
    """,
)

shared_sql(
    "pivot_filtered_counts",
    # pivot via FILTER clauses (portable across both engines)
    """
    SELECT user_id,
      count(*) FILTER (WHERE event_type = 'click') AS n_click,
      count(*) FILTER (WHERE event_type = 'view') AS n_view,
      count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
      count(*) FILTER (WHERE event_type = 'error') AS n_error
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)

shared_sql(
    "rollup_aggregate",
    """
    SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
      count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)

# Event-time tumbling window (streaming-adjacent; batch-checkable).
shared_sql(
    "tumbling_hour_counts",
    """
    SELECT unix_micros(date_trunc('hour', ts)) AS hour_us, event_type,
      count(*) AS n,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM events GROUP BY date_trunc('hour', ts), event_type
    ORDER BY hour_us, event_type
    """,
    oracle="""
    SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
      count(*) AS n,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM events GROUP BY date_trunc('hour', ts), event_type
    ORDER BY hour_us, event_type
    """,
)

# Sessionization: 30-minute-gap sessions per user (lag + cumulative flag).
shared_sql(
    "sessionize_30min",
    """
    WITH flagged AS (
      SELECT user_id,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR unix_micros(ts) - unix_micros(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
    oracle="""
    WITH flagged AS (
      SELECT user_id,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM flagged GROUP BY user_id ORDER BY user_id
    """,
)

# Time-series regularization: hourly grid per user, last observation
# carried forward (operators/timeseries.py). The oracle replays the
# identical bucket arithmetic (epoch-micros integer division) and LOCF
# window in DuckDB; user_id < 25 bounds the grid for the hash compare.
_GAPFILL_DUCK = """
    WITH obs AS (
      SELECT user_id, bucket, value FROM (
        SELECT user_id, epoch_us(ts) // 3600000000 AS bucket, value,
          row_number() OVER (
            PARTITION BY user_id, epoch_us(ts) // 3600000000
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE user_id < 25) t
      WHERE rn = 1
    ),
    span AS (
      SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
      FROM obs GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi)) AS bucket FROM span
    ),
    j AS (
      SELECT g.user_id, g.bucket, o.value,
        o.user_id IS NOT NULL AS observed
      FROM grid g LEFT JOIN obs o
        ON o.user_id = g.user_id AND o.bucket = g.bucket
    )
    SELECT user_id, bucket AS hour_bucket, observed,
      round(last_value(value IGNORE NULLS) OVER (
        PARTITION BY user_id ORDER BY bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_locf
    FROM j ORDER BY user_id, hour_bucket
"""


@query("ts_gapfill_locf", oracle=_GAPFILL_DUCK)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str):
    """Hourly gap-fill + LOCF over events (timeseries.gapfill_locf):
    the resample/ffill stage of a metrics pipeline, distributed — per-key
    grid via explode(sequence(lo,hi)) (never a global calendar
    cross-join), closing value per bucket by a total-order row_number,
    running last(ignorenulls) fill. Exact integer bucket arithmetic."""
    from .operators.timeseries import gapfill_locf
    from pyspark.sql import functions as F

    out = gapfill_locf(
        spark.table("events").where(F.col("user_id") < 25),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        tiebreak_col="event_id",
    )
    return out.select(
        "user_id",
        F.col("bucket").alias("hour_bucket"),
        "observed",
        F.round("value_locf", 6).alias("value_locf"),
    ).orderBy("user_id", "hour_bucket")


# Robust per-key outlier detection: |x - lower-median| > 3 * MAD, both
# medians deterministic under (value, event_id) total order — the
# anomaly-flagging twin of ts_gapfill_locf (operators/timeseries.py).
_MAD_DUCK = """
    WITH st AS (
      SELECT user_id, event_id, value,
        row_number() OVER (PARTITION BY user_id ORDER BY value, event_id)
          AS rn,
        count(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ),
    med AS (SELECT user_id, value AS med FROM st WHERE rn = (n + 1) // 2),
    ad AS (
      SELECT e.user_id, e.event_id, e.value, m.med,
        abs(e.value - m.med) AS absdev
      FROM events e JOIN med m USING (user_id)
    ),
    st2 AS (
      SELECT *,
        row_number() OVER (PARTITION BY user_id ORDER BY absdev, event_id)
          AS rn,
        count(*) OVER (PARTITION BY user_id) AS n
      FROM ad
    ),
    mad AS (SELECT user_id, absdev AS mad FROM st2 WHERE rn = (n + 1) // 2)
    SELECT a.user_id, a.event_id, round(a.value, 6) AS value,
      round(a.med, 6) AS med, round(d.mad, 6) AS mad
    FROM ad a JOIN mad d USING (user_id)
    WHERE a.absdev > 3.0 * d.mad
    ORDER BY a.user_id, a.event_id
"""


@query("ts_mad_outliers", oracle=_MAD_DUCK)
def ts_mad_outliers(spark: SparkSession, sf_dir: str):
    """Robust anomaly flags over events (timeseries.mad_outliers):
    per-user lower-median + MAD thresholding (breakdown-resistant,
    unlike mean/stddev z-scores); two keyed row_number windows + two
    co-partitioned joins, engine-portable bit-for-bit."""
    from pyspark.sql import functions as F

    from .operators.timeseries import mad_outliers

    out = mad_outliers(
        spark.table("events"),
        key_col="user_id",
        value_col="value",
        tiebreak_col="event_id",
        k=3.0,
    )
    return out.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
    ).orderBy("user_id", "event_id")


def _funnel_sql() -> str:
    """Ordered 3-step funnel view -> click -> purchase: per user, each
    step's first occurrence STRICTLY AFTER the previous step's time —
    the sequential-pattern query every event-analytics engine serves.
    Identical ANSI in both engines; each CTE is one per-user aggregate
    (shuffles co-partitioned on user_id — at 100 TB this is three
    map-side-combined aggs plus two user-key equi-joins, never a
    self-join explosion). conv_pct divides two exact BIGINTs once."""
    return """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    counts AS (
      SELECT 1 AS step, 'view' AS step_name,
             CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
      UNION ALL
      SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
      UNION ALL
      SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
    )
    SELECT step, step_name, n_users,
      round(CAST(n_users AS DOUBLE)
            / (SELECT n_users FROM counts WHERE step = 1), 6) AS conv_pct
    FROM counts ORDER BY step
    """


shared_sql("funnel_view_click_purchase", _funnel_sql())


def _retention_sql(us: str, dv: str) -> str:
    """Weekly retention cohorts: cohort = a user's first-activity week
    (absolute epoch-week index, exact integer division of epoch
    micros), offset = whole weeks between first activity and a later
    active week; n_active = distinct users of the cohort active at
    that offset. Two per-user/week aggregates + one user-key join —
    the cohort matrix every product-analytics engine serves, exact
    BIGINT arithmetic throughout. ``us``/``dv`` are the dialect's
    epoch-micros function and integer-div operator."""
    wk = 7 * 86_400 * 1_000_000
    return f"""
    WITH first AS (
      SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id,
        CAST({us}(f.t0) {dv} {wk} AS BIGINT) AS cohort_week,
        CAST(({us}(e.ts) {dv} {wk}) - ({us}(f.t0) {dv} {wk}) AS BIGINT)
          AS week_offset
      FROM events e JOIN first f ON f.user_id = e.user_id
    )
    SELECT cohort_week, week_offset,
      CAST(count(*) AS BIGINT) AS n_active
    FROM act GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """


def _transitions_sql() -> str:
    """Event-type Markov transition matrix: for every consecutive pair
    of a user's events (total order (ts, event_id) — deterministic),
    count prev_type -> next_type and its row-normalized probability.
    The third leg of the event-analytics family (funnel = one fixed
    path, retention = time offsets, transitions = the full first-order
    behavior graph — the input to journey mining / next-action
    models). Plan: one user-keyed lag window (co-partitioned, never a
    single reducer) + one map-side-combined count; the probability
    window runs over the |types|^2-row aggregate — metadata-sized."""
    return """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
        lag(event_type) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    cnt AS (
      SELECT prev_type, event_type AS next_type,
        CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
      round(CAST(n AS DOUBLE)
            / sum(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM cnt ORDER BY prev_type, next_type
    """


shared_sql("event_type_transitions", _transitions_sql())


shared_sql(
    "retention_weekly_cohorts",
    _retention_sql("unix_micros", "div"),
    oracle=_retention_sql("epoch_us", "//"),
)


# As-of join: for each purchase, the most recent click at-or-before it,
# per user. Implemented as union + ordered window with IGNORE NULLS —
# the single-sort merge-asof shape that scales (no join explosion).
shared_sql(
    "asof_purchase_prev_click",
    """
    WITH w AS (
      SELECT user_id, ts, event_id, event_type,
        last(CASE WHEN event_type = 'click' THEN event_id END) IGNORE NULLS OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS prev_click_seq
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT event_id AS purchase_seq, user_id, prev_click_seq
    FROM w WHERE event_type = 'purchase' ORDER BY purchase_seq
    """,
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id, event_type,
        last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS prev_click_seq
      FROM events WHERE event_type IN ('click', 'purchase')
    )
    SELECT event_id AS purchase_seq, user_id, prev_click_seq
    FROM w WHERE event_type = 'purchase' ORDER BY purchase_seq
    """,
)

shared_sql(
    "interval_join_events",
    # bounded 1:N interval join (the batch form of a stream-stream
    # windowed join; asof above is the nearest-1 variant): every
    # purchase matched to ALL of the same user's clicks in the
    # preceding 30 minutes. Plans as an equi-join on user_id with the
    # range as a post-join filter — at scale the user_id shuffle
    # co-locates each user's events, so the range filter is local.
    """
    SELECT p.event_id AS purchase_seq, c.event_id AS click_seq, p.user_id
    FROM events p JOIN events c
      ON p.user_id = c.user_id
      AND p.event_type = 'purchase' AND c.event_type = 'click'
      AND c.ts > p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
    ORDER BY purchase_seq, click_seq
    """,
)

@query(
    "stream_windowed_counts",
    # The STREAMING extension surface's oracle row (VERDICT r3 #7): a
    # REAL Structured Streaming execution of windowed_event_counts
    # (tumbling 1h windows, 30min watermark, append mode) over three
    # deterministic micro-batches, reproduced in DuckDB as plain SQL.
    # b0 = event_id%10 NOT IN (3,7) (80%), b1 = %10=7, b2 = %10=3 —
    # each spread over the whole time range, so most of b2 arrives
    # LATE relative to the watermark and is dropped.
    # Empirically pinned Spark semantics (see tests/test_streaming.py
    # ::test_stream_windowed_counts_batch_lag): the LATE-EVENT filter
    # in batch N uses the watermark computed from data through batch
    # N-2 (it lags eviction by one batch — watermarkForLateEvents), so
    # b1 is never filtered and b2 filters against wm_after_b0 =
    # max(ts in b0) - 30min; EVICTION/emission uses the current
    # watermark, and the trailing no-data micro-batch flushes every
    # window with end <= final watermark = max(all ts) - 30min.
    oracle="""
    WITH b0 AS (SELECT ts FROM events WHERE event_id % 10 NOT IN (3, 7)),
         b2 AS (SELECT ts FROM events WHERE event_id % 10 = 3),
         wm0 AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM b0),
         fw  AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events),
         survive AS (
           SELECT ts FROM events WHERE event_id % 10 != 3
           UNION ALL
           SELECT ts FROM b2
           WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR > (SELECT w FROM wm0)
         )
    SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, count(*) AS n
    FROM survive
    WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT w FROM fw)
    GROUP BY 1 ORDER BY 1
    """,
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .streaming.live import windowed_event_counts

    events = spark.table("events").select("event_id", "ts")
    work = tempfile.mkdtemp(prefix="stream_win_")
    try:
        src = _staged_stream_source(spark, events, work)
        agg = windowed_event_counts(
            src, window="1 hour", watermark="30 minutes", ts_col="ts"
        )
        sink = _run_stream_to_memory(spark, agg, work, output_mode="append")
        rows = (
            sink.select(F.unix_micros("win_start").alias("win_start_us"), "n")
            .orderBy("win_start_us")
            .collect()
        )
        return spark.createDataFrame(rows, "win_start_us long, n long")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _staged_stream_source(
    spark: SparkSession, df: DataFrame, work: str, seq_col: str = "event_id",
    preds: tuple | None = None,
) -> DataFrame:
    """Stage ``df`` as single-file micro-batches (default: 80% / %10==7
    / %10==3 of ``seq_col``; arrival order pinned via mtime) and return
    a file-source readStream over them (maxFilesPerTrigger=1): the
    deterministic-batch harness behind the streaming oracle rows.
    ``preds`` overrides the batch predicates (they should partition the
    input; rows matching none are simply never staged)."""
    import os
    import shutil

    stream_dir = os.path.join(work, "in")
    os.makedirs(stream_dir)
    if preds is None:
        preds = (
            ~(F.col(seq_col) % 10).isin(3, 7),
            F.col(seq_col) % 10 == 7,
            F.col(seq_col) % 10 == 3,
        )
    for i, pred in enumerate(preds):
        staged = os.path.join(work, f"stage{i}")
        df.where(pred).coalesce(1).write.parquet(staged)
        part = next(f for f in os.listdir(staged) if f.endswith(".parquet"))
        dst = os.path.join(stream_dir, f"b{i}.parquet")
        shutil.move(os.path.join(staged, part), dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    return (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )


def _run_stream_to_memory(
    spark: SparkSession, out: DataFrame, work: str, output_mode: str
) -> DataFrame:
    """Run ``out`` to completion (availableNow) into a memory sink and
    return the sink table (caller collects; sink view is dropped).

    ORACLE-HARNESS BOUNDARY (VERDICT-r6 "What's wrong" #2): the
    memory sink is driver-side BY NATURE and the stream_* catalog rows
    that ``.collect()`` it are watermark-bounded oracle fixtures, not
    product paths. These collects must NEVER migrate into
    ``streaming/live.py`` / ``streaming/stateful.py`` product code —
    a production pipeline writes to a distributed sink (parquet/
    foreachBatch into the log via ``bulk_append_df``); the only
    driver-side product collect is ``log_stream_sink``'s documented
    single-writer micro-batch commit (`sources/readers.py`)."""
    import os
    import uuid as _uuid

    qname = f"swc_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = spark.table(qname)
    spark.catalog.dropTempView(qname)
    return sink


@query(
    "stream_dedup_watermark",
    # Streaming dropDuplicates-within-watermark (VERDICT-r5 #8) — the
    # streaming twin of ns_dedup_exact, run as a REAL Structured
    # Streaming query over three pinned micro-batches with injected
    # duplicates: b0 = %10 NOT IN (3,7) originals; b1 = %10==7
    # originals + DUPLICATE copies of b0's %10==0 rows; b2 = %10==3
    # originals + duplicate copies of b0's %10==4 rows.
    # Empirically pinned Spark 4.1 semantics (probe in
    # tests/test_streaming.py::test_stream_dedup_watermark_semantics):
    # in batch N the late-event filter uses the watermark through batch
    # N-2 and state eviction at end of batch N uses the watermark
    # through N-1 — so a duplicate's late-filter bound always equals
    # the eviction bound that governed its twin's state, and EVERY
    # duplicate is dropped (late if ts < wm, live-state if ts >= wm):
    # exactly-once distinct output of non-late first arrivals.
    # b1 originals are never late (wm through b(-1) = -inf); b2
    # originals survive iff ts >= wm-through-b0.
    oracle="""
    WITH b0 AS (SELECT ts FROM events WHERE event_id % 10 NOT IN (3, 7)),
         wm0 AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM b0)
    SELECT event_id, epoch_us(ts) AS ts_us FROM events
    WHERE event_id % 10 NOT IN (3, 7) OR event_id % 10 = 7
    UNION ALL
    SELECT event_id, epoch_us(ts) FROM events
    WHERE event_id % 10 = 3 AND ts >= (SELECT w FROM wm0)
    ORDER BY event_id
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from .streaming.live import dedup_within_watermark

    ev = spark.table("events").select("event_id", "ts")
    work = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        stream_dir = os.path.join(work, "in")
        os.makedirs(stream_dir)
        m10 = F.col("event_id") % 10
        stages = (
            ev.where(~m10.isin(3, 7)),
            ev.where(m10 == 7).unionAll(ev.where(m10 == 0)),  # + dups of b0
            ev.where(m10 == 3).unionAll(ev.where(m10 == 4)),  # + dups of b0
        )
        for i, batch in enumerate(stages):
            staged = os.path.join(work, f"stage{i}")
            batch.coalesce(1).write.parquet(staged)
            part = next(f for f in os.listdir(staged) if f.endswith(".parquet"))
            dst = os.path.join(stream_dir, f"b{i}.parquet")
            shutil.move(os.path.join(staged, part), dst)
            os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
        src = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        out = dedup_within_watermark(
            src, keys=("event_id",), watermark="30 minutes", ts_col="ts"
        )
        sink = _run_stream_to_memory(spark, out, work, output_mode="append")
        rows = (
            sink.select("event_id", F.unix_micros("ts").alias("ts_us"))
            .orderBy("event_id")
            .collect()
        )
        return spark.createDataFrame(rows, "event_id long, ts_us long")
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "stream_session_counts",
    # Streaming SESSION windows (session_window + watermark, append
    # mode) — the dynamic-window member of the streaming family, twin
    # of the batch sessionize_30min row. Batches are partitioned BY KEY
    # (user_id % 3) so no session straddles a batch boundary — that
    # keeps the oracle closed-form while the run still exercises real
    # cross-batch session STATE (open sessions from b0 survive b1/b2
    # and flush in the trailing no-data batch) and the late-event
    # filter (b2 rows vs the batch-lagged watermark, same pinned
    # semantics as stream_windowed_counts: filter in batch N uses the
    # watermark through batch N-2). Session merge bound pinned by
    # tests/test_streaming.py::test_stream_session_semantics: an event
    # at exactly last_ts + gap MERGES (the bound is inclusive — probe
    # finding; a half-open assumption breaks on exact-gap ties);
    # emission requires session end <= final watermark =
    # max(all ts) - 30min (boundary equality emits — probed).
    oracle="""
    WITH wm0 AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events
                 WHERE user_id % 3 = 0),
         fw  AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events),
         survive AS (
           SELECT user_id, ts FROM events WHERE user_id % 3 IN (0, 1)
           UNION ALL
           SELECT user_id, ts FROM events
           WHERE user_id % 3 = 2 AND ts >= (SELECT w FROM wm0)
         ),
         ord AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                    > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_sess
           FROM survive
         ),
         sess AS (
           SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts) AS sid
           FROM ord
         )
    SELECT user_id, epoch_us(min(ts)) AS sess_start_us,
      epoch_us(max(ts) + INTERVAL 30 MINUTE) AS sess_end_us,
      count(*) AS n
    FROM sess GROUP BY user_id, sid
    HAVING max(ts) + INTERVAL 30 MINUTE <= (SELECT w FROM fw)
    ORDER BY user_id, sess_start_us
    """,
)
def stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .streaming.live import sessionized_event_counts

    ev = spark.table("events").select("user_id", "ts")
    work = tempfile.mkdtemp(prefix="stream_sess_")
    try:
        m3 = F.col("user_id") % 3
        src = _staged_stream_source(
            spark, ev, work, preds=(m3 == 0, m3 == 1, m3 == 2)
        )
        agg = sessionized_event_counts(
            src, gap="30 minutes", watermark="30 minutes",
            key="user_id", ts_col="ts",
        )
        sink = _run_stream_to_memory(spark, agg, work, output_mode="append")
        rows = (
            sink.select(
                "user_id",
                F.unix_micros("sess_start").alias("sess_start_us"),
                F.unix_micros("sess_end").alias("sess_end_us"),
                "n",
            )
            .orderBy("user_id", "sess_start_us")
            .collect()
        )
        return spark.createDataFrame(
            rows, "user_id long, sess_start_us long, sess_end_us long, n long"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "stream_stateful_key_stats",
    # The custom-stateful-operator surface's oracle row: a REAL
    # applyInPandasWithState run (per-key accumulator across 3 pinned
    # micro-batches, update mode) whose FINAL per-key state must equal
    # the batch aggregate. Values are fed as exact integer cents (in a
    # double column): integer-valued float64 sums are exact in any
    # accumulation order, so cross-batch state merging is hashable.
    oracle="""
    SELECT user_id,
      count(*) AS n,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS total,
      max(event_id) AS last_seq
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def stream_stateful_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .streaming.stateful import running_key_stats

    events = spark.table("events").select(
        F.col("event_id").alias("seq"),
        "user_id",
        # exact cents as double: any per-batch summation order is exact
        F.round(F.col("value") * 100).cast("long").cast("double").alias("value"),
    )
    work = tempfile.mkdtemp(prefix="stream_state_")
    try:
        src = _staged_stream_source(spark, events, work, seq_col="seq")
        out = running_key_stats(src)
        sink = _run_stream_to_memory(spark, out, work, output_mode="update")
        # update mode emits one row per touched key per batch; the final
        # accumulator per key is the row with the max n (n is monotone)
        from pyspark.sql.window import Window as _W

        w = _W.partitionBy("user_id").orderBy(F.col("n").desc())
        rows = (
            sink.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("user_id", "n", "total", "last_seq")
            .orderBy("user_id")
            .collect()
        )
        return spark.createDataFrame(
            rows, "user_id long, n long, total double, last_seq long"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "stream_hll_window",
    # Streaming HLL distinct-users per hour window — the streaming twin
    # of ns_hll_user_estimate, and the demonstration that any
    # commutative-monoid sketch streams for free: register update is
    # max(), so the windowed max aggregate's incremental state IS the
    # mergeable sketch (state = O(windows x 256) rows, independent of
    # stream rate), and append mode emits each window's registers once
    # the watermark passes its end. Late-data semantics are the SAME
    # pinned rules as stream_windowed_counts (late filter vs the
    # batch-lagged watermark on window END; emission when end <= final
    # watermark) — the survive set below reuses that oracle's CTEs
    # verbatim, then replays the register/estimate arithmetic of the
    # batch HLL row (all-BIGINT registers, precomputed branch literal)
    # over it.
    oracle="""
    WITH b0 AS (SELECT ts FROM events WHERE event_id % 10 NOT IN (3, 7)),
         wm0 AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM b0),
         fw  AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM events),
         survive AS (
           SELECT ts, user_id FROM events WHERE event_id % 10 != 3
           UNION ALL
           SELECT ts, user_id FROM events WHERE event_id % 10 = 3
             AND date_trunc('hour', ts) + INTERVAL 1 HOUR > (SELECT w FROM wm0)
         ),
         emit AS (
           SELECT date_trunc('hour', ts) AS ws, user_id FROM survive
           WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT w FROM fw)
         ),
         h AS (
           SELECT ws, CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                           AS BIGINT) AS hv
           FROM emit
         ),
         regs AS (
           SELECT ws, hv % 256 AS bucket,
             max(CASE WHEN hv // 256 = 0 THEN 53
                      ELSE 53 - length(bin(hv // 256)) END) AS rho
           FROM h GROUP BY 1, 2
         ),
         per AS (
           SELECT ws,
             CAST(sum((1::BIGINT << (53 - rho))) AS BIGINT) AS s_present,
             CAST(count(*) AS BIGINT) AS n_present
           FROM regs GROUP BY ws
         ),
         fin AS (
           SELECT ws,
             CAST(s_present + (256 - n_present) * 9007199254740992 AS BIGINT)
               AS s53,
             CAST(256 - n_present AS BIGINT) AS v_zero
           FROM per
         )
    SELECT epoch_us(ws) AS win_start_us, s53, v_zero,
      CASE WHEN CAST(s53 AS DOUBLE) >= 6.624895351417025e+17 AND v_zero > 0
           THEN round(256.0 * ln(256.0 / v_zero), 4)
           ELSE round(0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
                      * 9007199254740992.0 / CAST(s53 AS DOUBLE), 4)
      END AS hll_estimate
    FROM fin ORDER BY win_start_us
    """,
)
def stream_hll_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .streaming.live import hll_finalize_registers, windowed_hll_registers

    events = spark.table("events").select("event_id", "ts", "user_id")
    work = tempfile.mkdtemp(prefix="stream_hll_")
    try:
        src = _staged_stream_source(spark, events, work)
        regs = windowed_hll_registers(
            src, window="1 hour", watermark="30 minutes", ts_col="ts"
        )
        sink = _run_stream_to_memory(spark, regs, work, output_mode="append")
        fin = hll_finalize_registers(sink)
        rows = (
            fin.select(
                F.unix_micros("win_start").alias("win_start_us"),
                "s53",
                "v_zero",
                "hll_estimate",
            )
            .orderBy("win_start_us")
            .collect()
        )
        return spark.createDataFrame(
            rows, "win_start_us long, s53 long, v_zero long, hll_estimate double"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "stream_locf_grid",
    # Streaming gap-fill + LOCF (streaming/stateful.py::locf_grid_stream)
    # — the streaming twin of ts_gapfill_locf, and the op a windowed
    # aggregate CANNOT express (an unobserved bucket has no group, so
    # nothing emits; here event-time timeouts extend every key's grid to
    # the watermark). A REAL applyInPandasWithState run over the three
    # pinned micro-batches; exactly-once per (key, bucket) leans on the
    # pinned lag alignment (late filter in batch N uses the watermark
    # through N-2 == the bound that governed finalization in N-1, so a
    # surviving event's bucket is never already closed). The oracle
    # replays the survive set (same rules as stream_dedup_watermark) +
    # final-watermark grid in plain SQL.
    oracle="""
    WITH ev AS (
      SELECT event_id, ts, user_id, value FROM events WHERE user_id < 25
    ),
    b0 AS (SELECT ts FROM ev WHERE event_id % 10 NOT IN (3, 7)),
    wm0 AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM b0),
    fw AS (
      SELECT epoch_us(max(ts) - INTERVAL 30 MINUTE) // 3600000000 - 1 AS b
      FROM ev
    ),
    survive AS (
      SELECT * FROM ev
      WHERE event_id % 10 NOT IN (3, 7) OR event_id % 10 = 7
      UNION ALL
      SELECT * FROM ev
      WHERE event_id % 10 = 3 AND ts >= (SELECT w FROM wm0)
    ),
    obs AS (
      SELECT user_id, bucket, value FROM (
        SELECT user_id, epoch_us(ts) // 3600000000 AS bucket, value,
          row_number() OVER (
            PARTITION BY user_id, epoch_us(ts) // 3600000000
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM survive
        WHERE epoch_us(ts) // 3600000000 <= (SELECT b FROM fw)) t
      WHERE rn = 1
    ),
    span AS (SELECT user_id, min(bucket) AS lo FROM obs GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, (SELECT b FROM fw)))
        AS bucket
      FROM span
    ),
    j AS (
      SELECT g.user_id, g.bucket, o.value,
        o.user_id IS NOT NULL AS observed
      FROM grid g LEFT JOIN obs o
        ON o.user_id = g.user_id AND o.bucket = g.bucket
    )
    SELECT user_id, bucket, observed,
      round(last_value(value IGNORE NULLS) OVER (
        PARTITION BY user_id ORDER BY bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_locf
    FROM j ORDER BY user_id, bucket
    """,
)
def stream_locf_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .streaming.stateful import locf_grid_stream

    ev = (
        spark.table("events")
        .where(F.col("user_id") < 25)
        .select("event_id", "ts", "user_id", "value")
    )
    work = tempfile.mkdtemp(prefix="stream_locf_")
    try:
        src = _staged_stream_source(spark, ev, work)
        out = locf_grid_stream(src, watermark="30 minutes")
        sink = _run_stream_to_memory(spark, out, work, output_mode="update")
        # each (key, bucket) finalizes exactly once, so the sink IS the
        # grid (no per-batch dedupe needed — asserted by the unit probe)
        rows = (
            sink.select(
                "user_id",
                "bucket",
                "observed",
                F.round("value_locf", 6).alias("value_locf"),
            )
            .orderBy("user_id", "bucket")
            .collect()
        )
        return spark.createDataFrame(
            rows, "user_id long, bucket long, observed boolean, value_locf double"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "stream_mad_outliers",
    # Streaming robust anomaly detection (VERDICT-r6 #4) — the
    # streaming twin of ts_mad_outliers, via
    # streaming/stateful.py::mad_outliers_stream: exact medians do not
    # stream, so the pinned honest form is per-window EXACT over
    # watermark-CLOSED hourly buckets (within a finalized bucket the
    # lower-median + MAD rule is bit-identical to the batch operator).
    # A REAL applyInPandasWithState run over the three pinned
    # micro-batches; the survive set and final-watermark bucket bound
    # replay stream_locf_grid's pinned Spark 4.1 lag-alignment rules.
    oracle="""
    WITH ev AS (
      SELECT event_id, ts, user_id, value FROM events WHERE user_id < 25
    ),
    b0 AS (SELECT ts FROM ev WHERE event_id % 10 NOT IN (3, 7)),
    wm0 AS (SELECT max(ts) - INTERVAL 30 MINUTE AS w FROM b0),
    fw AS (
      SELECT epoch_us(max(ts) - INTERVAL 30 MINUTE) // 3600000000 - 1 AS b
      FROM ev
    ),
    survive AS (
      SELECT * FROM ev
      WHERE event_id % 10 NOT IN (3, 7) OR event_id % 10 = 7
      UNION ALL
      SELECT * FROM ev
      WHERE event_id % 10 = 3 AND ts >= (SELECT w FROM wm0)
    ),
    closed AS (
      SELECT user_id, epoch_us(ts) // 3600000000 AS bucket, event_id, value
      FROM survive
      WHERE epoch_us(ts) // 3600000000 <= (SELECT b FROM fw)
    ),
    med AS (
      SELECT user_id, bucket, value AS med FROM (
        SELECT user_id, bucket, value,
          row_number() OVER (
            PARTITION BY user_id, bucket ORDER BY value, event_id) AS rn,
          count(*) OVER (PARTITION BY user_id, bucket) AS n
        FROM closed) t
      WHERE rn = (n + 1) // 2
    ),
    ad AS (
      SELECT c.user_id, c.bucket, c.event_id, c.value, m.med,
        abs(c.value - m.med) AS dev
      FROM closed c JOIN med m USING (user_id, bucket)
    ),
    mad AS (
      SELECT user_id, bucket, dev AS mad FROM (
        SELECT user_id, bucket, dev,
          row_number() OVER (
            PARTITION BY user_id, bucket ORDER BY dev, event_id) AS rn,
          count(*) OVER (PARTITION BY user_id, bucket) AS n
        FROM ad) t
      WHERE rn = (n + 1) // 2
    )
    SELECT a.user_id, a.bucket, a.event_id, a.value, a.med, m.mad
    FROM ad a JOIN mad m USING (user_id, bucket)
    WHERE a.dev > 3.0 * m.mad
    ORDER BY a.user_id, a.bucket, a.event_id
    """,
)
def stream_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .streaming.stateful import mad_outliers_stream

    ev = (
        spark.table("events")
        .where(F.col("user_id") < 25)
        .select("event_id", "ts", "user_id", "value")
    )
    work = tempfile.mkdtemp(prefix="stream_mad_")
    try:
        src = _staged_stream_source(spark, ev, work)
        out = mad_outliers_stream(src, watermark="30 minutes")
        sink = _run_stream_to_memory(spark, out, work, output_mode="update")
        # each (key, bucket) finalizes exactly once, so the sink IS the
        # outlier set (asserted by the unit probe)
        rows = (
            sink.select("user_id", "bucket", "event_id", "value", "med", "mad")
            .orderBy("user_id", "bucket", "event_id")
            .collect()
        )
        return spark.createDataFrame(
            rows,
            "user_id long, bucket long, event_id long, value double, "
            "med double, mad double",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "src_orc_roundtrip",
    # The source-format surface's ORC attestation: events written to
    # ORC (JVM-native, zlib stripes) and read back through the engine's
    # read_any dispatch, then aggregated with exact-integer columns —
    # a type-mapping or timestamp bug in either direction breaks the
    # hash. The oracle aggregates the original parquet (same rows, so a
    # lossless round-trip is the only way to match). At 100 TB: ORC has
    # the same stripe-level min/max pushdown + column pruning story as
    # parquet, so this path inherits the scan-shape guarantees the plan
    # gates pin for parquet.
    oracle="""
    SELECT event_type, count(*) AS n,
      CAST(sum(event_id) AS BIGINT) AS sum_id,
      count(DISTINCT user_id) AS n_users,
      epoch_us(min(ts)) AS min_us, epoch_us(max(ts)) AS max_us
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .sources.readers import read_any

    events = spark.table("events").select("event_id", "user_id", "event_type", "ts")
    work = tempfile.mkdtemp(prefix="orc_rt_")
    try:
        path = work + "/events_orc"
        events.write.orc(path)
        rows = (
            read_any(spark, path, "orc")
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum("event_id").alias("sum_id"),
                F.countDistinct("user_id").alias("n_users"),
                F.unix_micros(F.min("ts")).alias("min_us"),
                F.unix_micros(F.max("ts")).alias("max_us"),
            )
            .orderBy("event_type")
            .collect()
        )
        return spark.createDataFrame(
            rows,
            "event_type string, n long, sum_id long, n_users long, "
            "min_us long, max_us long",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "src_avro_roundtrip",
    # The Avro sink+source loop, driver-attested: events written as
    # Avro OCF shards by the distributed sink (executor-side encode,
    # snappy blocks, one shard per partition), loaded back as binary
    # payloads, and decoded by the distributed record reader — a
    # varint, block, codec, schema-mapping, or shard-boundary bug on
    # EITHER side breaks the hash against the original parquet.
    oracle="""
    SELECT event_type, count(*) AS n,
      CAST(sum(event_id) AS BIGINT) AS sum_id,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def src_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    import pandas as pd

    from .operators.archives import avro_records_df
    from .sources.avro_sink import write_avro_ocf

    events = spark.table("events").select(
        "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    work = tempfile.mkdtemp(prefix="avro_rt_")
    try:
        out = os.path.join(work, "ocf")
        write_avro_ocf(events.repartition(8), out, codec="snappy")
        shards = sorted(glob.glob(os.path.join(out, "*.avro")))
        payloads = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": range(len(shards)),
                    "payload": [open(p, "rb").read() for p in shards],
                }
            )
        )
        back = avro_records_df(
            payloads, "event_id long, event_type string, cents long"
        )
        rows = (
            back.groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum("event_id").alias("sum_id"),
                F.sum("cents").alias("cents"),
            )
            .orderBy("event_type")
            .collect()
        )
        return spark.createDataFrame(
            rows, "event_type string, n long, sum_id long, cents long"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "src_tar_roundtrip",
    # The WebDataset-style tar-shard sink loop, driver-attested:
    # documents written as tar shards (one per partition, executor-side,
    # byte-deterministic USTAR members — sources/tar_sink.py), read
    # back through the package's OWN archive extraction, and checked by
    # content-exact aggregates: a member-naming, tar-framing, UTF-8, or
    # extraction bug on either side breaks the hash vs the source
    # parquet. Two members per sample ({key}.txt text, {key}.meta
    # lang|source) pin the multi-member sample convention.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
      CAST(count(*) * 2 AS BIGINT) AS n_members,
      CAST(sum(strlen(text)) AS BIGINT) AS txt_bytes,
      CAST(sum(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT)) AS BIGINT)
        AS txt_h,
      CAST(sum(CAST('0x' || substr(md5(lang || '|' || source), 1, 8)
               AS BIGINT)) AS BIGINT) AS meta_h
    FROM documents
    """,
)
def src_tar_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from .sources.tar_sink import read_tar_shards, write_tar_shards

    docs = spark.table("documents").select(
        "doc_id", "text", F.concat_ws("|", "lang", "source").alias("meta")
    )
    work = tempfile.mkdtemp(prefix="tar_rt_")
    try:
        out = os.path.join(work, "shards")
        write_tar_shards(
            docs.repartition(8), out, key_col="doc_id",
            members={"text": "txt", "meta": "meta"},
        )
        back = read_tar_shards(spark, out).where(F.col("ok"))
        ext = F.substring_index("member", ".", -1)
        h = F.conv(F.substring(F.md5("content"), 1, 8), 16, 10).cast("long")
        zero = F.lit(0).cast("long")
        rows = back.agg(
            F.countDistinct(F.substring_index("member", ".", 1)).alias("n_docs"),
            F.count("*").alias("n_members"),
            F.sum(
                F.when(ext == "txt", F.octet_length("content")).otherwise(zero)
            ).alias("txt_bytes"),
            F.sum(F.when(ext == "txt", h).otherwise(zero)).alias("txt_h"),
            F.sum(F.when(ext == "meta", h).otherwise(zero)).alias("meta_h"),
        ).collect()
        return spark.createDataFrame(
            rows,
            "n_docs long, n_members long, txt_bytes long, txt_h long, "
            "meta_h long",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "src_lakehouse_roundtrip",
    # BOTH open-table-format loops in one attestation: events bulk-
    # loaded into a log (one distributed commit), exported as a Delta
    # transaction log AND an Iceberg v2 metadata tree, then read back
    # through each format's own spec reader (JSON-action replay;
    # Avro manifest walk) and aggregated per format. The two groups
    # must equal each other AND the original parquet — an export or
    # reader bug in either format breaks the hash.
    oracle="""
    SELECT fmt, count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_id
    FROM events, (VALUES ('delta'), ('iceberg')) f(fmt)
    GROUP BY fmt ORDER BY fmt
    """,
)
def src_lakehouse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .log import ParquetLog
    from .sources.delta_export import export_delta_log
    from .sources.iceberg_export import export_iceberg_metadata
    from .sources.readers import append_df_to_log, read_any

    events = spark.table("events").select("event_id")
    work = tempfile.mkdtemp(prefix="lakehouse_rt_")
    try:
        log = ParquetLog(work + "/log")
        append_df_to_log(log, events)
        export_delta_log(log)
        export_iceberg_metadata(log)
        out = []
        for fmt in ("delta", "iceberg"):
            df = read_any(spark, log.path, fmt)
            ids = df.select(
                F.get_json_object("value", "$.event_id").cast("long").alias("event_id")
            )
            (row,) = (
                ids.agg(
                    F.count("*").alias("n"), F.sum("event_id").alias("sum_id")
                ).collect()
            )
            out.append((fmt, row.n, row.sum_id))
        return spark.createDataFrame(out, "fmt string, n long, sum_id long")
    finally:
        shutil.rmtree(work, ignore_errors=True)


shared_sql(
    "json_extraction",
    # the log's schema-less JSON value surface: path extraction + filter
    """
    SELECT event_id AS seq,
      CAST(get_json_object(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(get_json_object(props, '$.k') AS BIGINT) >= 80 AND event_id < 3000
    ORDER BY seq
    """,
    oracle="""
    SELECT event_id AS seq,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 80 AND event_id < 3000
    ORDER BY seq
    """,
)


# =====================================================================
# Extended relational surface — scalar/window/set/grouping breadth
# =====================================================================

shared_sql(
    "percentiles_exact",
    # interpolated quantiles over exact integer cents: Spark percentile()
    # and DuckDB quantile_cont() share the linear-interpolation formula,
    # so results over identical ints are bit-identical (verified).
    """
    SELECT o_orderpriority,
      percentile(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) AS median_c,
      percentile(CAST(round(o_totalprice * 100) AS BIGINT), 0.9) AS p90_c,
      percentile(CAST(round(o_totalprice * 100) AS BIGINT), 0.99) AS p99_c
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    oracle="""
    SELECT o_orderpriority,
      quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) AS median_c,
      quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.9) AS p90_c,
      quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.99) AS p99_c
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)

shared_sql(
    "string_agg_ordered",
    """
    SELECT o_orderstatus,
      listagg(DISTINCT o_orderpriority, ',') WITHIN GROUP (ORDER BY o_orderpriority) AS priorities
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    oracle="""
    SELECT o_orderstatus,
      string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)

shared_sql(
    "array_agg_sorted",
    # deterministic array aggregation: sort the collected list, then join
    # to ONE STRING — list-typed result columns crash the driver's
    # canonicalizer (pandas sort_values on lists), so both engines emit
    # the same comma-joined scalar.
    """
    SELECT user_id,
      array_join(sort_array(collect_list(DISTINCT event_type)), ',') AS types
    FROM events WHERE user_id < 10 GROUP BY user_id ORDER BY user_id
    """,
    oracle="""
    SELECT user_id,
      array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
    FROM events WHERE user_id < 10 GROUP BY user_id ORDER BY user_id
    """,
)

shared_sql(
    "grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)

shared_sql(
    "scalar_functions_2",
    # string surface: pad/trim/translate/replace/reverse/position + null
    # handling (coalesce/nullif) — identical ANSI text on both engines
    """
    SELECT o_orderkey,
      lpad(o_orderstatus, 3, '_') AS padded,
      trim('  ' || o_orderstatus || '  ') AS trimmed,
      translate(o_orderpriority, '-', '_') AS translated,
      replace(o_orderpriority, 'E', 'e') AS replaced,
      reverse(o_orderstatus) AS rev,
      CAST(position('-' IN o_orderpriority) AS BIGINT) AS dash_pos,
      coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
      CASE WHEN o_totalprice > 250000 THEN 'big' ELSE 'small' END AS bucket
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
)

shared_sql(
    "math_functions",
    # integer-safe math only (no libm transcendentals — their rounding is
    # not pinned across implementations); sqrt IS correctly-rounded IEEE
    """
    SELECT o_orderkey,
      CAST(floor(o_totalprice / 1000) AS BIGINT) AS floor_k,
      CAST(ceil(o_totalprice / 1000) AS BIGINT) AS ceil_k,
      round(sqrt(CAST(round(o_totalprice * 100) AS BIGINT)), 6) AS sqrt_c,
      sign(CAST(round(o_totalprice * 100) AS BIGINT) - 25000000) AS vs_250k,
      greatest(o_orderkey % 7, o_orderkey % 5) AS g,
      least(o_orderkey % 7, o_orderkey % 5) AS l
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
      CAST(floor(o_totalprice / 1000) AS BIGINT) AS floor_k,
      CAST(ceil(o_totalprice / 1000) AS BIGINT) AS ceil_k,
      round(sqrt(CAST(round(o_totalprice * 100) AS BIGINT)), 6) AS sqrt_c,
      CAST(sign(CAST(round(o_totalprice * 100) AS BIGINT) - 25000000) AS DOUBLE) AS vs_250k,
      greatest(o_orderkey % 7, o_orderkey % 5) AS g,
      least(o_orderkey % 7, o_orderkey % 5) AS l
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
)

shared_sql(
    "interval_arithmetic",
    """
    SELECT o_orderkey,
      unix_micros(CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP)) AS due_us,
      unix_micros(CAST(o_orderdate - INTERVAL 1 DAY AS TIMESTAMP)) AS prev_us
    FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
    """,
    oracle="""
    SELECT o_orderkey,
      epoch_us(o_orderdate + INTERVAL 30 DAY) AS due_us,
      epoch_us(o_orderdate - INTERVAL 1 DAY) AS prev_us
    FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
    """,
)

shared_sql(
    "window_rank_dense",
    # rank()/dense_rank() handle ties (o_totalprice duplicates survive in
    # cents space) — deterministic because ranking ignores arrival order
    """
    SELECT o_custkey, o_orderkey,
      CAST(rank() OVER w AS BIGINT) AS rnk,
      CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS quartile
    FROM orders WHERE o_custkey < 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)

shared_sql(
    "window_first_last",
    """
    SELECT o_custkey, o_orderkey,
      first_value(o_orderkey) OVER w AS first_ok,
      last_value(o_orderkey) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      ) AS last_ok,
      lead(o_orderkey) OVER w AS next_ok
    FROM orders WHERE o_custkey < 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)

shared_sql(
    "except_all_union_all",
    # bag semantics set ops
    """
    SELECT x FROM (
      SELECT o_custkey AS x FROM orders WHERE o_orderstatus = 'O'
      EXCEPT ALL
      SELECT o_custkey AS x FROM orders WHERE o_orderstatus = 'F'
    ) t ORDER BY x LIMIT 500
    """,
)

shared_sql(
    "correlated_scalar_subquery",
    """
    SELECT c_custkey,
      (SELECT CAST(round(max(o_totalprice) * 100) AS BIGINT)
       FROM orders WHERE o_custkey = c_custkey) AS max_order_c
    FROM customer WHERE c_custkey < 200 ORDER BY c_custkey
    """,
)

shared_sql(
    "cross_join_dims",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    WHERE n_regionkey = 0 ORDER BY r_name, n_name
    """,
)

shared_sql(
    "q6_forecast_revenue",
    # TPC-H Q6 shape: selective scan + single agg, the pure pushdown test
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_c4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)

shared_sql(
    "q18_large_volume_customers",
    # TPC-H Q18 shape: HAVING over a join-aggregate
    """
    SELECT c_custkey, o_orderkey, CAST(sum(qty_c) AS BIGINT) AS total_qty_c
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN (SELECT l_orderkey, CAST(round(l_quantity * 100) AS BIGINT) AS qty_c FROM lineitem) l
      ON l.l_orderkey = o_orderkey
    GROUP BY c_custkey, o_orderkey
    HAVING sum(qty_c) > 25000
    ORDER BY total_qty_c DESC, o_orderkey LIMIT 20
    """,
)


shared_sql(
    "sliding_window_counts",
    # 1-hour windows sliding every 30 minutes: each event lands in
    # exactly two windows. Spark's window() and DuckDB's time_bucket
    # both align to the epoch origin, so starts agree exactly.
    """
    SELECT unix_micros(w.start) AS win_start_us, count(*) AS n,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM (SELECT window(ts, '1 hour', '30 minutes') AS w, value FROM events)
    GROUP BY w ORDER BY win_start_us
    """,
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS s1, value FROM events
    ), w AS (
      SELECT s1 AS win_start, value FROM b
      UNION ALL
      SELECT s1 - INTERVAL 30 MINUTE AS win_start, value FROM b
    )
    SELECT epoch_us(win_start) AS win_start_us, count(*) AS n,
      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
    FROM w GROUP BY win_start ORDER BY win_start_us
    """,
)


shared_sql(
    "q10_returned_items",
    # TPC-H Q10 shape: returned-item revenue by customer + nation.
    # r10 OPTIMIZATION (guide §3.1): fact-first Spark text — see the
    # q3_top_revenue_orders note; the dim-first chain broadcast
    # LINEITEM.
    """
    SELECT c_custkey, c_name, n_name,
      CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c4
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_c4 DESC, c_custkey LIMIT 20
    """,
    oracle="""
    SELECT c_custkey, c_name, n_name,
      CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c4
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_c4 DESC, c_custkey LIMIT 20
    """,
)

shared_sql(
    "q14_promo_revenue",
    # TPC-H Q14 shape: conditional-aggregate ratio over a part join.
    # The ratio divides two exact integer sums -> deterministic double.
    """
    SELECT
      round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN disc_price_c4 ELSE 0 END) AS DOUBLE)
            / CAST(sum(disc_price_c4) AS DOUBLE), 9) AS promo_pct
    FROM (
      SELECT l_partkey,
        CAST(round(l_extendedprice * 100) AS BIGINT)
        * CAST(round((1 - l_discount) * 100) AS BIGINT) AS disc_price_c4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    ) l JOIN part ON p_partkey = l_partkey
    """,
)

shared_sql(
    "q19_discounted_revenue",
    # TPC-H Q19 shape: disjunctive multi-attribute predicates over a join
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c4
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE
      (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
      OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 AND l_quantity >= 10 AND l_quantity <= 40)
      OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 50 AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)


shared_sql(
    "array_functions",
    # nested-type surface over the embedding arrays: length, element
    # access, scaled slices — exact-int outputs (dialect fork for
    # array_size/len and 1-based slicing syntax)
    """
    SELECT vec_id,
      array_size(embedding) AS dim,
      CAST(round(CAST(element_at(embedding, 1) AS DOUBLE) * 1000000) AS BIGINT) AS e1_scaled,
      CAST(round(CAST(element_at(embedding, 64) AS DOUBLE) * 1000000) AS BIGINT) AS e64_scaled,
      CAST(aggregate(slice(embedding, 1, 8),
                     CAST(0 AS BIGINT),
                     (acc, x) -> acc + CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT)
        AS head8_sum_scaled
    FROM embeddings WHERE vec_id < 100 ORDER BY vec_id
    """,
    oracle="""
    SELECT vec_id,
      CAST(len(embedding) AS INT) AS dim,
      CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS e1_scaled,
      CAST(round(CAST(embedding[64] AS DOUBLE) * 1000000) AS BIGINT) AS e64_scaled,
      CAST(list_sum(list_transform(embedding[1:8],
                    x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS BIGINT)
        AS head8_sum_scaled
    FROM embeddings WHERE vec_id < 100 ORDER BY vec_id
    """,
)


shared_sql(
    "join_left_outer",
    # LEFT OUTER with aggregate over the nullable side: customers keep a
    # row even with no qualifying orders (NULL-safe count/sum)
    """
    SELECT c_custkey,
      count(o_orderkey) AS n_big_orders,
      CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) AS big_total_c
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey AND o_totalprice > 400000
    WHERE c_custkey < 300
    GROUP BY c_custkey ORDER BY c_custkey
    """,
)

shared_sql(
    "join_full_outer",
    # FULL OUTER between two disjoint-ish keyed aggregates
    """
    SELECT
      coalesce(o.k, l.k) AS custkey,
      o.n_open, l.n_fin
    FROM (
      SELECT o_custkey AS k, count(*) AS n_open FROM orders
      WHERE o_orderstatus = 'O' AND o_custkey < 120 GROUP BY o_custkey
    ) o
    FULL OUTER JOIN (
      SELECT o_custkey AS k, count(*) AS n_fin FROM orders
      WHERE o_orderstatus = 'F' AND o_custkey >= 80 AND o_custkey < 200 GROUP BY o_custkey
    ) l ON o.k = l.k
    ORDER BY custkey
    """,
)

shared_sql(
    "union_dedup_vs_all",
    # UNION (set) vs UNION ALL (bag) semantics in one result
    """
    SELECT 'dedup' AS mode, count(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      UNION
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    ) u
    UNION ALL
    SELECT 'all' AS mode, count(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    ) ua
    ORDER BY mode
    """,
)


shared_sql(
    "regexp_functions",
    # portable regex surface: both engines use RE2-compatible basics
    """
    SELECT o_orderkey,
      regexp_extract(o_orderpriority, '[0-9]+', 0) AS prio_num,
      CAST(regexp_extract(o_orderpriority, '([0-9]+)-', 1) AS BIGINT) AS prio_level,
      regexp_replace(o_orderpriority, '[0-9]+', '#') AS masked
    FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey
    """,
)

shared_sql(
    "argmin_argmax",
    # min_by/max_by both directions (DuckDB: arg_min/arg_max)
    """
    SELECT event_type,
      CAST(min(value_c * 10000000 + event_id) % 10000000 AS BIGINT) AS cheapest_seq,
      CAST(max(value_c * 10000000 + (9999999 - event_id)) % 10000000 AS BIGINT) AS dearest_inv,
      min(value_c) AS min_c,
      max(value_c) AS max_c
    FROM (SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS value_c FROM events)
    GROUP BY event_type ORDER BY event_type
    """,
    oracle="""
    SELECT event_type,
      CAST(min(value_c * 10000000 + event_id) % 10000000 AS BIGINT) AS cheapest_seq,
      CAST(max(value_c * 10000000 + (9999999 - event_id)) % 10000000 AS BIGINT) AS dearest_inv,
      min(value_c) AS min_c,
      max(value_c) AS max_c
    FROM (SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS value_c FROM events)
    GROUP BY event_type ORDER BY event_type
    """,
)

shared_sql(
    "value_histogram",
    # fixed-width histogram via integer bucketing (portable, exact)
    """
    SELECT CAST(floor(CAST(round(value * 100) AS BIGINT) / 5000) AS BIGINT) AS bucket,
      count(*) AS n,
      min(CAST(round(value * 100) AS BIGINT)) AS lo_c,
      max(CAST(round(value * 100) AS BIGINT)) AS hi_c
    FROM events GROUP BY 1 ORDER BY bucket
    """,
)


shared_sql(
    "session_windows_native",
    # native session_window() (gap-based session assignment) checked
    # against the lag+cumsum construction: session end = last event + gap
    """
    SELECT user_id,
      unix_micros(session_window.start) AS sess_start_us,
      unix_micros(session_window.end) AS sess_end_us,
      count(*) AS n
    FROM events
    GROUP BY user_id, session_window(ts, '30 minutes')
    ORDER BY user_id, sess_start_us
    """,
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
             THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
      epoch_us(min(ts)) AS sess_start_us,
      epoch_us(max(ts)) + 1800000000 AS sess_end_us,
      count(*) AS n
    FROM numbered GROUP BY user_id, sid
    ORDER BY user_id, sess_start_us
    """,
)


shared_sql(
    "unpivot_stack",
    # unpivot: wide per-user counters -> (user_id, kind, n) long form
    """
    SELECT user_id, kind, n FROM (
      SELECT user_id,
        count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
        count(CASE WHEN event_type = 'view' THEN 1 END) AS views
      FROM events WHERE user_id < 20 GROUP BY user_id
    ) w
    LATERAL VIEW stack(2, 'clicks', clicks, 'views', views) t AS kind, n
    ORDER BY user_id, kind
    """,
    oracle="""
    WITH w AS (
      SELECT user_id,
        count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
        count(CASE WHEN event_type = 'view' THEN 1 END) AS views
      FROM events WHERE user_id < 20 GROUP BY user_id
    )
    SELECT user_id, kind, n FROM (
      SELECT user_id, 'clicks' AS kind, clicks AS n FROM w
      UNION ALL
      SELECT user_id, 'views' AS kind, views AS n FROM w
    ) ORDER BY user_id, kind
    """,
)


@query(
    "stream_interval_join",
    # Stream-stream watermarked interval join (VERDICT-r7 #2) — a REAL
    # two-source Structured Streaming run: clicks and purchases staged
    # as separate file-source streams (3 single-file micro-batches
    # each, partitioned BY USER user_id % 3 on BOTH sides so every
    # user's rows co-batch and no pair needs cross-batch state — the
    # harness device of stream_session_counts), inner-joined on user
    # with c_ts in (p_ts - 30min, p_ts]. Pinned semantics (probe in
    # tests/test_streaming.py::test_stream_interval_join_semantics):
    # the two sources advance together one file per trigger; intra-
    # batch left/right rows DO join; the late-event filter in batch N
    # uses the GLOBAL watermark through batch N-2, where the global
    # watermark is the MIN across both sources' watermark operators
    # (multipleWatermarkPolicy default) — so batch-2 rows on EITHER
    # side survive iff ts >= least(side-0 maxes) - 30min, and a pair
    # emits iff both sides survive. The oracle replays exactly that.
    oracle="""
    WITH wm0 AS (
      SELECT least(
        (SELECT max(ts) FROM events
         WHERE event_type = 'click' AND user_id % 3 = 0),
        (SELECT max(ts) FROM events
         WHERE event_type = 'purchase' AND user_id % 3 = 0)
      ) - INTERVAL 30 MINUTE AS w
    ),
    sc AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'click'
        AND (user_id % 3 IN (0, 1) OR ts >= (SELECT w FROM wm0))
    ),
    sp AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'purchase'
        AND (user_id % 3 IN (0, 1) OR ts >= (SELECT w FROM wm0))
    )
    SELECT p.event_id AS purchase_seq, c.event_id AS click_seq, p.user_id
    FROM sp p JOIN sc c ON c.user_id = p.user_id
      AND c.ts > p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
    ORDER BY purchase_seq, click_seq
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from .streaming.live import interval_join_streams

    ev = spark.table("events")
    clicks = ev.where("event_type = 'click'").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_seq"),
        F.col("ts").alias("c_ts"),
    )
    purch = ev.where("event_type = 'purchase'").select(
        "user_id",
        F.col("event_id").alias("purchase_seq"),
        F.col("ts").alias("p_ts"),
    )
    work = tempfile.mkdtemp(prefix="stream_ij_")
    try:
        cs = _staged_stream_source(
            spark, clicks, os.path.join(work, "c"), seq_col="click_seq",
            preds=tuple(F.col("c_user") % 3 == i for i in range(3)),
        )
        ps = _staged_stream_source(
            spark, purch, os.path.join(work, "p"), seq_col="purchase_seq",
            preds=tuple(F.col("user_id") % 3 == i for i in range(3)),
        )
        out = interval_join_streams(
            ps, cs, on="user_id = c_user", left_ts="p_ts", right_ts="c_ts",
            lookback="30 minutes", watermark="30 minutes",
        ).select("purchase_seq", "click_seq", "user_id")
        sink = _run_stream_to_memory(spark, out, work, output_mode="append")
        rows = sink.orderBy("purchase_seq", "click_seq").collect()
        return spark.createDataFrame(
            rows, "purchase_seq long, click_seq long, user_id long"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "stream_interval_join_left",
    # LEFT-OUTER stream-stream interval join — same two-source run as
    # stream_interval_join plus null-extension of unmatched purchases.
    # Empirically pinned null-emission rule (four probes, unified in
    # tests/test_streaming.py::test_stream_interval_join_left_boundary):
    # eviction in batch N uses the GLOBAL watermark at batch start
    # (min across both sources of floor-to-ms(max ts seen) - 30min),
    # and an unmatched surviving purchase null-emits iff
    # p_ts <= that watermark - 1ms (Spark's internal wm-1ms bound:
    # a row AT the watermark millisecond is held, anything below it
    # emits). Cumulatively the final threshold is the all-data global
    # watermark - 1ms — the trailing no-data batch runs exactly when
    # that value advanced past the last data batch's, and when it does
    # not run the two thresholds coincide, so no conditional is needed.
    # click_seq is coalesced to -1 on both engines (null ordering/
    # hashing parity).
    oracle="""
    WITH wm0 AS (
      SELECT least(
        (SELECT max(ts) FROM events
         WHERE event_type = 'click' AND user_id % 3 = 0),
        (SELECT max(ts) FROM events
         WHERE event_type = 'purchase' AND user_id % 3 = 0)
      ) - INTERVAL 30 MINUTE AS w
    ),
    fw AS (
      SELECT date_trunc('milliseconds', least(
        (SELECT max(ts) FROM events WHERE event_type = 'click'),
        (SELECT max(ts) FROM events WHERE event_type = 'purchase')
      )) - INTERVAL 30 MINUTE - INTERVAL 1 MILLISECOND AS w
    ),
    sc AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'click'
        AND (user_id % 3 IN (0, 1) OR ts >= (SELECT w FROM wm0))
    ),
    sp AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'purchase'
        AND (user_id % 3 IN (0, 1) OR ts >= (SELECT w FROM wm0))
    )
    SELECT p.event_id AS purchase_seq, c.event_id AS click_seq, p.user_id
    FROM sp p JOIN sc c ON c.user_id = p.user_id
      AND c.ts > p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
    UNION ALL
    SELECT p.event_id, -1, p.user_id
    FROM sp p
    WHERE NOT EXISTS (
        SELECT 1 FROM sc c WHERE c.user_id = p.user_id
          AND c.ts > p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
      )
      AND p.ts <= (SELECT w FROM fw)
    ORDER BY purchase_seq, click_seq
    """,
)
def stream_interval_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from .streaming.live import interval_join_streams

    ev = spark.table("events")
    clicks = ev.where("event_type = 'click'").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_seq"),
        F.col("ts").alias("c_ts"),
    )
    purch = ev.where("event_type = 'purchase'").select(
        "user_id",
        F.col("event_id").alias("purchase_seq"),
        F.col("ts").alias("p_ts"),
    )
    work = tempfile.mkdtemp(prefix="stream_ijl_")
    try:
        cs = _staged_stream_source(
            spark, clicks, os.path.join(work, "c"), seq_col="click_seq",
            preds=tuple(F.col("c_user") % 3 == i for i in range(3)),
        )
        ps = _staged_stream_source(
            spark, purch, os.path.join(work, "p"), seq_col="purchase_seq",
            preds=tuple(F.col("user_id") % 3 == i for i in range(3)),
        )
        out = interval_join_streams(
            ps, cs, on="user_id = c_user", left_ts="p_ts", right_ts="c_ts",
            lookback="30 minutes", watermark="30 minutes", how="left_outer",
        ).select(
            "purchase_seq",
            F.coalesce(F.col("click_seq"), F.lit(-1)).alias("click_seq"),
            "user_id",
        )
        sink = _run_stream_to_memory(spark, out, work, output_mode="append")
        rows = sink.orderBy("purchase_seq", "click_seq").collect()
        return spark.createDataFrame(
            rows, "purchase_seq long, click_seq long, user_id long"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "stream_static_enrich",
    # Stream-static broadcast enrichment (the dimension-lookup stage of
    # a live ingest) — a REAL streaming run over the 3-batch harness
    # joined per micro-batch to the STATIC customer dim. Stateless: no
    # watermark, no state, no late-data rules — every event passes
    # through exactly once with its enrichment, so the oracle is the
    # plain batch left join.
    oracle="""
    SELECT e.event_id, e.user_id,
      coalesce(c.c_mktsegment, 'none') AS segment,
      CAST(coalesce(c.c_nationkey, -1) AS BIGINT) AS nationkey
    FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
    ORDER BY e.event_id
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .streaming.live import enrich_stream_static

    ev = spark.table("events").select("event_id", "user_id")
    dim = spark.table("customer").select(
        F.col("c_custkey"), "c_mktsegment", "c_nationkey"
    )
    work = tempfile.mkdtemp(prefix="stream_enrich_")
    try:
        src = _staged_stream_source(spark, ev, work)
        out = enrich_stream_static(
            src, dim, on=F.col("user_id") == F.col("c_custkey")
        ).select(
            "event_id",
            "user_id",
            F.coalesce(F.col("c_mktsegment"), F.lit("none")).alias("segment"),
            F.coalesce(F.col("c_nationkey").cast("long"), F.lit(-1)).alias(
                "nationkey"
            ),
        )
        sink = _run_stream_to_memory(spark, out, work, output_mode="append")
        rows = sink.orderBy("event_id").collect()
        return spark.createDataFrame(
            rows, "event_id long, user_id long, segment string, nationkey long"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "stream_pdf_text",
    # Streaming INGEST-KERNEL leg (NEW r10, VERDICT-r9 #6): the office/
    # PDF batch extractors must compose with Structured Streaming —
    # this row runs synth -> REAL PDF parse (both Arrow mapInPandas
    # kernels, operators/pdf.py) INSIDE a streaming query over the
    # 3-batch staged harness. Stateless: no watermark, no state —
    # every document passes through exactly once, so the oracle is the
    # batch extraction replay (substr arithmetic). A kernel that
    # secretly depended on batch-only planning (e.g. a collect or a
    # non-incremental shuffle) would fail to run at all; a per-batch
    # decode divergence breaks the hash.
    oracle="""
    SELECT d.doc_id, CAST(s.p AS INT) AS page_idx,
      coalesce(substr(d.text, 60 * s.p + 1, 60), '') AS page_text,
      true AS ok
    FROM documents d, generate_series(0, 2) s(p)
    WHERE s.p < 1 + d.doc_id % 3
    ORDER BY d.doc_id, page_idx
    """,
)
def stream_pdf_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .operators import pdf as _pdf

    docs = spark.table("documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="stream_pdf_")
    try:
        src = _staged_stream_source(spark, docs, work, seq_col="doc_id")
        out = _pdf.pdf_text_pages(_pdf.with_synthetic_pdf_payload(src))
        sink = _run_stream_to_memory(spark, out, work, output_mode="append")
        rows = sink.orderBy("doc_id", "page_idx").collect()
        return spark.createDataFrame(
            rows, "doc_id long, page_idx int, page_text string, ok boolean"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "stream_eml_text",
    # Streaming mail-ingest leg (r10 — the stream_pdf_text device over
    # the EML kernel): synth -> REAL RFC 5322/MIME parse (both Arrow
    # mapInPandas kernels, operators/eml.py) inside a streaming query
    # over the 3-batch staged harness. Stateless pass-through, so the
    # oracle is the batch extraction replay (substr arithmetic); a
    # kernel that depended on batch-only planning would not run, and a
    # per-batch decode divergence breaks the hash.
    oracle="""
    SELECT d.doc_id,
      coalesce(substr(d.text, 1, 20), '') AS subject,
      CAST(p.i AS INT) AS part_idx,
      CASE p.i WHEN 0 THEN 'text/plain' ELSE 'text/html' END AS mime_type,
      CASE p.i
        WHEN 0 THEN coalesce(substr(d.text, 21, 60), '')
        ELSE coalesce(substr(d.text, 81, 60), '')
      END AS part_text,
      true AS ok
    FROM documents d, generate_series(0, 1) p(i)
    ORDER BY d.doc_id, part_idx
    """,
)
def stream_eml_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .operators import eml as _eml

    docs = spark.table("documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="stream_eml_")
    try:
        src = _staged_stream_source(spark, docs, work, seq_col="doc_id")
        out = _eml.eml_part_texts(_eml.with_synthetic_eml_payload(src))
        sink = _run_stream_to_memory(spark, out, work, output_mode="append")
        rows = sink.orderBy("doc_id", "part_idx").collect()
        return spark.createDataFrame(
            rows,
            "doc_id long, subject string, part_idx int, mime_type string, "
            "part_text string, ok boolean",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "stream_preference_pairs",
    # Streaming preference-pair mining (r10 third batch): new
    # generations STREAM in (documents -> synthetic generations, a
    # stateless explode) and are paired per micro-batch against the
    # STATIC candidate pool (the day's generation snapshot) via the
    # broadcast stream-static join — the production shape for online
    # reward-data refresh. The static side always holds every
    # candidate, so each streamed row emits exactly its margin-
    # filtered pairs once and the oracle is the batch pair-mining
    # replay (ns_preference_pairs' arithmetic).
    oracle="""
    WITH gens AS (
      SELECT CAST(d.doc_id AS BIGINT) AS prompt_id,
        CAST(m.m AS BIGINT) AS model_id,
        CAST((length(d.text) * (m.m + 7) + d.doc_id * (m.m + 3)
              + 13 * m.m * m.m) % 1001 AS BIGINT) AS score
      FROM documents d CROSS JOIN range(4) m(m)
    )
    SELECT a.prompt_id AS prompt_id, a.model_id AS chosen_model,
      b.model_id AS rejected_model,
      CAST(a.score - b.score AS BIGINT) AS margin
    FROM gens a JOIN gens b
      ON a.prompt_id = b.prompt_id AND a.score - b.score >= 40
    ORDER BY a.prompt_id, chosen_model, rejected_model
    """,
)
def stream_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .operators import preference as _pref
    from .streaming.live import enrich_stream_static

    docs = spark.table("documents").select("doc_id", "text")
    static_pool = (
        _pref.with_synthetic_generations(spark.table("documents"))
        .select(
            F.col("prompt_id").alias("s_prompt_id"),
            F.col("model_id").alias("s_model_id"),
            F.col("score").alias("s_score"),
        )
    )
    work = tempfile.mkdtemp(prefix="stream_pref_")
    try:
        src = _staged_stream_source(spark, docs, work, seq_col="doc_id")
        live_gens = _pref.with_synthetic_generations(src)
        out = enrich_stream_static(
            live_gens,
            static_pool,
            on=(F.col("prompt_id") == F.col("s_prompt_id"))
            & (F.col("score") - F.col("s_score") >= _pref.MIN_MARGIN),
            how="inner",
        ).select(
            "prompt_id",
            F.col("model_id").alias("chosen_model"),
            F.col("s_model_id").alias("rejected_model"),
            (F.col("score") - F.col("s_score")).cast("long").alias("margin"),
        )
        sink = _run_stream_to_memory(spark, out, work, output_mode="append")
        rows = sink.orderBy(
            "prompt_id", "chosen_model", "rejected_model"
        ).collect()
        return spark.createDataFrame(
            rows,
            "prompt_id long, chosen_model long, rejected_model long, "
            "margin long",
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
