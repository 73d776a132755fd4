"""Conversation / SFT data preparation — the instruction-tuning leg
of the training-data pipeline. Post-training corpora arrive as
multi-turn conversations (JSON arrays of ``{role, content}`` turns,
the de-facto chat interchange shape); before they reach a trainer they
need: flattening to per-turn rows, role-alternation validation,
chat-template rendering (one packed string per conversation with role
sentinels), and turn-level dedup (boilerplate assistant answers and
repeated user prompts are the dominant near-dup class in SFT sets).

Everything here is pure JVM-side Spark — ``from_json`` +
``posexplode`` for the flatten, window/aggregate built-ins for the
rest. No Python runs per row, so the operators inherit whole-stage
codegen and scale linearly; the only shuffles are the per-conversation
groupBy (template render) and the corpus-wide content-hash groupBy
(turn dedup), both on keys with natural cardinality.

Synthesis (:func:`with_synthetic_conversation`) builds the JSON column
from the documents corpus with ``to_json(array(struct(...)))`` — turn
t of doc d is text[30t : 30t+30) with roles alternating
user/assistant — so the DuckDB oracles replay every downstream
operator as substr arithmetic without trusting the JSON round trip.

Reference parity note: the reference engine (flumedb) has no chat
surface; this module is part of the training-data-pipeline layer the
build brief adds on top of the reference's operator inventory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "with_synthetic_conversation",
    "conversation_turns",
    "validate_alternation",
    "chat_template_render",
    "turn_dedup",
    "sft_turns_oracle_sql",
    "chat_template_oracle_sql",
    "turn_dedup_oracle_sql",
]

TURN_CHARS = 30
MAX_TURNS = 4  # 1 + doc_id % 4 turns per conversation

_TURN_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("role", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )
)

# the rendered-template sentinels (a generic ChatML-ish shape)
ROLE_OPEN = "<|"
ROLE_CLOSE = "|>"
TURN_SEP = "\n"


def _role(t: Column) -> Column:
    return F.when(t % 2 == 0, F.lit("user")).otherwise(F.lit("assistant"))


def with_synthetic_conversation(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """doc_id -> a JSON conversation column: turn t (t in 0 .. doc_id%4)
    has role user/assistant alternating and content text[30t : 30t+30).
    Built with to_json(transform(sequence(...))) — zero Python."""
    n_turns = F.lit(1) + F.col("doc_id") % MAX_TURNS
    turns = F.transform(
        F.sequence(F.lit(0), n_turns - 1),
        lambda t: F.struct(
            _role(t).alias("role"),
            F.substring(
                F.col(text_col).cast("string"),
                (t * TURN_CHARS + 1).cast("int"),
                TURN_CHARS,
            ).alias("content"),
        ),
    )
    return docs.select(
        "doc_id", F.to_json(turns).alias("conversation_json")
    )


def conversation_turns(
    convs: DataFrame, json_col: str = "conversation_json"
) -> DataFrame:
    """Flatten JSON conversations to per-turn rows (doc_id, turn_idx,
    role, content, n_words). from_json + posexplode — whole-stage
    codegen end to end; a malformed JSON document yields zero rows
    rather than failing the scan (from_json returns null)."""
    parsed = convs.select(
        "doc_id", F.from_json(F.col(json_col), _TURN_SCHEMA).alias("turns")
    )
    return parsed.select(
        "doc_id",
        F.posexplode("turns").alias("turn_idx", "turn"),
    ).select(
        "doc_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.col("turn.role").alias("role"),
        F.col("turn.content").alias("content"),
        F.size(F.split(F.col("turn.content"), " +")).cast("int").alias("n_words"),
    )


def validate_alternation(turns: DataFrame) -> DataFrame:
    """Per-conversation validation flags: starts_with_user,
    alternates (no role repeated consecutively), ends_with_assistant —
    the standard SFT hygiene gates. One groupBy, order carried by
    turn_idx aggregation, no window over unbounded input."""
    w = Window.partitionBy("doc_id").orderBy("turn_idx")
    flagged = turns.select(
        "doc_id",
        "turn_idx",
        "role",
        F.lag("role").over(w).alias("prev_role"),
    )
    return flagged.groupBy("doc_id").agg(
        F.min(F.when(F.col("turn_idx") == 0, F.col("role"))).alias("first_role"),
        F.max(F.struct("turn_idx", "role"))["role"].alias("last_role"),
        F.coalesce(
            F.min(
                F.when(F.col("prev_role").isNull(), None).otherwise(
                    F.col("role") != F.col("prev_role")
                )
            ),
            F.lit(True),
        ).alias("alternates"),
    ).select(
        "doc_id",
        (F.col("first_role") == "user").alias("starts_with_user"),
        "alternates",
        (F.col("last_role") == "assistant").alias("ends_with_assistant"),
    )


def chat_template_render(turns: DataFrame) -> DataFrame:
    """One packed training string per conversation:
    ``<|role|>content`` joined with newlines, in turn order, plus the
    turn count and rendered length. array_agg over a struct sorted by
    turn_idx keeps ordering deterministic inside a plain groupBy (no
    single-partition window)."""
    packed = turns.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "role", "content"))
        ).alias("ts")
    )
    rendered = F.array_join(
        F.transform(
            F.col("ts"),
            lambda s: F.concat(
                F.lit(ROLE_OPEN), s["role"], F.lit(ROLE_CLOSE), s["content"]
            ),
        ),
        TURN_SEP,
    )
    return packed.select(
        "doc_id",
        F.size("ts").alias("n_turns"),
        rendered.alias("rendered"),
        F.length(rendered).alias("rendered_len"),
    )


def turn_dedup(turns: DataFrame) -> DataFrame:
    """Corpus-wide turn-level exact dedup: group by (role,
    md5(content)), keep the first occurrence (min doc_id, then min
    turn_idx), count copies. The dominant SFT near-dup class is exact
    repeated turns, so this is the cheap first pass before MinHash.
    One hash-groupBy shuffle on a high-cardinality key — scales."""
    return (
        turns.groupBy(F.col("role"), F.md5("content").alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(F.struct("doc_id", "turn_idx"))["doc_id"].alias("first_doc_id"),
            F.min(F.struct("doc_id", "turn_idx"))["turn_idx"].alias(
                "first_turn_idx"
            ),
        )
        .select(
            "role", "content_hash", "n_copies", "first_doc_id", "first_turn_idx"
        )
    )


# ---------------------------------------------------------------------
# DuckDB oracles — replay from the documents table directly (substr
# arithmetic), not from the JSON round trip
# ---------------------------------------------------------------------

_TURNS_CTE = f"""
    turns AS (
      SELECT d.doc_id, CAST(s.t AS INT) AS turn_idx,
        CASE WHEN s.t % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
        coalesce(substr(d.text, {TURN_CHARS} * s.t + 1, {TURN_CHARS}), '')
          AS content
      FROM documents d, generate_series(0, {MAX_TURNS - 1}) s(t)
      WHERE s.t <= d.doc_id % {MAX_TURNS}
    )
"""


def sft_turns_oracle_sql() -> str:
    return f"""
    WITH {_TURNS_CTE}
    SELECT doc_id, turn_idx, role, content,
      CAST(len(regexp_split_to_array(content, ' +')) AS INT) AS n_words
    FROM turns ORDER BY doc_id, turn_idx
    """


def chat_template_oracle_sql() -> str:
    return f"""
    WITH {_TURNS_CTE}
    SELECT doc_id, CAST(count(*) AS INT) AS n_turns,
      string_agg('{ROLE_OPEN}' || role || '{ROLE_CLOSE}' || content,
                 '{TURN_SEP}' ORDER BY turn_idx) AS rendered,
      CAST(sum(len(role) + len(content) + 4) + count(*) - 1 AS INT)
        AS rendered_len
    FROM turns GROUP BY doc_id ORDER BY doc_id
    """


def turn_dedup_oracle_sql() -> str:
    return f"""
    WITH {_TURNS_CTE}
    SELECT role, md5(content) AS content_hash,
      count(*) AS n_copies,
      CAST(min(doc_id * {MAX_TURNS * 2} + turn_idx)
           // {MAX_TURNS * 2} AS BIGINT) AS first_doc_id,
      CAST(min(doc_id * {MAX_TURNS * 2} + turn_idx)
           % {MAX_TURNS * 2} AS INT) AS first_turn_idx
    FROM turns t GROUP BY role, content
    ORDER BY first_doc_id, first_turn_idx, role
    """


PACK_TOKENS = 512


def conversation_packing(turns: DataFrame, pack_size: int = PACK_TOKENS) -> DataFrame:
    """SFT batch assembly: pack rendered conversations into
    ``pack_size``-token training sequences with the concat-and-chunk
    discipline of ns_sequence_packing (a conversation belongs to the
    pack its FIRST token lands in). A conversation's cost is
    sum(n_words(content)) + 2 per turn (the role open/close
    sentinels). One aggregate per conversation, one global-order
    cumsum window (per-shard at 100 TB, same expression), one groupBy
    — all JVM built-ins."""
    per_conv = turns.groupBy("doc_id").agg(
        (F.sum("n_words") + 2 * F.count(F.lit(1)))
        .cast("long")
        .alias("conv_tokens")
    )
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = per_conv.select(
        "doc_id",
        "conv_tokens",
        F.floor(
            F.coalesce(F.sum("conv_tokens").over(w), F.lit(0)) / pack_size
        ).alias("pack_id"),
    )
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum("conv_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .select("pack_id", "n_convs", "pack_tokens", "first_doc", "last_doc")
    )


def sft_packing_oracle_sql(pack_size: int = PACK_TOKENS) -> str:
    """DuckDB replay: turns from substr arithmetic -> per-conversation
    token cost -> cumsum -> floor-division pack assignment."""
    return f"""
    WITH {_TURNS_CTE},
    per_conv AS (
      SELECT doc_id,
        CAST(sum(len(regexp_split_to_array(content, ' +')) + 2) AS BIGINT)
          AS conv_tokens
      FROM turns GROUP BY doc_id
    ),
    c AS (
      SELECT doc_id, conv_tokens,
        CAST(coalesce(sum(conv_tokens) OVER (
          ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ), 0) AS BIGINT) AS tok_before
      FROM per_conv
    )
    SELECT CAST(floor(tok_before / {pack_size}.0) AS BIGINT) AS pack_id,
      CAST(count(*) AS BIGINT) AS n_convs,
      CAST(sum(conv_tokens) AS BIGINT) AS pack_tokens,
      CAST(min(doc_id) AS BIGINT) AS first_doc,
      CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM c GROUP BY pack_id ORDER BY pack_id
    """


def packing_efficiency(
    packs: DataFrame, pack_size: int = PACK_TOKENS
) -> DataFrame:
    """Packing-efficiency report — the padding-waste diagnostic a
    trainer reads before fixing a sequence length: packs bucketed by
    fill decile (floor(pack_tokens * 10 / pack_size); overfull packs
    from conversation spill land in buckets >= 10), with pack counts
    and token extremes per bucket. One groupBy over the already-tiny
    packs frame; all integer arithmetic."""
    b = F.expr(f"CAST(pack_tokens * 10 div {pack_size} AS BIGINT)")
    return (
        packs.select(
            b.alias("fill_decile"),
            "pack_tokens",
            "n_convs",
        )
        .groupBy("fill_decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.min("pack_tokens").cast("long").alias("min_tokens"),
            F.max("pack_tokens").cast("long").alias("max_tokens"),
            F.sum("n_convs").cast("long").alias("n_convs"),
        )
    )


def packing_efficiency_oracle_sql(pack_size: int = PACK_TOKENS) -> str:
    """DuckDB replay: the full packing CTE chain, then the decile
    rollup."""
    return f"""
    WITH {_TURNS_CTE},
    per_conv AS (
      SELECT doc_id,
        CAST(sum(len(regexp_split_to_array(content, ' +')) + 2) AS BIGINT)
          AS conv_tokens
      FROM turns GROUP BY doc_id
    ),
    c AS (
      SELECT doc_id, conv_tokens,
        CAST(coalesce(sum(conv_tokens) OVER (
          ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ), 0) AS BIGINT) AS tok_before
      FROM per_conv
    ),
    packs AS (
      SELECT CAST(floor(tok_before / {pack_size}.0) AS BIGINT) AS pack_id,
        CAST(count(*) AS BIGINT) AS n_convs,
        CAST(sum(conv_tokens) AS BIGINT) AS pack_tokens
      FROM c GROUP BY pack_id
    )
    SELECT CAST(pack_tokens * 10 // {pack_size} AS BIGINT) AS fill_decile,
      CAST(count(*) AS BIGINT) AS n_packs,
      CAST(min(pack_tokens) AS BIGINT) AS min_tokens,
      CAST(max(pack_tokens) AS BIGINT) AS max_tokens,
      CAST(sum(n_convs) AS BIGINT) AS n_convs
    FROM packs GROUP BY 1 ORDER BY fill_decile
    """
