"""Preference / RLHF data preparation — the reward-model leg of the
training-data pipeline. Post-training needs, beyond SFT conversations
(operators/conversations.py): pairwise preference construction
(chosen/rejected with a score margin), per-model-pair win-rate
matrices, Bradley-Terry strength estimation over the comparison graph,
and inter-annotator agreement (Fleiss' kappa) for label QC.

Everything is JVM-side Spark built-ins. The distributed-heavy steps
are the per-prompt self-join (bounded fan-out: K generations per
prompt, so K^2 pairs per key — linear in the corpus) and the
corpus-wide groupBy aggregations; the Bradley-Terry iteration then
runs over the per-model frame (K_MODELS rows — kilobytes), the same
aggregate-once-iterate-small shape as quality_clf's LR trainer.

EXACT-INTEGER ARITHMETIC throughout (the micro-unit discipline of
operators/graph.py pagerank and quality_clf): scores are integers,
win rates / BT strengths / kappa are micro-units produced by integral
division (`div` on DECIMAL(38,0) in Spark, `//` on HUGEINT in DuckDB
— identical truncation for the non-negative operands used here), so
results are independent of partitioning, execution order, and engine.

Synthesis (:func:`with_synthetic_generations`,
:func:`with_synthetic_annotations`) derives deterministic fixtures
from the documents corpus with pure ``length``/modulo arithmetic, so
the DuckDB oracles replay every downstream operator closed-form.

Reference parity note: the reference engine (flumedb) has no
preference surface; this module is part of the training-data-pipeline
layer the build brief adds on top of the reference's operator
inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_synthetic_generations",
    "with_synthetic_annotations",
    "preference_pairs",
    "winrate_matrix",
    "bt_scores",
    "fleiss_kappa",
    "length_bias",
    "best_of_n",
    "group_advantage",
    "preference_pairs_oracle_sql",
    "winrate_matrix_oracle_sql",
    "bt_scores_oracle_sql",
    "fleiss_kappa_oracle_sql",
    "length_bias_oracle_sql",
    "best_of_n_oracle_sql",
    "group_advantage_oracle_sql",
]

K_MODELS = 4
SCORE_MOD = 1001
MIN_MARGIN = 40
N_RATERS = 5
N_CATS = 3
MICRO = 1_000_000
# BT fixed-point: theta lives in MICRO units; per-pair terms carry an
# extra 1e12 so the integral divide keeps 6 significant digits
_BT_BIG = 1_000_000_000_000
BT_ITERATIONS = 3


def with_synthetic_generations(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """prompt_id x K_MODELS candidate generations with deterministic
    integer scores: score(m) = (len(text)*(m+7) + doc_id*(m+3) +
    13*m^2) mod SCORE_MOD. Pure length/modulo arithmetic so DuckDB
    replays it closed-form; ties across models are possible by
    construction (the margin filter has to do real work)."""
    g = docs.select(
        F.col("doc_id").cast("long").alias("prompt_id"),
        F.length(F.col(text_col)).cast("long").alias("_len"),
        F.explode(F.sequence(F.lit(0), F.lit(K_MODELS - 1))).alias("_m"),
    ).withColumn("model_id", F.col("_m").cast("long"))
    score = (
        g["_len"] * (g.model_id + 7)
        + g.prompt_id * (g.model_id + 3)
        + 13 * g.model_id * g.model_id
    ) % SCORE_MOD
    # deterministic generation length proxy (for verbosity-bias QC):
    # base length plus a per-model offset and a score-coupled term so
    # longer-wins is neither 0 nor 1 by construction
    gen_len = g["_len"] + 37 * g.model_id + score % 53
    return g.select(
        "prompt_id",
        "model_id",
        score.cast("long").alias("score"),
        gen_len.cast("long").alias("gen_len"),
    )


_GENS_CTE = f"""
    gens AS (
      SELECT prompt_id, model_id, score,
        CAST(base_len + 37 * model_id + score % 53 AS BIGINT) AS gen_len
      FROM (
        SELECT CAST(d.doc_id AS BIGINT) AS prompt_id,
          CAST(m.m AS BIGINT) AS model_id,
          CAST(length(d.text) AS BIGINT) AS base_len,
          CAST((length(d.text) * (m.m + 7) + d.doc_id * (m.m + 3)
                + 13 * m.m * m.m) % {SCORE_MOD} AS BIGINT) AS score
        FROM documents d CROSS JOIN range({K_MODELS}) m(m)
      )
    )
"""


def preference_pairs(
    gens: DataFrame, min_margin: int = MIN_MARGIN
) -> DataFrame:
    """(chosen, rejected) per prompt where the score gap is at least
    ``min_margin`` — the standard reward-model pair-mining rule (drop
    ties and near-ties; they carry label noise, Bradley & Terry 1952 /
    InstructGPT-style pair construction). Self-equi-join on the prompt
    key with bounded per-key fan-out (K^2) — linear at 100 TB, and the
    shuffle is the one prompt-key co-partition both sides share."""
    a, b = gens.alias("a"), gens.alias("b")
    return (
        a.join(
            b,
            (F.col("a.prompt_id") == F.col("b.prompt_id"))
            & (F.col("a.score") - F.col("b.score") >= min_margin),
        )
        .select(
            F.col("a.prompt_id").alias("prompt_id"),
            F.col("a.model_id").alias("chosen_model"),
            F.col("b.model_id").alias("rejected_model"),
            F.col("a.score").alias("chosen_score"),
            F.col("b.score").alias("rejected_score"),
            (F.col("a.score") - F.col("b.score")).cast("long").alias("margin"),
        )
    )


def preference_pairs_oracle_sql(min_margin: int = MIN_MARGIN) -> str:
    return f"""
    WITH {_GENS_CTE}
    SELECT a.prompt_id AS prompt_id, a.model_id AS chosen_model,
      b.model_id AS rejected_model, a.score AS chosen_score,
      b.score AS rejected_score,
      CAST(a.score - b.score AS BIGINT) AS margin
    FROM gens a JOIN gens b
      ON a.prompt_id = b.prompt_id AND a.score - b.score >= {min_margin}
    ORDER BY a.prompt_id, chosen_model, rejected_model
    """


def winrate_matrix(pairs: DataFrame) -> DataFrame:
    """Per unordered model pair (model_a < model_b): wins each way,
    total games, and model_a's win rate in micro-units (exact integral
    divide of two counts). One groupBy over the pairs table — the
    matrix itself is K^2 rows."""
    wins = pairs.groupBy("chosen_model", "rejected_model").agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )
    canon = wins.select(
        F.least("chosen_model", "rejected_model").alias("model_a"),
        F.greatest("chosen_model", "rejected_model").alias("model_b"),
        F.when(F.col("chosen_model") < F.col("rejected_model"), F.col("w"))
        .otherwise(F.lit(0))
        .alias("wa"),
        F.when(F.col("chosen_model") > F.col("rejected_model"), F.col("w"))
        .otherwise(F.lit(0))
        .alias("wb"),
    )
    return (
        canon.groupBy("model_a", "model_b")
        .agg(
            F.sum("wa").cast("long").alias("wins_a"),
            F.sum("wb").cast("long").alias("wins_b"),
        )
        .select(
            "model_a",
            "model_b",
            "wins_a",
            "wins_b",
            (F.col("wins_a") + F.col("wins_b")).cast("long").alias("games"),
            F.expr(
                f"CAST(CAST(wins_a AS DECIMAL(38,0)) * {MICRO} "
                "div (wins_a + wins_b) AS BIGINT)"
            ).alias("winrate_a_micro"),
        )
    )


def winrate_matrix_oracle_sql(min_margin: int = MIN_MARGIN) -> str:
    return f"""
    WITH {_GENS_CTE},
    pairs AS (
      SELECT a.model_id AS chosen_model, b.model_id AS rejected_model
      FROM gens a JOIN gens b
        ON a.prompt_id = b.prompt_id AND a.score - b.score >= {min_margin}
    ),
    canon AS (
      SELECT least(chosen_model, rejected_model) AS model_a,
        greatest(chosen_model, rejected_model) AS model_b,
        CAST(sum(CASE WHEN chosen_model < rejected_model THEN 1 ELSE 0 END)
             AS BIGINT) AS wins_a,
        CAST(sum(CASE WHEN chosen_model > rejected_model THEN 1 ELSE 0 END)
             AS BIGINT) AS wins_b
      FROM pairs GROUP BY 1, 2
    )
    SELECT model_a, model_b, wins_a, wins_b,
      CAST(wins_a + wins_b AS BIGINT) AS games,
      CAST(CAST(wins_a AS HUGEINT) * {MICRO} // (wins_a + wins_b)
           AS BIGINT) AS winrate_a_micro
    FROM canon ORDER BY model_a, model_b
    """


def bt_scores(
    pairs: DataFrame, iterations: int = BT_ITERATIONS
) -> DataFrame:
    """Bradley-Terry strengths by the MM (minorization-maximization)
    update, fixed ``iterations`` from a uniform start (Hunter 2004):

        theta_i <- wins_i / sum_j n_ij / (theta_i + theta_j)

    in micro-units with integral divides, so the trajectory is exact
    and the DuckDB oracle unrolls it as CTEs (the pagerank/LR device).
    The comparison graph is aggregated ONCE from the distributed pairs
    table (two groupBys); the iteration then joins K_MODELS-row frames
    — broadcast-sized regardless of corpus scale. Zero-win models
    floor at theta = 1 so divisors stay positive."""
    models = (
        pairs.select(F.col("chosen_model").alias("model_id"))
        .union(pairs.select(F.col("rejected_model").alias("model_id")))
        .distinct()
    )
    wins = models.join(
        pairs.groupBy(F.col("chosen_model").alias("model_id")).agg(
            F.count(F.lit(1)).cast("long").alias("w")
        ),
        "model_id",
        "left",
    ).select(
        "model_id", F.coalesce(F.col("w"), F.lit(0)).cast("long").alias("wins")
    )
    games = pairs.groupBy(
        F.least("chosen_model", "rejected_model").alias("i"),
        F.greatest("chosen_model", "rejected_model").alias("j"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    both = games.select("i", "j", "n").union(
        games.select(F.col("j").alias("i"), F.col("i").alias("j"), "n")
    )
    theta = models.select(
        "model_id", F.lit(MICRO).cast("long").alias("theta")
    )
    for _ in range(iterations):
        t = (
            both.join(
                theta.select(
                    F.col("model_id").alias("i"), F.col("theta").alias("th_i")
                ),
                "i",
            )
            .join(
                theta.select(
                    F.col("model_id").alias("j"), F.col("theta").alias("th_j")
                ),
                "j",
            )
            .select(
                F.col("i").alias("model_id"),
                F.expr(
                    f"CAST(CAST(n AS DECIMAL(38,0)) * {_BT_BIG} "
                    "div (th_i + th_j) AS DECIMAL(38,0))"
                ).alias("term"),
            )
        )
        denom = t.groupBy("model_id").agg(F.sum("term").alias("denom"))
        theta = (
            wins.join(denom, "model_id")
            .select(
                "model_id",
                F.greatest(
                    F.lit(1).cast("long"),
                    F.expr(
                        f"CAST(CAST(wins AS DECIMAL(38,0)) * {_BT_BIG} "
                        "div denom AS BIGINT)"
                    ),
                ).alias("theta"),
            )
        )
    return wins.join(theta, "model_id").select(
        "model_id", "wins", F.col("theta").alias("bt_micro")
    )


def bt_scores_oracle_sql(
    min_margin: int = MIN_MARGIN, iterations: int = BT_ITERATIONS
) -> str:
    ctes = [
        _GENS_CTE.strip(),
        f"""pairs AS (
      SELECT a.model_id AS chosen_model, b.model_id AS rejected_model
      FROM gens a JOIN gens b
        ON a.prompt_id = b.prompt_id AND a.score - b.score >= {min_margin}
    )""",
        """models AS (
      SELECT DISTINCT chosen_model AS model_id FROM pairs
      UNION SELECT DISTINCT rejected_model FROM pairs
    )""",
        """wins AS (
      SELECT m.model_id, CAST(coalesce(w.c, 0) AS BIGINT) AS wins
      FROM models m LEFT JOIN (
        SELECT chosen_model, count(*) AS c FROM pairs GROUP BY 1
      ) w ON w.chosen_model = m.model_id
    )""",
        """games AS (
      SELECT least(chosen_model, rejected_model) AS i,
        greatest(chosen_model, rejected_model) AS j,
        CAST(count(*) AS BIGINT) AS n
      FROM pairs GROUP BY 1, 2
    )""",
        """bidir AS (
      SELECT i, j, n FROM games UNION ALL SELECT j, i, n FROM games
    )""",
        f"""t0 AS (SELECT model_id, CAST({MICRO} AS BIGINT) AS theta
      FROM models)""",
    ]
    prev = "t0"
    for k in range(1, iterations + 1):
        ctes.append(
            f"""d{k} AS (
      SELECT b.i AS model_id,
        sum(CAST(CAST(b.n AS HUGEINT) * {_BT_BIG}
                 // (ta.theta + tb.theta) AS HUGEINT)) AS denom
      FROM bidir b
      JOIN {prev} ta ON ta.model_id = b.i
      JOIN {prev} tb ON tb.model_id = b.j
      GROUP BY 1
    )"""
        )
        ctes.append(
            f"""t{k} AS (
      SELECT w.model_id,
        greatest(CAST(1 AS BIGINT),
          CAST(CAST(w.wins AS HUGEINT) * {_BT_BIG} // d{k}.denom
               AS BIGINT)) AS theta
      FROM wins w JOIN d{k} ON d{k}.model_id = w.model_id
    )"""
        )
        prev = f"t{k}"
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT w.model_id, w.wins, t.theta AS bt_micro
    FROM wins w JOIN {prev} t ON t.model_id = w.model_id
    ORDER BY w.model_id
    """
    )


def with_synthetic_annotations(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """N_RATERS categorical labels per document for agreement QC:
    cat(r) = (doc_id*(r+2) + len(text)*(r+1) + 7*r) mod N_CATS —
    deterministic, engine-portable, with real disagreement by
    construction."""
    a = docs.select(
        F.col("doc_id").cast("long").alias("item_id"),
        F.length(F.col(text_col)).cast("long").alias("_len"),
        F.explode(F.sequence(F.lit(0), F.lit(N_RATERS - 1))).alias("_r"),
    ).withColumn("rater_id", F.col("_r").cast("long"))
    cat = (
        a.item_id * (a.rater_id + 2)
        + a["_len"] * (a.rater_id + 1)
        + 7 * a.rater_id
    ) % N_CATS
    return a.select("item_id", "rater_id", cat.cast("long").alias("category"))


_ANN_CTE = f"""
    ann AS (
      SELECT CAST(d.doc_id AS BIGINT) AS item_id,
        CAST(r.r AS BIGINT) AS rater_id,
        CAST((d.doc_id * (r.r + 2) + length(d.text) * (r.r + 1)
              + 7 * r.r) % {N_CATS} AS BIGINT) AS category
      FROM documents d CROSS JOIN range({N_RATERS}) r(r)
    )
"""


def fleiss_kappa(annotations: DataFrame) -> DataFrame:
    """Fleiss' kappa (1971) over (item_id, rater_id, category) rows,
    exact micro-unit arithmetic:

        P_bar  = (sum_i sum_k n_ik^2 - N*R) / (N*R*(R-1))
        P_e    = sum_k (c_k / (N*R))^2
        kappa  = (P_bar - P_e) / (1 - P_e)

    All three as integral divides of exact BIGINT/DECIMAL aggregates
    (numerators widened to DECIMAL(38,0): c_k^2 wraps int64 at the
    100 TB posture). kappa can be negative (worse-than-chance), where
    DuckDB's `//` floors but Spark's `div` truncates toward zero — the
    sign is factored out before the divide so both engines agree.
    Two groupBys over the annotation table; the final fold is one row."""
    nik = annotations.groupBy("item_id", "category").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    per_item = nik.groupBy("item_id").agg(
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sq"),
        F.sum("n").cast("long").alias("r"),
    )
    totals = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("sq").cast("long").alias("sum_sq"),
        F.sum("r").cast("long").alias("nr"),
    )
    ck = nik.groupBy("category").agg(F.sum("n").cast("long").alias("c"))
    ck_sq = ck.agg(
        F.sum(
            F.expr("CAST(CAST(c AS DECIMAL(38,0)) * c AS DECIMAL(38,0))")
        ).alias("sum_c_sq")
    )
    # R derived from the data (nr div n_items), not assumed — the
    # module works for any uniform rater count, not just the synthetic
    # N_RATERS fixture
    joined = totals.crossJoin(F.broadcast(ck_sq)).select(
        "n_items",
        F.expr("CAST(nr div n_items AS BIGINT)").alias("n_raters"),
        F.expr(
            f"CAST((CAST(sum_sq AS DECIMAL(38,0)) - nr) * {MICRO} "
            "div (CAST(nr AS DECIMAL(38,0)) "
            "* (nr div n_items - 1)) AS BIGINT)"
        ).alias("p_bar_micro"),
        F.expr(
            f"CAST(CAST(sum_c_sq AS DECIMAL(38,0)) * {MICRO} "
            "div (CAST(nr AS DECIMAL(38,0)) * nr) AS BIGINT)"
        ).alias("p_e_micro"),
    )
    num = F.col("p_bar_micro") - F.col("p_e_micro")
    den = F.lit(MICRO) - F.col("p_e_micro")
    mag = F.expr(
        f"CAST(CAST(abs(p_bar_micro - p_e_micro) AS DECIMAL(38,0)) "
        f"* {MICRO} div ({MICRO} - p_e_micro) AS BIGINT)"
    )
    return joined.select(
        "n_items",
        "n_raters",
        "p_bar_micro",
        "p_e_micro",
        (F.when(num < 0, -mag).otherwise(mag)).cast("long").alias("kappa_micro"),
    )


def fleiss_kappa_oracle_sql() -> str:
    return f"""
    WITH {_ANN_CTE},
    nik AS (
      SELECT item_id, category, CAST(count(*) AS BIGINT) AS n
      FROM ann GROUP BY 1, 2
    ),
    per_item AS (
      SELECT item_id, CAST(sum(n * n) AS BIGINT) AS sq,
        CAST(sum(n) AS BIGINT) AS r
      FROM nik GROUP BY 1
    ),
    totals AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
        CAST(sum(sq) AS BIGINT) AS sum_sq, CAST(sum(r) AS BIGINT) AS nr
      FROM per_item
    ),
    cksq AS (
      SELECT sum(CAST(c AS HUGEINT) * c) AS sum_c_sq FROM (
        SELECT CAST(sum(n) AS BIGINT) AS c FROM nik GROUP BY category
      )
    ),
    micro AS (
      SELECT n_items, CAST(nr // n_items AS BIGINT) AS n_raters,
        CAST((CAST(sum_sq AS HUGEINT) - nr) * {MICRO}
             // (CAST(nr AS HUGEINT) * (nr // n_items - 1))
             AS BIGINT) AS p_bar_micro,
        CAST(CAST(sum_c_sq AS HUGEINT) * {MICRO}
             // (CAST(nr AS HUGEINT) * nr) AS BIGINT) AS p_e_micro
      FROM totals, cksq
    )
    SELECT n_items, n_raters, p_bar_micro, p_e_micro,
      CAST(CASE WHEN p_bar_micro < p_e_micro
        THEN -(CAST(p_e_micro - p_bar_micro AS HUGEINT) * {MICRO}
               // ({MICRO} - p_e_micro))
        ELSE CAST(p_bar_micro - p_e_micro AS HUGEINT) * {MICRO}
             // ({MICRO} - p_e_micro)
        END AS BIGINT) AS kappa_micro
    FROM micro
    """


def length_bias(
    gens_with_len: DataFrame, min_margin: int = MIN_MARGIN
) -> DataFrame:
    """Verbosity-bias diagnostics for mined preference pairs — the
    standard reward-model QC check (does "longer" predict "chosen"?).
    Per unordered model pair: pair count, how often the chosen
    response is the longer one (count + micro-rate), and the exact
    covariance between score margin and signed length difference in
    micro-units:

        cov = (n * sum(margin*dlen) - sum(margin)*sum(dlen)) / n^2

    computed entirely from BIGINT sums with DECIMAL(38,0) widening
    before the one integral divide (sign factored out — Spark `div`
    truncates, DuckDB `//` floors). Same bounded self-equi-join shape
    as :func:`preference_pairs`; one groupBy to a K^2-row result."""
    a, b = gens_with_len.alias("a"), gens_with_len.alias("b")
    pairs = a.join(
        b,
        (F.col("a.prompt_id") == F.col("b.prompt_id"))
        & (F.col("a.score") - F.col("b.score") >= min_margin),
    ).select(
        F.least("a.model_id", "b.model_id").alias("model_a"),
        F.greatest("a.model_id", "b.model_id").alias("model_b"),
        (F.col("a.score") - F.col("b.score")).cast("long").alias("margin"),
        (F.col("a.gen_len") - F.col("b.gen_len")).cast("long").alias("dlen"),
    )
    agg = pairs.groupBy("model_a", "model_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("dlen") > 0, 1).otherwise(0))
        .cast("long")
        .alias("chosen_longer"),
        F.sum("margin").cast("long").alias("s_m"),
        F.sum("dlen").cast("long").alias("s_d"),
        F.sum(
            F.expr("CAST(CAST(margin AS DECIMAL(38,0)) * dlen AS DECIMAL(38,0))")
        ).alias("s_md"),
    )
    cov_num = F.expr(
        "CAST(n_pairs AS DECIMAL(38,0)) * s_md "
        "- CAST(s_m AS DECIMAL(38,0)) * s_d"
    )
    cov_mag = F.expr(
        f"CAST(abs(CAST(n_pairs AS DECIMAL(38,0)) * s_md "
        f"- CAST(s_m AS DECIMAL(38,0)) * s_d) * {MICRO} "
        "div (CAST(n_pairs AS DECIMAL(38,0)) * n_pairs) AS BIGINT)"
    )
    return agg.select(
        "model_a",
        "model_b",
        "n_pairs",
        "chosen_longer",
        F.expr(
            f"CAST(CAST(chosen_longer AS DECIMAL(38,0)) * {MICRO} "
            "div n_pairs AS BIGINT)"
        ).alias("chosen_longer_micro"),
        (F.when(cov_num < 0, -cov_mag).otherwise(cov_mag))
        .cast("long")
        .alias("cov_margin_dlen_micro"),
    )


def length_bias_oracle_sql(min_margin: int = MIN_MARGIN) -> str:
    return f"""
    WITH {_GENS_CTE},
    pairs AS (
      SELECT least(a.model_id, b.model_id) AS model_a,
        greatest(a.model_id, b.model_id) AS model_b,
        CAST(a.score - b.score AS BIGINT) AS margin,
        CAST(a.gen_len - b.gen_len AS BIGINT) AS dlen
      FROM gens a JOIN gens b
        ON a.prompt_id = b.prompt_id AND a.score - b.score >= {min_margin}
    ),
    agg AS (
      SELECT model_a, model_b, CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(sum(CASE WHEN dlen > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS chosen_longer,
        CAST(sum(margin) AS BIGINT) AS s_m,
        CAST(sum(dlen) AS BIGINT) AS s_d,
        sum(CAST(margin AS HUGEINT) * dlen) AS s_md
      FROM pairs GROUP BY 1, 2
    )
    SELECT model_a, model_b, n_pairs, chosen_longer,
      CAST(CAST(chosen_longer AS HUGEINT) * {MICRO} // n_pairs AS BIGINT)
        AS chosen_longer_micro,
      CAST(CASE WHEN CAST(n_pairs AS HUGEINT) * s_md
                     - CAST(s_m AS HUGEINT) * s_d < 0
        THEN -((-(CAST(n_pairs AS HUGEINT) * s_md
                  - CAST(s_m AS HUGEINT) * s_d)) * {MICRO}
               // (CAST(n_pairs AS HUGEINT) * n_pairs))
        ELSE (CAST(n_pairs AS HUGEINT) * s_md
              - CAST(s_m AS HUGEINT) * s_d) * {MICRO}
             // (CAST(n_pairs AS HUGEINT) * n_pairs)
        END AS BIGINT) AS cov_margin_dlen_micro
    FROM agg ORDER BY model_a, model_b
    """


def best_of_n(gens: DataFrame) -> DataFrame:
    """Best-of-N selection — the rejection-sampling primitive (pick
    the top-scored generation per prompt; BoN distillation keeps it,
    optionally gated on the margin over the runner-up as a confidence
    filter). One per-prompt window over K bounded rows (the partition
    key is the prompt — no unpartitioned window, no skew: every key
    has exactly K rows), deterministic tiebreak (score DESC, model_id
    ASC). Returns the winner with the runner-up score and the BoN
    margin."""
    from pyspark.sql import Window

    w = Window.partitionBy("prompt_id").orderBy(
        F.desc("score"), F.asc("model_id")
    )
    ranked = gens.select(
        "prompt_id",
        "model_id",
        "score",
        F.row_number().over(w).alias("_rk"),
        F.lead("score").over(w).alias("_runnerup"),
    )
    return ranked.where(F.col("_rk") == 1).select(
        "prompt_id",
        F.col("model_id").alias("best_model"),
        F.col("score").alias("best_score"),
        F.coalesce(F.col("_runnerup"), F.col("score"))
        .cast("long")
        .alias("runnerup_score"),
        (
            F.col("score")
            - F.coalesce(F.col("_runnerup"), F.col("score"))
        )
        .cast("long")
        .alias("bon_margin"),
    )


def best_of_n_oracle_sql() -> str:
    return f"""
    WITH {_GENS_CTE},
    ranked AS (
      SELECT prompt_id, model_id, score,
        row_number() OVER w AS rk,
        lead(score) OVER w AS runnerup
      FROM gens
      WINDOW w AS (PARTITION BY prompt_id
                   ORDER BY score DESC, model_id ASC)
    )
    SELECT prompt_id, model_id AS best_model, score AS best_score,
      CAST(coalesce(runnerup, score) AS BIGINT) AS runnerup_score,
      CAST(score - coalesce(runnerup, score) AS BIGINT) AS bon_margin
    FROM ranked WHERE rk = 1 ORDER BY prompt_id
    """


def group_advantage(gens: DataFrame) -> DataFrame:
    """Group-relative advantage — the GRPO-style signal (each
    generation scored against its own prompt group's mean instead of
    a learned value baseline):

        adv = score - mean(score over the prompt's K generations)

    in exact micro-units: adv_micro = (K*score - sum_scores) * 1e6
    div K with the sign factored out of the truncating divide. One
    per-prompt aggregate joined back (bounded K rows per key — at
    scale this is a map-side-combinable groupBy plus one co-
    partitioned equi-join); the group min/max ride along as the
    degenerate-group filter (a group with zero spread carries no
    signal)."""
    stats = gens.groupBy("prompt_id").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("score").cast("long").alias("s_sum"),
        F.min("score").cast("long").alias("s_min"),
        F.max("score").cast("long").alias("s_max"),
    )
    j = gens.join(stats, "prompt_id")
    num = F.col("k") * F.col("score") - F.col("s_sum")
    mag = F.expr(
        f"CAST(CAST(abs(k * score - s_sum) AS DECIMAL(38,0)) * {MICRO} "
        "div k AS BIGINT)"
    )
    return j.select(
        "prompt_id",
        "model_id",
        "score",
        (F.when(num < 0, -mag).otherwise(mag))
        .cast("long")
        .alias("adv_micro"),
        (F.col("s_max") - F.col("s_min")).cast("long").alias("group_range"),
    )


def group_advantage_oracle_sql() -> str:
    return f"""
    WITH {_GENS_CTE},
    stats AS (
      SELECT prompt_id, CAST(count(*) AS BIGINT) AS k,
        CAST(sum(score) AS BIGINT) AS s_sum,
        CAST(min(score) AS BIGINT) AS s_min,
        CAST(max(score) AS BIGINT) AS s_max
      FROM gens GROUP BY 1
    )
    SELECT g.prompt_id AS prompt_id, g.model_id, g.score,
      CAST(CASE WHEN s.k * g.score - s.s_sum < 0
        THEN -(CAST(s.s_sum - s.k * g.score AS HUGEINT) * {MICRO} // s.k)
        ELSE CAST(s.k * g.score - s.s_sum AS HUGEINT) * {MICRO} // s.k
        END AS BIGINT) AS adv_micro,
      CAST(s.s_max - s.s_min AS BIGINT) AS group_range
    FROM gens g JOIN stats s ON s.prompt_id = g.prompt_id
    ORDER BY g.prompt_id, g.model_id
    """
