"""Iterative graph analytics: damped PageRank by power iteration.

The package already has the two canonical *component* algorithms
(`dedup.neardup_clusters` fixed-K label propagation,
`dedup.connected_components_star` alternating star contraction); this
module adds the canonical *centrality* algorithm, implemented the way
a 1000-executor Pregel-style job would run it:

- the edge list is the big distributed table, partitioned by ``src``;
- each iteration is one equi-join (ranks x out-degrees x edges) plus
  one ``groupBy(dst).sum`` — both map-side-combinable shuffles, no
  all-pairs anything, no driver-side per-node state;
- the only driver-visible value per iteration is the dangling-mass
  scalar (one-row aggregate), the same bounded probe shape as
  ``connected_components_star``'s convergence count;
- lineage is cut per iteration via ``localCheckpoint`` so K iterations
  do not re-execute the whole upstream chain (the classic iterative-
  algorithm lineage blowup).

EXACT-INTEGER ARITHMETIC so results are engine-portable and
oracle-checkable bit-for-bit (same discipline as the micro-nat ln()
quantization used by the BM25/DSIR/perplexity family): ranks live in
integer "rank units" summing to ~``total`` (default 1e9); each
iteration computes

    share(u)    = rank(u) DIV outdeg(u)                (integer div)
    inflow(v)   = SUM share(u) over edges u->v
    dangling    = SUM rank(u) over nodes with no out-edges
    rank'(v)    = ( (100-d)*(total DIV n)
                    + d*(inflow(v) + dangling DIV n) ) DIV 100

with d the damping numerator (default 85, i.e. 0.85). Every operation
is a BIGINT sum or floor-division of non-negative BIGINTs, so the
result is independent of partitioning, execution order, and engine —
a DuckDB oracle replays the identical arithmetic with unrolled CTEs.

100 TB shape: a web-scale graph has power-law IN-degree; the hot
reducer in ``groupBy(dst).sum(share)`` is a plain associative sum, so
Spark's partial aggregation (map-side combine) collapses each hot
destination to one partial row per map task before the shuffle — the
skew lever is already built into the plan (no salting needed for
sums). The ranks-side join key (``src``) is the UNIFORM side
(out-degree is bounded by fan-out policy in real crawls; and the join
is 1:1 rank-to-degree). Iterations: PageRank converges geometrically
in the damping factor; fixed K (power iteration) is the production
norm for ranking (relative order stabilizes long before values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 5,
    damping_num: int = 85,
    total: int = 1_000_000_000,
) -> DataFrame:
    """Damped PageRank over a directed graph, exact integer arithmetic.

    ``edges``: (src, dst) directed, duplicates allowed (deduped here);
    ``nodes``: (node_id) — every node, including isolated/dangling ones
    (dangling = no out-edges; their mass is redistributed uniformly).

    Returns (node_id, rank) with integer ranks in units of
    ``total / n`` resolution. ``0 <= damping_num <= 100``.
    """
    if not 0 <= damping_num <= 100:
        raise ValueError("damping_num must be in [0, 100]")
    if iterations < 0:
        raise ValueError("iterations must be >= 0")

    e = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    nodes = nodes.select(F.col("node_id").cast("long")).distinct()
    n = nodes.count()  # scalar; the node count is a job parameter
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    base = total // n  # uniform teleport mass per node (integer)

    # internal column is `rk` (never `rank`: that parses as the window
    # function inside F.expr's `div` arithmetic)
    ranks = nodes.select("node_id", F.lit(base).cast("long").alias("rk"))
    for _ in range(iterations):
        ranks = ranks.localCheckpoint(eager=True)  # cut lineage per iter
        with_deg = ranks.join(
            outdeg, ranks["node_id"] == outdeg["src"], "left"
        ).select("node_id", "rk", "outdeg")
        # dangling mass: one-row aggregate (bounded driver probe)
        dangling = (
            with_deg.where(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("rk"), F.lit(0)).alias("s"))
            .collect()[0]["s"]
        )
        inflow = (
            with_deg.where(F.col("outdeg").isNotNull())
            .withColumn("share", F.expr("rk div outdeg"))
            .join(e, with_deg["node_id"] == e["src"])
            .groupBy("dst")
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, nodes["node_id"] == inflow["dst"], "left")
            .select(
                "node_id",
                (
                    F.lit((100 - damping_num) * base)
                    + F.lit(damping_num)
                    * (F.coalesce(F.col("inflow"), F.lit(0)) + F.lit(int(dangling) // n))
                ).alias("_num"),
            )
            .select("node_id", F.expr("_num div 100").cast("long").alias("rk"))
        )
    return ranks.select("node_id", F.col("rk").alias("rank"))
