"""Metrics observability pipeline — the ops an event stream grows once
people depend on it, composed end-to-end over the events table:

    raw events
      --> profile_columns        (ingest-boundary validation: assert
                                  over the profile DATA, fail the batch
                                  on contract drift)
      --> mad_outliers           (robust per-user anomaly flags:
                                  lower-median + MAD, burst-resistant)
      --> gapfill_locf           (regularize to an hourly grid with
                                  LOCF so downstream windows see one
                                  row per (user, hour))
      --> pagerank               (who matters: centrality over the
                                  customer<->supplier purchase graph)

Each stage asserts its own invariants (not just prints): completeness
contract, outlier subset-of-events, grid density == span, rank mass
conservation. Run:

    PYTHONPATH=/root/repo python examples/metrics_observability_pipeline.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import flumedb_spark as fs
from flumedb_spark.operators.graph import pagerank
from flumedb_spark.operators.profile import profile_columns
from flumedb_spark.operators.timeseries import gapfill_locf, mad_outliers

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = fs.get_spark("metrics_pipeline", cpus=8)
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    # 1) validate the batch BEFORE anything consumes it: checks are
    #    asserts over the profile DataFrame, so adding a contract is
    #    adding a row filter, not new plumbing
    prof = {r["col_name"]: r for r in profile_columns(events).collect()}
    assert prof["event_id"]["completeness"] == 1.0, "event_id must be total"
    assert prof["event_id"]["n_distinct"] == prof["event_id"]["n_rows"], (
        "event_id must be unique"
    )
    assert prof["ts"]["completeness"] == 1.0, "ts must be total"
    print(
        f"profile ok: {prof['event_id']['n_rows']} rows, "
        f"{len(prof)} columns validated"
    )

    # 2) robust anomaly flags (report, don't drop: anomalies are often
    #    the signal in an observability pipeline)
    flags = mad_outliers(
        events, key_col="user_id", value_col="value", tiebreak_col="event_id"
    ).cache()
    n_flags = flags.count()
    n_events = events.count()
    assert 0 < n_flags < n_events, "MAD should flag a strict subset"
    print(f"anomalies: {n_flags}/{n_events} events flagged (|x-med| > 3*MAD)")

    # 3) regularize to an hourly grid; every consumer after this point
    #    can assume one row per (user, hour) with no gaps
    grid = gapfill_locf(
        events,
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        tiebreak_col="event_id",
    ).cache()
    density = grid.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("bucket") - F.min("bucket") + 1).alias("span"),
    )
    assert density.where(F.col("n") != F.col("span")).count() == 0, (
        "grid must be dense per user"
    )
    obs_ratio = grid.agg(F.avg(F.col("observed").cast("double"))).first()[0]
    print(f"grid: {grid.count()} (user,hour) rows, observed ratio {obs_ratio:.3f}")

    # 4) centrality over the purchase graph (exact integer ranks)
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    s = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    nodes = c.select((F.col("c_custkey") * 2).alias("node_id")).unionAll(
        s.select((F.col("s_suppkey") * 2 + 1).alias("node_id"))
    )
    e0 = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(edges, nodes, iterations=5)
    total = ranks.agg(F.sum("rank")).first()[0]
    assert total <= 10**9, "floor division only loses mass"
    top = ranks.orderBy(F.desc("rank"), "node_id").limit(3).collect()
    print(
        "top-3 central nodes:",
        [(r["node_id"], r["rank"]) for r in top],
        f"(mass kept: {total / 10**9:.3f})",
    )

    print("pipeline ok")
    spark.stop()


if __name__ == "__main__":
    main()
