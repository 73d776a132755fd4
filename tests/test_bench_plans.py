"""Bench-config plan gates (VERDICT r2 item 2).

Round 2's bench coalesced every cached table to 8 partitions, silently
capping scan/join parallelism at 8 of 32 cores — results stayed correct,
so only a plan assertion can catch that class of regression. These tests
recreate the bench's serving state (managed ingest layout + cached
views) and pin:

- the ingest layout actually multi-splits the fact tables,
- the CACHED scan is at least as wide as the layout (nothing between
  ingest and cache may narrow it — the r2 bug),
- the star joins stay BroadcastHashJoin in the FINAL adaptive plan
  (dimensions must broadcast; a cache-estimate change flipping them to
  sort-merge is a silent 3-6x at sf0.1 and a shuffle disaster at 100 TB).
"""

import pytest

import __spark_entry__ as entry
from flumedb_spark.catalog import TABLES, register_tables

# sf0.01, not the default test sf0.001: big enough that lineitem's
# managed layout has >1 split, so the no-narrowing assertion has teeth
BENCH_SF = "/root/testdata/sf0.01"

JOIN_QUERIES = ["q3_top_revenue_orders", "q5_region_revenue", "q10_returned_items"]


@pytest.fixture(scope="module")
def bench_state(spark):
    register_tables(spark, BENCH_SF)
    for t in TABLES:
        spark.catalog.cacheTable(t)
        spark.table(t).count()
    yield spark
    for t in TABLES:
        try:
            spark.catalog.uncacheTable(t)
        except Exception:
            pass


def test_ingest_layout_multi_splits_fact_tables(bench_state):
    spark = bench_state
    from flumedb_spark.sources.ingest import ROWS_PER_SPLIT, managed_path

    import os

    n = spark.read.parquet(managed_path(BENCH_SF, "lineitem")).count()
    expect_min = min(64, max(1, n // ROWS_PER_SPLIT))
    # count on disk: reading the cached view's path resolves to the
    # InMemoryRelation, whose inputFiles() is empty by design
    files = [
        f
        for f in os.listdir(managed_path(BENCH_SF, "lineitem"))
        if f.endswith(".parquet")
    ]
    assert len(files) >= expect_min >= 2, (
        f"lineitem layout has {len(files)} files for {n} rows; "
        f"scan parallelism starts at the layout"
    )


def test_cached_scan_not_narrowed(bench_state):
    """The bench serves queries from cached views; the cache must keep
    (at least) the layout's width — r2's coalesce(8) regression made it
    8 < 30 at sf0.1 and cost 3-6x on the join queries."""
    import os

    spark = bench_state
    from flumedb_spark.sources.ingest import managed_path

    n_files = len(
        [
            f
            for f in os.listdir(managed_path(BENCH_SF, "lineitem"))
            if f.endswith(".parquet")
        ]
    )
    cached_parts = spark.table("lineitem").rdd.getNumPartitions()
    assert cached_parts >= n_files, (
        f"cached lineitem narrowed to {cached_parts} partitions "
        f"(layout has {n_files} files)"
    )


@pytest.fixture(params=["true", "false"], ids=["aqe_on", "aqe_off"])
def aqe_setting(bench_state, request):
    """The bench serves sf<=0.2 sweeps with AQE off (the per-stage
    barrier is pure latency there) and the sf1 section with AQE on —
    the join-shape gates must hold under BOTH settings."""
    spark = bench_state
    prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", request.param)
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", prior)


@pytest.mark.parametrize("name", JOIN_QUERIES)
def test_star_joins_broadcast_in_final_plan(aqe_setting, name):
    spark = aqe_setting
    qs = entry.queries()
    df = qs[name](spark, BENCH_SF)
    df.count()  # materialize so AQE's FINAL plan is available
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join in final plan"
    assert "SortMergeJoin" not in plan, (
        f"{name}: a dimension join fell back to sort-merge — "
        "check cached-relation size estimates vs autoBroadcastJoinThreshold"
    )


TPCH_QUERIES = [
    "q2_min_cost_supplier", "q4_order_priority", "q7_nation_volume",
    "q8_market_share", "q9_product_profit", "q11_important_parts",
    "q12_priority_classes", "q13_customer_distribution",
    "q15_top_supplier", "q16_part_supplier_counts",
    "q17_small_quantity_revenue", "q20_part_promotion",
    "q21_waiting_suppliers", "q22_global_sales_opportunity",
]


@pytest.mark.parametrize("name", TPCH_QUERIES)
def test_tpch_sweep_no_cartesian_and_dims_broadcast(aqe_setting, name):
    """The round-3 TPC-H sweep: every final adaptive plan must be free
    of cartesian products (the EXISTS/NOT EXISTS and correlated
    subqueries must decorrelate to joins), and the queries that touch a
    dimension table must broadcast at least one join side. Fact-fact
    self-joins (q17/q21) may legitimately shuffle — only the cartesian
    and no-broadcast-at-all outcomes are regressions."""
    spark = aqe_setting
    qs = entry.queries()
    df = qs[name](spark, BENCH_SF)
    df.count()  # materialize so AQE's FINAL plan is available
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name}: nested-loop join — a subquery failed to decorrelate "
        "to an equi-join"
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, (
        f"{name}: nothing broadcasts — dimension joins should"
    )
