"""Bucketed co-located joins — the shuffle-elimination strategy for
repeated big-table joins at 100 TB (SURVEY §2.C joins row; the
"bucketing for co-located joins" requirement).

Writing both fact tables bucketed by the join key lets every subsequent
join run bucket-to-bucket with NO exchange on either side — at cluster
scale that removes the dominant cost of a lineitem ⋈ orders query.
The test asserts the plan property, not just the result.
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from flumedb_spark.catalog import register_tables

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    register_tables(spark, sf_dir)
    spark.sql("CREATE DATABASE IF NOT EXISTS flume_bucketed")
    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        name = f"flume_bucketed.{t}_b"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # a previous session's metastore may have left the location behind
        import shutil

        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/flume_bucketed.db/{t}_b", ignore_errors=True)
        (
            spark.table(t)
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    yield
    for t in ("lineitem_b", "orders_b"):
        spark.sql(f"DROP TABLE IF EXISTS flume_bucketed.{t}")


def test_bucketed_join_is_shuffle_free(spark, bucketed):
    li = spark.table("flume_bucketed.lineitem_b")
    o = spark.table("flume_bucketed.orders_b")
    # at bench scale Catalyst (rightly) broadcasts the small side; the
    # merge hint forces the shape a 100 TB join takes, which is exactly
    # where bucketing must eliminate the exchanges
    joined = (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain(extended=False)
    plan = buf.getvalue()
    # no exchange below the join: both sides are bucket-aligned
    join_pos = plan.find("SortMergeJoin")
    assert join_pos != -1, plan
    below_join = plan[join_pos:]
    assert "Exchange hashpartitioning(l_orderkey" not in below_join
    assert "Exchange hashpartitioning(o_orderkey" not in below_join


def test_bucketed_join_matches_unbucketed(spark, bucketed, sf_dir):
    li_b = spark.table("flume_bucketed.lineitem_b")
    o_b = spark.table("flume_bucketed.orders_b")
    got = {
        r.o_orderstatus: r.n
        for r in li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    li = spark.table("lineitem")
    o = spark.table("orders")
    expect = {
        r.o_orderstatus: r.n
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expect
