"""functions/ column helpers, sources/ readers, and view self-heal."""

import os

import pytest
from pyspark.sql import functions as F

from flumedb_spark import Flume, Reduce
from flumedb_spark.functions import cents, epoch_us, scaled_int, tokens
from flumedb_spark.sources.readers import append_df_to_log, read_any


def test_column_helpers(spark):
    df = spark.createDataFrame(
        [(1, 12.34, "Hello World foo")], "id long, price double, text string"
    )
    row = df.select(
        cents("price").alias("c"),
        scaled_int(F.lit(0.5)).alias("s"),
        tokens("text").alias("t"),
    ).collect()[0]
    assert row.c == 1234
    assert row.s == 500000
    assert row.t == ["hello", "world", "foo"]


def test_epoch_us_matches_duckdb(spark):
    import duckdb

    df = spark.sql("SELECT TIMESTAMP '2024-03-01 12:30:45.123456' AS ts")
    got = df.select(epoch_us("ts").alias("e")).collect()[0].e
    exp = duckdb.sql("SELECT epoch_us(TIMESTAMP '2024-03-01 12:30:45.123456')").fetchone()[0]
    assert got == exp


def test_read_any_csv_json(spark, tmp_path):
    csv = tmp_path / "t.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    df = read_any(spark, str(csv), "csv", schema="a int, b string")
    assert sorted((r.a, r.b) for r in df.collect()) == [(1, "x"), (2, "y")]

    jl = tmp_path / "t.jsonl"
    jl.write_text('{"a": 1}\n{"a": 2}\n')
    df = read_any(spark, str(jl), "json", schema="a long")
    assert sorted(r.a for r in df.collect()) == [1, 2]

    with pytest.raises(ValueError):
        read_any(spark, str(csv), "xml")


def test_bulk_load_df_into_log(spark, tmp_log_dir):
    db = Flume(tmp_log_dir, spark=spark)
    df = spark.createDataFrame([(2, "b"), (1, "a"), (3, "c")], "k long, v string")
    append_df_to_log(db.log, df, order_by="k")
    items = db.stream(seqs=False)
    assert [i["k"] for i in items] == [1, 2, 3]  # seq order follows order_by
    db.close()


def test_transient_view_failure_self_heals(spark, tmp_log_dir, tmp_path):
    # O9 crash-restart (index.js:56-75): a sink error destroys and
    # rebuilds that one view; a transient fault therefore heals on the
    # replay and the read still succeeds.
    flag = str(tmp_path / "fail_once")
    with open(flag, "w") as f:
        f.write("1")

    def flaky_reducer(acc, item, _flag=flag):
        if item["foo"] == 2 and os.path.exists(_flag):
            os.remove(_flag)  # fail exactly once
            raise RuntimeError("transient sink fault")
        return (acc or 0) + item["foo"]

    db = Flume(tmp_log_dir, spark=spark).use("sum", Reduce(1, flaky_reducer))
    db.append([{"foo": 1}, {"foo": 2}, {"foo": 3}])
    assert db.sum.get() == 6  # healed: destroy + full replay behind the gate
    db.close()


def test_approx_sketches_bounded_error(spark, sf_dir):
    # approximate sketch surface: not oracle-hashable (engine-specific
    # sketches), but error bounds are assertable against exact answers
    from flumedb_spark.catalog import register_tables
    from pyspark.sql import functions as F

    register_tables(spark, sf_dir)
    ev = spark.table("events")
    exact = ev.select(F.countDistinct("user_id").alias("n")).collect()[0].n
    approx = ev.select(F.approx_count_distinct("user_id").alias("n")).collect()[0].n
    assert abs(approx - exact) <= max(2, 0.05 * exact)

    row = ev.select(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("n")
    ).collect()[0]
    assert abs(row.n - exact) <= max(2, 0.05 * exact)

    exact_med = ev.select(F.expr("percentile(value, 0.5)").alias("m")).collect()[0].m
    approx_med = ev.select(F.percentile_approx("value", 0.5).alias("m")).collect()[0].m
    assert abs(approx_med - exact_med) <= 0.1 * max(abs(exact_med), 1.0)


def test_python_udtf_map_to_keys_surface(spark, sf_dir):
    """The reference's V2 index-key fn is a UDTF shape: one record in,
    N index keys out (test/rebuild.js:25-32 returns an array of keys).
    The Level view ships the explode/Arrow forms; this pins the THIRD
    form — PySpark 4's native Python UDTF — and cross-checks it against
    the JVM explode construction row-for-row."""
    from pyspark.sql.functions import udtf
    from pyspark.sql import functions as F
    from flumedb_spark.catalog import register_tables

    register_tables(spark, sf_dir)

    @udtf(returnType="seq bigint, key string")
    class KeysOf:
        def eval(self, seq: int, user_id: int, event_type: str):
            # one record -> many index keys (user key + type key)
            yield seq, f"u:{user_id}"
            yield seq, f"t:{event_type}"

    spark.udtf.register("keys_of", KeysOf)
    got = spark.sql(
        """
        SELECT t.seq, t.key
        FROM events e,
        LATERAL keys_of(e.event_id, e.user_id, e.event_type) t
        WHERE e.event_id < 50
        ORDER BY seq, key
        """
    ).collect()
    expect = (
        spark.table("events")
        .where(F.col("event_id") < 50)
        .select(
            F.col("event_id").alias("seq"),
            F.explode(
                F.array(
                    F.concat(F.lit("u:"), F.col("user_id")),
                    F.concat(F.lit("t:"), F.col("event_type")),
                )
            ).alias("key"),
        )
        .orderBy("seq", "key")
        .collect()
    )
    assert [(r.seq, r.key) for r in got] == [(r.seq, r.key) for r in expect]
    assert len(got) == 100  # 50 records x 2 keys
