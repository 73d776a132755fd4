"""Engine-level SQL surface, mapper-skip plan, log pushdown plans,
ingest fallback."""

import contextlib
import io

from flumedb_spark import Flume, Reduce
from flumedb_spark.views.level import Level


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_engine_sql_over_log_and_views(spark, tmp_log_dir):
    db = Flume(tmp_log_dir, spark=spark)
    db.use("by_k", Level(1, key_expr="array(get_json_object(value, '$.k'))"))
    db.append([{"k": "a", "v": 1}, {"k": "b", "v": 2}, {"k": "a", "v": 3}])
    out = db.sql(
        """
        SELECT get_json_object(value, '$.k') AS k,
               sum(CAST(get_json_object(value, '$.v') AS BIGINT)) AS total
        FROM log GROUP BY 1 ORDER BY 1
        """
    ).collect()
    assert [(r.k, r.total) for r in out] == [("a", 4), ("b", 2)]
    # the view's index table is queryable too, and it is caught up
    idx = db.sql("SELECT key, count(*) AS n FROM view_by_k GROUP BY key ORDER BY key").collect()
    assert [(r.key, r.n) for r in idx] == [("a", 2), ("b", 1)]
    db.close()


def test_seq_only_stream_skips_python_mapper_in_plan(spark, tmp_log_dir):
    # index.js:97-99: values:false skips the mapper — assert at the PLAN
    # level that no Python stage exists in the seq-only scan
    db = Flume(tmp_log_dir, mapper=lambda v: {**v, "x": 1}, spark=spark)
    db.append([{"a": 1}, {"a": 2}])
    p_all = _plan(db.stream_df())
    p_seqs = _plan(db.stream_df(values=False))
    assert "EvalPython" in p_all or "MapInPandas" in p_all  # mapper present
    assert "EvalPython" not in p_seqs and "MapInPandas" not in p_seqs
    db.close()


def test_log_range_scan_pushdown_plan(spark, tmp_log_dir):
    db = Flume(tmp_log_dir, spark=spark)
    db.append([{"a": i} for i in range(20)])
    p = _plan(db.log.stream_df(spark, gt=5, lte=12))
    assert "GreaterThan(seq,5)" in p and "LessThanOrEqual(seq,12)" in p
    db.close()


def test_ingest_fallback_unwritable_warehouse(spark, monkeypatch, sf_dir):
    import flumedb_spark.catalog as catalog

    monkeypatch.setenv("SPARK_GRAFT_WAREHOUSE", "/proc/flume_cannot_write")
    catalog._REGISTERED.pop(id(spark), None)
    try:
        catalog.register_tables(spark, sf_dir)  # must fall back, not raise
        assert spark.table("events").count() > 0
        assert dict(spark.table("events").dtypes)["ts"] == "timestamp"  # ns fixed
    finally:
        monkeypatch.delenv("SPARK_GRAFT_WAREHOUSE")
        catalog._REGISTERED.pop(id(spark), None)  # re-register cleanly later
