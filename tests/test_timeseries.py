"""gapfill_locf (operators/timeseries.py): constructed-series semantics
— gap filling, NULL-valued observations, per-bucket closing value
tie-break, the span guard, and partitioning invariance."""

from __future__ import annotations

from datetime import datetime

import pytest

from flumedb_spark.operators.timeseries import gapfill_locf

HOUR_US = 3_600_000_000


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )


def _run(spark, rows, **kw):
    out = gapfill_locf(
        _df(spark, rows),
        key_col="user_id",
        ts_col="ts",
        value_col="value",
        tiebreak_col="event_id",
        **kw,
    )
    return {
        (r["user_id"], r["bucket"]): (r["observed"], r["value_locf"])
        for r in out.collect()
    }


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_gaps_fill_forward_and_nulls_carry_previous(spark):
    rows = [
        (1, _ts(0), 1, 10.0),
        (1, _ts(3), 2, None),  # observed bucket, NULL value: carries 10.0
        (1, _ts(5), 3, 50.0),
    ]
    got = _run(spark, rows)
    base = 473352  # hours since epoch for 2024-01-01 00:00 UTC
    assert got == {
        (1, base + 0): (True, 10.0),
        (1, base + 1): (False, 10.0),
        (1, base + 2): (False, 10.0),
        (1, base + 3): (True, 10.0),  # NULL observation -> LOCF carries
        (1, base + 4): (False, 10.0),
        (1, base + 5): (True, 50.0),
    }


def test_leading_null_stays_null_until_first_value(spark):
    rows = [(2, _ts(0), 1, None), (2, _ts(2), 2, 7.0)]
    got = _run(spark, rows)
    base = 473352
    assert got[(2, base)] == (True, None)
    assert got[(2, base + 1)] == (False, None)
    assert got[(2, base + 2)] == (True, 7.0)


def test_bucket_closing_value_uses_ts_then_event_id(spark):
    rows = [
        (3, _ts(0, 10), 5, 1.0),
        (3, _ts(0, 50), 6, 2.0),  # latest ts wins
        (3, _ts(0, 50), 9, 3.0),  # same ts: highest event_id wins
    ]
    got = _run(spark, rows)
    assert got[(3, 473352)] == (True, 3.0)


def test_keys_get_independent_spans(spark):
    rows = [(1, _ts(0), 1, 1.0), (2, _ts(10), 2, 2.0), (2, _ts(11), 3, 3.0)]
    got = _run(spark, rows)
    assert {k for k in got if k[0] == 1} == {(1, 473352)}
    assert {k for k in got if k[0] == 2} == {(2, 473362), (2, 473363)}


def test_span_guard_raises(spark):
    rows = [(1, datetime(2024, 1, 1), 1, 1.0), (1, datetime(2025, 1, 1), 2, 2.0)]
    with pytest.raises(ValueError, match="chunk the span"):
        _run(spark, rows, max_buckets_per_key=100)


def test_partitioning_invariance(spark):
    rows = [
        (u, _ts(h, m), u * 100 + h * 10 + m % 10, float(u + h + m))
        for u in (1, 2, 3)
        for h in (0, 2, 5, 9)
        for m in (0, 30)
    ]
    df = _df(spark, rows)
    kw = dict(key_col="user_id", ts_col="ts", value_col="value", tiebreak_col="event_id")
    a = sorted(map(tuple, gapfill_locf(df, **kw).collect()))
    b = sorted(map(tuple, gapfill_locf(df.repartition(7, "ts"), **kw).collect()))
    assert a == b
