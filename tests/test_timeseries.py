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


# ---------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------

from flumedb_spark.operators.timeseries import mad_outliers  # noqa: E402


def _mad_run(spark, rows, k=3.0):
    df = spark.createDataFrame(rows, "k long, id long, v double")
    out = mad_outliers(df, key_col="k", value_col="v", tiebreak_col="id", k=k)
    return {(r["k"], r["id"]): (r["value"], r["med"], r["mad"]) for r in out.collect()}


def test_mad_flags_the_burst_not_the_baseline(spark):
    # stable baseline around 10 +/- 1, one 100.0 burst
    rows = [(1, i, 10.0 + (i % 3) - 1) for i in range(9)] + [(1, 99, 100.0)]
    got = _mad_run(spark, rows)
    # 10 values sorted: lower median = 5th; MAD small; only the burst flags
    assert set(got) == {(1, 99)}
    _, med, mad = got[(1, 99)]
    assert med == 10.0 and mad == 1.0


def test_mean_based_would_miss_what_mad_catches(spark):
    # two coordinated bursts inflate a stddev threshold; MAD ignores them
    rows = [(1, i, 5.0) for i in range(10)] + [(1, 90, 500.0), (1, 91, 500.0)]
    got = _mad_run(spark, rows)
    assert (1, 90) in got and (1, 91) in got  # mad = 0 -> any deviation flags


def test_keys_are_independent(spark):
    rows = [(1, 1, 1.0), (1, 2, 1.0), (1, 3, 100.0), (2, 4, 100.0), (2, 5, 100.0)]
    got = _mad_run(spark, rows)
    assert {k for k in got if k[0] == 2} == set()  # key 2 is all-constant
    assert (1, 3) in got


def test_mad_partitioning_invariance(spark):
    rows = [(u, u * 1000 + i, float((i * 17) % 23)) for u in (1, 2) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, id long, v double")
    kw = dict(key_col="k", value_col="v", tiebreak_col="id")
    a = sorted(map(tuple, mad_outliers(df, **kw).collect()))
    b = sorted(map(tuple, mad_outliers(df.repartition(11, "v"), **kw).collect()))
    assert a == b


# ---------------------------------------------------------------------
# rank_quantile / quantile_clip
# ---------------------------------------------------------------------

from flumedb_spark.operators.timeseries import quantile_clip, rank_quantile  # noqa: E402


def test_rank_quantile_exact_ranks(spark):
    # 10 values 1..10: ceil(10*0.05)=1 -> 1.0; ceil(10*0.5)=5 -> 5.0;
    # ceil(10*0.95)=10 -> 10.0; q=1 -> max
    df = spark.createDataFrame(
        [(1, i, float(i)) for i in range(1, 11)], "k long, id long, v double"
    )
    for num, den, want in [(5, 100, 1.0), (1, 2, 5.0), (95, 100, 10.0), (1, 1, 10.0)]:
        got = rank_quantile(df, "k", "v", "id", num, den, "q").collect()
        assert [(r["k"], r["q"]) for r in got] == [(1, want)], (num, den)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rank_quantile(df, "k", "v", "id", 0, 100, "q")


def test_quantile_clip_saturates_tails_only(spark):
    # 20 values: 1..18 baseline plus two extremes
    rows = [(1, i, float(i)) for i in range(1, 19)] + [(1, 98, -1000.0), (1, 99, 1000.0)]
    df = spark.createDataFrame(rows, "k long, id long, v double")
    out = {r["id"]: r for r in quantile_clip(df, "k", "v", "id").collect()}
    # n=20: lo rank ceil(20*.05)=1 -> -1000.0 is itself the p05 (not
    # clipped); hi rank ceil(20*.95)=19 -> 18.0, so 1000.0 clips to 18
    assert out[99]["was_clipped"] and out[99]["value_clipped"] == 18.0
    assert not out[98]["was_clipped"]
    assert all(not out[i]["was_clipped"] for i in range(1, 19))
    # clipped values only ever saturate to observed values
    assert all(
        out[i]["value_clipped"] in [r[2] for r in rows] for i in out
    )
