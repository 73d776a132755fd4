"""profile_columns (operators/profile.py): exact semantics on
constructed data, repr truncation, argument validation, and the
one-scan plan shape (a profile that reads the table once per column
would be wrong at any scale)."""

from __future__ import annotations

import pytest

from flumedb_spark.operators.profile import profile_columns


def _rows(df):
    return {
        r["col_name"]: (
            r["n_rows"],
            r["n_nonnull"],
            r["n_distinct"],
            r["min_repr"],
            r["max_repr"],
            r["completeness"],
        )
        for r in df.collect()
    }


def test_counts_nulls_and_reprs(spark):
    df = spark.createDataFrame(
        [(1, "b", None), (2, None, None), (2, "a", None), (4, "a", None)],
        "k long, s string, z string",
    )
    got = _rows(profile_columns(df))
    assert got["k"] == (4, 4, 3, "1", "4", 1.0)
    assert got["s"] == (4, 3, 2, "a", "b", 0.75)
    # all-NULL column: no distincts, NULL reprs, completeness 0
    assert got["z"] == (4, 0, 0, None, None, 0.0)


def test_repr_truncation_and_column_subset(spark):
    df = spark.createDataFrame([("x" * 100, 1)], "t string, k long")
    got = _rows(profile_columns(df, cols=["t"], repr_len=8))
    assert set(got) == {"t"}
    assert got["t"][3] == "x" * 8 and got["t"][4] == "x" * 8


def test_bad_args_raise(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_columns(df, cols=["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_columns(df, cols=[])


def test_single_scan_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = profile_columns(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    # exact multi-column distinct goes through Expand + partial agg
    assert "Expand" in plan, plan
