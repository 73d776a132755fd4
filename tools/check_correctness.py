"""Local replica of the driver's t2 correctness gate — DRIVER-FAITHFUL.

Runs every catalog query on Spark AND its DuckDB oracle on the same
parquet tables, then compares like the driver does:

  * both results are materialized as pandas DataFrames,
  * columns sorted by name,
  * rows sorted by ALL columns (pandas ``sort_values`` — list-typed
    columns crash here, exactly as they crash the driver's
    canonicalizer),
  * dtypes compared STRICTLY (the driver hashes dtypes: a bit-identical
    int64 vs decimal128/float64 result still fails), and
  * values compared EXACTLY — no ``isclose``, no rounding, no int/float
    coercion.  The catalog is engineered for cross-engine exact
    determinism, so any drift is a real bug the driver would flag.

Round 1 lesson: a looser local gate (isclose 1e-9, ``1 == 1.0``) passed
78/78 locally while the driver scored 46/50.  This version flags all
four of those round-1 failures on the pre-fix code.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    from flumedb_spark.catalog import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonical form: columns sorted by name, rows sorted by
    all columns.  Raises TypeError on unhashable (list-typed) columns —
    deliberately, because the driver's canonicalizer does too."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _isna(v) -> bool:
    if isinstance(v, (list, tuple, dict, set)):
        return False
    r = pd.isna(v)
    return bool(r) if not hasattr(r, "__len__") else False


def first_diff(s: pd.DataFrame, d: pd.DataFrame):
    """Exact cell-by-cell comparison; returns (row, col, spark, duck) of the
    first mismatch or None.  NaN == NaN (both-missing is a match); no
    tolerance otherwise.  Dtypes are verified strictly before this runs,
    so plain ``==`` cannot silently coerce across int/float."""
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            a_na, b_na = _isna(a), _isna(b)
            if a_na and b_na:
                continue
            if a_na != b_na or a != b:
                return (i, c, a, b)
    return None


def check_one(spark, con, name: str, fn, oracles: dict, sf_dir: str) -> str | None:
    """Driver-faithful check of one entry. Returns None on pass or a
    rows-only entry, else a failure-description string."""
    try:
        sdf = fn(spark, sf_dir).toPandas()
    except Exception as e:
        return f"SPARK ERROR {type(e).__name__}: {str(e)[:300]}"
    if name not in oracles:
        return None  # rows-only by design
    try:
        ddf = con.execute(oracles[name]).df()
    except Exception as e:
        return f"DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}"
    if sorted(sdf.columns) != sorted(ddf.columns):
        return f"columns {sorted(sdf.columns)} != {sorted(ddf.columns)}"
    try:
        s, d = canonicalize(sdf), canonicalize(ddf)
    except TypeError as e:
        return f"CANONICALIZER ERR (driver would err too): {e}"
    if len(s) != len(d):
        return f"rowcount {len(s)} != {len(d)}"
    dtype_bad = [
        (c, str(s[c].dtype), str(d[c].dtype))
        for c in s.columns
        if str(s[c].dtype) != str(d[c].dtype)
    ]
    if dtype_bad:
        return f"dtype mismatch {dtype_bad}"
    diff = first_diff(s, d)
    if diff:
        i, c, a, b = diff
        return f"first diff row {i} col {c}: spark={a!r} duck={b!r}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from flumedb_spark.session import get_spark

    spark = get_spark("correctness", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duck_connect(sf_dir)
    qs, oracles = entry.queries(), entry.oracle_sql()

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        err = check_one(spark, con, name, fn, oracles, sf_dir)
        if err is not None:
            print(f"FAIL  {name}: {err}")
            n_fail += 1
        elif name not in oracles:
            print(f"rows  {name}: rows-only check")
            n_rowsonly += 1
        else:
            print(f"PASS  {name}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    if os.environ.get("CHECK_JSON_OUT"):
        import json as _json

        with open(os.environ["CHECK_JSON_OUT"], "w") as f:
            _json.dump(
                {"sf_dir": sf_dir, "pass": n_pass, "fail": n_fail, "rows_only": n_rowsonly},
                f,
            )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
