"""Local replica of the driver's t2 correctness gate.

Runs every catalog query on Spark AND its DuckDB oracle on the same
parquet tables, compares row count, column names, and values (columns
sorted by name, rows sorted by all columns — order-insensitive, like the
driver's value-hash). Exact comparison for ints/strings; floats must
match to 1e-9 (our catalog is engineered for exact determinism, so any
drift is a bug worth seeing).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    from flumedb_spark.catalog import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(rows: list[tuple], cols: list[str]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    key = lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)
    return sorted(out, key=key), [cols[i] for i in order]


def values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    return a == b


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
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: rows-only check, {len(srows)} rows")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        s_n, s_c = normalize(srows, scols)
        d_n, d_c = normalize(drows, dcols)
        if s_c != d_c:
            print(f"FAIL  {name}: schema {s_c} != {d_c}")
            n_fail += 1
            continue
        if len(s_n) != len(d_n):
            print(f"FAIL  {name}: rowcount {len(s_n)} != {len(d_n)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(s_n, d_n)):
            if not all(values_equal(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            print(f"FAIL  {name}: first diff at sorted row {bad[0]}:")
            print(f"      spark: {bad[1]}")
            print(f"      duck : {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(s_n)} rows)")
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
