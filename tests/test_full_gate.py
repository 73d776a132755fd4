"""Mechanized rotation freshness (VERDICT r3 "What's wrong" #3).

DRIVER_WINDOW rotates driver-green entries out of the 50-slot driver
window with comments asserting their code paths are unchanged.  Nothing
used to enforce those claims — a later edit to a rotated-out code path
would ship on a stale attestation.  This test replaces the hand-written
claims with a LIVE check: it re-runs the ENTIRE catalog (in-window AND
out-of-window) through the driver-faithful comparison at sf0.001 every
suite run, so an out-of-window regression fails CI the moment it is
introduced, not two rounds later.

sf0.001 keeps this to a few minutes; the driver itself covers the
in-window half at sf0.01, and tools/check_correctness.py remains the
full-SF sweep for release checks.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

SF_DIR = "/root/testdata/sf0.001"


def test_every_catalog_entry_fresh_against_oracle(spark):
    import __spark_entry__ as entry
    from check_correctness import check_one, duck_connect

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duck_connect(SF_DIR)
    failures = {}
    n_checked = n_rowsonly = 0
    for name, fn in qs.items():
        err = check_one(spark, con, name, fn, oracles, SF_DIR)
        if err is not None:
            failures[name] = err
        elif name not in oracles:
            n_rowsonly += 1
        else:
            n_checked += 1
    assert not failures, f"{len(failures)} stale/broken entries: {failures}"
    # r9: EVERY catalog entry is oracle-checked — the three rows-only
    # engine-hash entries (simhash64, ANN raw) were retired in favor of
    # their oracle twins (VERDICT-r8 #3); a new rows-only entry needs a
    # documented reason to raise this bound
    assert n_rowsonly == 0, n_rowsonly
    assert n_checked >= 220, n_checked  # r10: 223 registered
