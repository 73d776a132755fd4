"""The driver executes only the first 50 entries of ``queries()``.

r1-r8 pinned the window by hand (an ever-growing exemption list); r9
mechanized it (VERDICT-r8 #1): the window is NEW rows + CHANGED rows +
an oldest-driver-green backfill computed from the committed
CORRECTNESS_r*.json artifacts. These tests make that policy
EXECUTABLE — a registry edit that spends a slot on a fresh entry while
a staler one waits outside fails here, and the catalog-wide minimum
driver-green age must therefore rise every round. Rotated-out entries
stay correctness-covered by tests/test_full_gate.py (the whole catalog
re-runs vs DuckDB at sf0.001 every suite run).
"""

import os
import sys

import __spark_entry__ as entry
from flumedb_spark import catalog

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tools")
)
from window_rotation import WINDOW, compute_backfill, latest_green_rounds


def _window_names():
    return list(entry.queries())[:WINDOW]


def test_window_is_exactly_the_curated_list():
    assert _window_names() == catalog.DRIVER_WINDOW
    assert len(catalog.DRIVER_WINDOW) == WINDOW
    assert len(set(catalog.DRIVER_WINDOW)) == WINDOW


def test_window_names_all_registered():
    assert not [n for n in catalog.DRIVER_WINDOW if n not in catalog.QUERIES]


def test_new_and_changed_rows_hold_their_slots():
    names = set(_window_names())
    assert set(catalog.WINDOW_NEW) <= names
    assert set(catalog.WINDOW_CHANGED) <= names
    # new rows really are new: no driver record may exist for them yet
    green = latest_green_rounds(set(entry.queries()))
    already = [n for n in catalog.WINDOW_NEW if n in green]
    assert not already, (
        f"WINDOW_NEW rows with an existing driver record {already} — "
        "move them to WINDOW_CHANGED (or drop them from the pinned set)"
    )


def test_every_entry_has_a_driver_record_or_a_window_slot():
    # nothing may sit outside the window without any driver attestation
    green = latest_green_rounds(set(entry.queries()))
    orphans = [
        n
        for n in entry.queries()
        if n not in green and n not in _window_names()
    ]
    assert not orphans, f"never driver-checked and not in window: {orphans}"


def test_backfill_is_stale_first():
    """The load-bearing assertion: the window's non-pinned slots are
    exactly the oldest-driver-green entries (ties by registry order),
    re-derived from the artifacts — not a hand-curated list."""
    pinned = len(catalog.WINDOW_NEW) + len(catalog.WINDOW_CHANGED)
    assert catalog.DRIVER_WINDOW[pinned:] == compute_backfill()


def test_minimum_driver_green_age_rises():
    """Every backfill slot must be at least as stale as every entry
    left outside — so the minimum green round over the whole catalog
    is guaranteed to advance each round the window runs."""
    green = latest_green_rounds(set(entry.queries()))
    window = set(_window_names())
    out_greens = [r for n, r in green.items() if n not in window]
    in_backfill = [
        green[n]
        for n in catalog.DRIVER_WINDOW[
            len(catalog.WINDOW_NEW) + len(catalog.WINDOW_CHANGED) :
        ]
    ]
    assert in_backfill and out_greens
    assert max(in_backfill) <= min(out_greens)
    # and everything STRICTLY staler than the freshest outside entry
    # must already be inside
    floor = min(out_greens)
    missing = [
        n for n, r in green.items() if r < floor and n not in window
    ]
    assert not missing, f"staler entries stranded outside: {missing}"


def test_reorder_drops_nothing():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(catalog.QUERIES)
    assert set(osql) == set(catalog.ORACLES)
    # every oracle belongs to a registered query
    assert set(osql) <= set(qs)


def test_catalog_is_fully_oracle_checked():
    # r9: zero rows-only entries (VERDICT-r8 #3) — every registered
    # query must carry a DuckDB oracle
    missing = [n for n in catalog.QUERIES if n not in catalog.ORACLES]
    assert not missing, f"entries without an oracle: {missing}"
