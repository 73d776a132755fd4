"""The driver executes only the first 50 entries of ``queries()`` — pin
what that window must contain so a registry edit can't silently push a
component out of driver validation (the round-1 failure mode: all 18
north-star ops sat at positions 50+ and got zero CORRECTNESS rows).
"""

import __spark_entry__ as entry
from flumedb_spark import catalog

WINDOW = 50


def _window_names():
    return list(entry.queries())[:WINDOW]


def test_window_is_exactly_the_curated_list():
    assert _window_names() == catalog.DRIVER_WINDOW
    assert len(catalog.DRIVER_WINDOW) == WINDOW
    assert len(set(catalog.DRIVER_WINDOW)) == WINDOW


def test_all_northstar_ops_in_window():
    names = set(_window_names())
    ns = {n for n in entry.queries() if n.startswith("ns_")}
    # serving-path variants (e.g. ns_similarity_topk_np) duplicate an
    # oracle-checked op already in the window; they don't need a slot
    ns -= {n for n in ns if n.endswith("_np")}
    assert ns, "north-star ops missing from registry entirely"
    assert ns <= names, f"ns_* outside driver window: {sorted(ns - names)}"


def test_round1_red_rows_in_window():
    # the four rows the round-1 driver flagged must be re-proven
    for n in ("v1_reduce_stats", "v1_reduce_grouped", "math_functions",
              "array_agg_sorted"):
        assert n in _window_names(), n


def test_reorder_drops_nothing():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(catalog.QUERIES)
    assert set(osql) == set(catalog.ORACLES)
    # every oracle belongs to a registered query
    assert set(osql) <= set(qs)


def test_window_names_all_registered():
    assert not [n for n in catalog.DRIVER_WINDOW if n not in catalog.QUERIES]
