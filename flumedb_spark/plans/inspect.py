"""Physical-plan inspection utilities.

The engine's performance contract is expressed as plan properties
(filters reach the scan, small sides broadcast, hot paths stay JVM-side,
aggregates partial-combine before shuffling). These helpers make those
properties checkable in tests and at runtime — "explain and iterate
until it's the plan you'd want" as a first-class API.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    """`explain()` (simple mode) output as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(extended=False)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every predicate that reached a parquet scan."""
    out: list[str] = []
    for line in formatted_plan(df).splitlines():
        m = re.search(r"PushedFilters: \[(.*)\]", line)
        if m and m.group(1).strip():
            # split on commas that are outside predicate parentheses
            out.extend(
                p.strip() for p in re.split(r",\s*(?![^()]*\))", m.group(1))
            )
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df)


def is_python_free(df: DataFrame) -> bool:
    """True when no Python-worker stage exists in the plan (the hot-path
    invariant for relational operators)."""
    p = formatted_plan(df)
    return not any(
        marker in p for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas")
    )
