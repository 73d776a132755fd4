"""Stale-first driver-window generator (VERDICT-r8 #1).

Computes the 50-slot ``catalog.DRIVER_WINDOW`` as:

    WINDOW_NEW + WINDOW_CHANGED + oldest-driver-green backfill

where "driver-green round" is each entry's most recent green row in
the committed ``CORRECTNESS_r*.json`` artifacts (ties broken by
registry order). Run it after declaring a round's new/changed rows in
``flumedb_spark/catalog.py`` and paste the printed backfill; the
stale-first property itself is asserted by
``tests/test_driver_window.py`` on every suite run.

Usage: python tools/window_rotation.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def latest_green_rounds(
    registered: set[str], cutoff: int | None = None
) -> dict[str, int]:
    """name -> most recent driver round whose CORRECTNESS artifact
    records the entry green (hash-matched, or rows-matched for the
    historical no-oracle rows).

    ``cutoff`` (default ``catalog.WINDOW_BUILT_FOR_ROUND``) makes the
    computation artifact-cutoff aware (ADVICE r9): artifacts from round
    >= cutoff are ignored, so the window built at the START of round N
    stays valid after the driver drops ``CORRECTNESS_rN.json`` mid/
    post-round — previously that landing instantly invalidated the
    stale-first assertions (the r9 suite was deliberately red at round
    start for exactly this reason)."""
    if cutoff is None:
        from flumedb_spark import catalog

        cutoff = catalog.WINDOW_BUILT_FOR_ROUND
    green: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(f.rsplit("_r", 1)[1].split(".")[0])
        if rnd >= cutoff:
            continue
        for name, v in json.load(open(f)).items():
            if name not in registered or not isinstance(v, dict):
                continue
            ok = v.get("hash_match") or (
                v.get("rows_match") and v.get("err") in (None, "no_oracle")
            )
            if ok:
                green[name] = max(green.get(name, 0), rnd)
    return green


def compute_backfill() -> list[str]:
    import __spark_entry__ as entry
    from flumedb_spark import catalog

    qs = list(entry.queries())
    green = latest_green_rounds(set(qs))
    pinned = set(catalog.WINDOW_NEW) | set(catalog.WINDOW_CHANGED)
    order = {q: i for i, q in enumerate(qs)}
    cand = sorted(
        (q for q in green if q not in pinned),
        key=lambda q: (green[q], order[q]),
    )
    slots = WINDOW - len(pinned)
    return cand[:slots]


def main() -> None:
    from flumedb_spark import catalog

    backfill = compute_backfill()
    print(f"# {len(catalog.WINDOW_NEW)} new + {len(catalog.WINDOW_CHANGED)} "
          f"changed + {len(backfill)} backfill")
    print("_WINDOW_BACKFILL: list[str] = [")
    for n in backfill:
        print(f'    "{n}",')
    print("]")
    if backfill == list(catalog.DRIVER_WINDOW[len(catalog.WINDOW_NEW) + len(catalog.WINDOW_CHANGED):]):
        print("# catalog.DRIVER_WINDOW is already up to date")
    else:
        print("# DIFFERS from catalog.DRIVER_WINDOW — paste the list above")


if __name__ == "__main__":
    main()
