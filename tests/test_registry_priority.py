"""Pin the driver-window rotation policy (VERDICT r5 "What's wrong" #1).

The driver verifies only the first ~50 registry entries each round
(CORRECTNESS_r{N}.json). Round 5 shipped 7 new operators at positions
50-56 — one slot past the cutoff — so none got driver evidence in its
debut round. These tests make that structurally impossible to repeat:

  1. every registry entry with ZERO driver evidence (no row in any
     committed CORRECTNESS_r*.json) must appear before EVERY entry that
     has evidence — new operators always lead the window;
  2. all never-checked entries must fit inside the 50-entry window.

The evidence map is derived from the committed CORRECTNESS files, so the
test self-updates as rounds land: once the driver checks an entry, it is
free to rotate back.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_WINDOW = 50


def _driver_checked_names() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        try:
            data = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        if isinstance(data, dict):
            names.update(data.keys())
    return names


def _registry_order() -> list[str]:
    from jetstream_spark.queries import all_queries

    return list(all_queries())


def test_never_checked_entries_lead_the_registry():
    checked = _driver_checked_names()
    order = _registry_order()
    never = [n for n in order if n not in checked]
    if not never:
        return  # every entry has driver evidence — nothing to order
    last_never = max(order.index(n) for n in never)
    first_checked = min(
        (order.index(n) for n in order if n in checked), default=len(order)
    )
    offenders = [n for n in order[:last_never] if n in checked]
    assert last_never < first_checked, (
        "never-driver-checked entries must lead the registry window; "
        f"checked entries placed ahead of never-checked ones: {offenders}"
    )


def test_never_checked_entries_fit_in_driver_window():
    checked = _driver_checked_names()
    order = _registry_order()
    outside = [n for n in order[DRIVER_WINDOW:] if n not in checked]
    assert not outside, (
        f"entries with zero driver evidence sit outside the {DRIVER_WINDOW}-entry "
        f"driver window and will miss their debut-round check: {outside}"
    )


def test_priority_names_unique():
    from jetstream_spark.queries import _PRIORITY

    assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate names in _PRIORITY"
