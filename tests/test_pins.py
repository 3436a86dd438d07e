"""Committed self-hash regression pins (VERDICT r4 #2).

The driver window hash-certifies 50 oracle entries per round; the
rows-only entries (model surface, ANN buckets, learned BPE, pipeline
flagships) and the WINDOW_TAIL oracle entries parked past the window
get no cross-round value artifact from the driver. These tests
recompute each such entry's sf0.01 output hash (kg.valuehash — the
SAME typed order-insensitive hash the oracle sweep uses) and compare
against the committed constants in tests/golden/pins_sf001.json, so
a silent content drift — e.g. kg_bag_attention scores changing under
a refactor — fails pytest instead of passing unnoticed for rounds.

UPDATE PROTOCOL (intentional changes only): rerun
``python tools/update_pins.py`` (it refuses partitioning-dependent
pins by computing under two session configs), review the
pins_sf001.json diff entry by entry, and commit it WITH the change
that caused it. Never hand-edit the JSON.
"""

from __future__ import annotations

import json
import pathlib

import pytest

import kg.contract as contract
from kg.valuehash import df_value_hash

SF_DIR = "/root/testdata/sf0.01"
PINS = json.loads((pathlib.Path(__file__).parent / "golden"
                   / "pins_sf001.json").read_text())


def test_pin_set_is_current():
    """Every entry that needs a pin has one, and no stale pins: the
    pinned set == rows-only entries + WINDOW_TAIL (recomputed from the
    live registry, so adding an entry without repinning fails here)."""
    rows_only = {n for n in contract.driver_order()
                 if contract.Q[n][1] is None}
    assert set(PINS) == rows_only | set(contract.WINDOW_TAIL)


@pytest.mark.parametrize("name", sorted(PINS))
def test_pinned_output_unchanged(spark, name):
    fn, _ = contract.Q[name]
    h, n, cols = df_value_hash(fn(spark, SF_DIR))
    pin = PINS[name]
    assert sorted(c.lower() for c in cols) == pin["cols"], name
    assert n == pin["rows"], f"{name}: rows {n} != pinned {pin['rows']}"
    assert h == pin["hash"], (
        f"{name}: output content changed (hash {h} != pinned "
        f"{pin['hash']}). If intentional, rerun tools/update_pins.py "
        f"and commit the diff with this change.")
