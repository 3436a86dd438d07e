#!/usr/bin/env python
"""Regenerate the committed self-hash pins for contract entries the
driver cannot hash-certify (tests/golden/pins_sf001.json).

What gets pinned (VERDICT r4 #2): every rows-only entry (model
surface, ANN buckets, learned BPE, pipeline flagships) and the
WINDOW_TAIL oracle entries parked past the driver's 50-slot window.
For each, the order-insensitive typed value-hash (kg.valuehash — the
same function the oracle sweep uses) of its sf0.01 output is
committed; tests/test_pins.py recomputes and compares every round, so
a silent content drift in e.g. kg_bag_attention scores is caught by a
cross-round artifact even when the driver window carries no row for
it.

UPDATE PROTOCOL: when an entry's output changes ON PURPOSE (new model
checkpoint, intentional operator change), rerun

    python tools/update_pins.py

inspect the git diff of pins_sf001.json (each changed entry is an
intentional-change acknowledgment), and commit it together with the
change that caused it. The tool computes every hash under TWO session
configs (local[4]/4 shuffle partitions and local[8]/8 — the pytest
and check_contract configs) and refuses to write a pin that differs
between them: a partitioning-dependent entry must be fixed, not
pinned.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden", "pins_sf001.json")


def pinned_entries() -> list[str]:
    from kg import contract

    rows_only = [n for n in contract.driver_order()
                 if contract.Q[n][1] is None]
    return rows_only + list(contract.WINDOW_TAIL)


def hashes_under(master: str, parts: int) -> dict[str, dict]:
    from kg import contract
    from kg.session import get_spark
    from kg.valuehash import df_value_hash

    spark = get_spark(app_name=f"pins-{parts}", master=master,
                      shuffle_partitions=parts)
    out = {}
    for name in pinned_entries():
        fn, _ = contract.Q[name]
        h, n, cols = df_value_hash(fn(spark, SF_DIR))
        out[name] = {"hash": h, "rows": n,
                     "cols": sorted(c.lower() for c in cols)}
        print(f"  {name}: {n} rows {h}")
    spark.stop()
    return out


def main() -> None:
    print("config A: local[4] / 4 shuffle partitions")
    a = hashes_under("local[4]", 4)
    print("config B: local[8] / 8 shuffle partitions")
    b = hashes_under("local[8]", 8)
    diff = [n for n in a if a[n] != b[n]]
    if diff:
        sys.exit(f"REFUSING to pin partitioning-dependent entries: "
                 f"{diff} — fix the entries first")
    with open(OUT, "w") as f:
        json.dump(a, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(a)} pins -> {OUT}")


if __name__ == "__main__":
    main()
