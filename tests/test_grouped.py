"""Adversarial-layout property tests for the streaming group machine
(kg/stages/grouped.py, VERDICT r4 #7) — the state machine now under
every hot extraction path, so its edge cases get hypothesis coverage:
groups fragmented across many tiny Arrow batches, a single group
larger than flush_rows, batch boundaries landing anywhere (including
mid-group and on group edges), and empty leading/trailing frames.

Reference semantics: pandas groupby-apply over the concatenated
input — exactly what groupBy(...).applyInPandas would compute.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from kg.stages.grouped import stream_groups

COLS = ["k1", "k2", "v"]
OUT_COLS = ["k1", "k2", "n", "vsum", "vfirst", "vlast"]


def _close(key, items):
    vals = [v for (v,) in items]
    return [(key[0], key[1], len(vals), sum(vals), vals[0], vals[-1])]


def _reference(rows: list[tuple]) -> set[tuple]:
    out = set()
    pdf = pd.DataFrame(rows, columns=COLS)
    for (k1, k2), g in pdf.groupby(["k1", "k2"], sort=False):
        vals = list(g["v"])
        out.add((k1, k2, len(vals), sum(vals), vals[0], vals[-1]))
    return out


def _run_stream(rows, cuts, flush_rows):
    """Split the sorted row list into frames at ``cuts`` (tiny,
    arbitrary Arrow batch boundaries) and drain the machine."""
    bounds = sorted({0, len(rows), *cuts})
    frames = [pd.DataFrame(rows[a:b], columns=COLS)
              for a, b in zip(bounds, bounds[1:])] or \
             [pd.DataFrame([], columns=COLS)]
    got = []
    for out in stream_groups(iter(frames), COLS, 2, _close, OUT_COLS,
                             flush_rows=flush_rows):
        assert list(out.columns) == OUT_COLS
        got.extend(map(tuple, out.itertuples(index=False, name=None)))
    return got


@settings(max_examples=60, deadline=None)
@given(
    sizes=st.lists(st.integers(1, 9), min_size=1, max_size=12),
    big_at=st.integers(0, 11),
    data=st.data(),
    flush_rows=st.integers(1, 8),
)
def test_stream_groups_equals_groupby_apply(sizes, big_at, data,
                                            flush_rows):
    """Any sorted layout + any batch fragmentation + any flush size →
    byte-identical multiset of group results vs pandas groupby. One
    group is inflated past flush_rows so a single group alone crosses
    the flush threshold (the r4 verdict's named adversarial case)."""
    sizes = list(sizes)
    sizes[big_at % len(sizes)] = flush_rows + 13  # one oversized group
    rows: list[tuple] = []
    v = 0
    for gi, n in enumerate(sizes):
        for _ in range(n):
            rows.append((gi // 3, f"g{gi}", v))  # composite 2-part key
            v += 1
    cuts = data.draw(st.lists(
        st.integers(0, len(rows)), max_size=len(rows)))
    got = _run_stream(rows, cuts, flush_rows)
    assert len(got) == len(sizes)          # exactly one row per group
    assert set(got) == _reference(rows)


def test_stream_groups_empty_and_single():
    assert _run_stream([], [], 5) == []
    assert _run_stream([(0, "a", 7)], [0, 1], 1) == [(0, "a", 1, 7, 7, 7)]


def test_stream_groups_every_row_its_own_frame():
    """Maximal fragmentation: every row arrives in its own one-row
    frame (each group spans its full extent of batch boundaries)."""
    rows = [(i // 4, f"g{i // 4}", i) for i in range(24)]
    got = _run_stream(rows, list(range(25)), 3)
    assert set(got) == _reference(rows)
