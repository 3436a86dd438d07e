"""Streaming group-by over sorted Arrow batches — the shared state
machine behind every "tiny groups" stage (SURVEY.md §4 UDF cost
ledger, r4).

groupBy(...).applyInPandas pays one pandas frame PER GROUP; with
transcript-shaped groups (a ~20-turn conversation, a 1–5-instance
bag) that per-group overhead dominates the stage (measured 12.7 s →
2.1 s for cross-turn pairing at sf0.1). The alternative: pay the
SAME exchange via repartition(key_cols) + sortWithinPartitions, then
detect group boundaries in-stream inside one mapInPandas — hundreds
of groups per Arrow batch, one Python call per batch.

:func:`stream_groups` is that boundary-detection machine, shared so
its edge cases live in exactly one place: groups spanning Arrow batch
boundaries (the open group buffers across frames), output flushing at
group CLOSE (the row buffer is bounded even within a single dense
batch), and the empty-partition case (one empty, correctly-columned
frame).
"""
from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

__all__ = ["stream_groups"]


def stream_groups(it: Iterator[pd.DataFrame],
                  cols: list[str],
                  key_n: int,
                  close: Callable[[tuple, list], list],
                  out_cols: list[str],
                  flush_rows: int = 20_000,
                  flush_transform: Callable[[list], list] | None = None,
                  ) -> Iterator[pd.DataFrame]:
    """Iterate frames (sorted by ``cols[:key_n]`` within the
    partition), buffer each group's ``cols[key_n:]`` value tuples,
    and call ``close(key, items) -> list[row_tuple]`` at every group
    boundary. Yields output frames with ``out_cols``, flushing
    whenever the buffered output reaches ``flush_rows`` — checked at
    group close, so a single mention-dense batch cannot grow the
    buffer unboundedly, and no yield ever splits an open group.

    ``flush_transform(rows) -> rows'`` (r5): applied to the buffered
    close-output ONCE per flush, on the raw Python tuples, before the
    pandas frame is built — the hook the fused scorers use to run one
    batched model pass per flush and drop the wide token_ids column
    WITHOUT it ever entering a pandas object column (the
    build-then-reconvert round-trip measured ~25% of the cross-turn
    stage). ``flush_rows`` bounds the PRE-transform buffer."""
    key = None
    items: list = []
    out: list = []

    def frame(rows: list) -> pd.DataFrame:
        if flush_transform is not None:
            rows = flush_transform(rows)
        return pd.DataFrame(rows, columns=out_cols)

    for pdf in it:
        arrays = [pdf[c].to_numpy() for c in cols]
        for vals in zip(*arrays):
            kk = vals[:key_n]
            if kk != key:
                if key is not None:
                    out += close(key, items)
                    if len(out) >= flush_rows:
                        yield frame(out)
                        out = []
                key, items = kk, []
            items.append(vals[key_n:])
    if key is not None:
        out += close(key, items)
    if out or key is None:
        yield frame(out)
