"""Order-insensitive TYPED value hash over name-sorted columns — the
local replica of the driver's result comparison, shared by
tools/check_contract.py (Spark-vs-DuckDB oracle sweep) and
tests/test_pins.py (committed self-hash regression pins for entries
the driver can only rows-check). One implementation so the two
evidence surfaces can never drift apart.
"""

from __future__ import annotations

import hashlib


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    """Order-insensitive TYPED value hash over name-sorted columns.

    Typed: an integer and a float rendering of the same number hash
    DIFFERENTLY (``i:3`` vs ``f:3``). This mirrors the driver's
    comparison, which goes through a typed dataframe layer — DuckDB
    HUGEINT (int128, e.g. from sum(CASE…)) surfaces there as float64
    while Spark's BIGINT stays integer, so a string-hash that coerces
    both to "3" passes locally and fails at the driver (round-1
    join_left_outer). Harvest rows via ``.df()``/``toPandas()`` so the
    engine's type mapping, not Python's, decides the tag."""
    import datetime as dt
    import decimal

    import numpy as np
    import pandas as pd

    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, bool):
            return f"b:{int(v)}"
        if isinstance(v, (dt.date, dt.datetime, pd.Timestamp)):
            # DuckDB's .df() widens DATE to midnight Timestamp while
            # Spark keeps datetime.date — render midnight as the date
            ts = pd.Timestamp(v)
            return (f"t:{ts.date().isoformat()}" if ts == ts.normalize()
                    else f"t:{ts.isoformat()}")
        if isinstance(v, (float, np.floating)):
            # frame_rows pre-converts NaN to None; keep a tag anyway
            # in case a raw float path ever reaches here.
            # Fixed scale 1e-6, not %.6g (ADVICE r3): the contract
            # convention rounds every float aggregate to a fixed ≤6
            # decimals on both sides (most entries use 3-4; the
            # multimodal features use 6), so .6f is EXACT for all of
            # them — %.6g silently compared 8+-digit sums at 6
            # significant digits, and .4f would under-compare the
            # 6-decimal entries. The convention itself is enforced by
            # tests/test_contract.py::test_oracle_float_columns_are_rounded.
            return "f:nan" if np.isnan(v) else f"f:{float(v):.6f}"
        if isinstance(v, decimal.Decimal):
            # Spark DECIMAL surfaces as decimal.Decimal while DuckDB's
            # .df() widens to float64 — quantize both to the same
            # fixed 1e-6 scale (symmetric with the float branch)
            # so decimal comparisons stay full-precision above the
            # 6-significant-digit ceiling the old %.6g tag imposed
            return f"f:{float(v):.6f}"
        if isinstance(v, (int, np.integer)):
            return f"i:{int(v)}"
        if v is None:
            return "null"
        return f"s:{v}"

    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def frame_rows(pdf) -> list[tuple]:
    """pandas frame → list of tuples, NaN/NaT/None normalized to None
    (both engines render SQL NULL differently across dtypes)."""
    import pandas as pd

    out = []
    for r in pdf.itertuples(index=False, name=None):
        out.append(tuple(None if (v is None or v is pd.NaT
                                  or (isinstance(v, float) and v != v))
                         else v for v in r))
    return out


def df_value_hash(df) -> tuple[str, int, list[str]]:
    """(hash, row_count, columns) of a Spark DataFrame via the same
    toPandas path the oracle sweep uses."""
    cols = df.columns
    rows = frame_rows(df.toPandas())
    return value_hash(rows, cols), len(rows), cols
