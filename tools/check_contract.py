"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count + name-sorted column set + order-insensitive
value hash. Usage: python tools/check_contract.py [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


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
            # 6-decimal entries.
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


def main() -> None:
    import duckdb

    import __spark_entry__ as e
    from kg.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="contract-check", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_DIR}/{t}.parquet'")
    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = frame_rows(df.toPandas())
        except Exception as ex:
            print(f"FAIL {name}: spark error {str(ex).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(rows)} rows, cols={cols}")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            opdf = res.df()
            ocols = list(opdf.columns)
            orows = frame_rows(opdf)
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {str(ex).splitlines()[0][:160]}")
            n_fail += 1
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} vs {len(orows)}")
        if sorted(c.lower() for c in cols) != sorted(c.lower() for c in ocols):
            problems.append(f"schema {sorted(cols)} vs {sorted(ocols)}")
        if not problems and value_hash(rows, cols) != value_hash(orows, ocols):
            problems.append("value-hash mismatch")
            sset = {tuple(sorted(zip(cols, map(str, r)))) for r in rows}
            oset = {tuple(sorted(zip(ocols, map(str, r)))) for r in orows}
            ex1 = list(sset - oset)[:2]
            ex2 = list(oset - sset)[:2]
            problems.append(f"spark-only={ex1} duck-only={ex2}")
        if problems:
            print(f"FAIL {name}: {'; '.join(str(p) for p in problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(rows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
