"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count + name-sorted column set + order-insensitive
value hash. Usage: python tools/check_contract.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kg.valuehash import frame_rows, value_hash  # noqa: E402 (shared
# with tests/test_pins.py — one hash implementation, no drift)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


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
