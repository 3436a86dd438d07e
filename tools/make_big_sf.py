"""Build an APPROXIMATE sf1.0-scale dataset from the driver's sf0.1
fixture for scale-holding validation only (the driver regenerates its
own sf1.0 at measurement time; /root/testdata is read-only and is
never touched). 10 key-shifted copies of every scaling table keep
every FK coherent and every per-entity density identical to sf0.1
(67 events/user, ~30 lineitems/part, ~10 docs/near-dup cluster):

- relational keys shift by copy_index * (max_key+1);
- document text is token-salted per copy (disjoint vocab across
  copies, so near-dup/LSH structure per copy matches sf0.1 instead of
  degenerating into 10-way exact-dup clusters);
- embeddings get a per-vector deterministic offset so no cross-copy
  exact-duplicate vectors exist (keeps kNN/ANN candidate structure
  sane); copy-0 rows stay byte-identical, so the K=8 seed centroids
  (vec_id < 8) are unchanged.

Usage: python tools/make_big_sf.py [--out /root/testdata_big/sf1.0]
"""
from __future__ import annotations

import argparse
import os

SRC = "/root/testdata/sf0.1"

#: table -> (copies, select template). {i} is the copy index column.
TABLES = {
    "lineitem": """
        SELECT l_orderkey + i*150000 AS l_orderkey,
               l_partkey + i*20000 AS l_partkey,
               l_suppkey + i*1000 AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src, range(10) t(i)""",
    "orders": """
        SELECT o_orderkey + i*150000 AS o_orderkey,
               o_custkey + i*15000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src, range(10) t(i)""",
    "customer": """
        SELECT c_custkey + i*15000 AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM src, range(10) t(i)""",
    "part": """
        SELECT p_partkey + i*20000 AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM src, range(10) t(i)""",
    "supplier": """
        SELECT s_suppkey + i*1000 AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM src, range(10) t(i)""",
    "events": """
        SELECT event_id + i*100000 AS event_id, ts,
               user_id + i*1500 AS user_id, event_type, value, props
        FROM src, range(10) t(i)""",
    "documents": """
        SELECT doc_id + i*5000 AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE replace(text, ' ', '_' || i || ' ')
                         || '_' || i END AS text,
               lang, source,
               CAST(length(CASE WHEN i = 0 THEN text
                    ELSE replace(text, ' ', '_' || i || ' ')
                         || '_' || i END) AS BIGINT) AS n_chars
        FROM src, range(10) t(i)""",
    "embeddings": """
        SELECT vec_id + i*2000 AS vec_id,
               CASE WHEN i = 0 THEN embedding
                    ELSE list_transform(embedding, x -> CAST(
                        x + (hash(vec_id + i*2000) % 997) * 1e-6
                        AS FLOAT)) END AS embedding,
               label
        FROM src, range(10) t(i)""",
    "nation": "SELECT * FROM src",
    "region": "SELECT * FROM src",
}


def main() -> None:
    import duckdb

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/testdata_big/sf1.0")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for t, sql in TABLES.items():
        con.execute(f"CREATE OR REPLACE VIEW src AS "
                    f"SELECT * FROM '{SRC}/{t}.parquet'")
        con.execute(f"COPY ({sql}) TO '{args.out}/{t}.parquet' "
                    f"(FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    open(os.path.join(args.out, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
