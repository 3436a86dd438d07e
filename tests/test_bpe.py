"""True-BPE merge loop (kg/stages/bpe.py) — semantics, agreement with
the frozen-table replace() chain, and the Spark integration the driver
certifies via the token_count_bpe_merges hash."""
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kg import spec
from kg.stages import bpe


def test_merge_ranks_expands_chained_sentinels():
    ranks = spec.merge_ranks(spec.BPE_MERGES)
    assert ranks[("t", "h")] == 0
    assert ranks[("th", "e")] == 1       # e resolved through 
    assert ranks[("in", "g")] == 3
    assert len(ranks) == len(spec.BPE_MERGES)


def test_encode_word_frozen_table_examples():
    ranks = spec.merge_ranks(spec.BPE_MERGES)
    assert bpe.encode_word("the", ranks) == ("the",)
    assert bpe.encode_word("thing", ranks) == ("th", "ing")
    assert bpe.encode_word("banner", ranks) == ("b", "an", "n", "er")
    assert bpe.encode_word("x", ranks) == ("x",)
    assert bpe.encode_word("", ranks) == ()


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz THE.,!?ing ",
               max_size=120))
@settings(max_examples=120, deadline=None)
def test_true_bpe_equals_chain_on_frozen_table(text):
    """On spec.BPE_MERGES every replacement is a sentinel no earlier
    pattern contains, so true BPE == rank-exhaustive rewriting ==
    spec.bpe_symbol_count — the property that makes the DuckDB chain
    a valid oracle for the UDF column."""
    ranks = spec.merge_ranks(spec.BPE_MERGES)
    got = int(bpe.bpe_count_series(pd.Series([text]), ranks).iloc[0])
    assert got == spec.bpe_symbol_count(text)


def test_true_bpe_diverges_from_naive_rewriting():
    """A forward-referencing table where the two semantics DIFFER:
    rank-0 pair ("a","bc") only exists after rank-1 merges b+c, so a
    rank-ordered rewriting pass (already past rank 0) leaves "a"+"bc"
    unmerged, while true BPE re-checks and merges it. Pins that
    encode_word implements real BPE, not the rewriting shortcut."""
    table = [("a", ""), ("bc", "")]
    ranks = spec.merge_ranks(table)
    assert ranks == {("a", "bc"): 0, ("b", "c"): 1}
    assert bpe.encode_word("abc", ranks) == ("abc",)       # true BPE: 1 symbol
    s = "abc"
    for pat, rep in table:                                  # naive chain: 2
        s = s.replace(pat, rep)
    assert len(s) == 2


def test_lowest_rank_wins_not_leftmost():
    """With ("b","c") ranked below ("a","b"), true BPE merges bc first
    even though ab is leftmost — order sensitivity the chain shares
    only by construction."""
    table = [("bc", ""), ("ab", "")]
    ranks = spec.merge_ranks(table)
    assert bpe.encode_word("abc", ranks) == ("a", "bc")


def test_unique_word_cache_counts():
    """Batch path: repeated words hit the cache; counts match the
    per-word reference; empty strings, runs of spaces, and NULLs are
    safe (NULL text → NULL count, like the chain/oracle)."""
    ranks = spec.merge_ranks(spec.BPE_MERGES)
    texts = pd.Series(["the thing the thing", "", "   ", "on er an"])
    got = bpe.bpe_count_series(texts, ranks)
    assert list(got) == [spec.bpe_symbol_count(t) for t in texts]
    assert got.dtype == "Int64"
    withnull = bpe.bpe_count_series(pd.Series(["the", None]), ranks)
    assert withnull.iloc[0] == 1
    assert pd.isna(withnull.iloc[1])


def test_null_text_propagates_in_spark(spark):
    """A nullable corpus must not kill the mapInPandas task: NULL in,
    NULL out — exactly what the JVM chain and DuckDB produce."""
    df = spark.createDataFrame([(1, "the"), (2, None)],
                               "doc_id long, text string")
    rows = {r["doc_id"]: r["n"]
            for r in bpe.with_bpe_symbol_count(df, "text", "n").collect()}
    assert rows[1] == 1
    assert rows[2] is None


def test_with_bpe_symbol_count_matches_jvm_chain(spark):
    """Spark integration at sf0.001: the mapInPandas true-BPE column
    equals the whole-stage-codegen replace() chain on every document —
    locally what the driver's value hash asserts at sf0.01."""
    from pyspark.sql import functions as F

    from kg.contract import _t

    docs = _t(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    merged = F.lower(F.col("text"))
    for pat, rep in spec.BPE_MERGES:
        merged = F.replace(merged, F.lit(pat), F.lit(rep))
    chain = F.length(F.replace(merged, F.lit(" "), F.lit("")))
    out = (bpe.with_bpe_symbol_count(docs, "text", "n_udf")
           .withColumn("n_chain", chain))
    bad = out.where("n_udf <> n_chain").count()
    assert bad == 0
    assert out.count() > 0


def test_plan_is_map_only(spark):
    """No Exchange: the BPE count is a map-only stage (PLANS.md)."""
    from kg.contract import _t

    docs = _t(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    plan = bpe.with_bpe_symbol_count(docs, "text", "n")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
