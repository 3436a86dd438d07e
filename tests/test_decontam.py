"""Benchmark decontamination (kg/stages/decontam.py): crafted-overlap
semantics, normalization, short-doc edge, and the broadcast plan pin.
The DuckDB hash certificate over the sf0.01 corpus lives in the
`decontaminate_ngrams` contract entry; these tests pin the POLICY on
docs where the right answer is computable by hand."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kg.stages.decontam import benchmark_ngrams, decontaminate


@pytest.fixture(scope="module")
def fix(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [
            # contains bench 5-gram "beta gamma delta epsilon zeta"
            (1, "x beta gamma delta epsilon zeta y"),
            # same words, different order → no 5-gram collision
            (2, "zeta epsilon delta gamma beta alpha"),
            # clean
            (3, "one two three four five six seven"),
            # case-folded copy of a bench 5-gram → still dirty
            (4, "ALPHA BETA GAMMA DELTA EPSILON tail tail tail"),
            # 4 words: no 5-grams at all
            (5, "alpha beta gamma delta"),
        ],
        "doc_id long, text string")
    bg = benchmark_ngrams(bench, n=5)
    out = {r["doc_id"]: r.asDict()
           for r in decontaminate(docs, bg, n=5).collect()}
    return bench, docs, bg, out


def test_bench_gram_set_is_the_sliding_window(fix, spark):
    """The benchmark gram set is exactly the two sliding 5-gram
    windows — asserted through the r6 hashed representation
    (xxhash64 of the token slice, kg/stages/decontam.py
    word_ngram_hashes): expected fingerprints are recomputed here
    from the expected SURFACE grams with an independent expression,
    so a change to the gram identity function cannot silently pass."""
    bg = {r["g"] for r in fix[2].collect()}
    expected_grams = ["alpha beta gamma delta epsilon",
                      "beta gamma delta epsilon zeta"]
    want = {r["h"] for r in spark.createDataFrame(
        [(g,) for g in expected_grams], "g string")
        .select(F.xxhash64(F.split("g", " ")).alias("h")).collect()}
    assert bg == want and len(bg) == 2


def test_overlapping_doc_is_flagged_with_exact_counts(fix):
    out = fix[3]
    assert not out[1]["keep"]
    assert out[1]["n_grams"] == 3 and out[1]["n_dirty"] == 1
    assert out[1]["dirty_frac"] == pytest.approx(round(1 / 3, 4))


def test_word_reorder_defeats_no_gram_and_keeps(fix):
    # same vocabulary ≠ contamination: the n-gram test is about
    # verbatim runs, not topical similarity
    out = fix[3]
    assert out[2]["keep"] and out[2]["n_dirty"] == 0
    assert out[3]["keep"] and out[3]["n_dirty"] == 0


def test_case_insensitive_match(fix):
    out = fix[3]
    assert not out[4]["keep"] and out[4]["n_dirty"] == 1


def test_short_doc_has_no_grams_and_keeps(fix):
    out = fix[3]
    assert out[5] == {"doc_id": 5, "n_grams": 0, "n_dirty": 0,
                      "dirty_frac": 0.0, "keep": True}
    assert set(out) == {1, 2, 3, 4, 5}   # nobody dropped from output


def test_plan_broadcasts_benchmark_no_gram_shuffle_join(fix):
    # the scale contract: the gram join must be a BroadcastHashJoin
    # (eval suite side), never a gram-keyed SortMergeJoin of the
    # corpus (module docstring)
    bench, docs, bg, _ = fix
    plan = (decontaminate(docs, bg, n=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
