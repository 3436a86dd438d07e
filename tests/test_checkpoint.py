"""E2/A5 resume tests: kill-mid-run simulation — committed buckets are
never recomputed and the final output is identical (SURVEY.md §5.5)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kg import io
from kg.stages import checkpoint


def _input(spark):
    rows = [(f"c{i % 7}", i, float(i)) for i in range(100)]
    return spark.createDataFrame(rows, "conv_id string, x int, v double")


class _Boom(RuntimeError):
    pass


def test_kill_and_resume(spark, tmp_path):
    root = str(tmp_path / "ckpt")
    inp = _input(spark)
    calls = {"n": 0}

    def flaky_fn(df):
        calls["n"] += 1
        if calls["n"] == 3:
            raise _Boom("simulated kill")
        return df.groupBy("conv_id").agg(F.sum("v").alias("total"))

    def good_fn(df):
        calls["n"] += 1
        return df.groupBy("conv_id").agg(F.sum("v").alias("total"))

    # first run dies on the 3rd commit batch
    try:
        checkpoint.run_checkpointed(spark, root, "agg", "snap1", inp,
                                    flaky_fn, bucket_key="conv_id",
                                    n_buckets=8, groups=4)
        raise AssertionError("expected simulated kill")
    except _Boom:
        pass
    m1 = io.read_json(os.path.join(root, "agg", checkpoint.MANIFEST))
    committed_before = dict(m1["buckets"])
    assert 0 < len(committed_before) < 8

    # resume: only missing buckets recompute; committed entries are
    # byte-identical (same committed_at ⇒ not rewritten)
    calls["n"] = 0
    out = checkpoint.run_checkpointed(spark, root, "agg", "snap1", inp,
                                      good_fn, bucket_key="conv_id",
                                      n_buckets=8, groups=4)
    m2 = io.read_json(os.path.join(root, "agg", checkpoint.MANIFEST))
    for b, entry in committed_before.items():
        assert m2["buckets"][b] == entry
    # resumed output == single-shot computation
    expect = inp.groupBy("conv_id").agg(F.sum("v").alias("total"))
    assert out.exceptAll(expect).isEmpty() and expect.exceptAll(out).isEmpty()


def test_snapshot_change_invalidates(spark, tmp_path):
    root = str(tmp_path / "ckpt2")
    inp = _input(spark)

    def fn(df):
        return df.groupBy("conv_id").agg(F.count("*").alias("n"))

    checkpoint.run_checkpointed(spark, root, "agg", "snapA", inp, fn,
                                bucket_key="conv_id", n_buckets=4)
    cp = checkpoint.StageCheckpoint(root, "agg", "snapB", 4)
    assert cp.committed_buckets() == set()   # different snapshot ⇒ fresh


def test_noop_rerun_recomputes_nothing(spark, tmp_path):
    root = str(tmp_path / "ckpt3")
    inp = _input(spark)
    calls = {"n": 0}

    def fn(df):
        calls["n"] += 1
        return df.select("conv_id", "x", "v")

    checkpoint.run_checkpointed(spark, root, "s", "snap", inp, fn,
                                bucket_key="conv_id", n_buckets=4, groups=2)
    first = calls["n"]
    out = checkpoint.run_checkpointed(spark, root, "s", "snap", inp, fn,
                                      bucket_key="conv_id", n_buckets=4,
                                      groups=2)
    assert calls["n"] == first          # fn never called again
    assert out.count() == 100


def test_manifest_df_shape(spark, tmp_path):
    root = str(tmp_path / "ckpt4")
    inp = _input(spark)
    checkpoint.run_checkpointed(
        spark, root, "s", "snap", inp,
        lambda df: df, bucket_key="conv_id", n_buckets=4)
    m = checkpoint.manifest_df(spark, root, "s")
    rows = m.collect()
    assert {r["partition_id"] for r in rows} == {0, 1, 2, 3}
    assert sum(r["output_rows"] for r in rows) == 100
    assert all(r["snapshot_id"] == "snap" for r in rows)
