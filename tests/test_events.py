"""Event-stream operators (kg/stages/events.py) and the round-5
sampling/clustering additions: as-of join vs a brute-force reference,
gap-sessionization boundary semantics, temperature-mix quotas, and
Lloyd iteration correctness."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kg.stages import events as EV


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 12, minute, second, micro)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # user 1: purchases at 12:00 and 12:10; clicks around them
        (1, 1, _ts(0), "purchase", 10.0),
        (2, 1, _ts(5), "click", 1.0),
        (3, 1, _ts(10), "purchase", 20.0),
        (4, 1, _ts(10, 0, 1), "click", 2.0),   # 1µs after → matches 20
        (5, 1, _ts(15), "click", 3.0),
        # user 2: click BEFORE any purchase → null match
        (6, 2, _ts(1), "click", 4.0),
        (7, 2, _ts(2), "purchase", 30.0),
        (8, 2, _ts(2), "click", 5.0),   # ts EQUAL to purchase 7 →
        #                                 visible under >= semantics
        (9, 3, _ts(4), "click", 6.0),   # user with no purchases
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, "
              "event_type string, value double")


def test_asof_join_matches_bruteforce(spark, ev):
    """The union-window as-of join equals the naive per-left-row
    'latest right at ts <= left.ts' — including the equal-timestamp
    inclusion case (event 8 at exactly the purchase's ts) and left
    rows with no match (nulls, kept)."""
    left = (ev.where(F.col("event_type") == "click")
            .select("event_id", "user_id", "ts", "value"))
    right = (ev.where(F.col("event_type") == "purchase")
             .select("user_id", "ts", F.col("value").alias("pv")))
    got = {r["event_id"]: r["pv"]
           for r in EV.asof_join(left, right, ["user_id"], "ts",
                                 ["pv"]).collect()}
    # brute force via inequality join + window max — the plan shape
    # the operator exists to avoid, fine at 9 rows
    assert got == {2: 10.0, 4: 20.0, 5: 20.0,
                   6: None, 8: 30.0, 9: None}


def test_asof_join_single_exchange(spark, ev):
    """The whole as-of join is ONE exchange (on the key): the plan
    must contain exactly one hashpartitioning exchange and no
    BroadcastNestedLoop / CartesianProduct — the failure modes of
    expressing as-of as an inequality join."""
    left = (ev.where(F.col("event_type") == "click")
            .select("event_id", "user_id", "ts"))
    right = (ev.where(F.col("event_type") == "purchase")
             .select("user_id", "ts", F.col("value").alias("pv")))
    plan = (EV.asof_join(left, right, ["user_id"], "ts", ["pv"])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_sessionize_gap_boundaries(spark):
    """A gap of exactly gap_s stays in-session; gap_s + 1µs breaks.
    Single-event groups form session 0."""
    rows = [
        (1, _ts(0)),
        (2, _ts(10)),                 # exactly 600s later: in-session
        (3, _ts(20, 0, 1)),           # 600.000001s later: NEW session
        (4, _ts(25)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    out = {r["user_id"]: r["session_idx"]
           for r in EV.sessionize_by_gap(
               df.withColumn("k", F.lit(1)), ["k"], "ts",
               gap_s=600).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 1}
    solo = EV.sessionize_by_gap(df.where("user_id = 1"), ["user_id"],
                                "ts", gap_s=600).collect()
    assert [r["session_idx"] for r in solo] == [0]


def test_temperature_mix_quotas(spark):
    """α=0.5 mixing: per-stratum counts equal min(n_g, ceil(T·√n_g /
    Σ√n)) exactly, the selection is partitioning-independent, and a
    stratum smaller than its quota is taken whole."""
    import math

    from kg.stages.corpus import temperature_mix_sample

    rows = ([("a", i) for i in range(100)]
            + [("b", 1000 + i) for i in range(25)]
            + [("c", 2000 + i) for i in range(4)])
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    T = 50
    wsum = math.sqrt(100) + math.sqrt(25) + math.sqrt(4)
    want = {g: min(n, math.ceil(T * math.sqrt(n) / wsum))
            for g, n in (("a", 100), ("b", 25), ("c", 4))}
    out = temperature_mix_sample(df, ["lang"], "doc_id", T, alpha=0.5)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == want
    assert want["c"] == 4  # tiny stratum kept whole (capped at n_g)
    ids = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in temperature_mix_sample(
        df.repartition(7), ["lang"], "doc_id", T,
        alpha=0.5).collect())
    assert ids == ids2


def test_lloyd_recovers_separated_clusters(spark):
    """Three Lloyd iterations on two well-separated blobs from
    adversarial seeds (both inside one blob) still converge: k-means
    with K=2 moves one centroid to each blob and the final centroids
    are the exact blob means."""
    from kg.stages import kmeans

    blob_a = [(i, [0.0 + 0.1 * (i % 3), 0.0]) for i in range(6)]
    blob_b = [(10 + i, [10.0 + 0.1 * (i % 3), 10.0])
              for i in range(6)]
    emb = spark.createDataFrame(blob_a + blob_b,
                                "vec_id long, v array<double>")
    seed = spark.createDataFrame(
        # both seeds inside blob_a, one nearer its left edge
        [(0, 0, 0.0), (0, 1, 0.0), (1, 0, 0.3), (1, 1, 0.0)],
        "cluster long, pos int, val double")
    out = kmeans.lloyd(emb, seed, iters=3)
    cents = {(r["cluster"], r["pos"]): r["val"] for r in out.collect()}
    mean_x = (0.0 + 0.1 + 0.2) * 2 / 6  # both blobs share this offset
    assert cents[(0, 0)] == pytest.approx(mean_x)
    assert cents[(0, 1)] == pytest.approx(0.0)
    assert cents[(1, 0)] == pytest.approx(10.0 + mean_x)
    assert cents[(1, 1)] == pytest.approx(10.0)


def test_lloyd_one_iter_is_assign_update(spark):
    """lloyd(iters=1) ≡ update(assign(·)) — the composed loop runs
    exactly the certified single-step operators."""
    from kg.stages import kmeans

    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 4)]) for i in range(12)],
        "vec_id long, v array<double>")
    seed = (emb.where(F.col("vec_id") < 3)
            .select(F.col("vec_id").alias("cluster"),
                    F.posexplode("v").alias("pos", "val")))
    a = kmeans.lloyd(emb, seed, iters=1).collect()
    b = kmeans.update(
        kmeans.assign(emb, kmeans.fold_centroids(seed))).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
