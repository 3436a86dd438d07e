"""Incremental dedup (kg/stages/incremental.py): split-equivalence vs
the one-shot path, append-only index semantics, re-ingest behavior,
and the no-index-shuffle plan."""
from pyspark.sql import functions as F

from kg.stages import canon, incremental


def _norms(spark, pred=None):
    d = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
         .select("doc_id", F.lower("text").alias("norm")))
    if pred is not None:
        d = d.where(pred)
    return d.select("norm")


def _edge_set(df):
    return {(r["src"], r["dst"], round(r["sim"], 6)) for r in df.collect()}


import pytest


@pytest.mark.parametrize("split", [40, 150, 280])
def test_split_equivalence(spark, split):
    """index(old) + incremental(new) reproduces the one-shot edges
    EXACTLY at several split points (small index / balanced / small
    batch): old-old edges come from the index build batch, every edge
    touching a new node comes from the incremental call, nothing is
    missed or invented."""
    full = _edge_set(canon.near_duplicate_edges(
        _norms(spark), tau=0.5, feature="word"))

    old = _norms(spark, f"doc_id < {split}")
    new = _norms(spark, f"doc_id >= {split}")
    old_edges = canon.near_duplicate_edges(old, tau=0.5, feature="word")
    feats, bands = incremental.build_dedup_index(old, feature="word")
    inc_edges, _, _ = incremental.incremental_near_dup_edges(
        new, feats, bands, tau=0.5, feature="word")

    got = _edge_set(old_edges) | _edge_set(inc_edges)
    assert got == full
    # the split actually exercises the cross path: at least one edge
    # spans the boundary (fixture near-dup groups span doc_id ranges)
    old_nodes = {r["node"] for r in feats.select("node").collect()}
    spans = [e for e in _edge_set(inc_edges)
             if (e[0] in old_nodes) != (e[1] in old_nodes)]
    assert spans, "split produced no cross-boundary near-dup pair"


def test_append_then_empty_batch(spark):
    """After appending the batch's rows, a rerun of the SAME batch
    (now fully re-ingested) is anti-joined to nothing: zero edges,
    zero index growth — idempotent commit."""
    old = _norms(spark, "doc_id < 150")
    new = _norms(spark, "doc_id >= 150")
    feats, bands = incremental.build_dedup_index(old, feature="word")
    _, new_feats, new_bands = incremental.incremental_near_dup_edges(
        new, feats, bands, tau=0.5, feature="word")
    feats2 = feats.unionByName(new_feats)
    bands2 = bands.unionByName(new_bands)

    edges, nf, nb = incremental.incremental_near_dup_edges(
        new, feats2, bands2, tau=0.5, feature="word")
    assert edges.isEmpty()
    assert nf.isEmpty() and nb.isEmpty()


def test_index_side_never_shuffles(spark):
    """The index is consumed through the module's EXPLICIT broadcast
    of the batch's key set. With auto-broadcast disabled, that hint is
    the only thing that can produce a BroadcastHashJoin — so this
    fails if the hint is ever dropped (the regression would shuffle
    the full O(corpus) index through an Exchange). Asserted on the
    module-built plan, not a reconstruction: at test scale every join
    auto-broadcasts, which would mask the regression otherwise."""
    old = _norms(spark, "doc_id < 150")
    new = _norms(spark, "doc_id >= 150")
    feats, bands = incremental.build_dedup_index(old, feature="word")
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges, _, _ = incremental.incremental_near_dup_edges(
            new, feats, bands, tau=0.5, feature="word")
        plan = edges._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert "BroadcastHashJoin" in plan, plan


def test_hot_bucket_cap_parity(spark):
    """THE cap regime: 24 mutual near-dups (J = 0.9 pairwise) split
    12/12 overflow LSH buckets at block_cap=6 on both paths. Because
    incremental reconstructs each touched bucket with its COMBINED
    old+new membership, the cap drops exactly the buckets the
    one-shot path drops — so incremental == one-shot restricted to
    new-touching pairs holds EXACTLY even here (the regime the
    original split-equivalence test never exercised)."""
    from pyspark.sql import Observation

    base = " ".join(f"w{i}" for i in range(20))
    docs = [(f"{base} extra{i}",) for i in range(24)]
    all_n = spark.createDataFrame(docs, "norm string")
    old_n = spark.createDataFrame(docs[:12], "norm string")
    new_n = spark.createDataFrame(docs[12:], "norm string")
    # combined buckets here hold 15-24 members; cap=18 makes drops
    # REAL (some buckets over, some under) while pairs still survive
    # through under-cap buckets — the regime where a per-side cap
    # (the pre-review design) would diverge from the one-shot path
    cap = 18

    oneshot = canon.near_duplicate_edges(all_n, tau=0.5, feature="word",
                                         block_cap=cap)
    feats, bands = incremental.build_dedup_index(old_n, feature="word")
    obs = Observation("inc_drops")
    inc, new_feats, _ = incremental.incremental_near_dup_edges(
        new_n, feats, bands, tau=0.5, feature="word", block_cap=cap,
        obs=obs)
    inc_set = _edge_set(inc)
    new_nodes = {r["node"] for r in new_feats.select("node").collect()}
    want = {e for e in _edge_set(oneshot)
            if e[0] in new_nodes or e[1] in new_nodes}
    assert inc_set == want
    # all 12×12 + C(12,2) new-touching true pairs (J=0.9 each)
    assert len(inc_set) == 210
    # the regime is real: over-cap combined buckets were actually hit
    assert obs.get["dropped_buckets"] > 0


def test_empty_index_and_empty_batch(spark):
    """Degenerate regimes: an empty index reduces the incremental call
    to pure batch-self dedup (== one-shot on the batch); an empty
    batch yields no edges and no appends."""
    some = _norms(spark, "doc_id < 100")
    none = _norms(spark, "doc_id < 0")
    feats0, bands0 = incremental.build_dedup_index(none, feature="word")

    edges, nf, nb = incremental.incremental_near_dup_edges(
        some, feats0, bands0, tau=0.5, feature="word")
    want = _edge_set(canon.near_duplicate_edges(some, tau=0.5,
                                                feature="word"))
    assert _edge_set(edges) == want
    assert nf.count() > 0

    feats1, bands1 = incremental.build_dedup_index(some, feature="word")
    edges2, nf2, nb2 = incremental.incremental_near_dup_edges(
        none, feats1, bands1, tau=0.5, feature="word")
    assert edges2.isEmpty() and nf2.isEmpty() and nb2.isEmpty()


def test_singleton_buckets_matchable(spark):
    """A corpus document alone in its buckets (no near-dup among the
    old batch) must still be FINDABLE by a new near-duplicate — the
    reason build_dedup_index keeps singleton bucket rows."""
    sc_df = lambda rows: spark.createDataFrame(  # noqa: E731
        [(t,) for t in rows], "norm string")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    old = sc_df([base, "totally different words here nothing shared"])
    # old batch has NO internal near-dups
    assert canon.near_duplicate_edges(old, tau=0.5,
                                      feature="word").isEmpty()
    feats, bands = incremental.build_dedup_index(old, feature="word")
    new = sc_df([base + " lambda"])  # near-dup of the singleton doc
    edges, _, _ = incremental.incremental_near_dup_edges(
        new, feats, bands, tau=0.5, feature="word")
    assert edges.count() == 1


def test_option_paths_identical_edges(spark):
    """persist_batch=False, batch_count_hint, and carry are pure
    execution options: the edge set must be byte-identical to the
    default path (the contract entry and bench use all three)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F

    d = docs.select("doc_id", F.lower("text").alias("norm"))
    n = d.count()
    split = int(n * 0.9)
    old = d.where(F.col("doc_id") < split).select("norm")
    new = d.where(F.col("doc_id") >= split).select("norm")
    feats, bands = incremental.build_dedup_index(old, feature="word")
    base, nf, nb = incremental.incremental_near_dup_edges(
        new, feats, bands, tau=0.5, feature="word")
    opt, _, _ = incremental.incremental_near_dup_edges(
        new, feats, bands, tau=0.5, feature="word",
        persist_batch=False, carry="norm", batch_count_hint=n - split)
    want = {(r["src"], r["dst"], round(r["sim"], 6))
            for r in base.collect()}
    got = {(r["src"], r["dst"], round(r["sim"], 6))
           for r in opt.collect()}
    assert want == got and want
    # carry adds the payload columns without disturbing the core
    assert {"src_norm", "dst_norm"} <= set(opt.columns)
    incremental.release_batch(nf, nb)


def test_multi_batch_append_loop(spark):
    """The actual day-2 loop, two real ingest batches deep: build the
    index on old, dedup batch1, APPEND batch1's (feats, bands), dedup
    batch2 against the grown index. The union of
    index-build edges + batch1 edges + batch2 edges must equal the
    one-shot edge set over old ∪ b1 ∪ b2 exactly — i.e. appending is
    closed under iteration, not just for the first batch."""
    full = _edge_set(canon.near_duplicate_edges(
        _norms(spark), tau=0.5, feature="word"))

    old = _norms(spark, "doc_id < 150")
    b1 = _norms(spark, "doc_id >= 150 AND doc_id < 320")
    b2 = _norms(spark, "doc_id >= 320")

    old_edges = canon.near_duplicate_edges(old, tau=0.5, feature="word")
    feats, bands = incremental.build_dedup_index(old, feature="word")

    e1, nf1, nb1 = incremental.incremental_near_dup_edges(
        b1, feats, bands, tau=0.5, feature="word")
    got = _edge_set(old_edges) | _edge_set(e1)
    # append-only commit: plain unions, no regroup or rewrite
    feats2 = feats.unionByName(nf1.select(*feats.columns))
    bands2 = bands.unionByName(nb1.select(*bands.columns))

    e2, nf2, nb2 = incremental.incremental_near_dup_edges(
        b2, feats2, bands2, tau=0.5, feature="word")
    got |= _edge_set(e2)

    assert got == full
    # batch2 must have matched against batch1-APPENDED index rows,
    # otherwise this test degenerates to two independent splits
    b1_nodes = {r["node"] for r in nf1.select("node").collect()}
    cross = [e for e in _edge_set(e2)
             if e[0] in b1_nodes or e[1] in b1_nodes]
    assert cross, "batch2 found no near-dup against batch1's rows"
    incremental.release_batch(nf1, nb1)
    incremental.release_batch(nf2, nb2)
