"""Composed corpus pipeline (kg/stages/corpus.py): stage semantics,
partitioning-independence, and survivor hygiene at sf0.001."""
from pyspark.sql import functions as F

from kg.stages import corpus


def _docs(spark):
    return (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text"))


def test_stopwords_single_definition():
    """Both consumers ARE the spec constant (identity, not equality —
    drift is impossible by construction)."""
    from kg import spec
    from kg.contract import _STOPWORDS

    assert corpus.STOPWORDS is spec.STOPWORDS
    assert _STOPWORDS is spec.STOPWORDS


def test_survivor_hygiene(spark):
    """Survivors pass QC, contain no exact dups, and no near-dup pair
    at the pipeline's tau — verified BRUTE-FORCE (all-pairs word
    Jaccard over survivors), independent of the LSH path."""
    out = corpus.corpus_pipeline(_docs(spark)).persist()
    surv = (out.join(_docs(spark), "doc_id")
            .withColumn("norm",
                        F.lower(F.regexp_replace("text", r"\s+", " "))))
    n = out.count()
    assert 0 < n < _docs(spark).count()   # something dropped
    assert surv.select("norm").distinct().count() == n  # no exact dups

    sh = F.expr(
        "array_distinct(transform(sequence(0, size(_w) - 3), "
        "i -> concat_ws(' ', slice(_w, i + 1, 3))))")
    feats = (surv.select("doc_id", F.split("norm", " ").alias("_w"))
             .select("doc_id", sh.alias("f")))
    a, b = feats.alias("a"), feats.alias("b")
    inter = F.size(F.array_intersect("a.f", "b.f")).cast("double")
    union = F.size("a.f") + F.size("b.f") - inter
    dup_pairs = (a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
                 .where(inter / union >= 0.5).count())
    assert dup_pairs == 0


def test_partitioning_independence(spark):
    """Same output under radically different input partitionings —
    every decision keys on content hashes / min-ids, never row
    order."""
    d1 = _docs(spark).repartition(1)
    d2 = _docs(spark).repartition(37, "text")
    r1 = {tuple(r) for r in corpus.corpus_pipeline(d1).collect()}
    r2 = {tuple(r) for r in corpus.corpus_pipeline(d2).collect()}
    assert r1 == r2


def test_qc_and_packing_structure(spark):
    out = corpus.corpus_pipeline(_docs(spark), sample_mod=None,
                                 pack_ctx=256, n_shards=4).persist()
    # QC floor: every survivor has >= 5 tokens
    assert out.where("n_tokens < 5").count() == 0
    # packing: offsets are within the window
    assert out.where("pack_offset < 0 OR pack_offset >= 256").count() == 0
    # cumulative consistency: within a shard, pack boundaries are the
    # running sum of the doc that STARTS there
    rows = sorted((r["shard"], r["doc_id"], r["n_tokens"], r["pack_id"],
                   r["pack_offset"]) for r in out.collect())
    cum = {}
    for shard, doc, n, pid, off in rows:
        c = cum.get(shard, 0)
        assert pid == c // 256 and off == c % 256
        cum[shard] = c + n
    # contiguity: every doc here is shorter than the 256-token window
    # (asserted), so no window can be skipped — pack_ids per shard are
    # exactly 0..max with no gaps
    assert all(n < 256 for _, _, n, _, _ in rows)
    by_shard = {}
    for shard, _, _, pid, _ in rows:
        by_shard.setdefault(shard, set()).add(pid)
    for shard, pids in by_shard.items():
        assert pids == set(range(max(pids) + 1)), (shard, sorted(pids))


def test_sampling_subsets_survivors(spark):
    full = {r["doc_id"]
            for r in corpus.corpus_pipeline(_docs(spark)).collect()}
    sampled = {r["doc_id"] for r in corpus.corpus_pipeline(
        _docs(spark), sample_mod=10).collect()}
    assert sampled < full
    assert len(sampled) > 0


def test_degenerate_inputs(spark):
    """Empty corpus and a corpus where QC filters everything both
    yield an empty result, not a crash (the components_auto driver
    branch must handle a zero-node graph)."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert corpus.corpus_pipeline(empty).count() == 0
    junk = spark.createDataFrame([(1, "x"), (2, "zz qq")],
                                 "doc_id long, text string")
    assert corpus.corpus_pipeline(junk).count() == 0
