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


def test_gopher_each_rule_fires(spark):
    """One crafted document per Gopher rule (Rae21 §A1.1), each
    violating EXACTLY its own rule — plus a clean doc that passes all
    five. The production corpus can only exercise the mean-word-length
    measurement (it is single-line pure words — the driver oracle
    certifies the arithmetic there); this is where each rule's FIRING
    behavior is pinned."""
    ok = "the quick brown fox jumps over the lazy dog again today"
    rows = [
        (0, ok),                                     # passes all
        (1, "a a a a a a a a a a"),                  # mean len 1 < 3
        (2, "pneumonoultramicroscopicsilicovolcanoconiosis " * 3),
        (3, "# # # # hash tags # # everywhere # # # yes"),
        (4, "- one\n- two\n- three\n- four\nplain line here"),
        (5, "wait for it...\nmore to come...\nnot this line"),
        (6, "1 2 3 4 5 6 7 8 words 10"),             # alpha frac 0.1
    ]
    out = {r["doc_id"]: r for r in corpus.gopher_quality_cols(
        spark.createDataFrame(rows, "doc_id long, text string"))
        .collect()}
    assert out[0]["gopher_keep"] is True
    assert out[1]["gopher_keep"] is False and out[1]["mean_word_len"] < 3
    assert out[2]["gopher_keep"] is False and out[2]["mean_word_len"] > 10
    assert out[3]["gopher_keep"] is False and out[3]["symbol_ratio"] > 0.1
    # doc 4: 4 of 5 lines bullet-led → 0.8 ≤ 0.9 passes; make the
    # failing variant explicit
    assert out[4]["bullet_line_frac"] == 0.8 and out[4]["gopher_keep"]
    assert out[5]["gopher_keep"] is False
    assert abs(out[5]["ellipsis_line_frac"] - 2 / 3) < 1e-3
    assert out[6]["gopher_keep"] is False
    assert out[6]["alpha_word_frac"] == 0.1

    all_bullets = spark.createDataFrame(
        [(7, "\n".join(["- item"] * 19 + ["x"]))],
        "doc_id long, text string")
    r7 = corpus.gopher_quality_cols(all_bullets).collect()[0]
    assert r7["bullet_line_frac"] == 0.95 and r7["gopher_keep"] is False


def test_gopher_gate_in_pipeline(spark):
    """gopher=True composes into the QC stage: a bullet-spam doc that
    passes the base QC (enough tokens + stopwords) is dropped, the
    rest of the pipeline is unchanged for clean docs."""
    spam_line = "- the data is a big table of the fast rows"
    rows = [(1, "\n".join([spam_line] * 20)),
            (2, "the small query joins the big table on a key for "
                "the fast scan of all rows")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = {r["doc_id"]
            for r in corpus.corpus_pipeline(docs).collect()}
    gated = {r["doc_id"]
             for r in corpus.corpus_pipeline(docs, gopher=True).collect()}
    assert base == {1, 2}
    assert gated == {2}


def test_boilerplate_turns_threshold_boundary(spark):
    """drop_boilerplate_turns drops a text in MORE than max_convs
    distinct conversations, keeps one at exactly max_convs (boundary
    is exclusive), and repetition WITHIN one conversation never
    counts toward the threshold."""
    rows = []
    # "hot": appears once in convs c0..c3 (4 distinct)
    rows += [(i, f"c{i}", "hot banner") for i in range(4)]
    # "warm": appears in exactly 3 distinct convs (= max_convs)
    rows += [(10 + i, f"c{i}", "warm greeting") for i in range(3)]
    # "local": 6 repeats inside ONE conversation
    rows += [(20 + i, "c9", "local refrain") for i in range(6)]
    t = spark.createDataFrame(
        rows, "event_id long, conv_id string, text string")
    kept = {r["text"] for r in corpus.drop_boilerplate_turns(
        t, max_convs=3).collect()}
    assert kept == {"warm greeting", "local refrain"}
    n_local = (corpus.drop_boilerplate_turns(t, max_convs=3)
               .where(F.col("text") == "local refrain").count())
    assert n_local == 6  # all six intra-conv repeats survive


def test_c4_each_rule_fires(spark):
    """One crafted line per C4 rule (Raffel20 §2.2): no terminal
    punctuation, under 5 words, brace page-flag, lorem-ipsum
    page-flag, and the >=3-kept-lines page floor."""
    pages = [
        # page p0: 3 good lines + 1 unpunctuated + 1 short -> keep
        ("p0", "this line has five proper words."),
        ("p0", "another line with enough words here!"),
        ("p0", 'a third keeper with plenty of words?'),
        ("p0", "no terminal punctuation on this line"),
        ("p0", "too short."),
        # page p1: 3 good lines but one brace -> dropped
        ("p1", "these are perfectly fine words."),
        ("p1", "and these five words also work."),
        ("p1", "function() { return code; }."),
        # page p2: lorem ipsum -> dropped
        ("p2", "Lorem Ipsum dolor sit amet line."),
        ("p2", "some other normal words right here."),
        ("p2", "and a third normal line too."),
        # page p3: only 2 kept lines -> below floor
        ("p3", "first of exactly two keepers here."),
        ("p3", "second of exactly two keepers here."),
    ]
    out = {r["page"]: r for r in corpus.c4_page_stats(
        spark.createDataFrame(pages, "page string, line string"),
        ["page"]).collect()}
    assert out["p0"]["c4_keep"] and out["p0"]["n_kept"] == 3
    assert out["p0"]["n_lines"] == 5
    assert not out["p1"]["c4_keep"] and out["p1"]["has_brace"]
    assert not out["p2"]["c4_keep"] and out["p2"]["has_lorem"]
    assert not out["p3"]["c4_keep"] and out["p3"]["n_kept"] == 2


def test_stratified_sample_exact_quotas(spark):
    """ceil(frac*n) rows per stratum, independent of input
    partitioning, and a 1-row stratum always survives (the property
    a global hash-threshold sample cannot give)."""
    import math

    rows = ([(i, "en") for i in range(40)]
            + [(100 + i, "de") for i in range(7)]
            + [(200, "fi")])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = corpus.stratified_sample(df, ["lang"], 0.25, "doc_id")
    got = {}
    for r in out.collect():
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    assert got == {"en": math.ceil(0.25 * 40),
                   "de": math.ceil(0.25 * 7), "fi": 1}
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in corpus.stratified_sample(
        df.repartition(13), ["lang"], 0.25, "doc_id").collect()}
    assert a == b
