"""C1–C4 tests: LSH blocking, Jaccard verify, connected components
(vs a pure-Python union-find oracle AND DuckDB WITH RECURSIVE,
SURVEY.md §5.2c/5.3), cluster naming."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kg import schemas
from kg.stages import canon
from kg.stages.link import dictionary_df

# known graph: chain of 5 (forces ≥3 propagation rounds), a triangle,
# and singleton node 99 (FIXTURES.md F2 edges_tiny)
EDGES = [(1, 2, 0.9), (2, 3, 0.9), (3, 4, 0.9), (4, 5, 0.9),
         (10, 11, 0.8), (11, 12, 0.8), (10, 12, 0.8)]
NODES = [1, 2, 3, 4, 5, 10, 11, 12, 99]


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {n: find(n) for n in nodes}


def test_cc_known_graph(spark):
    nodes = spark.createDataFrame([(n,) for n in NODES], "node long")
    edges = spark.createDataFrame(EDGES, schema=schemas.EDGES)
    got = {r["node"]: r["component"]
           for r in canon.connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 99: 99}


def test_cc_matches_duckdb_recursive(spark):
    """DuckDB WITH RECURSIVE as an independent tiny-scale oracle."""
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)",
                    [(s, d) for s, d, _ in EDGES])
    con.execute("CREATE TABLE n(node BIGINT)")
    con.executemany("INSERT INTO n VALUES (?)", [(n,) for n in NODES])
    oracle = dict(con.execute("""
        WITH RECURSIVE sym AS (
            SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        reach(node, lab) AS (
            SELECT node, node FROM n
            UNION
            SELECT s.dst, r.lab FROM reach r JOIN sym s ON s.src = r.node)
        SELECT node, min(lab) FROM reach GROUP BY node
    """).fetchall())
    nodes = spark.createDataFrame([(n,) for n in NODES], "node long")
    edges = spark.createDataFrame(EDGES, schema=schemas.EDGES)
    got = {r["node"]: r["component"]
           for r in canon.connected_components(nodes, edges).collect()}
    assert got == oracle


@given(st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)), max_size=25))
@settings(max_examples=12, deadline=None)
def test_cc_property_vs_union_find(spark_prop, edges_raw):
    edges = [(min(a, b), max(a, b), 1.0) for a, b in edges_raw if a != b]
    nodes = sorted({n for e in edges for n in e[:2]} | {0, 14})
    expect = _union_find(nodes, [(s, d) for s, d, _ in edges])
    ndf = spark_prop.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark_prop.createDataFrame(edges or [(0, 0, 1.0)],
                                     schema=schemas.EDGES) \
        .where("src != dst")
    got = {r["node"]: r["component"]
           for r in canon.connected_components(ndf, edf).collect()}
    assert got == expect


def test_cc_star_known_graph(spark):
    nodes = spark.createDataFrame([(n,) for n in NODES], "node long")
    edges = spark.createDataFrame(EDGES, schema=schemas.EDGES)
    got = {r["node"]: r["component"]
           for r in canon.connected_components_star(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 99: 99}


def test_cc_star_long_chain(spark):
    """The regime large-star/small-star exists for: a chain of 40
    (hash-to-min would need 40 rounds; star converges in O(log²))."""
    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edges = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)], schema=schemas.EDGES)
    got = {r["node"]: r["component"]
           for r in canon.connected_components_star(
               nodes, edges, max_iter=12).collect()}
    assert got == {i: 0 for i in range(n)}


@given(st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), max_size=20))
@settings(max_examples=8, deadline=None)
def test_cc_star_property_vs_union_find(spark_prop, edges_raw):
    edges = [(min(a, b), max(a, b), 1.0) for a, b in edges_raw if a != b]
    nodes = sorted({n for e in edges for n in e[:2]} | {0, 12})
    expect = _union_find(nodes, [(s, d) for s, d, _ in edges])
    ndf = spark_prop.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark_prop.createDataFrame(edges or [(0, 0, 1.0)],
                                     schema=schemas.EDGES) \
        .where("src != dst")
    got = {r["node"]: r["component"]
           for r in canon.connected_components_star(ndf, edf).collect()}
    assert got == expect


def test_lsh_blocks_variant_pairs(spark):
    """Variant surfaces of the same entity must land in a shared LSH
    bucket and survive Jaccard verification; unrelated entities must
    not merge."""
    norms = spark.createDataFrame(
        [("acme corp",), ("the acme corp",), ("dataquill",),
         ("dataquill io",), ("granite labs",)], "norm string")
    feats = canon.node_features(norms)
    signed = canon.minhash_signatures(feats)
    edges = canon.verify_pairs(
        canon.candidate_pairs(canon.lsh_bands(signed)), feats, tau=0.5)
    norm_of = {r["node"]: r["norm"]
               for r in feats.select("node", "norm").collect()}
    pairs = {tuple(sorted((norm_of[r["src"]], norm_of[r["dst"]])))
             for r in edges.collect()}
    assert ("acme corp", "the acme corp") in pairs
    assert ("dataquill", "dataquill io") in pairs
    assert not any("granite labs" in p for p in pairs)


def test_canonicalize_norms_end_to_end(spark):
    """Dictionary-linked norms name their whole cluster; fully unknown
    clusters fall back to their lexicographically-first norm."""
    norms = spark.createDataFrame(
        [("acme corp",),         # dictionary hit
         ("acme corpp",),        # typo → cluster with the hit
         ("zzzz wobbleplex",), ("zzzz wobbleplexx",)],  # unknown cluster
        "norm string")
    mapping = {r["norm"]: r["entity"]
               for r in canon.canonicalize_norms(
                   norms, dictionary_df(spark)).collect()}
    assert mapping["acme corp"] == "Acme Corp"
    assert mapping["acme corpp"] == "Acme Corp"      # inherited via CC
    assert mapping["zzzz wobbleplex"] == mapping["zzzz wobbleplexx"] \
        == "zzzz wobbleplex"


def test_canonicalize_driver_path_equals_distributed(spark):
    """The driver-side C3+C4 fast path (small node sets) must be
    byte-identical to the distributed join/aggregate branch."""
    norms = spark.createDataFrame(
        [("acme corp",), ("acme corpp",), ("the acme corp",),
         ("dataquill",), ("dataquill io",), ("zzzz wobbleplex",),
         ("zzzz wobbleplexx",), ("granite labs",)], "norm string")
    d = dictionary_df(spark)
    fast = {(r["norm"], r["entity"])
            for r in canon.canonicalize_norms(norms, d).collect()}
    dist = {(r["norm"], r["entity"])
            for r in canon.canonicalize_norms(
                norms, d, driver_max_nodes=0).collect()}
    assert fast == dist and len(fast) == 8


def test_resolve_entities_typo_inherits_dict_entity(spark):
    """ADVICE r1: a dictionary-MISS typo variant must inherit the
    canonical entity of its dictionary-linked cluster-mate through
    connected components — which requires the dict norms to be part of
    the CC node set (they are not themselves misses)."""
    from kg import pipeline, schemas
    from pyspark.sql import types as T

    fields = [f for f in schemas.SCORED.fields if f.name != "token_ids"]
    schema = T.StructType(fields + [
        T.StructField("head_entity", T.StringType()),
        T.StructField("tail_entity", T.StringType())])
    row = {f.name: None for f in schema.fields}
    row.update(conv_id="c0", turn_idx=0,
               head_surface="Acme Corpp", head_norm="acme corpp",
               head_mtype="org", head_pos=0,
               tail_surface="Dataquill", tail_norm="dataquill",
               tail_mtype="tool", tail_pos=3,
               rel="located_in", score=0.9,
               head_entity=None, tail_entity="Dataquill")
    scored = spark.createDataFrame(
        [tuple(row[f.name] for f in schema.fields)], schema)
    out = pipeline.resolve_entities(scored, dictionary_df(spark)).collect()
    assert out[0]["head_entity"] == "Acme Corp"   # via CC, not cluster-min
    assert out[0]["tail_entity"] == "Dataquill"


def test_snapshot_id_requires_files(spark):
    from kg import pipeline
    import pytest as _pt

    df = spark.createDataFrame([(1,)], "x int")
    with _pt.raises(ValueError):
        pipeline.snapshot_id_of(df)


def test_simhash_near_pairs_recall_and_precision(spark):
    """The Manku block join must find EVERY pair within its Hamming
    guarantee (d ≤ n_blocks−1) and emit nothing beyond max_hamming —
    checked against exact all-pairs Hamming in numpy at sf0.001."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sims = canon.simhash64(docs).persist()
    got = {(r["src"], r["dst"]): r["hamming"]
           for r in canon.simhash_near_pairs(sims, max_hamming=3).collect()}
    sh = {r["doc_id"]: r["simhash"] for r in sims.collect()}
    ids = sorted(sh)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want[(a, b)] = d
    assert got == want
    assert want, "no pairs within Hamming 3 — vacuous"


def test_simhash_near_pairs_block_cap(spark):
    """Identical docs all share every block: a small cap must drop the
    degenerate bucket rather than emit O(n²) pairs."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(40)],
        "doc_id long, text string")
    sims = canon.simhash64(docs)
    assert canon.simhash_near_pairs(sims, block_cap=8).count() == 0
    full = canon.simhash_near_pairs(sims, block_cap=64).count()
    assert full == 40 * 39 // 2


def test_minhash_deterministic(spark):
    norms = spark.createDataFrame([("acme corp",), ("dataquill",)],
                                  "norm string")
    a = {r["node"]: r["sig"] for r in canon.minhash_signatures(norms).collect()}
    b = {r["node"]: r["sig"] for r in canon.minhash_signatures(norms).collect()}
    assert a == b
    assert len(a) == 2
    assert all(len(s) == 128 for s in a.values())


def test_near_duplicate_edges_matches_bruteforce(spark):
    """The WHOLE dedup path (word-shingle features → minhash → LSH
    banding → id-dedup → verify join) against an exact all-pairs
    DuckDB oracle at sf0.001: the planted document near-dups sit at
    shingle-Jaccard ≥ 0.9, where the b=32/r=4 banding miss probability
    is ~1e-15, so the edge SET must match exactly — recall 1.0 and
    precision 1.0, not just ≥0.95 (VERDICT r1 item 4)."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet") \
        .select((canon.F.lower("text")).alias("norm"))
    edges = canon.near_duplicate_edges(docs, tau=0.5, feature="word")
    feats = canon.node_features(docs, feature="word")
    norm_of = {r["node"]: r["norm"]
               for r in feats.select("node", "norm").collect()}
    got = {tuple(sorted((norm_of[r["src"]], norm_of[r["dst"]])))
           for r in edges.collect()}

    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    exact = con.execute("""
        WITH t AS (SELECT DISTINCT lower(text) AS norm FROM documents),
        w AS (SELECT norm, string_split(norm, ' ') AS toks FROM t),
        s AS (SELECT norm, list_distinct(
                  [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                   for i in range(1, greatest(len(toks) - 2, 1) + 1)]) AS ws
              FROM w)
        SELECT a.norm, b.norm FROM s a JOIN s b ON a.norm < b.norm
        WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
              / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)))
              >= 0.5
    """).fetchall()
    want = {tuple(sorted(p)) for p in exact}
    assert want, "oracle produced no near-dup pairs — test is vacuous"
    assert got == want


def test_candidate_pairs_stay_linear_on_natural_text(spark):
    """Regression for the round-1 scale-killer: on a natural-text
    corpus the LSH candidate-pair count must stay O(n·k), not O(n²).
    500 docs → 124,750 possible pairs; require < 8·n candidates."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet") \
        .select((canon.F.lower("text")).alias("norm"))
    feats = canon.node_features(docs, feature="word").persist()
    banded = canon.lsh_bands(canon.minhash_signatures(feats))
    n = feats.count()
    n_pairs = canon.candidate_pairs(banded).count()
    assert n_pairs < 8 * n, (n_pairs, n)


def test_candidate_pairs_drop_count_observable(spark):
    """ADVICE r2: over-cap buckets must be droppable WITH an
    observable count — 70 identical norms under block_cap=64 form one
    over-cap bucket per band; the Observation reports the drops and
    the pair set comes back empty."""
    from pyspark.sql import Observation

    norms = spark.createDataFrame([("acme corp",)] * 70 + [("zzz",)],
                                  "norm string")
    feats = canon.node_features(norms)
    banded = canon.lsh_bands(canon.minhash_signatures(feats))
    obs = Observation("lsh_drops")
    pairs = canon.candidate_pairs(banded, block_cap=64, obs=obs)
    assert pairs.count() == 0          # node_features dedups: 1 hot node
    # 70 identical norms collapse to ONE node -> no over-cap bucket;
    # build a real hot bucket from distinct-but-near-identical norms
    hot = [(f"shared prefix token run variant {i:03d}",)
           for i in range(70)]
    feats2 = canon.node_features(
        spark.createDataFrame(hot, "norm string"))
    banded2 = canon.lsh_bands(canon.minhash_signatures(feats2))
    obs2 = Observation("lsh_drops2")
    pairs2 = canon.candidate_pairs(banded2, block_cap=8, obs=obs2)
    pairs2.count()
    got = obs2.get
    assert got["dropped_buckets"] and got["dropped_buckets"] > 0
    assert got["dropped_nodes"] >= 9 * got["dropped_buckets"]


def test_canonicalize_edge_bound_falls_back_distributed(spark):
    """ADVICE r2 (medium): the driver C3+C4 fast path must probe the
    EDGE count, not just nodes — with driver_max_edges=1 a clustered
    norm set exceeds the bound and the distributed branch runs,
    producing identical output to the driver path."""
    rows = [("acme corp",), ("acme corporation",), ("acme corp.",),
            ("dataquill",), ("dataquill.io",), ("solben",)]
    norms = spark.createDataFrame(rows, "norm string")
    dict_df = spark.createDataFrame(
        [("acme corp", "Acme Corp"), ("dataquill", "Dataquill")],
        "norm string, entity string")
    via_driver = canon.canonicalize_norms(norms, dict_df)
    via_dist = canon.canonicalize_norms(norms, dict_df,
                                        driver_max_edges=1)
    assert sorted(map(tuple, via_driver.collect())) \
        == sorted(map(tuple, via_dist.collect()))


def test_components_auto_parity(spark):
    """components_auto: driver union-find output == distributed
    hash-to-min output on the same multi-component graph, and the
    edge-bound forces the distributed branch (probe discipline)."""
    edges = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(0, 30, 3)]      # 10 chains
        + [(100, 103, 1.0), (103, 106, 1.0)], schema=schemas.EDGES)
    nodes = spark.createDataFrame(
        [(i,) for i in range(0, 32)] + [(100,), (103,), (106,), (999,)],
        "node long")
    fast = {(r["node"], r["component"])
            for r in canon.components_auto(nodes, edges).collect()}
    dist = {(r["node"], r["component"])
            for r in canon.connected_components(nodes, edges).collect()}
    forced = {(r["node"], r["component"])
              for r in canon.components_auto(
                  nodes, edges, driver_max_edges=1).collect()}
    assert fast == dist == forced
    assert (999, 999) in fast            # singleton keeps itself


def test_simhash_md5_60_variant_exact_and_portable(spark):
    """The md5_60 signature variant (driver-oracle path): (a) block
    join == exact all-pairs Hamming at 60 bits, same guarantee as the
    xxhash64 variant; (b) every signature is reproducible OUTSIDE
    Spark from md5 + the ±1 vote — the property that makes the
    contract entry hash-verifiable by an external engine."""
    import hashlib

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sims = canon.simhash64(docs, word_hash="md5_60").persist()
    sh = {r["doc_id"]: r["simhash"] for r in sims.collect()}
    # (b) independent python recomputation, bit for bit
    for r in docs.select("doc_id", "text").limit(20).collect():
        hs = [int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
              for w in r["text"].lower().split(" ")]
        sig = sum(1 << i for i in range(60)
                  if sum(1 if (h >> i) & 1 else -1 for h in hs) > 0)
        assert sh[r["doc_id"]] == sig
    # (a) block-join exactness at n_bits=60
    got = {(r["src"], r["dst"]): r["hamming"]
           for r in canon.simhash_near_pairs(
               sims, max_hamming=3, n_bits=60).collect()}
    ids = sorted(sh)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin(sh[a] ^ sh[b]).count("1")
            if d <= 3:
                want[(a, b)] = d
    assert got == want and want
    sims.unpersist()
