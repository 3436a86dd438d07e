"""Semantic dedup (kg/stages/semantic.py): brute-path parity with a
pure-python union-find, the LSH-refinement invariant, and decision
structure."""
from pyspark.sql import functions as F

from kg.stages import ann, semantic


def _vecs(spark, n=200):
    return (spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet")
        .where(f"vec_id < {n}").select("vec_id", "embedding"))


def _clusters(df):
    return {r["vec_id"]: (r["cluster"], r["keep"]) for r in df.collect()}


def _python_reference(spark, n, tau):
    """Union-find over numpy brute-force cosine — independent of every
    Spark/DuckDB code path."""
    import numpy as np

    rows = sorted((r["vec_id"], r["embedding"])
                  for r in _vecs(spark, n).collect())
    ids = [i for i, _ in rows]
    m = np.array([e for _, e in rows], dtype=np.float64)
    nm = np.sqrt((m * m).sum(axis=1))
    cos = (m @ m.T) / np.maximum(np.outer(nm, nm), 1e-12)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if cos[a, b] >= tau:
                ra, rb = find(ids[a]), find(ids[b])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def test_brute_matches_python_union_find(spark):
    got = _clusters(semantic.semantic_dedup(_vecs(spark), tau=0.3,
                                            method="brute"))
    want = _python_reference(spark, 200, 0.3)
    assert {k: v[0] for k, v in got.items()} == want
    # nontrivial structure: some merges happened, not everything merged
    n_clusters = len(set(want.values()))
    assert 1 < n_clusters < 200


def test_one_keep_per_cluster(spark):
    got = semantic.semantic_dedup(_vecs(spark), tau=0.3, method="brute")
    per = (got.groupBy("cluster")
           .agg(F.sum(F.col("keep").cast("int")).alias("n_keep"),
                F.min("vec_id").alias("mn"),
                F.first("cluster").alias("c")).collect())
    assert all(r["n_keep"] == 1 for r in per)
    assert all(r["mn"] == r["c"] for r in per)  # representative = min id


def test_lsh_refines_brute(spark):
    """Exact in-candidate verification ⇒ LSH edges ⊆ brute edges ⇒
    every LSH cluster sits inside ONE brute cluster (splits allowed,
    wrong merges impossible)."""
    brute = {k: v[0] for k, v in _clusters(
        semantic.semantic_dedup(_vecs(spark), tau=0.3,
                                method="brute")).items()}
    lsh = {k: v[0] for k, v in _clusters(
        semantic.semantic_dedup(_vecs(spark), tau=0.3, method="lsh",
                                dim=64)).items()}
    assert set(lsh) == set(brute)
    image = {}
    for vid, lc in lsh.items():
        bc = brute[vid]
        assert image.setdefault(lc, bc) == bc, \
            f"LSH cluster {lc} spans brute clusters"


def test_lsh_edge_precision_exact(spark):
    """Every surviving LSH edge is a true ≥ τ pair (exact filter)."""
    edges = semantic.cosine_edges_lsh(_vecs(spark), tau=0.3, dim=64)
    e1 = _vecs(spark).select(F.col("vec_id").alias("src"),
                             F.col("embedding").alias("e1"))
    e2 = _vecs(spark).select(F.col("vec_id").alias("dst"),
                             F.col("embedding").alias("e2"))
    cos = ann.cosine(F.col("e1"), F.col("e2"))
    bad = (edges.join(e1, "src").join(e2, "dst")
           .where(cos < 0.3).count())
    assert bad == 0
