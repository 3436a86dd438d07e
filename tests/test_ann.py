"""Many-to-many ANN bucket join (kg.stages.ann) vs brute-force cosine.

Recall is measured on a DETERMINISTIC clustered table (20 centers ×
25 members, 64-dim, tight clusters): hyperplane LSH only has signal
when neighbors are actually angular-close — the driver's embeddings
fixture is near-random (top-1 cosine ≈0.37), where no LSH family
separates neighbors from noise. The plumbing (bucket self-join, pair
dedup, re-rank, top-k window) is the same either way and is what the
contract entry exercises on the fixture.
"""

from __future__ import annotations

import numpy as np
import pytest

from kg.stages import ann

N_CENTERS, PER, DIM, K = 20, 25, 64, 10


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((N_CENTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # noise ‖ε‖ ≈ 0.03·√64 = 0.24 against unit centers → within-cluster
    # cosine ≈ 0.94 (θ ≈ 0.33 rad) — angular-close enough for LSH
    pts = (np.repeat(centers, PER, axis=0)
           + 0.03 * rng.standard_normal((N_CENTERS * PER, DIM)))
    rows = [(i, [float(x) for x in pts[i]]) for i in range(len(pts))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, pts.astype(np.float32)


def _true_topk(pts: np.ndarray, k: int) -> np.ndarray:
    v = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    s = v @ v.T
    np.fill_diagonal(s, -2.0)
    return np.argsort(-s, axis=1)[:, :k]


def test_ann_recall_vs_bruteforce(spark, clustered):
    df, pts = clustered
    top = ann.ann_topk_self_join(df, dim=DIM, k=K, n_planes=8,
                                 n_tables=4, seed=7)
    got: dict[int, set[int]] = {}
    for r in top.collect():
        got.setdefault(r["q"], set()).add(r["c"])
    want = _true_topk(pts.astype(np.float64), K)
    recalls = [len(got.get(q, set()) & set(want[q])) / K
               for q in range(len(pts))]
    mean_recall = float(np.mean(recalls))
    # θ(top-10 neighbor) ≈ 0.33 rad ⇒ per-table collision ≈ 0.89^8,
    # union over 4 tables ≈ 0.88; measured 0.91 with this pinned seed
    assert mean_recall >= 0.85, mean_recall


def test_ann_is_exact_within_candidates(spark, clustered):
    """Every reported neighbor's cosine must equal the exact cosine
    (re-rank is exact; only candidate GENERATION is approximate), and
    ranks must be contiguous from 1 with the pinned tie-break."""
    df, pts = clustered
    top = ann.ann_topk_self_join(df, dim=DIM, k=3, n_planes=8,
                                 n_tables=2, seed=7).collect()
    v = pts.astype(np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    by_q: dict[int, list] = {}
    for r in top:
        assert abs(r["cos"] - float(v[r["q"]] @ v[r["c"]])) < 1e-6
        by_q.setdefault(r["q"], []).append((r["rnk"], -r["cos"], r["c"]))
    for q, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))


def test_ivf_recall_vs_bruteforce(spark, clustered):
    """IVF self-join ANN: with cells ≈ true clusters and nprobe=2,
    recall@10 on the clustered table must be ≥ 0.9 (members of the
    same k-means cell dominate every true neighborhood)."""
    df, pts = clustered
    top = ann.ivf_topk_self_join(df, n_cells=24, nprobe=2, k=K, seed=7)
    got: dict[int, set[int]] = {}
    for r in top.collect():
        got.setdefault(r["q"], set()).add(r["c"])
    want = _true_topk(pts.astype(np.float64), K)
    recall = float(np.mean([len(got.get(q, set()) & set(want[q])) / K
                            for q in range(len(pts))]))
    assert recall >= 0.9, recall


def test_bucket_cap_drops_degenerate_buckets(spark):
    """All-identical vectors land in one bucket per table; a cap of 8
    must drop the 50-member bucket rather than emit 50·49 pairs."""
    rows = [(i, [1.0] * 8) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b = ann.hyperplane_buckets(df, dim=8, n_planes=4, n_tables=2, seed=3)
    assert ann.candidate_pairs(b, bucket_cap=8).count() == 0
    assert ann.candidate_pairs(b, bucket_cap=64).count() == 50 * 49


def test_cosine_zero_norm_guard(spark):
    """ADVICE r2: a zero vector must not score NaN (Spark orders NaN
    above every real double, so a zero-norm candidate would take
    rnk=1 for every query). With the greatest(·, 1e-12) guard its
    cosine is 0.0 and it ranks below any positive match."""
    rows = [(0, [1.0, 0.0, 0.0]),       # query
            (1, [0.9, 0.1, 0.0]),       # true neighbor
            (2, [0.0, 0.0, 0.0])]       # zero vector
    vecs = spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>")
    pairs = spark.createDataFrame([(0, 1), (0, 2)], "q long, c long")
    got = {r["c"]: (r["cos"], r["rnk"])
           for r in ann.rerank_topk(pairs, vecs, k=2).collect()}
    assert got[2][0] == 0.0 and not np.isnan(got[2][0])
    assert got[1][1] == 1 and got[2][1] == 2


def test_lsh_params_for_bounds_occupancy():
    """Auto-sizing (r5): planes grow with log2(n) so expected bucket
    occupancy stays ≈ the target whatever n; tables grow to hold
    recall ≥ target under the Charikar per-table collision model."""
    for n in (1_000, 60_000, 120_000, 10_000_000):
        planes, tables = ann.lsh_params_for(n)
        assert n / (2 ** planes) <= 64 * 1.01          # occupancy bound
        p = 0.889 ** planes                            # near-pair regime
        assert 1 - (1 - p) ** tables >= 0.9 - 1e-9     # recall target
    # monotone: more vectors never means fewer planes
    ps = [ann.lsh_params_for(n)[0] for n in (10**3, 10**4, 10**5, 10**6)]
    assert ps == sorted(ps)


def test_train_centroids_sample_is_order_unbiased(spark):
    """r5 regression (caught by the 120k probe): the quantizer sample
    was `limit(sample)` — the FIRST rows — so a corpus whose storage
    order correlates with geometry trained on a biased prefix. With
    hash-spread sampling, training on a sample SMALLER than the
    corpus must still cover clusters from the whole id range."""
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((10, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # cluster-ordered: ids 0..99 = cluster 0, 100..199 = cluster 1, …
    pts = (np.repeat(centers, 100, axis=0)
           + 0.03 * rng.standard_normal((1000, DIM)))
    rows = [(i, [float(x) for x in pts[i]]) for i in range(len(pts))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # 16 cells for 10 clusters: over-provisioning sidesteps the
    # k-means local optimum where two clusters merge into one
    # centroid (a quantizer-quality issue, not a sampling one)
    cents = ann.train_centroids(df, n_cells=16, sample=200, seed=7)
    # every true cluster center must be near SOME trained centroid; a
    # prefix sample (old behavior: clusters 0-1 only) leaves the last
    # clusters ~orthogonal to every centroid (max cos ≈ 0.2-0.4)
    cover = (centers @ cents.T).max(axis=1)
    assert float(cover.min()) > 0.8, cover
