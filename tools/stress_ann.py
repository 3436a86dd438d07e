"""Scale stress probe for many-to-many ANN — recall measured against
exact brute-force ground truth at 10–30× the pytest table size, for
BOTH scale paths (hyperplane LSH and IVF).

Data: the test_ann.py clustered regime scaled up — C unit centers,
P members each with angular noise σ=0.03 (within-cluster cosine
≈ 0.94). Ground truth: exact top-k over the full similarity matrix
for a deterministic sample of queries (numpy; the full N×N matrix is
why this is a sampled measurement above ~30k vectors).

Reported per path: mean recall@k on the sample, wall-clock. The
recall floor (≥ 0.8 LSH, ≥ 0.85 IVF) asserts the bucketed candidate
generation does not silently degrade as buckets grow — the failure
mode bucket caps + more tables exist to manage.

Usage: python tools/stress_ann.py [--centers 600] [--per 100]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
K = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--centers", type=int, default=600)
    ap.add_argument("--per", type=int, default=100)
    ap.add_argument("--sample", type=int, default=500)
    ap.add_argument("--auto-lsh", action="store_true",
                    help="size (n_planes, n_tables) with "
                         "ann.lsh_params_for(n) instead of the fixed "
                         "(8, 4) — the bounded-cost configuration the "
                         "module documents for LSH beyond ~50k vectors")
    args = ap.parse_args()

    from kg.session import get_spark
    from kg.stages import ann

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((args.centers, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = (np.repeat(centers, args.per, axis=0)
           + 0.03 * rng.standard_normal((args.centers * args.per, DIM)))
    n = len(pts)

    spark = get_spark(app_name="kg-ann-stress")
    import pandas as pd

    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": [row.astype(np.float32)
                                      for row in pts]})
    df = (spark.createDataFrame(pdf)
          .selectExpr("vec_id",
                      "cast(embedding as array<float>) as embedding")
          .localCheckpoint())

    # exact ground truth for a deterministic query sample
    qs = np.arange(0, n, max(n // args.sample, 1))[:args.sample]
    v = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    sims = v[qs] @ v.T
    for row_i, q in enumerate(qs):
        sims[row_i, q] = -2.0
    want = np.argsort(-sims, axis=1)[:, :K]

    def recall(top) -> float:
        got: dict[int, set[int]] = {}
        for r in top.where(top.q.isin([int(q) for q in qs])).collect():
            got.setdefault(r["q"], set()).add(r["c"])
        return float(np.mean([
            len(got.get(int(q), set()) & set(want[i])) / K
            for i, q in enumerate(qs)]))

    if args.auto_lsh:
        n_planes, n_tables = ann.lsh_params_for(n)
    else:
        n_planes, n_tables = 8, 4
    t0 = time.time()
    lsh_recall = recall(ann.ann_topk_self_join(
        df, dim=DIM, k=K, n_planes=n_planes, n_tables=n_tables, seed=7))
    dt_lsh = time.time() - t0

    t1 = time.time()
    ivf_recall = recall(ann.ivf_topk_self_join(
        df, n_cells=max(args.centers // 8, 16), nprobe=2, k=K, seed=7))
    dt_ivf = time.time() - t1

    print(json.dumps({
        "n_vectors": n,
        "lsh_planes": n_planes,
        "lsh_tables": n_tables,
        "n_queries": len(qs),
        "lsh_recall_at_10": round(lsh_recall, 3),
        "ivf_recall_at_10": round(ivf_recall, 3),
        "lsh_seconds": round(dt_lsh, 2),
        "ivf_seconds": round(dt_ivf, 2),
    }))
    spark.stop()
    if lsh_recall < 0.8 or ivf_recall < 0.85:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
