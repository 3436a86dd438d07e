"""Scale stress probe for the PageRank operator (kg/stages/graph.py,
driver-oracle entry pagerank_iter3) — R disjoint replica copies of a
deterministic base graph, verified by two invariants no wrong
implementation satisfies together:

  1. REPLICA SYMMETRY (exact-shape): the copies are structurally
     identical and disjoint, so corresponding nodes across all R
     copies must converge to the SAME score. Checked per intra-block
     node index: max-min spread < 1e-12 (the only legitimate variance
     is float sum-order, ~1e-16/term). A dropped edge, a wrong outdeg,
     or any cross-replica leakage breaks the symmetry immediately.
  2. MASS CONSERVATION: the base block is a symmetrized ring+hub, so
     every node has out-edges (no dangling mass loss) and each
     iteration maps total mass 1 → 0.15 + 0.85·1 = 1 exactly;
     |Σpr − 1| must stay < 1e-9 after all iterations.

Base block (size B, deterministic arithmetic): ring i → (i+1) mod B,
hub shortcuts hub=block base ↔ every 16th node, then symmetrized —
mixed degrees (hub ≈ B/8, ring nodes 2–4), diameter ~B/2 so the
iterations genuinely propagate.

Usage: python tools/stress_graph.py [--replicas 64] [--block 4096]
                                    [--iters 5]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=64)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kg.session import get_spark
    from kg.stages import graph

    spark = get_spark(app_name="kg-graph-stress")
    r, b = args.replicas, args.block
    n = r * b

    ids = spark.range(n)
    base = (F.col("id") - F.col("id") % b)  # block start
    ring = ids.select(F.col("id").alias("src"),
                      (base + (F.col("id") + 1) % b).alias("dst"))
    hub = (ids.where(f"id % 16 = 0 and id % {b} != 0")
           .select(base.alias("src"), F.col("id").alias("dst")))
    half = ring.unionByName(hub)
    edges = half.unionByName(half.select(F.col("dst").alias("src"),
                                         F.col("src").alias("dst")))
    nodes = ids.select(F.col("id").alias("node"))

    t0 = time.time()
    pr = graph.pagerank(nodes, edges, iters=args.iters,
                        checkpoint_every=2)
    stats = (pr.select((F.col("node") % b).alias("slot"), "pr")
             .groupBy("slot")
             .agg(F.count("*").alias("cnt"),
                  (F.max("pr") - F.min("pr")).alias("spread"))
             .agg(F.sum(F.col("cnt")).alias("n_scored"),
                  F.max("spread").alias("max_spread")).collect()[0])
    mass = pr.agg(F.sum("pr")).collect()[0][0]
    dt = time.time() - t0

    n_edges = 2 * (n + (n // 16 - r))  # ring + hub, symmetrized
    sym_ok = bool(stats["max_spread"] < 1e-12
                  and stats["n_scored"] == n)
    mass_ok = bool(abs(mass - 1.0) < 1e-9)
    print(json.dumps({
        "n_nodes": n,
        "n_edges": n_edges,
        "replicas": r,
        "iters": args.iters,
        "replica_symmetry": sym_ok,
        "max_cross_replica_spread": float(stats["max_spread"]),
        "mass_error": abs(mass - 1.0),
        "mass_conserved": mass_ok,
        "seconds": round(dt, 2),
        "edge_iters_per_sec": round(n_edges * args.iters / dt),
    }))
    spark.stop()
    if not (sym_ok and mass_ok):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
