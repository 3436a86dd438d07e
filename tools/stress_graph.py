"""Scale stress probe for the graph operators (kg/stages/graph.py —
driver-oracle entries pagerank_iter3 / min_label_prop_iter3 /
triangle_counts_parts) — R disjoint replica copies of a
deterministic base graph, verified by invariants no wrong
implementation satisfies together.

--op pagerank (default):

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

--op lpa: same replica graph; after k synchronous min-label rounds
every node's label must EQUAL an independent dense numpy k-hop-min
reference computed on one base block (labels never cross replica
boundaries, so per-slot the block-relative label is a single exact
value — checked for all B slots, not sampled).

--op triangles: ring + i→i+2 chord blocks — by construction EVERY
node closes exactly 3 triangles ({i-2,i-1,i}, {i-1,i,i+1},
{i,i+1,i+2}), so the exact invariant is per-node count ≡ 3 over all
R×B nodes (and total corner-sum = 3·R·B). Uniform degree 4 also
forces the degree-ordered orientation through its id tie-break.

Usage: python tools/stress_graph.py [--op pagerank|lpa|triangles]
                                    [--replicas 64] [--block 4096]
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


def _ring_hub_edges(spark, r, b):
    """R disjoint symmetrized ring+hub blocks; returns (nodes, edges,
    n_edges)."""
    from pyspark.sql import functions as F

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
    n_edges = 2 * (n + (n // 16 - r))
    return nodes, edges, n_edges


def _numpy_khop_min_block(b, iters):
    """Dense reference labels for ONE ring+hub block after `iters`
    synchronous min rounds (labels = slot indices 0..b-1)."""
    nbrs = [[] for _ in range(b)]
    half = [(i, (i + 1) % b) for i in range(b)]
    half += [(0, j) for j in range(16, b, 16)]
    for s, d in half:
        nbrs[d].append(s)
        nbrs[s].append(d)
    lab = list(range(b))
    for _ in range(iters):
        lab = [min([lab[v]] + [lab[u] for u in nbrs[v]])
               for v in range(b)]
    return lab


def _run_lpa(spark, args):
    from pyspark.sql import functions as F

    from kg.stages import graph

    r, b = args.replicas, args.block
    n = r * b
    nodes, edges, n_edges = _ring_hub_edges(spark, r, b)
    t0 = time.time()
    lab = graph.min_label_propagation(nodes, edges, iters=args.iters,
                                      checkpoint_every=2)
    # block-relative label per slot: must be a single distinct value
    # across all R replicas AND equal the numpy reference
    per_slot = (lab.select((F.col("node") % b).alias("slot"),
                           (F.col("label") % b).alias("rel"))
                .groupBy("slot")
                .agg(F.countDistinct("rel").alias("n_rel"),
                     F.min("rel").alias("rel"),
                     F.count("*").alias("cnt"))
                .collect())
    dt = time.time() - t0
    ref = _numpy_khop_min_block(b, args.iters)
    sym_ok = all(row["n_rel"] == 1 and row["cnt"] == r
                 for row in per_slot)
    exact_ok = (len(per_slot) == b
                and all(row["rel"] == ref[row["slot"]]
                        for row in per_slot))
    print(json.dumps({
        "op": "lpa", "n_nodes": n, "n_edges": n_edges,
        "replicas": r, "iters": args.iters,
        "replica_symmetry": bool(sym_ok),
        "labels_match_reference": bool(exact_ok),
        "seconds": round(dt, 2),
        "edge_iters_per_sec": round(n_edges * args.iters / dt),
    }))
    return sym_ok and exact_ok


def _run_triangles(spark, args):
    from pyspark.sql import functions as F

    from kg.stages import graph

    r, b = args.replicas, args.block
    n = r * b
    ids = spark.range(n)
    base = (F.col("id") - F.col("id") % b)
    ring = ids.select(F.col("id").alias("src"),
                      (base + (F.col("id") + 1) % b).alias("dst"))
    chord = ids.select(F.col("id").alias("src"),
                       (base + (F.col("id") + 2) % b).alias("dst"))
    # undirected-simple form: each edge once with src < dst
    edges = (ring.unionByName(chord)
             .select(F.least("src", "dst").alias("src"),
                     F.greatest("src", "dst").alias("dst"))
             .distinct())
    n_edges = 2 * n  # ring + chord per node
    t0 = time.time()
    stats = (graph.triangle_counts(edges)
             .agg(F.count("*").alias("n_nodes_in_tri"),
                  F.min("n_triangles").alias("mn"),
                  F.max("n_triangles").alias("mx"),
                  F.sum("n_triangles").alias("corner_sum"))
             .collect()[0])
    dt = time.time() - t0
    ok = (stats["n_nodes_in_tri"] == n and stats["mn"] == 3
          and stats["mx"] == 3 and stats["corner_sum"] == 3 * n)
    print(json.dumps({
        "op": "triangles", "n_nodes": n, "n_edges": n_edges,
        "replicas": r,
        "expected_triangles": n, "corner_sum": int(stats["corner_sum"]),
        "per_node_exactly_3": bool(stats["mn"] == 3
                                   and stats["mx"] == 3),
        "all_counts_exact": bool(ok),
        "seconds": round(dt, 2),
        "edges_per_sec": round(n_edges / dt),
    }))
    return ok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", choices=("pagerank", "lpa", "triangles"),
                    default="pagerank")
    ap.add_argument("--replicas", type=int, default=64)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kg.session import get_spark
    from kg.stages import graph

    spark = get_spark(app_name="kg-graph-stress")
    if args.op != "pagerank":
        ok = (_run_lpa if args.op == "lpa"
              else _run_triangles)(spark, args)
        spark.stop()
        raise SystemExit(0 if ok else 1)
    r, b = args.replicas, args.block
    n = r * b

    nodes, edges, n_edges = _ring_hub_edges(spark, r, b)

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
