"""Scale stress probe for INCREMENTAL dedup — the day-2 regime at
100× pytest scale, with the split-equivalence guarantee asserted
against a full one-shot rescan AND the O(batch)-vs-O(corpus) cost
ratio measured on the same session.

Corpus: the sf0.1 documents table replicated R× with realistic
duplication (tools/stress_corpus.build_stress_corpus — exact and
near-dup replicas). Ingest batch: one fresh near-dup variant of every
base document (a ' yq0' word appended), ids above the corpus range.

Asserted EXACTLY (the test_incremental.py guarantee, at scale):

  incremental(batch vs index) == one-shot(corpus ∪ batch)
                                  ∩ {pairs touching a batch node}

Measured: wall-clock of the incremental query vs the one-shot rescan
— the number that justifies the module's existence: batch dedup must
not pay the corpus scan.

Usage: python tools/stress_incremental.py [--replicas 100]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--batch-docs", type=int, default=250,
                    help="ingest-batch size in docs; the day-2 regime "
                         "is batch ≪ corpus — pass --batch-docs equal "
                         "to the base size to see the crossover where "
                         "incremental stops paying off")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from stress_corpus import build_stress_corpus

    from pyspark.sql import functions as F

    from kg.session import get_spark
    from kg.stages import canon, incremental

    spark = get_spark(app_name="kg-incremental-stress")
    base = (spark.read.parquet(f"{args.sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    n_base = base.count()

    corpus = build_stress_corpus(base, args.replicas, n_base)
    old_norms = corpus.select(F.lower("text").alias("norm"))
    batch = (base.where(F.col("doc_id") < args.batch_docs)
             .select(F.concat(F.lower("text"), F.lit(" yq0"))
                     .alias("norm")))
    n_docs = n_base * args.replicas

    # index build is day-1 cost — outside the timed region, exactly
    # like bench.py's pre-materialized parquet index
    feats, bands = incremental.build_dedup_index(old_norms,
                                                 feature="word")
    feats = feats.localCheckpoint()
    bands = bands.localCheckpoint()

    t0 = time.time()
    inc_edges, nf, nb = incremental.incremental_near_dup_edges(
        batch, feats, bands, tau=0.5, feature="word",
        batch_count_hint=args.batch_docs)
    inc = {(r["src"], r["dst"], round(r["sim"], 6))
           for r in inc_edges.collect()}
    dt_inc = time.time() - t0

    t1 = time.time()
    one_shot_edges = canon.near_duplicate_edges(
        old_norms.unionByName(batch), tau=0.5, feature="word")
    one_shot = {(r["src"], r["dst"], round(r["sim"], 6))
                for r in one_shot_edges.collect()}
    dt_full = time.time() - t1

    new_nodes = {r["node"] for r in nf.select("node").collect()}
    want = {e for e in one_shot
            if e[0] in new_nodes or e[1] in new_nodes}

    print(json.dumps({
        "n_corpus_docs": n_docs,
        "n_batch_docs": args.batch_docs,
        "inc_edges": len(inc),
        "split_equivalence": inc == want,
        "inc_seconds": round(dt_inc, 2),
        "one_shot_seconds": round(dt_full, 2),
        "speedup": round(dt_full / max(dt_inc, 1e-9), 1),
    }))
    incremental.release_batch(nf, nb)
    spark.stop()
    if inc != want:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
