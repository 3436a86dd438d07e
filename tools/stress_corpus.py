"""100×-scale dedup stress probe with a PROVABLE survivor invariant.

bench.py measures the corpus pipeline at sf0.1 (5k docs). This probe
answers the 100-TB question the bench can't: does the composed
QC → exact-dedup → LSH near-dup → CC → pack program stay correct AND
near-linear when the corpus grows 100× with realistic duplication
structure?

Construction (deterministic, seedless — pure arithmetic on doc_id):
every base document gains R replicas; replica r of doc d is
  - an EXACT duplicate (same text) when (d + r) % 10 != 0,
  - a NEAR duplicate (text + " xr<r>") otherwise — one appended word
    on an ~85-word document keeps 3-word-shingle Jaccard ≈ 0.93 ≥ τ.

Every replica therefore lands in its original's near-dup component,
and the survivor rule (min doc_id per component) picks the ORIGINAL
doc — so the stress corpus's survivor set must equal the base
corpus's survivor set EXACTLY. A dedup bug that only manifests at
scale (capped-bucket recall loss, partitioning dependence, skew
mishandling) breaks the equality.

The invariant holds while near-dup buckets stay under the LSH block
cap. At extreme duplication (e.g. 300 replicas → ~30 near-dup
variants per doc × multi-doc base clusters) buckets exceed the
default cap of 64 and are DROPPED — recall degrades, but observably:
the probe reports the dropped-bucket/node counters, and re-running
with --block-cap 256 restores the exact invariant. That pair of runs
is the documented cap semantics demonstrated end to end: recall is a
knob with a visible gauge, never a silent loss.

Usage: python tools/stress_corpus.py [--replicas 100]
         [--block-cap N] [--sf-dir ...]
Prints one JSON line:
  {n_docs, n_base, survivors, match, dropped_buckets, dropped_nodes,
   seconds}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_stress_corpus(base, replicas: int, offset: int,
                        perturb_tag: str = "xr"):
    """base(doc_id, text) × replicas: replica r of doc d is an exact
    duplicate unless (d + r) % 10 == 0, in which case one word
    ' <tag><r>' is appended (a near-duplicate at shingle Jaccard
    ≈ 0.93). Replica ids stack at d + r·offset; r=0 is the base
    itself."""
    from pyspark.sql import functions as F

    r = base.sparkSession.range(replicas).withColumnRenamed("id", "r")
    return (base.crossJoin(r)
            .select(
                (F.col("doc_id") + F.col("r") * offset)
                .alias("doc_id"),
                F.when(F.col("r") == 0, F.col("text"))
                 .when((F.col("doc_id") + F.col("r")) % 10 != 0,
                       F.col("text"))
                 .otherwise(F.concat("text", F.lit(f" {perturb_tag}"),
                                     F.col("r").cast("string")))
                 .alias("text")))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=100,
                    help="total copies of the base corpus (incl. it)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--block-cap", type=int, default=None,
                    help="LSH block cap override (default: spec.BLOCK_CAP)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kg.session import get_spark
    from kg.stages import corpus

    spark = get_spark(app_name="kg-corpus-stress")
    base = (spark.read.parquet(f"{args.sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    n_base = base.count()
    offset = n_base  # replica ids stack above the base id range

    stress = build_stress_corpus(base, args.replicas, offset)

    base_survivors = {
        row["doc_id"]
        for row in corpus.corpus_pipeline(base).select("doc_id").collect()}

    from pyspark.sql import Observation

    obs = Observation("stress_drops")
    t0 = time.time()
    got = {row["doc_id"] for row in
           corpus.corpus_pipeline(stress, block_cap=args.block_cap,
                                  obs=obs)
           .select("doc_id").collect()}
    dt = time.time() - t0
    # the observed blocking subtree was materialized by the eager
    # components probe + the collect above, so obs.get is safe here
    drops = obs.get

    print(json.dumps({
        "n_docs": n_base * args.replicas,
        "n_base": n_base,
        "survivors": len(got),
        "match": got == base_survivors,
        "dropped_buckets": drops.get("dropped_buckets"),
        "dropped_nodes": drops.get("dropped_nodes"),
        "seconds": round(dt, 2),
    }))
    spark.stop()
    # a mismatch WITH observed drops is the documented cap regime
    # (rerun with a higher --block-cap); a mismatch WITHOUT drops
    # would be a real dedup bug
    if got != base_survivors and not drops.get("dropped_buckets"):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
