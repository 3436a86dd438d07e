"""Scale stress probe for the FLAGSHIP triple-extraction pipeline,
with a provable output invariant (the KG twin of stress_corpus.py).

Replicate a seeded synthetic transcript corpus k× under fresh
conv_ids. Extraction, scoring, and entity linking are per-conversation
functions of content, entity canonicalization sees no new surface
forms, and dedup_aggregate takes max(score) — so the stress run's
triples must satisfy, EXACTLY:

  - (subj, pred, obj) set       == base set
  - confidence per triple       == base confidence (max is
                                   replica-invariant)
  - n_support per triple        == k × base n_support

Any partitioning dependence, shuffle nondeterminism, lost or
double-counted instances, or canonicalization drift that only shows
up at scale breaks one of the three equalities. Wall-clock and
turns/sec are reported for the scale story; the equalities are the
correctness story.

Usage: python tools/stress_kg.py [--base-convs 500] [--replicas 64]
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
    ap.add_argument("--base-convs", type=int, default=500)
    ap.add_argument("--replicas", type=int, default=64)
    ap.add_argument("--cross-turn-k", type=int, default=0,
                    help="also exercise the ±k cross-turn pairing "
                         "path (the r4 streaming-mapInPandas rewrite) "
                         "under the same invariants")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kg import datagen, pipeline, schemas
    from kg.session import get_spark

    spark = get_spark(app_name="kg-stress")
    pdf, _ = datagen.generate(n_conversations=args.base_convs, seed=42)
    base = spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS) \
                .localCheckpoint()
    n_turns_base = base.count()

    r = spark.range(args.replicas).withColumnRenamed("id", "r")
    stress = (base.crossJoin(r)
              .select(F.concat("conv_id", F.lit("#"),
                               F.col("r").cast("string"))
                      .alias("conv_id"),
                      "turn_idx", "role", "text", "tool", "ts")
              .localCheckpoint())
    n_turns = stress.count()

    def triple_map(df):
        return {(row["subj"], row["pred"], row["obj"]):
                (row["confidence"], row["n_support"])
                for row in df.select("subj", "pred", "obj",
                                     "confidence",
                                     "n_support").collect()}

    want = triple_map(pipeline.run(
        spark, base, cross_turn_k=args.cross_turn_k)["triples"])

    t0 = time.time()
    got = triple_map(pipeline.run(
        spark, stress, cross_turn_k=args.cross_turn_k)["triples"])
    dt = time.time() - t0

    keys_match = set(got) == set(want)
    conf_match = keys_match and all(
        got[key][0] == want[key][0] for key in want)
    support_match = keys_match and all(
        got[key][1] == args.replicas * want[key][1] for key in want)

    print(json.dumps({
        "n_turns": n_turns,
        "n_turns_base": n_turns_base,
        "n_triples": len(got),
        "cross_turn_k": args.cross_turn_k,
        "keys_match": keys_match,
        "confidence_match": conf_match,
        "support_times_k": support_match,
        "seconds": round(dt, 2),
        "turns_per_sec": round(n_turns / dt, 1),
    }))
    spark.stop()
    if not (keys_match and conf_match and support_match):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
