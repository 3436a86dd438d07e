#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol).

Default mode (what the driver runs per round):
    python bench.py
runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {...}, "sf", ...
extra keys: turns_per_sec for the e2e pipeline}.

Scaling-evidence mode (BASELINE.md / north-rule two-cluster-size
protocol, sandbox proxy: same job + same input at local[8] vs
local[32]):
    python bench.py --scaling
spawns one subprocess per parallelism level (fresh JVM each — no
shared executor state), reports raw turns/sec at both levels plus
eff = tput(32) / (4 × tput(8)), and rewrites BENCH.md.

The e2e input is deterministic synthetic transcripts (kg.datagen,
seed 42) cached under .bench_data/ — byte-identical across levels.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR_DEFAULT = "/root/testdata/sf0.1"
BENCH_CONVS = int(os.environ.get("KG_BENCH_CONVS", "8000"))
BENCH_SKEW = 100


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_transcripts(spark) -> tuple[str, int]:
    """Generate-once-and-cache the bench transcript table."""
    from kg import datagen

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".bench_data")
    path = os.path.join(root, f"transcripts_c{BENCH_CONVS}_s{BENCH_SKEW}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        datagen.write_transcripts(path, spark,
                                  n_conversations=BENCH_CONVS,
                                  mean_turns=8, seed=42,
                                  skew_factor=BENCH_SKEW)
    n_turns = spark.read.parquet(path).count()
    return path, n_turns


def run_queries(cpus: int, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from kg import contract, pipeline
    from kg.session import get_spark
    from kg.stages import score

    spark = get_spark(app_name=f"kg-bench-{cpus}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    t_path, n_turns = ensure_transcripts(spark)

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        # release persisted frames so queries don't interfere
        spark.catalog.clearCache()

    # warm the JVM + Python worker pool once (excluded from timings)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # --- e2e KG pipeline: the headline number -----------------------
    bc = score.broadcast_weights(spark)

    def e2e():
        t0 = spark.read.parquet(t_path)
        out = pipeline.run(spark, t0, weights_bc=bc)
        out["triples"].write.mode("overwrite").parquet(
            os.path.join(".bench_data", "_out_triples"))

    timed("kg_e2e_pipeline", e2e)

    # --- macro-stage: extraction+scoring only (the Python-bound path)
    def extract_score():
        t0 = spark.read.parquet(t_path)
        pipeline.extract_and_score(spark, t0, weights_bc=bc) \
            .write.mode("overwrite").parquet(
                os.path.join(".bench_data", "_out_scored"))

    timed("kg_extract_score", extract_score)

    # --- representative relational operators at sf ------------------
    for name in ("agg_basic", "join_inner", "window_rank",
                 "join_range_window", "topk", "knn_cosine_bruteforce",
                 "two_phase_salted_agg", "ngram_jaccard_pairs",
                 "minhash_lsh_dedup", "text_quality_score"):
        fn, _ = contract.Q[name]
        timed(name, lambda fn=fn: fn(spark, sf_dir)
              .write.mode("overwrite").format("noop").save())

    spark.stop()
    tput = n_turns / timings["kg_e2e_pipeline"]
    return {"cpus": cpus, "n_turns": n_turns, "timings": timings,
            "turns_per_sec": round(tput, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", SF_DIR_DEFAULT)
    sf = _sf_of(sf_dir)

    if args.scaling:
        results = {}
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--cpus", str(cpus),
                 "--json-only"],
                capture_output=True, text=True, check=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir,
                     # 10× corpus: compute must dominate fixed costs
                     # (JVM+worker-pool spin-up) for an honest
                     # parallelism-scaling measurement
                     "KG_BENCH_CONVS": os.environ.get(
                         "KG_BENCH_CONVS_SCALING", "80000")})
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        t8, t32 = (results[8]["turns_per_sec"],
                   results[32]["turns_per_sec"])
        eff = t32 / (4 * t8)
        payload = {
            "metric": "scaling_efficiency_local8_to_local32",
            "value": round(eff, 3), "unit": "ratio", "sf": sf,
            "turns_per_sec_local8": t8, "turns_per_sec_local32": t32,
            "n_turns": results[32]["n_turns"],
            "queries": {f"local{c}": r["queries"]
                        for c, r in results.items()},
        }
        print(json.dumps(payload))
        _write_bench_md(payload)
        return

    cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    r = run_queries(cpus, sf_dir)
    payload = {
        "metric": "headline_query_seconds",
        "value": round(sum(r["timings"].values()), 3),
        "unit": "sec",
        "queries": r["timings"],
        "sf": sf,
        "cpus": cpus,
        "n_turns": r["n_turns"],
        "turns_per_sec": r["turns_per_sec"],
    }
    print(json.dumps(payload))


def _write_bench_md(p: dict) -> None:
    lines = [
        "# BENCH — measured scaling evidence (BASELINE.md §scaling protocol)",
        "",
        f"- input: {p['n_turns']} synthetic transcript turns "
        "(kg.datagen seed 42, hot-conversation skew ×100), byte-identical "
        "at both parallelism levels",
        f"- local[8]  e2e throughput: **{p['turns_per_sec_local8']} "
        "turns/sec**",
        f"- local[32] e2e throughput: **{p['turns_per_sec_local32']} "
        "turns/sec**",
        f"- scaling efficiency tput(32)/(4×tput(8)) = **{p['value']}** "
        "(target ≥ 0.8)",
        "",
        "Per-query seconds:",
        "",
        "| query | local[8] | local[32] |",
        "| --- | --- | --- |",
    ]
    q8, q32 = p["queries"]["local8"], p["queries"]["local32"]
    for k in q8:
        lines.append(f"| {k} | {q8[k]} | {q32.get(k, '-')} |")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
