#!/usr/bin/env python
"""Round-6 optimization measurement harness (guide §1) — bench.py is
FROZEN for driver measurement, so the extra evidence lives here:

- per-query noop-sink timing for ANY subset of contract.Q entries at
  any SF dir (``--queries a,b,c``), best-of-N with per-entry noise
  attribution: /proc/loadavg + the fixed numpy calibration matmul are
  sampled BEFORE EVERY ENTRY (VERDICT r5 next-round #1 — bench.py
  samples once per run, so a mid-run co-tenant burst is unattributable
  there; here every number carries its own host-speed context).
- ``--plans DIR --suffix before|after`` additionally writes
  ``DIR/<query>_<suffix>.txt`` with .explain("formatted") for each
  timed query (the judge's plan-claim evidence).

Methodology matches bench.py exactly: same session factory (AQE on,
shuffle partitions = cpus), noop sink, clearCache between trials,
warm-up scan of lineitem first. Numbers printed as ONE JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def calib() -> dict:
    import numpy as np

    with open("/proc/loadavg") as f:
        loadavg = [float(x) for x in f.read().split()[:3]]
    a = np.full((600, 600), 1.0 / 600, dtype=np.float64)
    t0 = time.perf_counter()
    for _ in range(30):
        a = a @ a
    return {"loadavg": loadavg,
            "calibration_sec": round(time.perf_counter() - t0, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--plans", default="")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from kg import contract
    from kg.session import get_spark

    spark = get_spark(app_name="kg-bench-extra",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    # warm the JVM + Python worker pool the way bench.py does
    spark.read.parquet(f"{args.sf_dir}/lineitem.parquet").count()

    names = ([q.strip() for q in args.queries.split(",") if q.strip()]
             or list(contract.Q))
    out: dict[str, dict] = {}
    for name in names:
        fn, _ = contract.Q[name]
        if args.plans:
            import io
            from contextlib import redirect_stdout

            os.makedirs(args.plans, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf_dir).explain("formatted")
            with open(os.path.join(
                    args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            spark.catalog.clearCache()
        noise = calib()
        samples = []
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.mode("overwrite") \
                .format("noop").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"best": min(samples), "samples": samples, **noise}
    spark.stop()
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": args.cpus,
                      "queries": out,
                      "total_best": round(sum(v["best"]
                                              for v in out.values()), 3)}))


if __name__ == "__main__":
    main()
