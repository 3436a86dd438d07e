"""Row-identity gate for optimization rewrites: run a contract entry
under the CURRENT tree and under a PRIOR version of one module (a file
checked out from git into a temp path), in the SAME Spark session, and
compare row multisets exactly. Usage:

    python tools/cmp_old_new.py --module kg.stages.graph \
        --old /tmp/graph_old.py --sf-dir /root/testdata/sf1.0 \
        --queries pagerank_iter3,min_label_prop_iter3
"""
from __future__ import annotations

import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rows_of(df) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--module", required=True)
    ap.add_argument("--old", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from kg import contract
    from kg.session import get_spark

    spark = get_spark(app_name="cmp-old-new",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)

    mod = importlib.import_module(args.module)
    new_src = mod.__file__
    names = [q.strip() for q in args.queries.split(",") if q.strip()]

    def load_into(path: str) -> None:
        spec = importlib.util.spec_from_file_location(args.module, path)
        fresh = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(fresh)
        for k in dir(fresh):
            if not k.startswith("__"):
                setattr(mod, k, getattr(fresh, k))

    ok = True
    for name in names:
        fn, _ = contract.Q[name]
        load_into(args.old)
        old_rows = rows_of(fn(spark, args.sf_dir))
        spark.catalog.clearCache()
        load_into(new_src)
        new_rows = rows_of(fn(spark, args.sf_dir))
        spark.catalog.clearCache()
        same = old_rows == new_rows
        ok = ok and same
        print(f"{'IDENTICAL' if same else 'MISMATCH'} {name}: "
              f"old={len(old_rows)} new={len(new_rows)} rows")
        if not same:
            diff = set(old_rows) ^ set(new_rows)
            for r in list(diff)[:5]:
                print("  diff row:", r)
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
