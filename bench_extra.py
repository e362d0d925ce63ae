"""Extra benchmarks for the optimization rounds (guide §1.4) — NOT the
driver-timed bench (bench.py is frozen for measurement; this file only
feeds OPTIMIZATION_r*.md evidence).

Per-query isolated timing with the same construct+count semantics as
bench.py (so numbers are comparable), plus:

* --noop     time a noop-sink materialization of every column instead
             of count() (guide §1.4 — count() lets the optimizer prune)
* --explain DIR   dump .explain("formatted") per query to DIR/<q>.txt
* --reps N   min-of-N with bench.py's between-rep hygiene

Usage:
    python bench_extra.py [--reps 5] [--noop] [--explain plans/r06] q1 q2 ...
Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and
$SPARK_GRAFT_CPUS (default 32) like bench.py.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as mod
    from ner_funtool_spark.session import get_spark

    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    qs = mod.queries()

    def hygiene():
        spark.catalog.clearCache()
        getattr(mod, "_EDGE_CACHE", {}).clear()
        gc.collect()

    results: dict[str, dict] = {}
    for name in args.queries:
        fn = qs[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            hygiene()
            df = fn(spark, sf_dir)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        if args.reps <= 0:
            results[name] = {"min": None, "walls": []}
            continue
        walls = []
        for _ in range(args.reps):
            hygiene()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            walls.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = {"min": min(walls), "walls": walls}
        print(f"## {name}: min={min(walls)} walls={walls}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus,
                      "noop": args.noop, "results": results}))


if __name__ == "__main__":
    main()
