"""sf1 (100x correctness-gate scale) verification sweep — r4 verdict
item 2.

Runs the scale-sensitive registry tier at an sf1 directory (generated
by tools/gen_sf.py — 10x key-shifted replication of the driver's
sf0.1), one query per fresh process:

* first through tools/driver_sim.py (full Spark-vs-DuckDB value-hash
  gate) under a per-query wall cap;
* if the gated run exceeds the cap, the query is re-run SPARK-ONLY
  (construct + count) to separate engine cost from oracle cost — the
  honest boundary the verdict asks for: "record which oracles are NOT
  tractable at sf1 with measured walls".

Writes one JSON line per query to stdout and a summary file.

Usage: python tools/sf1_sweep.py [sf_dir=/tmp/nfs_sf1] [out_json]
       SF1_ONE=<query> python tools/sf1_sweep.py <sf_dir>   # spark-only cell
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

QUERIES = [
    # dedup family (near-dup replica cliques are the sf1 stress)
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_incremental", "dedup_clusters",
    "neardup_cosine",
    # ANN serving paths (brute oracle + the two full compositions)
    "ann_topk", "ann_topk_ivf_pq", "ann_topk_ivf_opq",
    # bucketed stores (layout correctness must survive 10x)
    "kg_two_hop_store", "kg_degrees_store",
    "kg_comention_store", "kg_comention_pmi_store",
    # iterative / recursive-oracle tier
    "wordpiece_features_multipiece", "kg_lpa_inc_invariants",
    "entity_canonicalize", "kg_entity_temporal",
]
CAP_SEC = 420
CORES = "16"


def spark_only(sf_dir: str, name: str) -> None:
    import __spark_entry__ as mod
    from ner_funtool_spark.session import get_spark

    spark = get_spark("sf1_spark_only", cores=int(CORES),
                      shuffle_partitions=int(CORES))
    t0 = time.time()
    n = mod.queries()[name](spark, sf_dir).count()
    print(json.dumps({"query": name, "spark_rows": n,
                      "spark_wall_sec": round(time.time() - t0, 1)}))
    spark.stop()


def main() -> None:
    one = os.environ.get("SF1_ONE")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nfs_sf1"
    if one:
        spark_only(sf_dir, one)
        return
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_sweep.json"
    results = []
    for name in QUERIES:
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(HERE, "driver_sim.py"),
                 sf_dir, name],
                env={**os.environ, "DRIVER_SIM_CORES": CORES},
                capture_output=True, text=True, timeout=CAP_SEC,
            )
            wall = round(time.time() - t0, 1)
            line = next((ln for ln in p.stdout.splitlines()
                         if ln.strip().startswith(f"{name}:")), "")
            ok = "-> OK" in line or "rows-only check" in line
            rec = {"query": name, "status": "OK" if ok else "FAIL",
                   "gated_wall_sec": wall, "detail": line.strip()[-160:]}
        except subprocess.TimeoutExpired:
            wall = round(time.time() - t0, 1)
            rec = {"query": name, "status": "OVER_CAP",
                   "gated_wall_sec": wall}
            # separate engine cost from oracle cost
            try:
                p2 = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), sf_dir],
                    env={**os.environ, "SF1_ONE": name},
                    capture_output=True, text=True, timeout=CAP_SEC,
                )
                sline = next((ln for ln in p2.stdout.splitlines()
                              if ln.startswith("{")), None)
                if sline:
                    rec.update(json.loads(sline))
                    rec["status"] = "SPARK_OK_ORACLE_OVER_CAP"
            except subprocess.TimeoutExpired:
                rec["status"] = "SPARK_OVER_CAP"
        results.append(rec)
        print(json.dumps(rec), flush=True)
    with open(out_json, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
