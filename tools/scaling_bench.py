"""Two-parallelism scaling evidence (north_rule: efficiency >= 0.8 from
N to 4N executors; no real cluster in this sandbox, so the same job
runs at two parallelism levels on the SAME input — per driver
instructions).

Methodology:
* the synthetic source table is STAGED to parquet once; the timed job
  is the production shape — columnar scan -> segment -> Arrow CRF
  tagging -> mentions -> triples -> count — not the data generator;
* each configuration launches EXACTLY as the north_rule specifies —
  ``spark-submit --master local[N] --py-files <pkg.zip> job.py`` — a
  fresh JVM per run, warmed, and repeated; the MINIMUM wall is used
  (the host is a shared vCPU box with visible steal-time spikes — min
  is the low-noise estimator);
* configurations are interleaved (lo, hi, lo, hi) so host noise cannot
  systematically favor one side.

Prints one JSON line; BENCH/BASELINE.md records the curated results.

Usage: python tools/scaling_bench.py [n_files] [lo_cores] [hi_cores] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAGE_DIR = "/tmp/nfs_scaling_src"

JOB = r"""
import json, sys, time
sys.path.insert(0, "__REPO__")
from ner_funtool_spark.session import get_spark
from ner_funtool_spark.plans.kg import build_triples

cores = int(sys.argv[1]); path = sys.argv[2]
# small staged table: cap scan-partition size so the scan fans out to
# all cores (default 128MB maxPartitionBytes would coalesce ~70MB of
# parquet into ~3 tasks and serialize the whole pipeline)
spark = get_spark("scaling", cores=cores, shuffle_partitions=cores,
                  extra={"spark.sql.files.maxPartitionBytes": str(1 * 1024 * 1024),
                         "spark.sql.files.openCostInBytes": "0"})
src = spark.read.parquet(path)
# warm JVM + python workers so we time the job, not startup: a
# limit(2000) slice only touches 1-2 scan partitions, so at N cores
# N-2 Python workers still pay their numpy/pyarrow import INSIDE the
# timed region (r6 finding — the faster decode kernel made this ~2 s
# fixed cost visible).  A thin sample spans every partition, spawning
# and warming every worker the timed job will reuse.
build_triples(src.sample(0.05, seed=1), mode="rules").count()
t0 = time.time()
n = build_triples(src, mode="rules").count()
wall = time.time() - t0
print(json.dumps(dict(cores=cores, triples=n, wall=wall, tps=n / wall)))
spark.stop()
"""


def stage(n_files: int) -> str:
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "from ner_funtool_spark.session import get_spark\n"
        "from ner_funtool_spark.sources.code_table import stage_source_parquet\n"
        "spark = get_spark('stage', cores=32)\n"
        f"stage_source_parquet(spark, {n_files}, {STAGE_DIR!r}, partitions=128)\n"
        "spark.stop()\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, timeout=1200,
                   capture_output=True, cwd=REPO)
    return STAGE_DIR


PKG_ZIP = "/tmp/nfs_scaling_pkg.zip"
JOB_FILE = "/tmp/nfs_scaling_job.py"


def _prepare_submit() -> None:
    """Package the library once and write the job file — the job then
    launches exactly as the north_rule specifies: ``spark-submit
    --py-files <pkg.zip> job.py`` at each parallelism level."""
    if os.path.exists(PKG_ZIP):
        os.remove(PKG_ZIP)
    subprocess.run(
        ["zip", "-qr", PKG_ZIP, "ner_funtool_spark"], check=True, cwd=REPO
    )
    # under spark-submit the package rides in via --py-files, not sys.path
    with open(JOB_FILE, "w") as f:
        f.write(JOB.replace('sys.path.insert(0, "__REPO__")\n', ""))


def run(cores: int, path: str) -> dict:
    out = subprocess.run(
        [
            "spark-submit",
            "--master", f"local[{cores}]",
            "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "16g"),
            "--py-files", PKG_ZIP,
            JOB_FILE, str(cores), path,
        ],
        capture_output=True, text=True, timeout=1800, cwd="/tmp",
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    lo_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi_cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    path = stage(n_files)
    _prepare_submit()
    lo_runs, hi_runs = [], []
    for _ in range(reps):
        lo_runs.append(run(lo_cores, path))
        hi_runs.append(run(hi_cores, path))
    lo = min(lo_runs, key=lambda r: r["wall"])
    hi = min(hi_runs, key=lambda r: r["wall"])
    eff = (hi["tps"] / lo["tps"]) / (hi_cores / lo_cores)
    result = {
        "n_files": n_files,
        "lo_cores": lo_cores,
        "hi_cores": hi_cores,
        f"local{lo_cores}_tps": round(lo["tps"], 1),
        f"local{lo_cores}_wall_sec": round(lo["wall"], 2),
        f"local{hi_cores}_tps": round(hi["tps"], 1),
        f"local{hi_cores}_wall_sec": round(hi["wall"], 2),
        "speedup": round(hi["tps"] / lo["tps"], 3),
        "scaling_efficiency": round(eff, 3),
        "triples": hi["triples"],
        "all_lo_walls": [round(r["wall"], 2) for r in lo_runs],
        "all_hi_walls": [round(r["wall"], 2) for r in hi_runs],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
