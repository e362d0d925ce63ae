"""Encoder-depth throughput study (M13 honesty at depth — r4 verdict
item 5): neural-path sentences/sec vs encoder shape, up to the
real-BERT regime (12 layers x 12 heads, 21128 wordpiece-sized
hash-vocab, 768-wide variant), at two parallelism levels.

The reference's serving loop runs 22 ms/sentence (~45 sentences/s) at
BERT-base depth (Result.MD:8, predict_bert_crf.py:141-150); this
measures what the Arrow-batched mapInArrow pipeline sustains as
per-token FLOPs grow toward that regime.

Each (shape, cores) cell runs in its OWN subprocess (one JVM cannot
change local[N] after start; sequential — never two Spark benches at
once, BENCH/BASELINE.md drift rule).  Structural invariants are
asserted inline at every depth (mention spans well-formed, etypes in
the domain set) — the depth knob must not break decode semantics.

Usage: python tools/depth_bench.py            # full sweep, table to stdout
       DEPTH_ONE=L,H,D,V,cores,n_files python tools/depth_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (n_layers, n_heads, embed_dim, vocab, n_files) — corpus sized down as
# per-token FLOPs grow so each cell stays minutes-bounded; tps is
# per-sentence, so cells compare across different corpus sizes
CONFIGS = [
    (2, 4, 32, 4096, 2000),      # engine default (fixture-pinned shape)
    (4, 8, 96, 21128, 1000),     # mid depth, wordpiece-sized vocab
    (8, 12, 96, 21128, 1000),
    (12, 12, 96, 21128, 1000),   # BERT-base depth, narrow width
    (12, 12, 768, 21128, 120),   # BERT-base depth AND width
]
CORES = [8, 32]


def run_one(spec: str) -> None:
    L, H, D, V, cores, n_files = (int(x) for x in spec.split(","))
    from ner_funtool_spark.plans.kg import detect_mentions
    from ner_funtool_spark.session import get_spark
    from ner_funtool_spark.sources.code_table import stage_source_parquet

    spark = get_spark(f"depth_L{L}", cores=cores, shuffle_partitions=cores)
    stage = f"/tmp/nfs_depth_src_{n_files}"
    stage_source_parquet(spark, n_files, stage, partitions=cores * 4)
    # fan the small staged table out to all cores (bench.py flagship rule)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    src = spark.read.parquet(stage)
    from ner_funtool_spark.operators.segment import segment_lines

    n_sents = segment_lines(src).count()
    opts = {"n_layers": L, "n_heads": H, "embed_dim": D, "vocab_size": V}
    m = detect_mentions(src, domain="code", mode="neural", encoder_opts=opts)
    m.limit(50).count()  # warm workers / JIT numpy
    walls = []
    n_mentions = 0
    for _ in range(3):
        t0 = time.time()
        n_mentions = m.count()
        walls.append(time.time() - t0)
        if walls[-1] > 60:  # heavy cells: one honest wall beats 3 slow ones
            break
    wall = min(walls)
    # structural invariants at this depth (the M13 decode contract)
    from pyspark.sql import functions as F

    from ner_funtool_spark.config import CODE_ETYPES

    bad = m.filter(
        (F.col("begin") < 0) | (F.col("end") <= F.col("begin"))
        | ~F.col("etype").isin(*CODE_ETYPES)
    ).count()
    spark.stop()
    print(json.dumps({
        "n_layers": L, "n_heads": H, "embed_dim": D, "vocab": V,
        "cores": cores, "n_files": n_files, "n_sentences": n_sents,
        "n_mentions": n_mentions, "wall_sec": round(wall, 3),
        "sents_per_sec": round(n_sents / wall, 1),
        "invariant_violations": bad,
    }))


def main() -> None:
    one = os.environ.get("DEPTH_ONE")
    if one:
        run_one(one)
        return
    rows = []
    for L, H, D, V, n_files in CONFIGS:
        for cores in CORES:
            spec = f"{L},{H},{D},{V},{cores},{n_files}"
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "DEPTH_ONE": spec},
                capture_output=True, text=True, check=True,
            )
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            rec = json.loads(line)
            rows.append(rec)
            print(json.dumps(rec), flush=True)
    print("\n| layers x heads x dim (vocab) | local[8] sents/s | "
          "local[32] sents/s | 8->32 eff |")
    print("|---|---|---|---|")
    by_cfg = {}
    for r in rows:
        by_cfg.setdefault(
            (r["n_layers"], r["n_heads"], r["embed_dim"], r["vocab"]), {}
        )[r["cores"]] = r
    for (L, H, D, V), cells in by_cfg.items():
        s8 = cells.get(8, {}).get("sents_per_sec", 0)
        s32 = cells.get(32, {}).get("sents_per_sec", 0)
        eff = round(s32 / s8 / 4, 3) if s8 else 0
        print(f"| {L}x{H}x{D} ({V}) | {s8} | {s32} | {eff} |")
    assert all(r["invariant_violations"] == 0 for r in rows), rows


if __name__ == "__main__":
    main()
