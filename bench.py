"""Benchmark harness — ONE JSON line on stdout.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], and the flagship
code-KG end-to-end job (synthetic source table -> segment -> Arrow CRF
tagging -> mentions -> triples) sized to the scale factor, reporting
triples/sec (the BASELINE.json metric).

    {"metric": "triples_per_sec", "value": ..., "unit": "triples/sec",
     "queries": {name: sec, ...}, "sf": ..., ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# queries that run a driver-side convergence loop (CC / pagerank / LPA /
# k-core / PQ train) — eager materialization inside construction makes
# their single-shot walls the noisiest; they get min-of-3 + hygiene
ITERATIVE_TIER = {
    "entity_canonicalize", "kg_canonical_triples", "training_corpus",
    "kg_pagerank", "kg_ppr", "kg_communities", "kg_triangles",
    "kg_kcore", "ann_topk_pq", "ann_topk_ivf_pq", "triples_upsert_bloom",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    # code-KG corpus size scales with sf: sf0.1 -> 20k files (~360k lines)
    n_files = int(os.environ.get("SPARK_GRAFT_N_FILES", str(int(200_000 * sf))))

    import __spark_entry__ as mod
    from ner_funtool_spark.plans.kg import build_triples
    from ner_funtool_spark.session import get_spark
    from ner_funtool_spark.sources.code_table import stage_source_parquet

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)

    # host calibration: a fixed single-thread numpy workload, timed
    # min-of-5.  This session measured the SAME flagship job 3.2x
    # apart hours apart (BENCH/BASELINE.md drift record), so every
    # artifact carries its own host-speed sample — compare walls
    # across artifacts only after normalizing by this number.
    import numpy as _np

    _a = _np.random.RandomState(0).rand(1024, 1024)
    cal = []
    for _ in range(5):
        t0 = time.time()
        for _ in range(8):
            _a = _a @ _a % 1.0 + 0.5
        cal.append(time.time() - t0)
    host_calibration_sec = round(min(cal), 3)

    timings: dict[str, float] = {}

    def hygiene():
        """Between-query session hygiene (r3 verdict item 2): the
        driver's single-session bench showed the iterative tier up to
        15x above the repo's per-query claims — cross-query state
        accumulation (cached plans never dropped, localCheckpoint
        blocks pinned by lingering python references, GC pressure
        after 30+ queries).  Drop every cached plan and force a python
        GC so the ContextCleaner releases checkpoint/broadcast blocks
        before the next query is timed.  The entry module's session
        memo (_EDGE_CACHE) is cleared too: clearCache unpersists its
        frames, and reusing them silently recomputes the tagging stage
        — each query should re-persist its own inputs instead.  Net:
        every per-query wall is SELF-CONTAINED (cold caches), so r4+
        numbers are not 1:1 comparable with r3 single-session walls
        for queries that shared cached inputs."""
        import gc

        spark.catalog.clearCache()
        getattr(mod, "_EDGE_CACHE", {}).clear()
        gc.collect()

    def timed(name, fn, reps: int = 1):
        walls = []
        out = None
        for _ in range(reps):
            hygiene()
            t0 = time.time()
            out = fn()
            walls.append(time.time() - t0)
        timings[name] = round(min(walls), 3)
        return out

    # flagship: code-KG end-to-end triples/sec over a columnar scan
    # (the production shape; staging is cached across runs)
    stage_dir = f"/tmp/nfs_bench_src_{n_files}"
    stage_source_parquet(spark, n_files, stage_dir, partitions=cpus * 4)
    # cap scan-partition size ONLY for the flagship read: the staged
    # table is small on disk and must fan out to all cores
    # (BENCH/BASELINE.md analysis); other queries keep defaults
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(2 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    src = spark.read.parquet(stage_dir)
    build_triples(src.limit(2000), mode="rules").count()  # warm workers
    # min of 5: the host shows steal-time spikes AND slow multi-minute
    # throughput drift (r3 measured the same kernel 12% apart an hour
    # apart with vmstat 100% idle) — more reps tighten the min estimator
    walls = []
    for _ in range(5):
        t0 = time.time()
        n_triples = build_triples(src, mode="rules").count()
        walls.append(time.time() - t0)
    timings["kg_code_e2e"] = round(min(walls), 3)
    tps = n_triples / timings["kg_code_e2e"]
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(4 * 1024 * 1024))

    # headline driver queries at this sf
    qs = mod.queries()
    for name in (
        "kg_triples", "kg_mentions", "mentions_relational", "tag_metrics",
        "entity_canonicalize", "dedup_minhash_lsh", "dedup_simhash",
        "ann_topk", "text_stats", "pricing_summary", "revenue_by_nation",
        "top_parts_per_supplier", "windowed_event_counts", "sessionize",
        "kg_canonical_triples", "triples_upsert", "kg_pagerank",
        # r3 additions: the dataset-management + temporal-KG tier
        "training_corpus", "triples_history_scd2", "dedup_incremental",
        "kg_comention", "doc_packing", "triples_upsert_bloom",
        # r3 continuation: graph-analytics tier
        "kg_two_hop", "kg_comention_pmi", "kg_triangles", "kg_skew_report",
        "kg_communities", "sketch_profile_invariants", "kg_kcore",
        "ann_topk_pq", "kg_ppr", "ann_topk_ivf_pq",
        # r4 additions: layout-served and temporal-dimension tier
        "kg_two_hop_store", "events_time_pruned", "tag_metrics_micro",
        "kg_entity_temporal",
        # r5: doc-bucketed mention store (Exchange-free co-mention)
        "kg_comention_store", "kg_comention_pmi_store",
    ):
        # construction is inside the timing: declarative queries build
        # lazily (~ms), but queries that materialize eagerly during
        # construction (pagerank / triangle checkpoint loops) must not
        # under-report by timing only the final count.  The iterative
        # tier takes min-of-3 (single-shot walls on this host are ±30%
        # noise and dominated the r3 driver artifact's 15x outliers).
        reps = 3 if name in ITERATIVE_TIER else 1
        timed(name, lambda n=name: qs[n](spark, sf_dir).count(), reps=reps)

    spark.stop()
    # calibration-normalized walls (r4 verdict item 8): scale every
    # wall by (host_calibration_sec / CAL_REF_SEC) so artifacts from
    # hosts at different (drifting) speeds compare by construction —
    # CAL_REF_SEC is the quiet-host calibration this repo's claims
    # were measured at (0.38-0.43 across rounds; BENCH/BASELINE.md).
    # First-order correction only: the kernel samples single-thread
    # compute speed, which BENCH/BASELINE.md shows moves in lock-step
    # with the flagship under host drift (3.5x vs 3.2x same-session);
    # it cannot correct I/O- or scheduler-bound components.
    CAL_REF_SEC = 0.400
    factor = CAL_REF_SEC / host_calibration_sec
    queries_normalized = {k: round(v * factor, 3) for k, v in timings.items()}
    print(json.dumps({
        "metric": "triples_per_sec",
        "value": round(tps, 1),
        "value_normalized": round(tps / factor, 1),
        "unit": "triples/sec",
        "queries": timings,
        "queries_normalized": queries_normalized,
        "sf": sf,
        "cpus": cpus,
        "n_files": n_files,
        "n_triples": n_triples,
        "kg_e2e_sec": timings["kg_code_e2e"],
        "host_calibration_sec": host_calibration_sec,
        "host_calibration_ref_sec": CAL_REF_SEC,
        # r3 continuation: per-query walls now include query
        # CONSTRUCTION, so eagerly-materializing queries (canonicalize
        # CC loop, pagerank, bloom build, triangles/LPA/kcore) report
        # honest totals — r1/r2 per-query numbers timed only the final
        # count and under-reported those queries; not comparable 1:1
        "timing_semantics": "construct+count (r3+); earlier rounds count-only",
    }))


if __name__ == "__main__":
    main()
