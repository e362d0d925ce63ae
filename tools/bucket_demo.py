"""Bucketed-store read-path evidence: the same subj-keyed queries on
the plain parquet layout vs the bucketed+sorted table.

The bucketed layout pays one repartition at write time; after that the
catalog's bucketing spec satisfies the distribution requirement of
every subj-keyed aggregation and join, so their plans drop the
Exchange entirely — at 100 TB that removed shuffle is the size of the
store.  This script measures both layouts on the flagship triples and
asserts the plan shapes (no Exchange on the bucketed side), printing
one JSON line; BENCH/BASELINE.md records the curated result.

Usage: python tools/bucket_demo.py [n_files] [n_buckets] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/nfs_bucket_demo"


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from ner_funtool_spark.plans.kg import build_triples
    from ner_funtool_spark.session import get_spark
    from ner_funtool_spark.sources.code_table import stage_source_parquet
    from ner_funtool_spark.operators.graph import two_hop
    from ner_funtool_spark.sources.store import (
        pred_cooccurrence_from_store,
        subj_degrees_from_store,
        two_hop_from_store,
        write_triples_bucketed,
        write_triples_bucketed_by_obj,
    )

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark("bucket_demo")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    stage_dir = f"{WORK}/src"
    stage_source_parquet(spark, n_files, stage_dir, partitions=128)
    triples = build_triples(
        spark.read.parquet(stage_dir), domain="code", mode="rules"
    ).drop("provenance")

    plain_dir = f"{WORK}/plain"
    t0 = time.time()
    triples.write.mode("overwrite").parquet(plain_dir)
    plain_write = time.time() - t0

    table = "triples_bkt_demo"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    bkt_dir = f"{WORK}/bucketed"
    t0 = time.time()
    write_triples_bucketed(triples, table, bkt_dir, n_buckets=n_buckets)
    bkt_write = time.time() - t0

    plain = spark.read.parquet(plain_dir)

    def timed(fn):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            walls.append(time.time() - t0)
        return round(min(walls), 3)

    deg_plain = plain.groupBy("subj").agg(F.count("*").alias("out_deg"))
    deg_bkt = subj_degrees_from_store(spark, table)

    tp = plain.select("subj", "pred").distinct()
    a = tp.select("subj", F.col("pred").alias("pred1"))
    b = tp.select("subj", F.col("pred").alias("pred2"))
    co_plain = (
        a.join(b, "subj").filter(F.col("pred1") < F.col("pred2"))
        .groupBy("pred1", "pred2").agg(F.count("*").alias("n_subjects"))
    )
    co_bkt = pred_cooccurrence_from_store(spark, table)

    # dual-index two-hop: the OPS companion table makes BOTH join
    # inputs bucket-aligned on the middle node (sources/store.py)
    ops_table = table + "_ops"
    spark.sql(f"DROP TABLE IF EXISTS {ops_table}")
    tkey = triples.select("subj", "pred", "obj").distinct()
    spo2_table = table + "_spo_key"
    spark.sql(f"DROP TABLE IF EXISTS {spo2_table}")
    t0 = time.time()
    write_triples_bucketed(tkey, spo2_table, f"{WORK}/spo_key",
                           n_buckets=n_buckets)
    write_triples_bucketed_by_obj(tkey, ops_table, f"{WORK}/ops",
                                  n_buckets=n_buckets)
    dual_write = time.time() - t0
    MID_CAP = 20
    hop_plain = two_hop(plain, max_mid_degree=MID_CAP)
    hop_bkt = two_hop_from_store(spark, spo2_table, ops_table,
                                 max_mid_degree=MID_CAP)

    from ner_funtool_spark.plans.inspect import (
        join_subtree_exchanges,
        plan_string,
    )

    assert "Exchange" not in plan_string(deg_bkt), \
        "bucketed agg must not shuffle"
    # indentation-bounded subtree count (not text splitting): zero
    # Exchange nodes under the join = both inputs co-located
    assert join_subtree_exchanges(co_bkt) == 0, \
        "bucketed self-join inputs must be co-located"
    assert "Exchange" in plan_string(deg_plain)  # the shuffle being saved
    assert join_subtree_exchanges(co_plain) > 0  # and on the join path
    assert join_subtree_exchanges(hop_bkt) == 0, \
        "dual-index two-hop join must be co-located"

    result = {
        "n_files": n_files,
        "n_buckets": n_buckets,
        "n_triples": triples.count(),
        "write_plain_sec": round(plain_write, 3),
        "write_bucketed_sec": round(bkt_write, 3),
        "agg_plain_sec": timed(lambda: deg_plain.count()),
        "agg_bucketed_sec": timed(lambda: deg_bkt.count()),
        "selfjoin_plain_sec": timed(lambda: co_plain.count()),
        "selfjoin_bucketed_sec": timed(lambda: co_bkt.count()),
        "twohop_plain_sec": timed(lambda: hop_plain.count()),
        "twohop_dual_index_sec": timed(lambda: hop_bkt.count()),
        "write_dual_index_sec": round(dual_write, 3),
        "bucketed_agg_exchanges": 0,
        "reps": reps,
    }
    # results must agree between layouts
    assert deg_plain.count() == deg_bkt.count()
    assert sorted(map(tuple, co_plain.collect())) == sorted(
        map(tuple, co_bkt.collect())
    )
    assert hop_plain.count() == hop_bkt.count()
    spark.sql(f"DROP TABLE IF EXISTS {spo2_table}")
    spark.sql(f"DROP TABLE IF EXISTS {ops_table}")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.stop()
    shutil.rmtree(WORK, ignore_errors=True)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
