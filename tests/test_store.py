"""Bucketed triples store: write once, then subj-keyed aggregation and
self-join read the catalog bucketing spec and plan NO Exchange."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ner_funtool_spark.plans.kg import build_triples
from ner_funtool_spark.sources.code_table import source_table
from ner_funtool_spark.sources.store import (
    pred_cooccurrence_from_store,
    subj_degrees_from_store,
    write_triples_bucketed,
)

TABLE = "triples_bkt_test"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store") / "triples_bkt")
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    triples = build_triples(
        source_table(spark, 120, partitions=4), domain="code", mode="rules"
    ).drop("provenance")
    write_triples_bucketed(triples, TABLE, path, n_buckets=8)
    yield spark, triples
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    shutil.rmtree(path, ignore_errors=True)


def test_store_roundtrips_rows(store):
    spark, triples = store
    assert spark.table(TABLE).count() == triples.count()
    # multiset equality via exceptAll in both directions
    assert spark.table(TABLE).exceptAll(triples).count() == 0
    assert triples.exceptAll(spark.table(TABLE)).count() == 0


def test_degrees_from_store_has_no_exchange(store):
    spark, triples = store
    deg = subj_degrees_from_store(spark, TABLE)
    plan = _physical(deg)
    assert "Exchange" not in plan, plan[:2000]
    assert "Bucketed: true" in plan
    # values match the non-bucketed computation
    expect = {
        r["subj"]: r["n"]
        for r in triples.groupBy("subj").agg(F.count("*").alias("n")).collect()
    }
    got = {r["subj"]: r["out_deg"] for r in deg.collect()}
    assert got == expect


def test_self_join_from_store_is_colocated(store):
    spark, triples = store
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        co = pred_cooccurrence_from_store(spark, TABLE)
        plan = _physical(co)
        # the only Exchange allowed is the final tiny (pred1, pred2)
        # aggregation; the join inputs themselves must be co-located
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange hashpartitioning" not in join_part, join_part[:2000]
        rows = {(r["pred1"], r["pred2"]): r["n_subjects"] for r in co.collect()}
        # oracle-free cross-check against the in-memory frame
        t = triples.select("subj", "pred").distinct()
        a = t.select("subj", F.col("pred").alias("pred1"))
        b = t.select("subj", F.col("pred").alias("pred2"))
        expect = {
            (r["pred1"], r["pred2"]): r["n"]
            for r in a.join(b, "subj")
            .filter(F.col("pred1") < F.col("pred2"))
            .groupBy("pred1", "pred2")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert rows == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from ner_funtool_spark.sources.store import compact_parquet

    src = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    df = spark.range(0, 20000).selectExpr("id", "id * 2 AS v")
    df.repartition(64).write.parquet(src)  # 64 tiny files
    stats = compact_parquet(spark, src, out, target_mb=128)
    assert stats["in_files"] == 64
    assert stats["out_files"] == 1  # 20k rows << 128MB -> one file
    got = spark.read.parquet(out)
    assert got.count() == 20000
    assert got.exceptAll(df).count() == 0 and df.exceptAll(got).count() == 0
