"""As-of join semantics + bucketed-table co-located join (no-shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ner_funtool_spark.operators.asof import asof_join


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:45:00"), (2, "2024-01-01 10:10:00"),
         (3, "2024-01-01 12:00:00"), (4, "2024-01-01 09:00:00")],
        "event_id long, ts_s string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("2024-01-01 10:30:00", 10.0), ("2024-01-01 11:30:00", 20.0),
         ("2024-01-01 09:30:00", 5.0)],
        "rt_s string, rate double",
    ).select(F.col("rt_s").cast("timestamp").alias("rt"), "rate")
    got = {r["event_id"]: r["rate"] for r in asof_join(left, right).collect()}
    assert got == {
        1: 10.0,   # 10:45 -> 10:30 rate
        2: 5.0,    # 10:10 -> 09:30 rate (previous hour)
        3: 20.0,   # 12:00 -> 11:30
        4: None,   # 09:00 -> nothing at or before
    }


def test_asof_join_preserves_duplicate_left_rows(spark):
    """Round-2 hardening: identical left rows each produce one output
    row (the old groupBy-over-all-left-columns merged them)."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:45:00")] * 3,
        "event_id long, ts_s string",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("2024-01-01 10:30:00", 10.0)], "rt_s string, rate double"
    ).select(F.col("rt_s").cast("timestamp").alias("rt"), "rate")
    rows = asof_join(left, right).collect()
    assert len(rows) == 3
    assert all(r["rate"] == 10.0 for r in rows)


def test_asof_join_duplicate_right_ts_one_deterministic_row(spark):
    """Two right rows with the SAME timestamp: exactly one output row,
    tie broken by max over the value columns (documented total order)."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:45:00")], "event_id long, ts_s string"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("2024-01-01 10:30:00", 10.0), ("2024-01-01 10:30:00", 7.0)],
        "rt_s string, rate double",
    ).select(F.col("rt_s").cast("timestamp").alias("rt"), "rate")
    rows = asof_join(left, right).collect()
    assert len(rows) == 1
    assert rows[0]["rate"] == 10.0  # max of the tied values


def test_asof_join_keys_path(spark):
    """Equality-keys variant: matches only within the same key."""
    left = spark.createDataFrame(
        [(1, "a", "2024-01-01 10:45:00"), (2, "b", "2024-01-01 10:45:00")],
        "event_id long, k string, ts_s string",
    ).select("event_id", "k", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("a", "2024-01-01 10:30:00", 1.0), ("b", "2024-01-01 09:30:00", 2.0)],
        "k string, rt_s string, rate double",
    ).select("k", F.col("rt_s").cast("timestamp").alias("rt"), "rate")
    got = {r["event_id"]: (r["rate"], r["rt"]) for r in
           asof_join(left, right, keys=["k"]).collect()}
    assert got[1][0] == 1.0  # a matches a's 10:30 rate
    assert got[2][0] == 2.0  # b matches b's 09:30 rate, not a's newer one


def test_asof_join_lookback_horizon(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 23:00:00")], "event_id long, ts_s string"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("2024-01-01 10:00:00", 1.0)], "rt_s string, rate double"
    ).select(F.col("rt_s").cast("timestamp").alias("rt"), "rate")
    # match is 13h back: outside lookback=6 -> NULL; inside lookback=24 -> found
    short = asof_join(left, right, lookback=6).first()
    assert short["rate"] is None
    long = asof_join(left, right, lookback=24).first()
    assert long["rate"] == 1.0


def test_bucketed_join_has_no_shuffle_exchange(spark):
    """bucketBy co-locates both sides: the join plan must contain no
    shuffle Exchange (the scale path for repeated joins on one key).
    Broadcast is disabled so the sort-merge path is actually planned."""
    import shutil

    for t in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    a = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_a")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_b")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
        assert j.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in ("bkt_a", "bkt_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
