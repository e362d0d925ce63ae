"""Range-partitioned events layout: the time window must reach the
scan as PartitionFilters and cut the file set (read-path pruning
evidence for BENCH/BASELINE.md)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ner_funtool_spark.sources.layout import (
    events_in_window,
    prune_stats,
    write_events_range_partitioned,
)

SF = "/root/testdata/sf0.001"


def test_events_range_layout_prunes_partitions(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    path = str(tmp_path / "events_by_date")
    write_events_range_partitioned(ev, path)

    mn = ev.agg(F.min(F.to_date("ts")).alias("d")).first()["d"]
    start, end = mn + dt.timedelta(days=1), mn + dt.timedelta(days=3)
    w = events_in_window(spark, path, start, end)

    stats = prune_stats(w, path)
    assert stats["partition_filters"], stats
    assert 0 < stats["selected_files"] < stats["total_files"], stats

    # pruned read returns exactly the window's rows
    want = ev.filter(
        (F.to_date("ts") >= F.lit(start)) & (F.to_date("ts") < F.lit(end))
    ).count()
    assert w.count() == want and want > 0

    # one file per date directory (no small-file spray)
    assert stats["total_files"] == ev.select(F.to_date("ts")).distinct().count()


def test_events_layout_salted_hot_dates(spark, tmp_path):
    """files_per_date > 1 spreads a date over up to that many files
    (bounded — never a small-file spray) and pruning still serves the
    exact window."""
    import os

    ev = spark.read.parquet(f"{SF}/events.parquet")
    path = str(tmp_path / "events_salted")
    write_events_range_partitioned(ev, path, files_per_date=4)

    per_dir = {}
    for d in os.listdir(path):
        if d.startswith("event_date="):
            per_dir[d] = sum(
                1 for f in os.listdir(os.path.join(path, d))
                if f.endswith(".parquet")
            )
    assert per_dir and max(per_dir.values()) <= 4

    mn = ev.agg(F.min(F.to_date("ts")).alias("d")).first()["d"]
    start, end = mn + dt.timedelta(days=1), mn + dt.timedelta(days=3)
    w = events_in_window(spark, path, start, end)
    stats = prune_stats(w, path)
    assert stats["partition_filters"] and \
        stats["selected_files"] < stats["total_files"]
    want = ev.filter(
        (F.to_date("ts") >= F.lit(start)) & (F.to_date("ts") < F.lit(end))
    ).count()
    assert w.count() == want and want > 0
