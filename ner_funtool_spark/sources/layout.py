"""Time-range-partitioned event layout + partition-pruned reads.

The events table is the engine's append-heavy fact stream; every
operational query windows it by time.  Laying it out partitioned by
event date turns those windows into PARTITION PRUNING: the scan's
``PartitionFilters`` eliminate whole directories at planning time, so
a one-day query over a year of data opens ~1/365 of the files — at
100 TB this is the difference between a full-table scan and a few
hundred GB.  (The reference materializes flat result files with no
layout concept, SURVEY.md §4.2; this is the Spark-native read-path
companion to the bucketed triples store in ``sources/store.py``.)

Evidence surfaces:

* ``prune_stats`` reports total vs selected partition files straight
  from the planned ``FileSourceScanExec`` (selected) and the full
  listing (total) — the numbers BENCH/BASELINE.md records;
* tests assert the window lands in ``PartitionFilters`` (not the
  post-scan Filter) and that the pruned file set is a strict subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_events_range_partitioned(events: DataFrame, path: str,
                                   ts_col: str = "ts",
                                   files_per_date: int = 1) -> None:
    """Materialize events partitioned by event date.

    ``repartition("event_date")`` routes each date's rows to one task
    so every partition directory holds one file (no small-file spray:
    with T tasks and D dates an unrepartitioned write creates up to
    T*D files).  For production volumes where one day exceeds a task,
    ``files_per_date > 1`` adds a deterministic salt to the
    repartition so a hot date spreads over up to that many tasks/files
    — the skew treatment of the salted triples write applied to the
    time dimension (a single 100 TB-scale day must not serialize
    through one writer).
    """
    e = events.withColumn("event_date", F.to_date(F.col(ts_col)))
    if files_per_date > 1:
        salt = F.pmod(
            F.xxhash64(F.col(ts_col).cast("string")), F.lit(files_per_date)
        )
        e = e.repartition(F.col("event_date"), salt)
    else:
        e = e.repartition("event_date")
    (
        e.write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def events_in_window(spark: SparkSession, path: str,
                     start_date, end_date) -> DataFrame:
    """Events with start_date <= event_date < end_date: the filter is
    on the PARTITION column, so it prunes directories at plan time."""
    return spark.read.parquet(path).filter(
        (F.col("event_date") >= F.lit(start_date))
        & (F.col("event_date") < F.lit(end_date))
    )


def prune_stats(df: DataFrame, path: str) -> dict:
    """{selected_files, total_files, partition_filters: bool} for the
    scan feeding ``df`` — the pruning evidence.  Files are counted by
    executing the scan and collecting distinct input_file_name()
    (DataFrame.inputFiles lists the relation BEFORE partition pruning,
    so it cannot show the cut); the filter's placement is read from
    the plan's PartitionFilters clause."""
    spark = df.sparkSession
    plan = df._jdf.queryExecution().executedPlan().toString()
    selected = df.select(F.input_file_name()).distinct().count()
    total = (
        spark.read.parquet(path).select(F.input_file_name()).distinct().count()
    )
    return {
        "selected_files": selected,
        "total_files": total,
        "partition_filters": "PartitionFilters: [" in plan
        and "event_date" in plan.split("PartitionFilters:")[1].split("]")[0],
    }
