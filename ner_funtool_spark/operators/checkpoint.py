"""Per-partition checkpoint ledger + idempotent resumable writes.

The reference checkpoints model state every N steps and keeps the last
5 (tf.train.Saver, train_lstm_crf.py:161-165, 267-269).  Our engine's
unit of recovery is the *output partition*: every (part, salt) bucket
of the triples table is written independently, recorded in a ledger,
and skipped on re-runs — so a killed job resumes where it stopped and
produces byte-identical output (north_rule resumability).

Why this is safe:
* partition assignment is deterministic (pmod(xxhash64(...)) on
  content, operators/triples.py), so re-runs route every row to the
  same bucket;
* the write uses dynamic partition overwrite, so a bucket that was
  half-written when the job died is atomically replaced on resume;
* the ledger is an append-only parquet table under
  ``<out>/_ledger/`` with one row per completed bucket, including a
  row count and an order-insensitive content checksum
  (bit_xor of xxhash64) — the lineage+metrics record the north_rule
  asks for.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_SCHEMA = (
    "part int, salt int, rows bigint, checksum bigint, written_at double"
)


def ledger_path(out_dir: str) -> str:
    return f"{out_dir}/_ledger"


def load_ledger(spark: SparkSession, out_dir: str) -> DataFrame:
    """Empty ledger ONLY when the path does not exist yet (first run);
    any other read failure (corrupt files, permissions) re-raises —
    silently rewriting on corruption would mask lost run lineage."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(LEDGER_SCHEMA).parquet(ledger_path(out_dir))
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], LEDGER_SCHEMA)
        raise


def resumable_write(salted: DataFrame, out_dir: str,
                    content_cols: tuple[str, ...] = ("subj", "pred", "obj"),
                    simulate_failure_after: int | None = None) -> dict:
    """Write salted triples partitioned by (part, salt), skipping buckets
    already in the ledger.  Returns run stats.

    ``simulate_failure_after``: test hook — only the first K pending
    buckets are written and *recorded*, mimicking a job killed mid-run
    (the remaining buckets are untouched).
    """
    spark = salted.sparkSession
    t0 = time.time()
    done = load_ledger(spark, out_dir).select("part", "salt").distinct()
    pending = salted.join(done, ["part", "salt"], "left_anti")

    if simulate_failure_after is not None:
        keep = (
            pending.select("part", "salt").distinct()
            .orderBy("part", "salt").limit(simulate_failure_after)
        )
        pending = pending.join(keep, ["part", "salt"], "left_semi")

    pending = pending.persist()
    stats_rows = (
        pending.groupBy("part", "salt")
        .agg(
            F.count("*").alias("rows"),
            F.expr(
                "bit_xor(xxhash64(" + ", ".join(content_cols) + "))"
            ).alias("checksum"),
        )
        .collect()
    )
    n_buckets = len(stats_rows)
    n_rows = sum(r["rows"] for r in stats_rows)
    if n_buckets:
        (
            pending.repartition("part", "salt")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("part", "salt")
            .parquet(out_dir)
        )
        ledger_df = spark.createDataFrame(
            [
                (r["part"], r["salt"], r["rows"], r["checksum"], time.time())
                for r in stats_rows
            ],
            LEDGER_SCHEMA,
        )
        ledger_df.coalesce(1).write.mode("append").parquet(ledger_path(out_dir))
    pending.unpersist()
    return {
        "written_buckets": n_buckets,
        "written_rows": n_rows,
        "wall_sec": time.time() - t0,
    }


def run_metrics(spark: SparkSession, out_dir: str) -> dict:
    """Aggregate ledger into throughput/lineage metrics (K3 analog)."""
    led = load_ledger(spark, out_dir)
    row = led.agg(
        F.count("*").alias("buckets"),
        F.coalesce(F.sum("rows"), F.lit(0)).alias("rows"),
        F.min("written_at").alias("t_first"),
        F.max("written_at").alias("t_last"),
    ).first()
    wall = (row["t_last"] - row["t_first"]) if row["buckets"] else 0.0
    return {
        "buckets": row["buckets"],
        "rows": int(row["rows"]),
        "ledger_wall_sec": wall,
    }
