"""Versioned snapshot store for streaming view maintenance.

The foreachBatch maintenance loops (stream_triples_upsert,
stream_degrees_ivm) read the current store AND write its successor in
the same micro-batch.  Writing in place would make the job read its
own output; the r3 workaround — materializing the merged store through
the driver with toPandas() — is a driver OOM at scale (the whole store
through one process per batch).

This module replaces that with the snapshot pattern every table format
(Iceberg/Delta) uses under the hood:

* each batch writes the FULL merged view to a fresh version directory
  ``store/v{epoch:010d}`` — a fully distributed write, nothing through
  the driver;
* a version is COMMITTED iff Spark's job committer placed its
  ``_SUCCESS`` marker (written atomically at job commit) — the marker
  IS the manifest, so there is no rename-overwrite race to handle and
  a crashed/partial write is never visible to readers;
* readers resolve "the store" to the highest committed version;
* older versions are pruned after a successful commit (keeping one
  predecessor for in-flight readers).

Epoch replays (at-least-once foreachBatch delivery) rewrite the same
version directory with mode("overwrite"), so the loop stays idempotent.
All filesystem operations go through the Hadoop FileSystem API, so the
same code runs on file://, hdfs:// and s3a:// (on S3, committers that
skip _SUCCESS must enable it — mapreduce.fileoutputcommitter has it on
by default).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_VERSION_RE = re.compile(r"^v(\d{10})$")


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _version_dir(store_path: str, version: int) -> str:
    return f"{store_path.rstrip('/')}/v{version:010d}"


def _list_versions(spark: SparkSession, store_path: str):
    """[(version:int, committed:bool)] under ``store_path``, ascending."""
    fs, root, jvm = _fs_and_path(spark, store_path)
    if not fs.exists(root):
        return []
    out = []
    for status in fs.listStatus(root):
        if not status.isDirectory():
            continue
        m = _VERSION_RE.match(status.getPath().getName())
        if not m:
            continue
        success = jvm.org.apache.hadoop.fs.Path(
            status.getPath(), "_SUCCESS"
        )
        out.append((int(m.group(1)), bool(fs.exists(success))))
    return sorted(out)


def latest_committed_version(spark: SparkSession, store_path: str,
                             below: int | None = None,
                             at_least: int | None = None):
    """Highest committed version number (optionally bounded to
    ``at_least <= v < below``), or None when no committed snapshot in
    range exists.  A missing store directory is 'no snapshot'; any
    OTHER filesystem error propagates (a half-readable store must fail
    the batch loudly, not silently restart the view from empty)."""
    committed = [
        v for v, ok in _list_versions(spark, store_path)
        if ok and (below is None or v < below)
        and (at_least is None or v >= at_least)
    ]
    return committed[-1] if committed else None


def read_snapshot(spark: SparkSession, store_path: str,
                  below: int | None = None,
                  at_least: int | None = None):
    """DataFrame over the latest committed snapshot, or None if the
    store has never committed (in the requested version range).

    Maintenance loops MUST pass ``below=<their own version>``: an
    at-least-once replay of epoch N then merges against the same
    predecessor it saw the first time, instead of reading its own
    committed v{N} output (which would re-create the read-own-output
    cycle and double-count additive deltas).  Loops whose run REBUILDS
    the view (checkpoint-less availableNow reprocesses every input
    file) additionally pass ``at_least=<their run's version base>`` so
    a previous run's head is never merged twice into the re-derived
    view."""
    v = latest_committed_version(spark, store_path, below=below,
                                 at_least=at_least)
    if v is None:
        return None
    return spark.read.parquet(_version_dir(store_path, v))


def compact_snapshot(spark: SparkSession, store_path: str,
                     target_mb: int = 128) -> dict:
    """Maintenance compaction for a snapshot store: rewrite the latest
    committed snapshot into ~target_mb files as the NEXT version.

    Micro-batch loops leave each snapshot with one file per task per
    batch; folding the head through the same versioned-commit path
    keeps reads fast without breaking atomic visibility (readers see
    either the old head or the compacted one, never a partial
    rewrite).  Run between stream runs (single-writer contract): if a
    resumed stream later replays the epoch whose slot the compaction
    took, it simply overwrites it with the equivalent uncompacted view
    — correctness is preserved, only the compaction is undone.
    Returns {from_version, to_version, out_files}.
    """
    head = latest_committed_version(spark, store_path)
    if head is None:
        raise ValueError(f"no committed snapshot under {store_path}")
    df = spark.read.parquet(_version_dir(store_path, head))
    fs, _, jvm = _fs_and_path(spark, store_path)
    total = 0
    it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(
        _version_dir(store_path, head)), True)
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    n_out = max(1, -(-total // (target_mb * 1024 * 1024)))  # ceil
    write_snapshot(df.repartition(int(n_out)), store_path, head + 1)
    return {"from_version": head, "to_version": head + 1,
            "out_files": int(n_out)}


def write_snapshot(df: DataFrame, store_path: str, version: int,
                   keep: int = 2) -> str:
    """Distributed write of ``df`` as snapshot ``version``; on commit,
    prune all versions older than the ``keep`` newest committed ones,
    plus any uncommitted debris (the store has a single maintenance
    writer, so post-commit an uncommitted dir can only be a crashed
    attempt — a replay overwrites its slot anyway).  Returns the
    version directory written."""
    spark = df.sparkSession
    vdir = _version_dir(store_path, version)
    df.write.mode("overwrite").parquet(vdir)
    fs, _, jvm = _fs_and_path(spark, store_path)
    versions = _list_versions(spark, store_path)
    committed = [v for v, ok in versions if ok]
    floor = committed[-keep] if len(committed) >= keep else (
        committed[0] if committed else version
    )
    # the floor must never exceed the version just written: a writer
    # committing BELOW existing versions (a fresh checkpoint-less run
    # would if its base weren't offset; defend anyway) must not have
    # its own commit pruned out from under it
    floor = min(floor, version)
    for v, ok in versions:
        if v < floor or not ok:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(_version_dir(store_path, v)),
                True,
            )
    return vdir
