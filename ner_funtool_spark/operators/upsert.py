"""Incremental triples upsert — MERGE-INTO-shaped KG maintenance.

A production KG is not rebuilt from scratch per run: new commits of a
repository re-emit triples for changed files, and the store must keep
exactly one row per logical triple — the newest version — without
rewriting untouched partitions.  This operator family gives the engine
that maintenance surface in plain DataFrame algebra (the same shape an
Iceberg MERGE INTO compiles to: anti/semi joins + a windowed dedup):

* ``latest_per_key`` — one row per key, newest by a version column,
  ties broken deterministically by the full value tuple (max struct —
  a total order, the engine's standard tie-break).
* ``upsert_triples`` — existing ∪ incoming -> resolved table; rows of
  ``existing`` untouched by ``incoming`` pass through unchanged
  (anti-join), matched keys take the newer version.

Scale notes: one shuffle on the key for the dedup, one for the
anti-join; both are equi-joins on (subj, pred, obj).  With the store
salted by operators/triples.py the anti-join co-partitions with the
write layout, so only buckets containing matched keys rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_KEY = ("subj", "pred", "obj")


def latest_per_key(df: DataFrame, key_cols=TRIPLE_KEY,
                   version_col: str = "commit") -> DataFrame:
    """One row per key: max over struct(version, other cols) — newest
    version wins, exact ties resolve by the value tuple (total order,
    deterministic on both engines)."""
    keys = list(key_cols)
    others = [c for c in df.columns if c not in keys]
    ordered = [version_col] + [c for c in others if c != version_col]
    agg = df.groupBy(*keys).agg(
        F.max(F.struct(*[F.col(c) for c in ordered])).alias("_v")
    )
    return agg.select(
        *keys, *[F.col("_v").getField(c).alias(c) for c in ordered]
    ).select(*df.columns)


def upsert_triples(existing: DataFrame, incoming: DataFrame,
                   key_cols=TRIPLE_KEY,
                   version_col: str = "commit") -> DataFrame:
    """MERGE-INTO semantics: keys present in ``incoming`` take the
    newest version across BOTH tables; all other existing rows pass
    through untouched.  Columns must match."""
    keys = list(key_cols)
    inc_keys = incoming.select(*keys).distinct()
    untouched = existing.join(inc_keys, keys, "left_anti")
    touched = existing.join(inc_keys, keys, "left_semi").unionByName(incoming)
    resolved = latest_per_key(touched, key_cols, version_col)
    return untouched.unionByName(resolved)
