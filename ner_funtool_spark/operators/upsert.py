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

BLOOM_HASHES = 3
BLOOM_BITS_PER_KEY = 16
_BLOOM_MAX_BITS = 1 << 26  # 64 Mbit = 8 MB bitmap ceiling (broadcast state)


def _bloom_num_bits(n_keys: int, bits_per_key: int = BLOOM_BITS_PER_KEY) -> int:
    m = 1 << max(10, (max(n_keys, 1) * bits_per_key - 1).bit_length())
    return min(m, _BLOOM_MAX_BITS)


def _bloom_positions(key_cols, num_bits: int, num_hashes: int):
    """k independent bit positions per key tuple: pmod(xxhash64(i, keys))
    — one hash per probe index rather than h1 + i*h2 arithmetic, so no
    bigint overflow under ANSI mode and the same expression serves
    build and probe."""
    cols = [F.col(c) for c in key_cols]
    return [
        F.pmod(F.xxhash64(F.lit(i), *cols), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def build_key_bloom(keys_df: DataFrame, key_cols,
                    num_hashes: int = BLOOM_HASHES,
                    bits_per_key: int = BLOOM_BITS_PER_KEY):
    """Bloom filter over ``keys_df``'s key tuples, built as ONE
    distributed aggregation (explode k positions -> groupBy word ->
    bit_or), collected as a bounded ``num_bits/64``-long bitmap and
    returned as a 1-row DataFrame to broadcast onto the probe side.

    This is the runtime-row-filter idea Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter`` applies to shuffle
    joins, made explicit and deterministic: the build side costs one
    pass over the (small) key set, the probe predicate is pure
    whole-stage-codegen column expressions, and NO key is ever falsely
    rejected — false positives only pass extra rows to the exact join
    behind it, so any join it guards keeps its semantics.

    Returns (bloom_df['_bloom' array<bigint>], num_bits, num_hashes).
    """
    n = keys_df.count()
    m = _bloom_num_bits(n, bits_per_key)
    pos = F.explode(F.array(*_bloom_positions(key_cols, m, num_hashes)))
    words = (
        keys_df.select(pos.alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.col("p").cast("int").alias("pi"),
        )
        .selectExpr("w", "shiftleft(cast(1 as bigint), pi % 64) AS bit")
        .groupBy("w").agg(F.bit_or("bit").alias("bits"))
    )
    got = {r["w"]: r["bits"] for r in words.collect()}
    bitmap = [got.get(i, 0) for i in range(m // 64)]
    spark = keys_df.sparkSession
    bloom_df = spark.createDataFrame([(bitmap,)], "_bloom array<bigint>")
    return bloom_df, m, num_hashes


def bloom_prune(probe: DataFrame, bloom_df: DataFrame, key_cols,
                num_bits: int, num_hashes: int = BLOOM_HASHES) -> DataFrame:
    """Drop ``probe`` rows whose key tuple cannot be in the bloom'd key
    set — runs in the probe's scan stage, BEFORE any shuffle the exact
    join behind it needs.  Output schema == probe schema."""
    out = probe.crossJoin(F.broadcast(bloom_df))
    conds = []
    for i, p in enumerate(_bloom_positions(key_cols, num_bits, num_hashes)):
        out = out.withColumn(f"_bp{i}", p)
        conds.append(
            F.expr(
                f"(shiftright(element_at(_bloom, cast(_bp{i} / 64 AS int) + 1),"
                f" cast(_bp{i} % 64 AS int)) & 1) = 1"
            )
        )
    keep = conds[0]
    for c in conds[1:]:
        keep = keep & c
    drop = ["_bloom"] + [f"_bp{i}" for i in range(num_hashes)]
    return out.filter(keep).drop(*drop)


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


def scd2_upsert(history: DataFrame, incoming: DataFrame,
                key_cols=TRIPLE_KEY, compare_cols=("content_sha",),
                version: str = "v2",
                valid_from_col: str = "valid_from",
                valid_to_col: str = "valid_to") -> DataFrame:
    """Type-2 slowly-changing-dimension MERGE over a triples HISTORY
    table — the temporal-KG maintenance shape (every fact carries
    [valid_from, valid_to); valid_to NULL = current).

    Semantics per key of ``incoming`` (one row per key, e.g. via
    latest_per_key):

    * current row exists and ``compare_cols`` differ -> the current row
      CLOSES (valid_to = version) and the incoming row opens as the new
      current (valid_from = version);
    * current row exists and values are identical -> no-op (the current
      row stays open, no duplicate history);
    * no current row -> the incoming row opens as current;
    * already-closed history rows always pass through unchanged.

    One full-outer join of the CURRENT slice against the incoming keys
    + the untouched closed slice — the same join budget as a plain
    MERGE.  At scale the closed slice is the bulk of the table and is
    never shuffled (pure pass-through union), so maintenance cost
    follows the CURRENT set + update size, not history length.
    """
    keys = list(key_cols)
    cmps = list(compare_cols)
    cur = history.filter(F.col(valid_to_col).isNull())
    closed = history.filter(F.col(valid_to_col).isNotNull())
    inc = incoming.select(
        *keys, *[F.col(c).alias(f"_in_{c}") for c in cmps],
        *[F.col(c).alias(f"_in_{c}") for c in incoming.columns
          if c not in keys and c not in cmps],
        F.lit(True).alias("_in_flag"),
    )
    other_cols = [c for c in incoming.columns if c not in keys and c not in cmps]
    j = cur.join(inc, keys, "full_outer")
    # presence markers survive NULL data values: valid_from is non-null
    # on every real current row (table contract); _in_flag is a literal
    has_cur = F.col(valid_from_col).isNotNull()
    has_inc = F.col("_in_flag").isNotNull()
    changed = has_cur & has_inc & (
        sum(
            [(~F.col(c).eqNullSafe(F.col(f"_in_{c}"))).cast("int") for c in cmps],
            F.lit(0),
        ) > 0
    )
    # surviving current rows: unmatched, or matched-identical
    keep_cur = j.filter(has_cur & (~has_inc | ~changed)).select(*history.columns)
    # matched-changed current rows close at `version`
    close_cur = j.filter(changed).select(
        *[F.col(c) for c in history.columns if c != valid_to_col],
        F.lit(version).alias(valid_to_col),
    ).select(*history.columns)
    # new current rows: matched-changed or brand-new keys
    open_new = j.filter(has_inc & (changed | ~has_cur)).select(
        *keys,
        *[F.col(f"_in_{c}").alias(c) for c in cmps],
        *[F.col(f"_in_{c}").alias(c) for c in other_cols],
        F.lit(version).alias(valid_from_col),
        F.lit(None).cast("string").alias(valid_to_col),
    ).select(*history.columns)
    return closed.unionByName(keep_cur).unionByName(close_cur).unionByName(open_new)


def snapshot_at(history: DataFrame, version: str,
                valid_from_col: str = "valid_from",
                valid_to_col: str = "valid_to") -> DataFrame:
    """Time-travel read over an SCD2 history: the fact set visible AT
    ``version`` — rows whose validity interval covers it
    (valid_from <= version < valid_to, NULL valid_to = open).  A pure
    partition-pruned filter: with the history written partitioned (or
    sorted) by validity, a snapshot read touches only covering row
    groups.  Versions compare as strings; use zero-padded or timestamp
    versions in production.  Invariant (driver-gated):
    ``snapshot_at(scd2_upsert(H_v1, ...), "v1") == H_v1``."""
    return history.filter(
        (F.col(valid_from_col) <= version)
        & (F.col(valid_to_col).isNull() | (F.col(valid_to_col) > version))
    ).drop(valid_from_col, valid_to_col)


def upsert_triples(existing: DataFrame, incoming: DataFrame,
                   key_cols=TRIPLE_KEY,
                   version_col: str = "commit",
                   bloom: bool = False) -> DataFrame:
    """MERGE-INTO semantics: keys present in ``incoming`` take the
    newest version across BOTH tables; all other existing rows pass
    through untouched.  Columns must match.

    ``bloom=True`` builds a Bloom filter over the incoming keys and
    prunes the existing-side input of the semi join with it IN THE SCAN
    STAGE — when ``incoming`` is too large to broadcast (the 100 TB
    case: both join inputs shuffle on the key), an update touching 1%
    of keys stops shuffling ~100% of the store into the matched-side
    resolution; only bloom hits (matches + ~0.1% false positives at 16
    bits/key) flow on.  Blooming never drops a true match, so the
    result is hash-identical to ``bloom=False`` — Q:triples_upsert_bloom
    is gated against the SAME oracle as Q:triples_upsert."""
    keys = list(key_cols)
    inc_keys = incoming.select(*keys).distinct()
    if bloom:
        inc_keys = inc_keys.persist()  # read by the bloom build + both joins
    untouched = existing.join(inc_keys, keys, "left_anti")
    ex_touch = existing
    if bloom:
        bloom_df, m, k = build_key_bloom(inc_keys, keys)
        ex_touch = bloom_prune(existing, bloom_df, keys, m, k)
    touched = ex_touch.join(inc_keys, keys, "left_semi").unionByName(incoming)
    resolved = latest_per_key(touched, key_cols, version_col)
    return untouched.unionByName(resolved)
