"""Dataset management operators for a training-data pipeline:
deterministic splits, stratified sampling, and sequence packing.

Everything here is a per-row pure-expression decision (no shuffle for
splits/sampling, one partition-local window for packing), so each
operator holds at 10^12 rows by construction, and every decision hashes
through the cross-engine md5 forms (functions/hashing.py) so the DuckDB
oracles replay it exactly.

Why these exist (the ops an LLM data pipeline runs after dedup):

* ``assign_splits`` — train/val/test membership must be a deterministic
  function of the ROW, not of the run: reshuffling-based splits leak
  rows across splits whenever the corpus is re-ingested or grows.
  Hash-bucket assignment (bucket = H(salt|id) % 10000 against
  cumulative weight boundaries) is stable under appends, restarts and
  repartitioning.
* ``stratified_sample`` — per-stratum keep rates (data mixing: e.g.
  downsample crawl, keep all curated sources) with the same stability
  guarantee; keep iff bucket < rate * 10000.
* ``pack_documents`` — concat-and-chunk sequence packing: documents are
  laid end-to-end in a deterministic order and cut into fixed
  ``budget``-token bins (GPT-style pretraining batches; document
  boundaries do not reset the bin).  Packing is PARTITION-LOCAL
  (per ``part_col``): each stratum packs independently, which is the
  only formulation that needs no global sequential state at 100 TB —
  one window cumsum per stratum, no shuffle beyond it.

The reference has no dataset-management tier (its splits are fixed
files, data/clue_ner/*.txt); these are engine-level extensions the
north_star's training-corpus use case requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_int_col

SPLIT_BUCKETS = 10000


def _bucket(id_col, salt: str):
    """Deterministic 0..9999 bucket of (salt, id) — md5-based so the
    DuckDB oracle computes the identical value."""
    key = F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))
    return F.pmod(md5_int_col(key), F.lit(SPLIT_BUCKETS))


def assign_splits(df: DataFrame, weights: dict[str, float],
                  id_col: str = "doc_id",
                  salt: str = "split_v1") -> DataFrame:
    """Adds ``split`` (the weights' keys) by deterministic hash bucket.

    weights: ordered {label: fraction} summing to ~1; boundaries are
    cumulative fractions of 10,000 buckets (exact integer edges, so
    both engines cut identically).  Changing ``salt`` redraws the
    split; appending rows never moves existing ones.
    """
    total = sum(weights.values())
    b = _bucket(id_col, salt)
    expr = None
    acc = 0.0
    labels = list(weights.items())
    for label, w in labels[:-1]:
        acc += w / total
        edge = int(round(acc * SPLIT_BUCKETS))
        expr = (F.when(b < edge, label) if expr is None
                else expr.when(b < edge, label))
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "source", id_col: str = "doc_id",
                      default_rate: float = 0.0,
                      salt: str = "sample_v1") -> DataFrame:
    """Keep each row with its stratum's rate, deterministically:
    keep iff H(salt|id) % 10000 < rate * 10000.  Strata absent from
    ``rates`` use ``default_rate``.  Pure filter — no shuffle, stable
    under appends (the data-mixing primitive)."""
    b = _bucket(id_col, salt)
    expr = None
    for stratum, rate in rates.items():
        edge = int(round(rate * SPLIT_BUCKETS))
        cond = F.col(strata_col) == stratum
        expr = (F.when(cond, b < edge) if expr is None
                else expr.when(cond, b < edge))
    default_edge = int(round(default_rate * SPLIT_BUCKETS))
    keep = (b < default_edge) if expr is None else expr.otherwise(b < default_edge)
    return df.filter(keep)


def pack_documents(df: DataFrame, budget: int,
                   part_col: str = "source", id_col: str = "doc_id",
                   ntok_col=None) -> DataFrame:
    """Concat-and-chunk packing: within each ``part_col`` stratum,
    documents ordered by ``id_col`` are laid end-to-end and cut into
    ``budget``-token bins.

    Returns (id, part, n_tokens, pack_id, start_off): the doc's tokens
    begin at ``start_off`` inside pack ``pack_id`` (a doc straddling a
    boundary continues into the next pack — GPT-style chunking, no
    padding waste).  ``ntok_col``: a Column of per-doc token counts;
    defaults to whitespace tokens of ``text``.

    One window (cumulative sum per stratum) — the partition-local
    formulation that scales: no global order, no driver state.
    """
    ntok = ntok_col if ntok_col is not None else F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy(part_col).orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(ntok).over(w), F.lit(0)).cast("bigint")
    return df.select(
        F.col(id_col),
        F.col(part_col),
        ntok.cast("int").alias("n_tokens"),
        F.floor(cum_before / budget).cast("bigint").alias("pack_id"),
        F.pmod(cum_before, F.lit(budget)).cast("int").alias("start_off"),
    )
