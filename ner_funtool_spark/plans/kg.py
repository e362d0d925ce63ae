"""End-to-end KG-construction plans.

``build_triples`` is the flagship dataflow (north_star):

  source scan -> segment -> fused Arrow tag+extract -> mentions
  -> triples projection (+ CONTAINS from the scan) -> salted write

The plan is declared entirely with DataFrame ops so Catalyst prunes
columns into the parquet scan and fuses the relational glue; the only
Python is the single Arrow-batched tagging stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.segment import segment_lines
from ..operators.tagger import tag_mentions
from ..operators.triples import contains_triples, mentions_to_triples


def detect_mentions(source: DataFrame, *, domain: str = "code",
                    mode: str = "rules") -> DataFrame:
    """source(repo,path,commit,lang,content,content_sha) -> mention rows."""
    sents = segment_lines(source)
    return tag_mentions(sents, domain=domain, mode=mode)


def build_triples(source: DataFrame, *, domain: str = "code",
                  mode: str = "rules", include_contains: bool = True) -> DataFrame:
    """Full mention->triple dataflow; returns the un-salted triple DF
    (callers add salting via operators.triples.write_triples)."""
    mentions = detect_mentions(source, domain=domain, mode=mode)
    triples = mentions_to_triples(mentions, domain=domain)
    if include_contains:
        triples = triples.unionByName(contains_triples(source))
    return triples


def documents_as_source(documents: DataFrame) -> DataFrame:
    """Adapt the driver's `documents` table to the source-code input
    shape (repo,path,commit,lang,content,content_sha) — a pure
    projection, SQL-expressible so the DuckDB oracle can mirror it."""
    return documents.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.substring(F.md5(F.col("text")), 1, 12).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
    )
