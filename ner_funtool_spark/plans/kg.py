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
                    mode: str = "rules",
                    encoder_opts: dict | None = None) -> DataFrame:
    """source(repo,path,commit,lang,content,content_sha) -> mention rows.
    ``encoder_opts`` overrides the neural encoder shape (depth study —
    operators/tagger._build_encoder docstring)."""
    sents = segment_lines(source)
    return tag_mentions(sents, domain=domain, mode=mode,
                        encoder_opts=encoder_opts)


def build_triples(source: DataFrame, *, domain: str = "code",
                  mode: str = "rules", include_contains: bool = True) -> DataFrame:
    """Full mention->triple dataflow; returns the un-salted triple DF
    (callers add salting via operators.triples.write_triples)."""
    mentions = detect_mentions(source, domain=domain, mode=mode)
    triples = mentions_to_triples(mentions, domain=domain)
    if include_contains:
        triples = triples.unionByName(contains_triples(source))
    return triples


def build_canonical_triples(source: DataFrame, *, domain: str = "code",
                            mode: str = "rules",
                            link_threshold: float = 0.5,
                            alias_df: DataFrame | None = None) -> DataFrame:
    """The full north_star flow: mentions -> (optional) alias join ->
    blocked candidate linking -> connected-components canonical ids ->
    triples whose objects are canonical entities, plus SAME_AS edges
    for every non-canonical surface form.
    """
    from ..operators.linking import alias_link, link_entities
    from ..operators.triples import mentions_to_triples

    # the Arrow tagging stage feeds linking (nodes + edges), the triple
    # projection AND the SAME_AS branch — persist so it runs once, not
    # once per downstream reference (session-lifetime cache, LRU)
    mentions = detect_mentions(source, domain=domain, mode=mode).persist()
    if alias_df is not None:
        mentions = alias_link(mentions, alias_df)
        mentions = mentions.withColumn(
            "text", F.coalesce("entity_id", F.col("text"))
        ).drop("entity_id")
    token_pattern = "[._/ ]" if domain == "code" else " "
    linked = link_entities(mentions, threshold=link_threshold,
                           token_pattern=token_pattern)
    canon = linked.withColumn("surface", F.col("text")).withColumn(
        "text", F.col("canonical_id")
    )
    triples = mentions_to_triples(
        canon.drop("canonical_id", "surface"), domain=domain
    )
    same_as = (
        linked.filter(F.col("text") != F.col("canonical_id"))
        .select(
            F.col("text").alias("subj"),
            F.lit("SAME_AS").alias("pred"),
            F.col("canonical_id").alias("obj"),
            F.col("repo"),
            F.col("content_sha"),
            F.struct(
                F.col("path"), F.col("commit"), F.col("sent_id"),
                F.col("begin"), F.col("end"), F.col("model"), F.col("score"),
            ).alias("provenance"),
        )
        .distinct()
    )
    return triples.unionByName(same_as).unionByName(contains_triples(source))


def materialize_triples(source: DataFrame, out_dir: str, *,
                        domain: str = "code", mode: str = "rules",
                        n_parts: int = 32, n_salt: int = 8) -> dict:
    """End-to-end materialize with salted partitioning + resumable
    per-bucket checkpointing; returns run stats (K3/K7 analog)."""
    from ..operators.checkpoint import resumable_write, run_metrics
    from ..operators.triples import with_salted_part

    triples = build_triples(source, domain=domain, mode=mode).drop("provenance")
    salted = with_salted_part(triples, n_parts=n_parts, n_salt=n_salt)
    stats = resumable_write(salted, out_dir)
    stats.update(run_metrics(source.sparkSession, out_dir))
    return stats


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
