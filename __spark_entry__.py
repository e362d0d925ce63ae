"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``ner_funtool_spark/``; this module is the
thin registry mapping SURVEY.md §2 operators to runnable queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ner_funtool_spark import oracles  # noqa: E402
from ner_funtool_spark.plans.kg import build_triples, detect_mentions, documents_as_source  # noqa: E402


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents -> segment -> Arrow CRF tagging -> mentions
    -> (subj, pred, obj) triples.  Driver checks rows>0."""
    src = documents_as_source(_docs(spark, "/root/testdata/sf0.001"))
    return build_triples(src, domain="doc", mode="rules").select(
        "subj", "pred", "obj", "repo", "content_sha"
    )


# ---------------------------------------------------------------------------
# queries: name -> (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------

def _q_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = documents_as_source(_docs(spark, sf_dir))
    return build_triples(src, domain="doc", mode="rules").select(
        "subj", "pred", "obj", "repo", "content_sha"
    )


def _q_kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = documents_as_source(_docs(spark, sf_dir))
    m = detect_mentions(src, domain="doc", mode="rules")
    return m.select(
        "repo",
        "path",
        F.col("sent_id").cast("bigint").alias("sent_id"),
        F.col("begin").alias("mbegin"),
        F.col("end").alias("mend"),
        "text",
        "etype",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "kg_triples": _q_kg_triples,
        "kg_mentions": _q_kg_mentions,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/types)."""
    return {
        "kg_triples": oracles.doc_triples_sql(),
        "kg_mentions": oracles.doc_mentions_sql(),
    }
