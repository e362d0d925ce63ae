"""Sinks (SURVEY.md §2.2 K1-K6): columnar tables, CLUE submit JSON,
TSV, and the Iceberg gate.

The reference writes TFRecords (run_bert_crf.py:436-467), metric text
files (:812-817), probability TSVs (:850-863) and CLUE submit JSON
(predict_bert_wol.py:204-221, 340-383).  Our engine's canonical sink is
partitioned parquet (operators/triples.py, operators/checkpoint.py);
this module adds the interchange formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def have_iceberg(spark) -> bool:
    """Iceberg needs its runtime jar on the classpath; not in this image
    (pyspark_guide.md).  Callers fall back to plain parquet layout with
    the identical partition spec."""
    try:
        # py4j returns a JavaPackage (no error) for unknown attributes,
        # so probe the classloader explicitly
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Schema")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, path_or_table: str, partition_by: list[str],
                mode: str = "overwrite") -> str:
    """Iceberg when available, parquet otherwise — same partition spec."""
    spark = df.sparkSession
    if have_iceberg(spark):
        (
            df.writeTo(path_or_table)
            .using("iceberg")
            .partitionedBy(*[F.col(c) for c in partition_by])
            .createOrReplace()
        )
        return "iceberg"
    df.write.mode(mode).partitionBy(*partition_by).parquet(path_or_table)
    return "parquet"


def clue_submit_json(labels: DataFrame, out_dir: str | None = None) -> DataFrame:
    """(line_id, label) -> one JSON line per input line:
    {"id": i, "label": {type: {word: [[s,e]]}}} (predict_bert_wol.py:220).

    Returns the single-column DataFrame of JSON strings; writes
    ``write.text`` when out_dir is given."""
    j = labels.select(
        F.to_json(
            F.struct(F.col("line_id").alias("id"), F.col("label"))
        ).alias("value")
    )
    if out_dir:
        j.coalesce(1).write.mode("overwrite").text(out_dir)
    return j


def write_tsv(df: DataFrame, out_dir: str) -> None:
    """test_results.tsv analog (run_bert_crf.py:850-863)."""
    df.write.mode("overwrite").option("sep", "\t").option("header", True).csv(out_dir)


def metrics_json(metrics: DataFrame, out_dir: str) -> None:
    """eval_results analog (run_bert_crf.py:812-817) as JSON lines."""
    metrics.coalesce(1).write.mode("overwrite").json(out_dir)
