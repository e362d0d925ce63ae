"""Sink formats: CLUE submit JSON, TSV, metrics JSON, Iceberg gate."""

from __future__ import annotations

import json
import os

from ner_funtool_spark.sources.corpus import clue_tags, read_clue_json, tags_to_clue_label
from ner_funtool_spark.sources.sinks import (
    clue_submit_json,
    have_iceberg,
    metrics_json,
    write_table,
    write_tsv,
)

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_clue_submit_json_shape(spark):
    clue = read_clue_json(spark, f"{DATA}/clue.jsonl")
    labels = tags_to_clue_label(clue_tags(clue))
    rows = [json.loads(r["value"]) for r in clue_submit_json(labels).collect()]
    assert all(set(r) == {"id", "label"} for r in rows)
    one = next(r for r in rows if r["label"].get("game"))
    assert one["label"]["game"]["x"] == [[0, 0], [3, 3]]


def test_write_table_falls_back_to_parquet(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    fmt = write_table(df, str(tmp_path / "t"), partition_by=["v"])
    assert fmt == ("iceberg" if have_iceberg(spark) else "parquet")
    back = spark.read.parquet(str(tmp_path / "t"))
    assert back.count() == 2 and set(back.columns) == {"k", "v"}


def test_tsv_and_metrics_sinks(spark, tmp_path):
    df = spark.createDataFrame([(1, 0.5)], "k long, v double")
    write_tsv(df, str(tmp_path / "tsv"))
    got = spark.read.option("sep", "\t").option("header", True).csv(str(tmp_path / "tsv"))
    assert got.count() == 1
    metrics_json(df, str(tmp_path / "mj"))
    assert spark.read.json(str(tmp_path / "mj")).first()["v"] == 0.5
