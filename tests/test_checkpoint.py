"""Resumability: kill after k buckets, re-run, assert identical final
triples and no duplicate work (SURVEY.md §5 test plan item d)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ner_funtool_spark.operators.checkpoint import load_ledger, resumable_write, run_metrics
from ner_funtool_spark.operators.triples import with_salted_part
from ner_funtool_spark.plans.kg import build_triples
from ner_funtool_spark.sources.code_table import source_table


@pytest.fixture(scope="module")
def salted(spark):
    src = source_table(spark, 60, partitions=4)
    t = build_triples(src, mode="rules").drop("provenance")
    return with_salted_part(t, n_parts=6, n_salt=2).persist()


def _read_triples(spark, path):
    return spark.read.parquet(path).select("subj", "pred", "obj")


def test_oneshot_then_resume_is_noop(spark, salted, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("triples_a"))
    s1 = resumable_write(salted, out)
    assert s1["written_buckets"] > 0 and s1["written_rows"] > 0
    n = _read_triples(spark, out).count()
    s2 = resumable_write(salted, out)
    assert s2["written_buckets"] == 0 and s2["written_rows"] == 0
    assert _read_triples(spark, out).count() == n
    m = run_metrics(spark, out)
    assert m["rows"] == n and m["buckets"] == s1["written_buckets"]


def test_killed_run_resumes_to_identical_output(spark, salted, tmp_path_factory):
    ref_dir = str(tmp_path_factory.mktemp("triples_ref"))
    resumable_write(salted, ref_dir)
    want = sorted(map(tuple, _read_triples(spark, ref_dir).collect()))

    out = str(tmp_path_factory.mktemp("triples_resume"))
    s1 = resumable_write(salted, out, simulate_failure_after=3)
    assert s1["written_buckets"] == 3
    led1 = load_ledger(spark, out)
    assert led1.count() == 3

    s2 = resumable_write(salted, out)  # resume
    assert s2["written_buckets"] > 0
    got = sorted(map(tuple, _read_triples(spark, out).collect()))
    assert got == want

    # no bucket written twice
    led = load_ledger(spark, out)
    assert led.groupBy("part", "salt").count().filter(F.col("count") > 1).count() == 0
    # resume did not re-write the 3 finished buckets
    first = {(r["part"], r["salt"]) for r in led1.collect()}
    assert s2["written_buckets"] == led.count() - 3
    second = {
        (r["part"], r["salt"]) for r in led.collect()
    } - first
    assert not (first & second)


def test_ledger_checksums_match_data(spark, salted, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("triples_ck"))
    resumable_write(salted, out)
    led = load_ledger(spark, out).select("part", "salt", "rows", "checksum")
    again = (
        spark.read.parquet(out)
        .groupBy("part", "salt")
        .agg(
            F.count("*").alias("rows2"),
            F.expr("bit_xor(xxhash64(subj, pred, obj))").alias("checksum2"),
        )
    )
    j = led.join(again, ["part", "salt"], "full")
    bad = j.filter(
        (F.col("rows") != F.col("rows2")) | (F.col("checksum") != F.col("checksum2"))
        | F.col("rows").isNull() | F.col("rows2").isNull()
    )
    assert bad.count() == 0
