"""Dataset-management operators: hash splits, stratified sampling,
sequence packing, salted join."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_funtool_spark.operators.datasplit import (
    assign_splits,
    pack_documents,
    stratified_sample,
)
from ner_funtool_spark.operators.joins import salted_join


def test_assign_splits_stable_under_append(spark):
    """A row's split never changes when more rows arrive (the property
    shuffle-based splits lack)."""
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    small = spark.range(100).withColumnRenamed("id", "doc_id")
    big = spark.range(1000).withColumnRenamed("id", "doc_id")
    s1 = {r["doc_id"]: r["split"] for r in assign_splits(small, w).collect()}
    s2 = {r["doc_id"]: r["split"] for r in assign_splits(big, w).collect()}
    assert all(s2[k] == v for k, v in s1.items())
    # proportions roughly match the weights at n=1000
    from collections import Counter
    c = Counter(s2.values())
    assert 700 < c["train"] < 900 and 50 < c["val"] < 160 and 50 < c["test"] < 160
    # a different salt redraws
    s3 = {r["doc_id"]: r["split"]
          for r in assign_splits(big, w, salt="other").collect()}
    assert any(s3[k] != s2[k] for k in s3)


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("source"),
    )
    out = stratified_sample(df, {"s0": 1.0, "s1": 0.25}, default_rate=0.0)
    got = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in got}
    assert by["s0"] == 1000            # rate 1.0 keeps everything
    assert 150 < by.get("s1", 0) < 350  # ~25% of 1000
    # deterministic: same rows on re-run
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in stratified_sample(
        df, {"s0": 1.0, "s1": 0.25}, default_rate=0.0).collect())
    assert a == b


def test_pack_documents_chunking(spark):
    df = spark.createDataFrame(
        [(1, "a", "x " * 99), (2, "a", "y " * 49), (3, "a", "z " * 199),
         (4, "b", "w " * 9)],
        "doc_id long, source string, text string",
    )
    # text "x " * 99 splits to 100 tokens (trailing space -> empty token)
    rows = {r["doc_id"]: r for r in pack_documents(df, 128).collect()}
    assert rows[1]["pack_id"] == 0 and rows[1]["start_off"] == 0
    assert rows[2]["pack_id"] == 0 and rows[2]["start_off"] == 100
    # doc 3 starts at cumulative 150 -> pack 1, offset 22
    assert rows[3]["pack_id"] == 1 and rows[3]["start_off"] == 150 - 128
    # stratum b packs independently
    assert rows[4]["pack_id"] == 0 and rows[4]["start_off"] == 0


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [("k1", i) for i in range(50)] + [("k2", i) for i in range(3)],
        "k string, v long",
    )
    right = spark.createDataFrame([("k1", "A"), ("k2", "B"), ("k3", "C")],
                                  "k string, tag string")
    plain = sorted(map(tuple, left.join(right, ["k"]).collect()))
    salted = sorted(map(tuple, salted_join(left, right, ["k"], n_salt=4).collect()))
    assert plain == salted
    # left rows of the hot key actually spread over multiple salts
    from pyspark.sql import functions as FF
    salts = (left.withColumn(
        "_s", FF.pmod(FF.xxhash64("k", "v"), FF.lit(4)))
        .filter(FF.col("k") == "k1").select("_s").distinct().count())
    assert salts > 1


def test_degenerate_inputs(spark):
    """Empty and single-row corpora flow through the dataset-management
    stack without errors (the 100 TB pipeline's first failure mode is a
    partition that happens to be empty)."""
    import pyspark.sql.functions as FF

    from ner_funtool_spark.operators.upsert import scd2_upsert, snapshot_at
    from ner_funtool_spark.plans.corpus import build_training_corpus

    schema = "doc_id long, source string, lang string, text string, n_chars long"
    empty = spark.createDataFrame([], schema)
    one = spark.createDataFrame([(1, "s0", "en", "join table", 10)], schema)

    kwargs = dict(min_quality=0.0, jaccard_t=0.5,
                  rates={"s0": 1.0}, default_rate=0.0,
                  weights={"train": 0.9, "test": 0.1})
    assert build_training_corpus(empty, **kwargs).count() == 0
    got = build_training_corpus(one, **kwargs).collect()
    assert len(got) == 1 and got[0]["doc_id"] == 1

    assert assign_splits(empty, {"a": 1.0}).count() == 0
    assert stratified_sample(empty, {"s0": 1.0}).count() == 0
    assert pack_documents(empty, 64).count() == 0
    assert pack_documents(one, 64).collect()[0]["pack_id"] == 0

    hist_schema = ("subj string, pred string, obj string, repo string, "
                   "content_sha string, valid_from string, valid_to string")
    ehist = spark.createDataFrame([], hist_schema)
    einc = spark.createDataFrame(
        [], "subj string, pred string, obj string, repo string, content_sha string")
    assert scd2_upsert(ehist, einc).count() == 0
    # empty history + one incoming row opens one current fact
    inc1 = spark.createDataFrame(
        [("a", "P", "x", "r", "s")],
        "subj string, pred string, obj string, repo string, content_sha string")
    out = scd2_upsert(ehist, inc1, version="v1")
    assert out.count() == 1
    assert snapshot_at(out, "v1").count() == 1
    assert out.filter(FF.col("valid_to").isNull()).count() == 1
