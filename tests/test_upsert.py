"""MERGE-INTO-shaped triples upsert semantics."""

from __future__ import annotations

from ner_funtool_spark.operators.upsert import latest_per_key, upsert_triples

SCHEMA = "subj string, pred string, obj string, repo string, content_sha string, commit string"


def test_latest_per_key_version_and_tie_break(spark):
    df = spark.createDataFrame(
        [
            ("a", "P", "x", "r1", "s1", "v1"),
            ("a", "P", "x", "r1", "s2", "v2"),   # newer version wins
            ("b", "P", "y", "r1", "s3", "v1"),
            ("b", "P", "y", "r1", "s9", "v1"),   # tie on version -> max value tuple
        ],
        SCHEMA,
    )
    got = {(r["subj"], r["obj"]): (r["commit"], r["content_sha"])
           for r in latest_per_key(df).collect()}
    assert got[("a", "x")] == ("v2", "s2")
    assert got[("b", "y")] == ("v1", "s9")


def test_upsert_touches_only_matched_keys(spark):
    existing = spark.createDataFrame(
        [
            ("a", "P", "x", "r1", "s1", "v1"),
            ("b", "P", "y", "r1", "s2", "v1"),
            ("c", "P", "z", "r1", "s3", "v1"),
        ],
        SCHEMA,
    )
    incoming = spark.createDataFrame(
        [
            ("a", "P", "x", "r1", "s1new", "v2"),   # update
            ("d", "P", "w", "r1", "s4", "v2"),      # insert
        ],
        SCHEMA,
    )
    got = {r["subj"]: (r["commit"], r["content_sha"])
           for r in upsert_triples(existing, incoming).collect()}
    assert got["a"] == ("v2", "s1new")
    assert got["b"] == ("v1", "s2")      # untouched pass-through
    assert got["c"] == ("v1", "s3")
    assert got["d"] == ("v2", "s4")      # new key inserted
    assert len(got) == 4


def test_upsert_older_incoming_does_not_regress(spark):
    existing = spark.createDataFrame(
        [("a", "P", "x", "r1", "s2", "v2")], SCHEMA
    )
    incoming = spark.createDataFrame(
        [("a", "P", "x", "r1", "s1", "v1")], SCHEMA
    )
    rows = upsert_triples(existing, incoming).collect()
    assert len(rows) == 1
    assert rows[0]["commit"] == "v2"     # store already newer: kept


def test_bloom_prune_no_false_negatives_and_prunes(spark):
    from ner_funtool_spark.operators.upsert import bloom_prune, build_key_bloom

    # 1000-key store, 10 incoming keys: the bloom must pass all 10
    # matches and prune (almost) everything else before the join
    existing = spark.range(1000).selectExpr(
        "concat('s', id) AS subj", "'P' AS pred", "concat('o', id) AS obj"
    )
    incoming_keys = spark.range(0, 1000, 100).selectExpr(
        "concat('s', id) AS subj", "'P' AS pred", "concat('o', id) AS obj"
    )
    keys = ["subj", "pred", "obj"]
    bloom_df, m, k = build_key_bloom(incoming_keys, keys)
    pruned = bloom_prune(existing, bloom_df, keys, m, k)
    assert pruned.columns == existing.columns
    n_pass = pruned.count()
    # no false negatives: every true match survives the bloom
    assert pruned.join(incoming_keys, keys, "left_semi").count() == 10
    # real pruning: at 16 bits/key the fp rate is well under 1%
    assert n_pass < 30, n_pass


def test_upsert_bloom_identical_result(spark):
    existing = spark.createDataFrame(
        [("a", "P", "x", "r1", "s1", "v1"), ("b", "P", "y", "r1", "s2", "v1"),
         ("c", "P", "z", "r2", "s3", "v1")], SCHEMA
    )
    incoming = spark.createDataFrame(
        [("a", "P", "x", "r1", "s1new", "v2"), ("d", "P", "w", "r2", "s4", "v2")],
        SCHEMA
    )
    plain = sorted(map(tuple, upsert_triples(existing, incoming).collect()))
    bloomed = sorted(map(tuple, upsert_triples(existing, incoming, bloom=True).collect()))
    assert plain == bloomed


def test_scd2_upsert_all_branches(spark):
    from pyspark.sql import functions as F

    from ner_funtool_spark.operators.upsert import scd2_upsert

    hist_schema = ("subj string, pred string, obj string, repo string, "
                   "content_sha string, valid_from string, valid_to string")
    history = spark.createDataFrame(
        [
            ("a", "P", "x", "r1", "s1", "v1", None),    # will change
            ("b", "P", "y", "r1", "s2", "v1", None),    # identical re-emit
            ("c", "P", "z", "r2", "s3", "v1", None),    # untouched
            ("d", "P", "w", "r2", "s0", "v0", "v1"),    # already closed
        ],
        hist_schema,
    )
    incoming = spark.createDataFrame(
        [
            ("a", "P", "x", "r1", "s1new"),   # changed value
            ("b", "P", "y", "r1", "s2"),      # no-op
            ("e", "P", "q", "r3", "s9"),      # brand-new key
        ],
        "subj string, pred string, obj string, repo string, content_sha string",
    )
    out = scd2_upsert(history, incoming, version="v2")
    rows = {(r["subj"], r["valid_from"]): (r["content_sha"], r["valid_to"])
            for r in out.collect()}
    assert out.count() == 6
    assert rows[("a", "v1")] == ("s1", "v2")      # closed at v2
    assert rows[("a", "v2")] == ("s1new", None)   # reopened
    assert rows[("b", "v1")] == ("s2", None)      # no-op stays current
    assert rows[("c", "v1")] == ("s3", None)      # untouched current
    assert rows[("d", "v0")] == ("s0", "v1")      # closed history intact
    assert rows[("e", "v2")] == ("s9", None)      # new key opens
    # current slice is key-unique
    cur = out.filter(F.col("valid_to").isNull())
    assert cur.count() == cur.select("subj", "pred", "obj").distinct().count()


def test_scd2_snapshot_roundtrip(spark):
    from ner_funtool_spark.operators.upsert import scd2_upsert, snapshot_at

    hist_schema = ("subj string, pred string, obj string, repo string, "
                   "content_sha string, valid_from string, valid_to string")
    v1 = spark.createDataFrame(
        [("a", "P", "x", "r1", "s1", "v1", None),
         ("b", "P", "y", "r1", "s2", "v1", None)],
        hist_schema,
    )
    incoming = spark.createDataFrame(
        [("a", "P", "x", "r1", "s1new"), ("e", "P", "q", "r3", "s9")],
        "subj string, pred string, obj string, repo string, content_sha string",
    )
    merged = scd2_upsert(v1, incoming, version="v2")
    # as-of v1 recovers exactly the original fact set
    back = sorted(map(tuple, snapshot_at(merged, "v1").collect()))
    want = sorted(map(tuple, v1.drop("valid_from", "valid_to").collect()))
    assert back == want
    # as-of v2 sees the new current facts
    now = {r["subj"]: r["content_sha"] for r in snapshot_at(merged, "v2").collect()}
    assert now == {"a": "s1new", "b": "s2", "e": "s9"}
