"""Connected components vs a brute-force union-find, plus linking tests."""

from __future__ import annotations

import numpy as np
import pytest

from ner_funtool_spark.operators.components import canonicalize, connected_components
from ner_funtool_spark.operators.linking import alias_link, candidate_pairs, link_entities


def _uf_components(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(ms) for ms in comp.values() for n in ms}


@pytest.mark.parametrize("seed", range(5))
def test_cc_matches_union_find_random_graphs(spark, seed):
    rng = np.random.RandomState(seed)
    n = 40
    nodes = [f"n{i:03d}" for i in range(n)]
    m = int(rng.randint(10, 60))
    edges = [
        (nodes[rng.randint(n)], nodes[rng.randint(n)]) for _ in range(m)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    want = _uf_components(nodes, edges)
    ndf = spark.createDataFrame([(x,) for x in nodes], "node string")
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["canonical_id"] for r in canonicalize(ndf, edf).collect()}
    assert got == want


def test_cc_long_chain_converges(spark):
    # a 40-node path graph is the worst case for naive propagation;
    # the star algorithm must still converge within max_iter
    nodes = [f"n{i:03d}" for i in range(40)]
    edges = list(zip(nodes[:-1], nodes[1:]))
    edf = spark.createDataFrame(edges, "src string, dst string")
    got = connected_components(edf, max_iter=25).collect()
    assert {r["canonical_id"] for r in got} == {"n000"}
    assert len(got) == 40


def test_cc_empty_edges(spark):
    ndf = spark.createDataFrame([("a",), ("b",)], "node string")
    edf = spark.createDataFrame([], "src string, dst string")
    got = {r["node"]: r["canonical_id"] for r in canonicalize(ndf, edf).collect()}
    assert got == {"a": "a", "b": "b"}


def test_candidate_pairs_jaccard_and_blocking(spark):
    ents = spark.createDataFrame(
        [
            ("join merge", "op"),
            ("join merge sort", "op"),
            ("join", "op"),
            ("join merge", "obj"),   # same text, different type -> different block
            ("sort scan", "op"),     # different first token -> never paired
        ],
        "text string, etype string",
    )
    got = {(r["src"], r["dst"]): r["score"] for r in candidate_pairs(ents).collect()}
    # jaccard({join,merge},{join,merge,sort}) = 2/3; ({join},{join,merge}) = 1/2
    assert got == {
        ("join merge", "join merge sort"): round(2 / 3, 6),
        ("join", "join merge"): 0.5,
    }
    # jaccard 1/3 < threshold -> ("join", "join merge sort") excluded;
    # the obj-typed "join merge" is in a different block so the op/obj
    # twin pair never forms; "sort scan" has a different first token.


def test_alias_link_broadcast(spark):
    mentions = spark.createDataFrame(
        [("Join Merge", "op"), ("unknown thing", "op")], "text string, etype string"
    )
    alias = spark.createDataFrame(
        [("join merge", "ENT_1")], "alias string, entity_id string"
    )
    got = {r["text"]: r["entity_id"] for r in alias_link(mentions, alias).collect()}
    assert got == {"Join Merge": "ENT_1", "unknown thing": None}


def test_link_entities_assigns_canonical_ids(spark):
    mentions = spark.createDataFrame(
        [
            ("join merge", "op"),
            ("join merge sort", "op"),
            ("scan", "op"),
            ("join merge", "op"),  # duplicate mention
        ],
        "text string, etype string",
    )
    got = link_entities(mentions).collect()
    by_text = {}
    for r in got:
        by_text.setdefault(r["text"], set()).add(r["canonical_id"])
    # the two similar entities share one canonical id (the min text)
    assert by_text["join merge"] == {"join merge"}
    assert by_text["join merge sort"] == {"join merge"}
    assert by_text["scan"] == {"scan"}
    assert len(got) == 4  # mention rows preserved


def test_keep_one_per_cluster_policies(spark):
    from pyspark.sql import functions as F

    from ner_funtool_spark.operators.components import keep_one_per_cluster

    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (4, 7), (9, 99)],
        "doc_id long, n_chars long",
    )
    # cluster {1,2,3} with canonical 1; 4 clustered alone; 9 unclustered
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "node long, canonical_id long"
    )
    # default policy: min id per cluster
    kept = {r["doc_id"] for r in keep_one_per_cluster(docs, clusters).collect()}
    assert kept == {1, 4, 9}
    # keep-longest policy: n_chars desc, doc_id asc tie-break (2 beats 3)
    kept = {
        r["doc_id"]
        for r in keep_one_per_cluster(
            docs, clusters,
            order_cols=[F.col("n_chars").desc(), F.col("doc_id").asc()],
        ).collect()
    }
    assert kept == {2, 4, 9}
