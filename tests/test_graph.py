"""Graph analytics (degrees, PageRank) vs numpy references."""

from __future__ import annotations

import numpy as np

from ner_funtool_spark.operators.graph import degrees, pagerank


def _np_pagerank(edges, nodes, iterations=5, d=0.85):
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[idx[s]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += pr[idx[s]] / out_deg[idx[s]]
        dangling = pr[out_deg == 0].sum()
        pr = (1 - d) / n + d * (contrib + dangling / n)
    return {nodes[i]: pr[i] for i in range(n)}


def test_degrees_multigraph(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got = {r["node"]: (r["out_deg"], r["in_deg"], r["deg"])
           for r in degrees(df).collect()}
    assert got == {"a": (2, 1, 3), "b": (1, 2, 3), "c": (1, 1, 2)}


def test_pagerank_matches_numpy_with_dangling(spark):
    # d is dangling (no out-edges); duplicate edge must count once
    edges = [("a", "b"), ("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["pr"] for r in pagerank(df).collect()}
    want = _np_pagerank(list(set(edges)), ["a", "b", "c", "d"])
    assert set(got) == set(want)
    for node, pr in want.items():
        assert abs(got[node] - pr) < 1e-6, node
    # probability mass is conserved under dangling redistribution
    assert abs(sum(got.values()) - 1.0) < 1e-5


def test_pagerank_empty_edges(spark):
    # empty edge list: typed empty result, no ZeroDivisionError
    df = spark.createDataFrame([], "src string, dst string")
    out = pagerank(df)
    assert out.columns == ["node", "pr"]
    assert out.count() == 0


def test_comention_edges(spark):
    from ner_funtool_spark.operators.graph import comention_edges

    m = spark.createDataFrame(
        [("r", "p1", "a"), ("r", "p1", "b"), ("r", "p1", "b"), ("r", "p1", "c"),
         ("r", "p2", "a"), ("r", "p2", "b"),
         ("r", "p3", "a")],
        "repo string, path string, text string",
    )
    got = {(r["a"], r["b"]): r["n_docs"] for r in comention_edges(m).collect()}
    # duplicates within a doc count once; pairs weighted by doc count
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
