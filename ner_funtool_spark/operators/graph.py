"""Graph analytics over the materialized triples table — the natural
KG surface next to canonicalization (round-1 backlog item).

The reference stops at emitting tag outputs; its KG re-expression
(north_star) materializes (subj, pred, obj) triples, and the first
questions a user asks of a triples table are graph-shaped: node
degrees and node importance.  Both are expressed as DataFrame ops:

* degrees — two groupBy counts + one outer join (two shuffles total);
  multigraph semantics (parallel edges count separately).
* pagerank — fixed-iteration power method over DISTINCT edges with the
  standard damping + dangling-mass redistribution.  Each iteration is
  one join + one aggregation; ``localCheckpoint`` truncates the plan
  per iteration exactly like the connected-components operator
  (components.py), so the lineage never grows with iteration count —
  the property that keeps iterative DataFrame algorithms viable at
  scale.  The dangling-mass scalar stays distributed (1-row aggregate
  broadcast-crossJoined back), no driver collect in the loop.

Both are DuckDB-oracle-checked (unrolled-CTE SQL, oracles.py) at
round(6) on doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
PR_ITERATIONS = 5


def degrees(edges: DataFrame, src_col: str = "src",
            dst_col: str = "dst") -> DataFrame:
    """(node, out_deg, in_deg, deg) over a multigraph edge list."""
    out_d = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    in_d = edges.groupBy(F.col(dst_col).alias("node")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .fillna(0, subset=["out_deg", "in_deg"])
        .select(
            "node",
            F.col("out_deg").cast("bigint").alias("out_deg"),
            F.col("in_deg").cast("bigint").alias("in_deg"),
            (F.col("out_deg") + F.col("in_deg")).cast("bigint").alias("deg"),
        )
    )


def comention_edges(mentions: DataFrame, doc_cols=("repo", "path"),
                    text_col: str = "text") -> DataFrame:
    """Entity co-occurrence edges: (a, b, n_docs) for every unordered
    pair of DISTINCT entities mentioned in the same document, weighted
    by the number of documents co-mentioning them — the edge list
    entity-embedding / related-entities features train on.

    Per-document distinct-entity self-join: the join key is the doc id,
    so pair count per doc is bounded by (distinct entities per doc)^2 —
    document-length-bounded, never corpus-quadratic; one groupBy on the
    (a, b) pair aggregates the weights.
    """
    d = list(doc_cols)
    ents = mentions.select(*d, F.col(text_col).alias("e")).distinct()
    a = ents.select(*d, F.col("e").alias("a"))
    b = ents.select(*d, F.col("e").alias("b"))
    return (
        a.join(b, d)
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


def pagerank(edges: DataFrame, src_col: str = "src", dst_col: str = "dst",
             iterations: int = PR_ITERATIONS,
             damping: float = DAMPING) -> DataFrame:
    """Fixed-iteration PageRank over the DISTINCT edge set.

    pr_{t+1}(v) = (1-d)/N + d * (sum_{u->v} pr_t(u)/outdeg(u)
                                 + dangling_mass_t / N)

    Returns (node, pr) with pr rounded to 6 decimals (cross-engine
    float determinism rule).  N is computed once (scalar dimension);
    everything in the loop is distributed.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        # empty edge list: no nodes, typed-empty result (guards the
        # 1.0/n below; r2 ADVICE item 3)
        out = nodes.select("node", F.lit(0.0).cast("double").alias("pr"))
        e.unpersist()
        nodes.unpersist()
        return out
    out_deg = e.groupBy("src").agg(F.count("*").alias("od"))
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(out_deg, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("od")).alias("contrib"))
        )
        dangling = (
            ranks.join(out_deg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    # materialize the final ranks (eager checkpoint) BEFORE releasing
    # the cached edge/node tables the iteration plan reads — after
    # this the caller holds a self-contained result and the loop's
    # persisted inputs are freed (r2 ADVICE item 3)
    out = ranks.select("node", F.round("pr", 6).alias("pr")).localCheckpoint(
        eager=True
    )
    e.unpersist()
    nodes.unpersist()
    return out
