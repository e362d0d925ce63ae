"""The training-corpus materialization plan — the end-to-end flow a
data team actually runs over raw documents:

    quality filter -> near-dup removal (keep-longest) ->
    stratified sampling (data mixing) -> deterministic split assignment

Each stage is an existing oracle-gated operator (textstats.quality_score,
dedup.ngram_jaccard_pairs + components.keep_one_per_cluster,
datasplit.stratified_sample / assign_splits); this plan composes them in
the canonical order (filter FIRST so dedup's candidate generation never
sees rows that are leaving anyway) and the composed DuckDB oracle
(oracles.training_corpus_sql) replays the whole flow — so the
INTERACTION of the stages is value-hash-gated, not just each stage
alone.

Scale shape: the quality filter is a pure projection+filter in the
scan stage; dedup is the bounded-blocking jaccard path; sampling/splits
are shuffle-free hash filters.  The only shuffles are the dedup
self-join and the keep-one window — both over the already-filtered
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import quality_score
from ..operators.components import canonicalize, keep_one_per_cluster
from ..operators.datasplit import assign_splits, stratified_sample
from ..operators.dedup import ngram_jaccard_pairs


def build_training_corpus(docs: DataFrame, *, min_quality: float,
                          jaccard_t: float,
                          rates: dict[str, float], default_rate: float,
                          weights: dict[str, float]) -> DataFrame:
    """documents -> (doc_id, source, quality, split) of the materialized
    training corpus.  Thresholds compare the 6-decimal-rounded quality
    (quality_score's output contract) so both engines cut identically.
    """
    q = docs.withColumn("quality", quality_score(F.col("text")))
    # filtered feeds BOTH the dedup edge builder and the keep stage:
    # persist so the quality projection runs once
    filtered = q.filter(F.col("quality") >= min_quality).persist()
    # the near-dup edge list feeds the CC loop's initial checkpoint,
    # the node list AND (through clusters) the keep stage — persist it
    # or the whole candidate-join + exact-verify pipeline re-runs per
    # materialization (r6, measured: 3 recomputes of ~8.6 s each at
    # sf0.1; the edge list itself is tiny)
    edges = (
        ngram_jaccard_pairs(filtered, jaccard_t)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .persist()
    )
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    )
    clusters = canonicalize(nodes, edges)
    kept = keep_one_per_cluster(
        filtered, clusters,
        order_cols=[F.col("n_chars").desc(), F.col("doc_id").asc()],
    )
    sampled = stratified_sample(kept, rates, default_rate=default_rate)
    out = assign_splits(sampled, weights)
    return out.select("doc_id", "source", "quality", "split")
