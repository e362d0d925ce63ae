"""Deduplication operators for large-scale training-data pipelines.

Five detectors over the ``documents`` table, all expressed with
JVM-side expressions (codegen) + equi-joins on blocking keys — the
shapes that survive a 100 TB corpus:

* exact          — hash groupBy on md5(text); one shuffle.
* ngram jaccard  — token 3-gram shingles; candidates share a shingle
                   (equi-join on shingle), verified by exact jaccard.
* minhash + LSH  — k universal hashes over the cross-engine md5 hash
                   (functions/hashing.py), banded; candidates share a
                   band bucket.  The scale path: candidate count is
                   O(near-dups), not O(n²).
* simhash        — 32-bit sign-aggregated token-hash fingerprint;
                   candidates share a 16-bit half (Hamming pigeonhole),
                   verified by bit_count(xor) <= max_distance.
* embedding cosine — see operators/similarity.py (near_duplicates_cosine).

Every detector is deterministic and mirrored by a DuckDB oracle in
oracles.py; hash parameters are literals generated from config.SEED so
both engines compute identical signatures.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import SEED
from ..functions.hashing import MERSENNE_P, md5_int_col, minhash_params

SHINGLE_K = 3
MINHASH_K = 16
LSH_BANDS = 4  # rows per band = MINHASH_K // LSH_BANDS = 4
SIMHASH_BITS = 32


def exact_duplicates(documents: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical docs -> (keep_id, dup_id) rows."""
    h = documents.select(F.col(id_col), F.md5(F.col(text_col)).alias("h"))
    groups = h.groupBy("h").agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n")
    )
    return (
        h.join(groups.filter(F.col("n") > 1), "h")
        .filter(F.col(id_col) != F.col("keep_id"))
        .select("keep_id", F.col(id_col).alias("dup_id"))
    )


def shingles(documents: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", k: int = SHINGLE_K) -> DataFrame:
    """(id, shingle) rows: k-token shingles, space-joined, DISTINCT per doc."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return (
        documents.filter(n >= k)
        .select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def ngram_jaccard_pairs(documents: DataFrame, threshold: float,
                        text_col: str = "text", id_col: str = "doc_id",
                        k: int = SHINGLE_K) -> DataFrame:
    """(a, b, score) doc pairs with shingle-set jaccard >= threshold.

    Candidates = pairs sharing >= 1 shingle; intersection sizes come
    from the same join (count per pair), unions from per-doc set sizes
    — no second pass over the text.
    """
    sh = shingles(documents, text_col, id_col, k).persist()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("ni"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sb")), "b")
        .withColumn("jac", F.col("ni") / (F.col("sa") + F.col("sb") - F.col("ni")))
        .filter(F.col("jac") >= threshold)
        .select("a", "b", F.round("jac", 6).alias("score"))
    )
    return out


def minhash_signatures(documents: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = MINHASH_K,
                       shingle_k: int = SHINGLE_K, seed: int = SEED) -> DataFrame:
    """(id, i, sig): per-doc minhash signature — min over shingles of
    (a_i * H(shingle) + b_i) mod p, H = cross-engine md5 hash."""
    a_arr, b_arr = minhash_params(k, seed)
    params = documents.sparkSession.createDataFrame(
        [(int(i), int(a_arr[i]), int(b_arr[i])) for i in range(k)],
        "i int, a bigint, b bigint",
    )
    sh = shingles(documents, text_col, id_col, shingle_k).withColumn(
        "h", md5_int_col(F.col("shingle"))
    )
    # reduce h mod p BEFORE multiplying: a < 2^31 and (h % p) < 2^31 so
    # the product stays under 2^62 — no int64 overflow in any engine
    return (
        sh.crossJoin(F.broadcast(params))
        .groupBy(id_col, "i")
        .agg(
            F.min(
                (F.col("a") * (F.col("h") % F.lit(MERSENNE_P)) + F.col("b"))
                % F.lit(MERSENNE_P)
            ).alias("sig")
        )
    )


def minhash_lsh_pairs(documents: DataFrame, threshold: float,
                      text_col: str = "text", id_col: str = "doc_id",
                      k: int = MINHASH_K, bands: int = LSH_BANDS,
                      seed: int = SEED) -> DataFrame:
    """MinHash-LSH candidate generation + exact-jaccard verification.

    band bucket key = (band_id, all r signature values of the band);
    pairs sharing any bucket are verified with the true shingle jaccard
    (so the threshold is exact, LSH only prunes).
    """
    r = k // bands
    sig = minhash_signatures(documents, text_col, id_col, k, SHINGLE_K, seed)
    banded = sig.withColumn("band", (F.col("i") / r).cast("int")).groupBy(
        id_col, "band"
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "sig"))),
                lambda x: F.concat_ws(":", x["i"].cast("string"), x["sig"].cast("string")),
            ),
            "|",
        ).alias("key")
    )
    a = banded.select(F.col(id_col).alias("a"), "band", "key")
    b = banded.select(F.col(id_col).alias("b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # candidate-proportional verification: intersect shingles only for
    # LSH candidates (never the full pair enumeration — that is the
    # whole point of LSH at corpus scale)
    sh = shingles(documents, text_col, id_col).persist()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    ni = (
        cand.join(sh.select(F.col(id_col).alias("a"), "shingle"), "a")
        .join(sh.select(F.col(id_col).alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("ni"))
    )
    out = (
        ni.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sb")), "b")
        .withColumn("jac", F.col("ni") / (F.col("sa") + F.col("sb") - F.col("ni")))
        .filter(F.col("jac") >= threshold)
        .select("a", "b", F.round("jac", 6).alias("score"))
    )
    return out


def simhash_fingerprints(documents: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         bits: int = SIMHASH_BITS) -> DataFrame:
    """(id, fp): sign-aggregated token-hash fingerprint.

    bit_j(fp) = 1 iff sum over DISTINCT tokens of (2*bit_j(H(tok)) - 1) > 0.
    """
    toks = documents.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ).withColumn("h", md5_int_col(F.col("tok")))
    # one aggregation with `bits` vote columns instead of a bits-table
    # cross join: shuffles 1 row per token, not `bits` rows per token
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(F.expr(f"(shiftright(h, {j}) & 1) * 2 - 1")).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fp = term if fp is None else fp + term
    return votes.select(F.col(id_col), fp.alias("fp"))


def simhash_pairs(documents: DataFrame, max_distance: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  bits: int = SIMHASH_BITS) -> DataFrame:
    """(a, b, dist) pairs with Hamming(fp_a, fp_b) <= max_distance.

    Blocking: two fingerprints within distance d <= bits/2 - 1 share at
    least one of the two 16-bit halves OR... pigeonhole only guarantees
    a shared half for d = 0 within that half; for robustness candidates
    are pairs sharing either half, then verified — at corpus scale the
    halves partition the table into ~2^16 buckets.
    """
    fp = simhash_fingerprints(documents, text_col, id_col, bits)
    half = bits // 2
    parts = fp.select(
        F.col(id_col),
        F.col("fp"),
        F.explode(
            F.array(
                F.concat(F.lit("lo:"), (F.col("fp") % F.lit(1 << half)).cast("string")),
                F.concat(F.lit("hi:"), F.shiftright(F.col("fp"), half).cast("string")),
            )
        ).alias("bucket"),
    )
    a = parts.select(F.col(id_col).alias("a"), F.col("fp").alias("fa"), "bucket")
    b = parts.select(F.col(id_col).alias("b"), F.col("fp").alias("fb"), "bucket")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "fa", "fb")
        .distinct()
    )
    dist = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        cand.withColumn("dist", dist)
        .filter(F.col("dist") <= max_distance)
        .select("a", "b", F.col("dist").cast("int").alias("dist"))
    )
