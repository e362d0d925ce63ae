"""Tagger stage tests: tokenizer offsets, lexer classes, decode-parity
fixtures for the neural & cascade paths (SURVEY.md §5: CRF decode
outputs are an explicit pytest target), and invalid-sequence mention
extraction."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from ner_funtool_spark.operators.tagger import (
    code_token_classes,
    extract_mentions_arrays,
    tag_sequences,
    tokenize_batch,
)

SENTS = [
    "import alpha.core",
    "def load_1(a, b):",
    "class Reader7:",
    'import "beta"',
    "x = compute(x, y)",
]

# committed decode-parity fixtures: sha256 over '|'.join(tags) per
# sentence, '\n'-joined, for the seeded model (config.SEED).
# REGENERATED r3 when the neural encoder became SeededBertBiLSTM
# (toy-BERT attention stack + BiLSTM, VERDICT r2 item 6); regenerate by
# running tag_sequences over SENTS and hashing, as _tag_hash does.
NEURAL_HASH = "090683d58d9bbb053d5932686e67f4d37c1097e90f62df52964e693da3da99fb"
CASCADE_HASH = "70e901a722d9348d0c635db5577022d6ae064488ee8b55fae3c41262e063993f"


def test_tokenizer_offsets_reconstruct_tokens():
    toks, tb, te, lens = tokenize_batch(pd.Series(SENTS))
    for i, s in enumerate(SENTS):
        for j in range(lens[i]):
            assert s[tb[i, j]:te[i, j]] == toks[i, j]


def test_tokenizer_truncates_at_max_len():
    s = pd.Series([" ".join(f"t{i}" for i in range(100))])
    toks, _, _, lens = tokenize_batch(s, max_len=64)
    assert lens[0] == 64 and toks.shape[1] == 64


def test_code_token_classes_rules():
    toks, _, _, lens = tokenize_batch(pd.Series(SENTS))
    cls = code_token_classes(toks, lens)
    by_tok = {}
    for i in range(len(SENTS)):
        for j in range(lens[i]):
            by_tok.setdefault((i, toks[i, j]), cls[i, j])
    # import alpha.core -> alpha, '.', core all module (3)
    assert by_tok[(0, "alpha")] == 3 and by_tok[(0, ".")] == 3 and by_tok[(0, "core")] == 3
    assert by_tok[(0, "import")] == 0
    assert by_tok[(1, "load_1")] == 1  # func after def
    assert by_tok[(2, "Reader7")] == 2  # class
    assert by_tok[(3, "beta")] == 3  # quoted import
    assert by_tok[(4, "compute")] == 0  # plain call is not an entity


def test_from_import_symbol_is_not_module():
    toks, _, _, lens = tokenize_batch(pd.Series(["from alpha.core import load_1"]))
    cls = code_token_classes(toks, lens)
    names = {toks[0, j]: cls[0, j] for j in range(lens[0])}
    assert names["alpha"] == 3 and names["core"] == 3
    assert names["load_1"] == 0  # imported symbol, not a module mention


def _tag_hash(rows) -> str:
    blob = "\n".join("|".join(r.tags) for r in rows)
    return hashlib.sha256(blob.encode()).hexdigest()


@pytest.mark.parametrize("mode,expect", [("neural", NEURAL_HASH), ("cascade", CASCADE_HASH)])
def test_decode_parity_fixture(spark, mode, expect):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SENTS)], "sid long, sentence string"
    )
    rows = tag_sequences(df, domain="code", mode=mode).orderBy("sid").collect()
    assert _tag_hash(rows) == expect


def test_decode_deterministic_across_partitionings(spark):
    df1 = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SENTS)], "sid long, sentence string"
    ).repartition(1)
    df4 = df1.repartition(4)
    a = tag_sequences(df1, domain="code", mode="neural").orderBy("sid").collect()
    b = tag_sequences(df4, domain="code", mode="neural").orderBy("sid").collect()
    assert [r.tags for r in a] == [r.tags for r in b]


def test_extract_mentions_handles_invalid_sequences():
    """Arbitrary (neural) tag ids: only type-consistent B(M*)E chains and
    singleton S emit — matches spans.pipeline_rule."""
    from ner_funtool_spark.functions.spans import pipeline_rule

    rng = np.random.RandomState(5)
    etypes = ["a", "b"]
    names = ["O"] + [f"{x}-{t}" for t in etypes for x in "BMES"]
    for _ in range(30):
        n = int(rng.randint(1, 10))
        tags = rng.randint(0, 9, size=(1, n)).astype(np.int32)
        tb = np.arange(0, 3 * n, 3, dtype=np.int32).reshape(1, n)
        te = tb + 2
        sent = " ".join(f"w{j}" for j in range(n))
        m = extract_mentions_arrays(tags, tb, te, np.array([n]))
        got_set = {
            (b, e, sent[b:e], etypes[t])
            for b, e, t in zip(m["begin"], m["end"], m["etype_id"])
        }
        want = pipeline_rule([f"w{j}" for j in range(n)], [names[t] for t in tags[0]])
        want_set = {(3 * x.begin, 3 * x.end + 2, x.text, x.etype) for x in want}
        assert got_set == want_set, (tags.tolist(), got_set, want_set)


def test_albert_encoder_structure_and_decode(spark):
    """SeededAlbertBiLSTM: factorized embedding (E < D), ONE shared
    layer applied n_layers times (structural sharing), deterministic
    encode distinct from the BERT-style stack; the albert tagging mode
    produces structurally valid mentions."""
    import numpy as np

    from ner_funtool_spark.functions.model import (
        SeededAlbertBiLSTM,
        SeededBertBiLSTM,
    )
    from ner_funtool_spark.plans.kg import detect_mentions, documents_as_source

    alb = SeededAlbertBiLSTM(256, 9, n_attr=3)
    assert alb.factor_dim < alb.embed.shape[1]
    assert alb.emb_e.shape == (256, alb.factor_dim)
    # parameter sharing is structural: one dict, not n copies
    assert isinstance(alb.shared_layer, dict)
    ids = np.array([[1, 2, 3, 0], [4, 5, 0, 0]])
    lens = np.array([3, 2])
    h1 = alb.encode(ids, lens)
    h2 = alb.encode(ids, lens)
    assert np.array_equal(h1, h2)  # deterministic
    bert = SeededBertBiLSTM(256, 9, n_attr=3)
    assert not np.allclose(h1, bert.encode(ids, lens))

    docs = spark.createDataFrame(
        [(1, "join scan filter table index", "en", "s0", 29)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    m = detect_mentions(documents_as_source(docs), domain="doc",
                        mode="albert").collect()
    for r in m:
        assert 0 <= r["begin"] < r["end"] <= len(r["sentence"])
        assert r["text"] == r["sentence"][r["begin"]:r["end"]]
        assert r["model"] == "albert_doc_v1"
