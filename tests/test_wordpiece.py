"""BasicTokenizer / WordPiece / encoding semantics (P4-P7) — behavior
pinned against the reference's documented contract
(bert/tokenization.py, run_bert_crf.py:340-433)."""

from __future__ import annotations

from ner_funtool_spark.functions.wordpiece import (
    CLS,
    SEP,
    UNK,
    basic_tokenize,
    encode_words,
    full_tokenize,
    wordpiece,
)


def test_basic_lowercase_accent_punct():
    assert basic_tokenize("Héllo, World!") == ["hello", ",", "world", "!"]


def test_basic_cjk_chars_isolated():
    assert basic_tokenize("ab中国cd") == ["ab", "中", "国", "cd"]


def test_basic_control_and_weird_whitespace():
    assert basic_tokenize("a\x00b c\td") == ["ab", "c", "d"]


def test_basic_consecutive_punct_each_token():
    assert basic_tokenize("a--b") == ["a", "-", "-", "b"]


def test_basic_no_lower():
    assert basic_tokenize("Ab C", lower=False) == ["Ab", "C"]


VOCAB = {"un", "##aff", "##able", "aff", "runn", "##ing", "run", "a", "##b",
         "[UNK]", "[CLS]", "[SEP]"}


def test_wordpiece_reference_example():
    # the reference's own docstring example (tokenization.py:315-317)
    assert wordpiece("unaffable", VOCAB) == ["un", "##aff", "##able"]


def test_wordpiece_greedy_longest_first():
    assert wordpiece("running", VOCAB) == ["runn", "##ing"]


def test_wordpiece_unk_on_uncovered_and_oversize():
    assert wordpiece("xyz", VOCAB) == [UNK]
    assert wordpiece("ab" * 150, VOCAB) == [UNK]  # > 200 chars


def test_full_tokenize_composes():
    assert full_tokenize("Unaffable running!", VOCAB | {"!"}) == [
        "un", "##aff", "##able", "runn", "##ing", "!",
    ]


def test_encode_words_label_alignment():
    vocab = {w: i + 5 for i, w in enumerate(sorted(VOCAB))}
    label_map = {"O": 0, "B-x": 1, "X": 2, CLS: 3, SEP: 4}
    enc = encode_words(["unaffable", "run"], ["B-x", "O"], vocab,
                       max_len=10, label_map=label_map)
    # tokens are unpadded; ids/mask are padded to max_len
    assert enc["tokens"] == [CLS, "un", "##aff", "##able", "run", SEP]
    # first piece keeps the word label, continuations get X
    assert enc["labels"][:6] == [CLS, "B-x", "X", "X", "O", SEP]
    assert enc["input_mask"] == [1] * 6 + [0] * 4
    assert len(enc["input_ids"]) == 10


def test_encode_words_truncates_to_max():
    vocab = {"a": 1, "##b": 2, "[UNK]": 0}
    label_map = {"O": 0, "X": 1, CLS: 2, SEP: 3}
    enc = encode_words(["ab"] * 10, ["O"] * 10, vocab, max_len=6,
                       label_map=label_map)
    assert len(enc["input_ids"]) == 6
    assert enc["tokens"][0] == CLS and SEP in enc["tokens"]
    assert sum(enc["input_mask"]) == 6


# ---------------------------------------------------------------------------
# production Spark stage (operators/wordpiece_stage.py)
# ---------------------------------------------------------------------------

def test_wordpiece_stage_matches_pure_function(spark):
    """The mapInPandas stage must produce exactly encode_words() per row
    (broadcast vocab + per-batch memoization are transparent)."""
    from ner_funtool_spark.operators.wordpiece_stage import (
        build_label_map,
        wordpiece_encode,
    )

    vocab = {p: i for i, p in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "load", "data", "##set", "x"]
    )}
    label_map = build_label_map(["op", "obj"])
    rows = [
        (1, ["load", "dataset"], ["op", "obj"]),   # dataset -> data ##set
        (2, ["x", "zzz"], ["O", "O"]),             # zzz -> [UNK]
        (3, [], []),                               # empty sentence
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, words array<string>, labels array<string>"
    )
    got = {r["doc_id"]: r for r in
           wordpiece_encode(df, vocab, label_map, max_len=8).collect()}
    for doc_id, words, labels in rows:
        want = encode_words(words, labels, vocab, 8, label_map)
        assert got[doc_id]["tokens"] == want["tokens"]
        assert got[doc_id]["input_ids"] == want["input_ids"]
        assert got[doc_id]["input_mask"] == want["input_mask"]
        assert got[doc_id]["label_ids"] == want["label_ids"]
    # continuation piece got X label, first piece kept the word label
    t1 = got[1]
    assert t1["tokens"] == ["[CLS]", "load", "data", "##set", "[SEP]"]
    x_id = label_map["X"]
    assert t1["label_ids"][3] == x_id
    assert t1["label_ids"][2] == label_map["obj"]


def test_corpus_vocab_covers_and_orders(spark):
    """corpus_vocab: specials + char fallback + frequent tokens; any
    lowercase-alnum word is coverable (no [UNK] explosion)."""
    from ner_funtool_spark.operators.wordpiece_stage import corpus_vocab

    docs = spark.createDataFrame(
        [(i, "alpha beta alpha") for i in range(5)], "doc_id long, text string"
    )
    v = corpus_vocab(docs, min_freq=5)
    assert v["[PAD]"] == 0 and "[UNK]" in v
    assert "alpha" in v        # freq 10 >= 5
    assert "beta" in v         # freq 5 >= 5
    assert "##z" in v and "q" in v  # char fallback pieces
    got = wordpiece("qqq", v)  # rare word -> char pieces, never [UNK]
    assert got == ["q", "##q", "##q"]


def test_corpus_vocab_top_n_cap_is_deterministic(spark):
    """max_vocab structurally bounds the driver collect: the cap keeps
    the most-frequent tokens (ties by token asc) and drops the tail."""
    from ner_funtool_spark.operators.wordpiece_stage import corpus_vocab

    rows = [(i, "hot " * 9 + "warm " * 4 + f"cold{i}") for i in range(6)]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    capped = corpus_vocab(docs, min_freq=1, max_vocab=2)
    # the two corpus slots go to hot (54) then warm (24); cold* cut
    assert "hot" in capped and "warm" in capped
    assert not any(k.startswith("cold") for k in capped)
    full = corpus_vocab(docs, min_freq=1, max_vocab=30_000)
    assert any(k.startswith("cold") for k in full)
    # specials + char fallback never count against the cap
    assert "[UNK]" in capped and "##z" in capped


def test_subword_vocab_multichar_continuations(spark):
    """corpus_vocab_with_subwords: a frequent doubled word splits as
    [w, ##w] — the greedy match consumes a MULTI-CHAR continuation."""
    from ner_funtool_spark.operators.wordpiece_stage import (
        corpus_vocab_with_subwords,
    )

    docs = spark.createDataFrame(
        [(i, "join filter join") for i in range(5)], "doc_id long, text string"
    )
    v = corpus_vocab_with_subwords(docs, min_freq=5)
    assert "##join" in v and "##filter" in v
    assert wordpiece("joinjoin", v) == ["join", "##join"]
    # rare word still falls back to char continuations
    assert wordpiece("zq", v) == ["z", "##q"]
    # continuation ids extend the base vocab deterministically
    assert v["##join"] > v["join"] and v["##filter"] > v["filter"]
