"""Byte-path tokenizer equivalence vs the reference regex path.

The fast path (functions/fast_tokenize.py) must produce EXACTLY the
spans, lengths, token classes and truncation of the regex tokenizer in
operators/tagger.py — randomized and adversarial cases below; the
end-to-end guarantee additionally rides on the DuckDB-oracle-checked
kg_mentions/kg_triples queries, which exercise the byte path."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pytest

from ner_funtool_spark.functions.fast_tokenize import padded_spans
from ner_funtool_spark.operators.tagger import (
    MAX_LEN,
    _classes_bytes,
    _tokenize_unique,
    code_token_classes,
    doc_token_classes,
)

WORDS = [
    "def", "func", "function", "void", "class", "type", "import", "from",
    "package", "join", "table", "row", "get_value", "x", "_private",
    "camelCase", "a1b2", "123", "42abc", "0x", "n0", "HTTP2Server",
]
PUNCT = list(".,;:(){}[]\"'`!@#$%^&*-+=<>/?\\|~")
WS = [" ", "  ", "\t", "\n", "\x0b", "\x0c", "\x1c", "\x1f", " \t "]


def _rand_sentences(rng, n, allow_unicode=False):
    out = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(0, 90)):
            r = rng.random()
            if r < 0.5:
                parts.append(rng.choice(WORDS))
            elif r < 0.7:
                parts.append(rng.choice(PUNCT))
            elif r < 0.75 and allow_unicode:
                parts.append("中")
            else:
                parts.append(str(rng.randint(0, 99999)))
            parts.append(rng.choice(WS) if rng.random() < 0.8 else "")
        out.append("".join(parts))
    out += ["", " ", "...", "123abc456def", "abc123", "_", '"x"', "9"]
    return out


def _assert_equivalent(sentences, max_len=MAX_LEN):
    arr = pa.array(sentences, type=pa.string())
    fast = padded_spans(arr, max_len)
    assert fast is not None
    data, offs, fb, fe, flens, tstart, tlen = fast
    utoks, ub, ue, ulens = _tokenize_unique(sentences, max_len)
    np.testing.assert_array_equal(flens, ulens)
    assert fb.shape == ub.shape
    np.testing.assert_array_equal(fb, ub)
    np.testing.assert_array_equal(fe, ue)
    # token payloads match (byte slices vs regex matches)
    for i in range(len(sentences)):
        for j in range(int(ulens[i])):
            if tlen[i, j] == 0 and utoks[i, j] == "":
                continue
            got = data[tstart[i, j]: tstart[i, j] + tlen[i, j]].tobytes().decode()
            assert got == utoks[i, j], (i, j, sentences[i])
    return data, tstart, tlen, ulens, utoks


def test_spans_match_regex_randomized():
    rng = random.Random(42)
    _assert_equivalent(_rand_sentences(rng, 120))


def test_classes_match_both_domains():
    rng = random.Random(7)
    sentences = _rand_sentences(rng, 80)
    data, tstart, tlen, ulens, utoks = _assert_equivalent(sentences)
    for domain, str_fn in (("code", code_token_classes),
                           ("doc", doc_token_classes)):
        fast_cls = _classes_bytes(domain, data, tstart, tlen, ulens)
        np.testing.assert_array_equal(
            fast_cls, str_fn(utoks, ulens), err_msg=domain
        )


def test_truncation_and_offsets():
    s = " ".join(f"tok{i}" for i in range(200))  # 200 tokens > MAX_LEN
    data, tstart, tlen, ulens, utoks = _assert_equivalent([s], max_len=64)
    assert ulens[0] == 64


def test_non_ascii_falls_back():
    arr = pa.array(["hello 世界", "ok"], type=pa.string())
    assert padded_spans(arr, 64) is None


def test_sliced_arrow_array_offsets():
    """padded_spans must honor a nonzero pyarrow array offset."""
    arr = pa.array(["aa bb", "cc dd", "ee ff"], type=pa.string()).slice(1, 2)
    fast = padded_spans(arr, 64)
    assert fast is not None
    data, offs, fb, fe, flens, tstart, tlen = fast
    got0 = data[tstart[0, 0]: tstart[0, 0] + tlen[0, 0]].tobytes().decode()
    assert got0 == "cc"
    assert list(flens) == [2, 2]


def test_tokens_never_cross_sentence_boundary():
    # adjacent strings with no separator: "ab" + "cd" must NOT merge
    data, tstart, tlen, ulens, utoks = _assert_equivalent(["ab", "cd"])
    assert utoks[0, 0] == "ab" and utoks[1, 0] == "cd"
    assert ulens[0] == 1 and ulens[1] == 1


@pytest.mark.parametrize("s,want", [
    ("123abc", ["123", "abc"]),
    ("abc123", ["abc123"]),
    ("12ab34cd", ["12", "ab34cd"]),
    ("_x.9y", ["_x", ".", "9", "y"]),
    ('"import os"', ['"', "import", "os", '"']),
])
def test_digit_letter_run_splits(s, want):
    _, tstart, tlen, ulens, utoks = _assert_equivalent([s])
    assert list(utoks[0, : ulens[0]]) == want


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAS_HYPOTHESIS = False

if HAS_HYPOTHESIS:
    ascii_text = st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=127),
        max_size=200,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(ascii_text, min_size=1, max_size=8))
    def test_hypothesis_spans_equal_regex(sentences):
        """Fuzz: byte-path spans == regex spans for ANY ASCII input
        (including control chars, long punct runs, empty strings)."""
        _assert_equivalent(sentences, max_len=64)
