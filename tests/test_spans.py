"""Span-rule divergence fixtures (SURVEY.md §2.9, hard-parts item 2).

Each case pins one behavioural difference between the reference's three
extractors (ner_utils.get_entity / get_result, entity_evaluating.calculate)
and our production pipeline rule.
"""

from __future__ import annotations

from ner_funtool_spark.functions.spans import (
    Mention,
    calculate_rule,
    get_entity_rule,
    get_result_rule,
    pipeline_rule,
    trans_label_rule,
)

TOKS = list("abcdefg")


def test_get_entity_basic_and_type_slice():
    # B M E emits; note the reference keeps tag[1:] i.e. '-TYPE'
    tags = ["B-ORG", "M-ORG", "E-ORG", "O", "O", "O", "O"]
    assert get_entity_rule(TOKS, tags) == ["-ORG:abc"]


def test_get_entity_no_type_consistency():
    # M/E of a different type still extend (no check in the reference)
    tags = ["B-ORG", "M-LOC", "E-PER", "O", "O", "O", "O"]
    assert get_entity_rule(TOKS, tags) == ["-ORG:abc"]


def test_get_entity_s_never_emits():
    tags = ["S-ORG", "O", "B-LOC", "E-LOC", "O", "O", "O"]
    assert get_entity_rule(TOKS, tags) == ["-LOC:cd"]


def test_get_entity_id0_gap_survives():
    # id-0 positions are `continue`d, so an O-gap does NOT reset (quirk)
    tags = ["B-ORG", 0, "E-ORG", "O", "O", "O", "O"]
    assert get_entity_rule(TOKS, tags) == ["-ORG:ac"]


def test_get_entity_leading_me_ignored():
    tags = ["M-ORG", "E-ORG", "O", "O", "O", "O", "O"]
    assert get_entity_rule(TOKS, tags) == []


def test_get_result_reference_worked_example():
    # the reference's own __main__ example (ner_utils.py:156-176):
    # '中国首都是北京' with B M M E O M M — the O flushes [0,3]; the
    # trailing M M never opened a span (M with empty temp_word is a
    # no-op at ner_utils.py:132-136), so only one span comes out.
    tags = ["B-ORG", "M-ORG", "M-ORG", "E-ORG", "O", "M-ORG", "M-ORG"]
    spans, types = get_result_rule(tags)
    assert spans == [[0, 3]] and types == ["ORG"]


def test_get_result_singleton_and_open_at_end_dropped():
    spans, types = get_result_rule(["S-PER", "O", "B-ORG", "M-ORG"])
    assert spans == [[0, 0]] and types == ["PER"]


def test_get_result_m_adopts_type_when_missing():
    # M- extends an open span and supplies the type if it's missing
    spans, types = get_result_rule(["B-ORG", "M-LOC", "E-LOC", "O"])
    assert spans == [[0, 2]] and types == ["ORG"]


def test_calculate_requires_type_consistency():
    tags = ["B-ORG", "M-LOC", "E-ORG", "O", "O", "O", "O"]
    assert calculate_rule(TOKS, tags) == []  # M-LOC resets the candidate
    tags2 = ["B-ORG", "M-ORG", "E-ORG", "O", "O", "O", "O"]
    assert calculate_rule(TOKS, tags2) == [Mention(0, 2, "abc", "ORG")]


def test_calculate_skips_o_without_reset():
    # the reference `continue`s on y==0 -> O-gap survives (quirk kept)
    tags = ["B-ORG", "O", "E-ORG", "O", "O", "O", "O"]
    assert calculate_rule(TOKS, tags) == [Mention(0, 2, "ac", "ORG")]


def test_pipeline_rule_resets_on_o_and_emits_s():
    tags = ["B-ORG", "O", "E-ORG", "S-PER", "O", "O", "O"]
    assert pipeline_rule(TOKS, tags) == [Mention(3, 3, "d", "PER")]
    tags2 = ["B-ORG", "M-ORG", "E-ORG", "O", "S-PER", "O", "O"]
    assert pipeline_rule(TOKS, tags2) == [
        Mention(0, 2, "a b c", "ORG"),
        Mention(4, 4, "e", "PER"),
    ]


def test_pipeline_rule_open_at_end_dropped():
    assert pipeline_rule(TOKS[:3], ["B-ORG", "M-ORG", "M-ORG"]) == []


def test_trans_label_truth_table():
    # ner_utils.py:28-34: O boundary -> O; attr O under entity -> O
    bmeo = ["B", "M", "E", "O", "S"]
    attr = ["LOC", "O", "ORG", "PER", "GPE"]
    assert trans_label_rule(bmeo, attr) == ["B-LOC", "O", "E-ORG", "O", "S-GPE"]
    assert trans_label_rule(["B"], ["LOC"], joiner="_") == ["B_LOC"]
