"""Span / entity extraction rules — the reference's signature semantics.

Four *different* extraction rules exist in the reference and they
disagree on edge cases; all four are reproduced here as pure functions
(used by unit tests and as the semantic spec), with the vectorized
batch extractor living in operators/tagger.py.

Rule inventory (SURVEY.md §2.9):

* E1 ``get_entity``          — reference public_tools/ner_utils.py:42-59
* E3 ``get_result``          — reference public_tools/ner_utils.py:103-146
* E4 ``calculate``           — reference public_tools/entity_evaluating.py:12-33
* E5 ``trans_label``         — reference public_tools/ner_utils.py:9-39

Documented divergences (tested in tests/test_spans.py):
- E1 skips tag id 0 with ``continue`` → an open entity *survives* an
  O-gap (id 0) between M tokens; it never emits ``S-`` singletons; it
  does NOT check type consistency between B/M/E.
- E3 emits ``S-`` singletons, flushes the open span on O and B, adopts
  a type from M if missing, and emits+closes on any other prefix (E-);
  an entity still open at end-of-sequence is dropped.
- E4 requires type consistency (an M-/E- of a different type resets the
  candidate) and records (sentence, end-position); used for the metric
  join (entity_evaluating.py:60-81) — our P/R harness reproduces it.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Mention:
    begin: int  # token index of first token (inclusive)
    end: int    # token index of last token (inclusive, reference style)
    text: str
    etype: str


def get_entity_rule(tokens: list[str], tags: list[str | int],
                    id2tag: dict[int, str] | None = None) -> list[str]:
    """E1: emit ``TYPE:text`` strings; no type check, no S-, O-gap survives.

    ``tags`` may be ids (with ``id2tag``) or tag strings.  Matches
    ner_utils.get_entity including the ``tag[1:]`` slice that keeps the
    leading '-' of the type (e.g. ``-ORG:中国``).
    """
    out: list[str] = []
    entity = ""
    for j, raw in enumerate(tags):
        if raw == 0:
            continue
        tag = id2tag[raw] if id2tag is not None else raw
        if tag[0] == "B":
            entity = tag[1:] + ":" + tokens[j]
        elif tag[0] == "M" and len(entity) != 0:
            entity += tokens[j]
        elif tag[0] == "E" and len(entity) != 0:
            entity += tokens[j]
            out.append(entity)
            entity = ""
        else:
            entity = ""
    return out


def get_result_rule(tags: list[str]) -> tuple[list[list[int]], list[str]]:
    """E3: inclusive [start,end] index spans + types (CLUE submit rule)."""
    spans: list[list[int]] = []
    types: list[str] = []
    open_pos: list[int] = []
    open_type = ""

    def flush():
        nonlocal open_pos, open_type
        if open_pos:
            spans.append([min(open_pos), max(open_pos)])
            types.append(open_type)
        open_pos, open_type = [], ""

    for i, tag in enumerate(tags):
        if tag.startswith("O"):
            flush()
        elif tag.startswith("S-"):
            flush()
            spans.append([i, i])
            types.append(tag.split("-")[1])
        elif tag.startswith("B-"):
            flush()
            open_pos = [i]
            open_type = tag.split("-")[1]
        elif tag.startswith("M-"):
            if open_pos:
                open_pos.append(i)
                if open_type == "":
                    open_type = tag.split("-")[1]
        else:  # E- and anything else
            if open_pos:
                open_pos.append(i)
                if open_type == "":
                    open_type = tag.split("-")[1]
                flush()
            else:
                open_pos, open_type = [], ""
    # NB: an entity still open at end-of-sequence is dropped (reference
    # behaviour — the loop simply ends).
    return spans, types


def calculate_rule(tokens: list[str], tags: list[str]) -> list[Mention]:
    """E4: type-consistent B..M..E extraction with positions.

    Emits one Mention per closed entity; M-/E- whose type differs from
    the open entity's type reset the candidate.  Tokens equal to "" or
    tags equal to "O" are skipped (the reference skips x==0 / y==0).
    """
    out: list[Mention] = []
    cur: list[tuple[int, str]] = []
    cur_type = ""
    for j, (tok, tag) in enumerate(zip(tokens, tags)):
        if tok == "" or tag == "O":
            continue
        if tag[0] == "B":
            cur = [(j, tok)]
            cur_type = tag[2:]
        elif tag[0] == "M" and cur and cur_type == tag[2:]:
            cur.append((j, tok))
        elif tag[0] == "E" and cur and cur_type == tag[2:]:
            cur.append((j, tok))
            out.append(Mention(cur[0][0], j, "".join(t for _, t in cur), cur_type))
            cur, cur_type = [], ""
        else:
            cur, cur_type = [], ""
    return out


def pipeline_rule(tokens: list[str], tags: list[str], sep: str = " ") -> list[Mention]:
    """Our engine's production extraction rule (superset used end-to-end):

    E4 type-consistency + E3's ``S-`` singleton emission, entities open
    at end-of-sequence dropped.  This is the rule the SQL oracle
    (maximal same-class runs) provably matches for decoder-emitted tag
    sequences, which are always BMES-valid by construction.
    """
    out: list[Mention] = []
    cur: list[tuple[int, str]] = []
    cur_type = ""
    for j, (tok, tag) in enumerate(zip(tokens, tags)):
        if tag == "O":
            cur, cur_type = [], ""
            continue
        b, t = tag[0], tag[2:]
        if b == "S":
            out.append(Mention(j, j, tok, t))
            cur, cur_type = [], ""
        elif b == "B":
            cur, cur_type = [(j, tok)], t
        elif b == "M" and cur and cur_type == t:
            cur.append((j, tok))
        elif b == "E" and cur and cur_type == t:
            cur.append((j, tok))
            out.append(Mention(cur[0][0], j, sep.join(x for _, x in cur), t))
            cur, cur_type = [], ""
        else:
            cur, cur_type = [], ""
    return out


def trans_label_rule(bmeo: list[str], attr: list[str], joiner: str = "-") -> list[str]:
    """E5 cascade merge: O-boundary → O; O-attr → O; else ``b{joiner}a``.

    Matches ner_utils.trans_label (joiner '-') and the underscore
    variant in predict_multitask_lm_model.py:116-143 (joiner '_').
    """
    out = []
    for b, a in zip(bmeo, attr):
        if b == "O" or a == "O":
            out.append("O")
        else:
            out.append(f"{b}{joiner}{a}")
    return out
