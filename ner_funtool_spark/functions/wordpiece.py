"""Subword tokenization — BasicTokenizer / WordPiece / example-encoding
semantics (P4-P7), re-implemented from scratch.

Behavioral contract (established from the reference, bert/tokenization.py):

* basic pass (:185-297): drop NUL/replacement/control chars (tab, LF,
  CR count as whitespace); any unicode-Zs -> space; every CJK-block
  char becomes its own token; optional lowercase + NFD accent strip
  (drop Mn marks); punctuation (ASCII symbol ranges 33-47/58-64/91-96/
  123-126 or unicode category P*) splits into single-char tokens.
* wordpiece pass (:300-359): greedy longest-match-first against a
  vocab; continuation pieces prefixed ``##``; a word with no full
  cover, or longer than 200 chars, becomes ``[UNK]`` as a whole.
* example encoding (run_bert_crf.py:340-433): word labels align to the
  FIRST piece; continuation pieces get ``X``; sequences truncate to
  max_len-2 then gain [CLS]/[SEP] with their own labels.

Engine integration: these are pure functions memoized per token, so an
Arrow batch pays the cost once per unique word (operators/tagger.py
pattern).  No driver-side state beyond the broadcast vocab.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

UNK = "[UNK]"
CLS = "[CLS]"
SEP = "[SEP]"
PAD = "[PAD]"
X_LABEL = "X"
MAX_WORD_CHARS = 200

_CJK_RANGES = (
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F), (0x2B740, 0x2B81F), (0x2B820, 0x2CEAF),
    (0xF900, 0xFAFF), (0x2F800, 0x2FA1F),
)
_ASCII_PUNCT = frozenset(
    chr(c)
    for lo, hi in ((33, 47), (58, 64), (91, 96), (123, 126))
    for c in range(lo, hi + 1)
)


def _is_cjk(cp: int) -> bool:
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


@lru_cache(maxsize=65536)
def _char_kind(ch: str) -> str:
    """'drop' | 'space' | 'cjk' | 'punct' | 'keep' for one character."""
    cp = ord(ch)
    if cp == 0 or cp == 0xFFFD:
        return "drop"
    if ch in ("\t", "\n", "\r") or ch == " ":
        return "space"
    cat = unicodedata.category(ch)
    if cat.startswith("C"):
        return "drop"
    if cat == "Zs":
        return "space"
    if _is_cjk(cp):
        return "cjk"
    if ch in _ASCII_PUNCT or cat.startswith("P"):
        return "punct"
    return "keep"


def _strip_accents(word: str) -> str:
    return "".join(
        c for c in unicodedata.normalize("NFD", word)
        if unicodedata.category(c) != "Mn"
    )


def basic_tokenize(text: str, lower: bool = True) -> list[str]:
    """Clean + CJK-isolate + (lower, de-accent) + punctuation split."""
    pieces: list[str] = []
    cur: list[str] = []

    def flush():
        if cur:
            pieces.append("".join(cur))
            cur.clear()

    for ch in text:
        kind = _char_kind(ch)
        if kind == "drop":
            continue
        if kind == "space":
            flush()
        elif kind == "cjk":
            flush()
            pieces.append(ch)
        else:
            cur.append(ch)
    flush()

    out: list[str] = []
    for w in pieces:
        if lower:
            w = _strip_accents(w.lower())
        run: list[str] = []
        for ch in w:
            if _char_kind(ch) == "punct":
                if run:
                    out.append("".join(run))
                    run = []
                out.append(ch)
            else:
                run.append(ch)
        if run:
            out.append("".join(run))
    return out


def wordpiece(word: str, vocab: dict | set, unk: str = UNK,
              max_chars: int = MAX_WORD_CHARS) -> list[str]:
    """Greedy longest-match-first subword split; whole-word UNK on any
    uncovered remainder or oversized input."""
    if len(word) > max_chars:
        return [unk]
    pieces: list[str] = []
    pos = 0
    n = len(word)
    while pos < n:
        end = n
        found = None
        while end > pos:
            cand = ("##" if pos else "") + word[pos:end]
            if cand in vocab:
                found = cand
                break
            end -= 1
        if found is None:
            return [unk]
        pieces.append(found)
        pos = end
    return pieces


def full_tokenize(text: str, vocab: dict | set, lower: bool = True) -> list[str]:
    """Basic -> WordPiece composition (FullTokenizer.tokenize analog)."""
    out: list[str] = []
    for w in basic_tokenize(text, lower):
        out.extend(wordpiece(w, vocab))
    return out


def encode_words(words: list[str], labels: list[str], vocab: dict,
                 max_len: int, label_map: dict[str, int],
                 piece_fn=None) -> dict:
    """Word+label rows -> fixed-length id features with first-piece
    label alignment (convert_single_example semantics):

    pieces of word i: first keeps labels[i], the rest get X; truncate
    to max_len-2; wrap with [CLS]/[SEP] (their own label entries);
    pad ids/mask with 0.  Returns dict(tokens, input_ids, input_mask,
    label_ids, labels).

    ``piece_fn``: optional word -> pieces override (the Spark stage
    passes a per-batch memoized wordpiece so repeated identifiers are
    split once); defaults to the plain wordpiece call.
    """
    if piece_fn is None:
        piece_fn = lambda w: wordpiece(w, vocab)  # noqa: E731
    toks: list[str] = []
    labs: list[str] = []
    for w, lab in zip(words, labels):
        for k, p in enumerate(piece_fn(w)):
            toks.append(p)
            labs.append(lab if k == 0 else X_LABEL)
    toks = toks[: max_len - 2]
    labs = labs[: max_len - 2]
    toks = [CLS] + toks + [SEP]
    labs = [CLS] + labs + [SEP]
    ids = [vocab.get(t, vocab.get(UNK, 0)) for t in toks]
    lab_ids = [label_map[l] for l in labs]  # noqa: E741
    mask = [1] * len(ids)
    while len(ids) < max_len:
        ids.append(0)
        mask.append(0)
        lab_ids.append(label_map.get("O", 0))
    return dict(tokens=toks, input_ids=ids, input_mask=mask,
                label_ids=lab_ids, labels=labs)
