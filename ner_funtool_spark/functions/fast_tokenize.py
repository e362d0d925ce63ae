"""Byte-level vectorized tokenization + token classification — the
8->32-core scaling lever (VERDICT r1 item 5 / BENCH r1 analysis).

The round-1 hot path tokenized unique sentences with a Python
re.finditer loop; per-token Python string objects dominated worker CPU
and, at 32-way concurrency on this host, the workers time-shared
oversubscribed vCPUs.  This module removes Python strings from the
rules-mode flagship entirely:

* the Arrow dictionary's UTF-8 DATA BUFFER is viewed as one numpy
  uint8 array (zero copy);
* a 256-entry class table + cumulative-sum/segment tricks find every
  token span of the reference regex
  ``[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[^\\sA-Za-z0-9_]`` in O(bytes)
  SIMD-friendly numpy ops (whitespace bytes = exactly the ASCII set
  Python's ``\\s`` matches: 9-13, 28-31, 32);
* token classification (keyword / word-list membership) compares
  (length, first-8-bytes-as-uint64) keys — exact for all keywords and
  DOC_*_WORDS (all <= 8 bytes), no string hashing, no interning.

The fast path applies only when the batch is pure ASCII (a single
numpy max() scan decides); any non-ASCII batch falls back to the
reference-faithful regex path, so semantics never change — equivalence
is pytest-proven against the regex tokenizer on randomized inputs.
"""

from __future__ import annotations

import numpy as np

# byte classes
_OTHER, _SPACE, _LETTER, _DIGIT = 0, 1, 2, 3

_CLS = np.zeros(256, dtype=np.uint8)
for _b in (9, 10, 11, 12, 13, 28, 29, 30, 31, 32):  # python re \s on ASCII
    _CLS[_b] = _SPACE
for _b in range(ord("A"), ord("Z") + 1):
    _CLS[_b] = _LETTER
for _b in range(ord("a"), ord("z") + 1):
    _CLS[_b] = _LETTER
_CLS[ord("_")] = _LETTER
for _b in range(ord("0"), ord("9") + 1):
    _CLS[_b] = _DIGIT


def word_key(w: str) -> int:
    """(first 8 bytes little-endian as uint64) of an ASCII word."""
    b = w.encode("ascii")[:8]
    return int.from_bytes(b.ljust(8, b"\0"), "little")


def word_keys(words) -> tuple[np.ndarray, np.ndarray]:
    """-> (keys uint64[n], lens int64[n]) for a word list (<= 8 bytes)."""
    assert all(len(w) <= 8 for w in words), "prefix key needs <= 8 bytes"
    return (
        np.array([word_key(w) for w in words], dtype=np.uint64),
        np.array([len(w) for w in words], dtype=np.int64),
    )


def buffer_view(arr) -> tuple[np.ndarray, np.ndarray] | None:
    """pyarrow StringArray -> (data uint8 view, offsets int64) or None
    if the batch contains any non-ASCII byte (fallback signal)."""
    import pyarrow as pa

    if arr.type != pa.string():  # large_string has int64 offsets -> fallback
        return None
    bufs = arr.buffers()
    if bufs[1] is None or bufs[2] is None:
        return None
    offs_all = np.frombuffer(bufs[1], dtype=np.int32)
    offs = offs_all[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0]: offs[-1]]
    if data.size and int(data.max()) >= 128:
        return None
    return data, offs - offs[0]


def token_spans(data: np.ndarray, offsets: np.ndarray):
    """All reference-regex token spans over concatenated ASCII strings.

    Returns (abs_start, abs_end, sid) — absolute byte positions into
    ``data`` plus the string index of each token, in document order.

    Span rules == ``[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[^\\s...]``:
    * non-alnum non-space byte: its own 1-byte token;
    * an alnum run starting with a letter/underscore: one token;
    * an alnum run starting with digits: the digit prefix is one
      token, the rest (from the first letter) one identifier token;
    * tokens never cross string boundaries.
    """
    n = data.size
    if n == 0:
        return (np.empty(0, np.int64),) * 3
    cls = _CLS[data]
    letter = cls == _LETTER
    space = cls == _SPACE
    punct = cls == _OTHER
    alnum = letter | (cls == _DIGIT)

    prev_alnum = np.empty(n, dtype=bool)
    prev_alnum[0] = False
    prev_alnum[1:] = alnum[:-1]
    sent_starts = offsets[:-1]
    sent_starts = sent_starts[sent_starts < n]
    prev_alnum[sent_starts] = False  # runs never cross strings

    run_start = alnum & ~prev_alnum
    # identifier beginning inside a digit-led run: first letter with no
    # earlier letter since the run start (segmented cumsum compare)
    cl0 = np.concatenate(([0], np.cumsum(letter)))  # letters in [0, i)
    idx = np.arange(n)
    rs_ffill = np.maximum.accumulate(np.where(run_start, idx, 0))
    ident_after_digit = letter & prev_alnum & (cl0[idx] == cl0[rs_ffill])

    starts = punct | run_start | ident_after_digit
    stop = space | starts
    sp = np.flatnonzero(stop)
    s_idx = np.flatnonzero(starts)
    ends = np.append(sp, n)[np.searchsorted(sp, s_idx, side="right")]
    sid = np.searchsorted(offsets, s_idx, side="right") - 1
    return s_idx, ends, sid


def padded_spans(arr, max_len: int):
    """pyarrow StringArray -> per-string padded span matrices, or None
    when the batch is not pure ASCII.

    Returns (data, offsets, ubegin [U,S] i32, uend [U,S] i32,
    ulens [U], tok_start [U,S] i64 absolute, tok_len [U,S] i64) with
    per-string truncation to ``max_len`` tokens and the same min-1
    length convention as operators.tagger._tokenize_unique.
    """
    bv = buffer_view(arr)
    if bv is None:
        return None
    data, offsets = bv
    s_abs, e_abs, sid = token_spans(data, offsets)
    U = len(arr)
    counts = np.bincount(sid, minlength=U) if len(sid) else np.zeros(U, np.int64)
    first = np.concatenate(([0], np.cumsum(counts)))[sid] if len(sid) else sid
    rank = np.arange(len(s_abs)) - first
    keep = rank < max_len
    s_abs, e_abs, sid, rank = s_abs[keep], e_abs[keep], sid[keep], rank[keep]

    lens = np.maximum(np.minimum(counts, max_len), 1)
    S = max(1, int(lens.max()) if U else 1)
    ubegin = np.zeros((U, S), dtype=np.int32)
    uend = np.zeros((U, S), dtype=np.int32)
    tok_start = np.zeros((U, S), dtype=np.int64)
    tok_len = np.zeros((U, S), dtype=np.int64)
    rel = s_abs - offsets[sid]
    ubegin[sid, rank] = rel.astype(np.int32)
    uend[sid, rank] = (e_abs - offsets[sid]).astype(np.int32)
    tok_start[sid, rank] = s_abs
    tok_len[sid, rank] = e_abs - s_abs
    return data, offsets, ubegin, uend, lens, tok_start, tok_len


def prefix_keys(data: np.ndarray, tok_start: np.ndarray,
                tok_len: np.ndarray) -> np.ndarray:
    """(first 8 bytes as uint64) per token span — vectorized gather;
    padding slots (len 0) get key 0."""
    shape = tok_start.shape
    st = tok_start.ravel()
    ln = tok_len.ravel()
    b8 = np.zeros((st.size, 8), dtype=np.uint8)
    for k in range(8):
        m = ln > k
        b8[m, k] = data[st[m] + k]
    return b8.view(np.uint64).reshape(shape)


def match_words(keys: np.ndarray, tok_len: np.ndarray, words) -> np.ndarray:
    """Boolean mask: token == any word of the list (exact, via
    (len, 8-byte-prefix) equality — valid for words <= 8 bytes)."""
    wk, wl = word_keys(list(words))
    out = np.zeros(keys.shape, dtype=bool)
    for i in range(len(wk)):
        out |= (keys == wk[i]) & (tok_len == wl[i])
    return out


def first_byte(keys: np.ndarray) -> np.ndarray:
    """First byte of each token from its little-endian prefix key."""
    return (keys & np.uint64(0xFF)).astype(np.uint8)


def starts_with_letter(keys: np.ndarray) -> np.ndarray:
    """Token begins with [A-Za-z_] (identifier-shaped)."""
    return _CLS[first_byte(keys)] == _LETTER
