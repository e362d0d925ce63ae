"""Fused Arrow-batch tagging stage: tokenize -> emissions -> Viterbi -> mentions.

This is the engine's analog of the reference's predict loop
(predict_bert_crf.py:141-173: per-sentence convert_single_example ->
sess.run -> strip -> extract), re-expressed as ONE ``mapInArrow``
stage over whole Arrow record batches — the north_star's explicit
replacement for the row-at-a-time serving scripts.  Per-batch dynamic
padding reproduces pad_sequences' batch-max semantics
(data_preprocess.py:228-242, the shadowed ``max_len`` quirk).

Two decoders share the Viterbi kernel (functions/crf.py):

* mode="rules":  interpretable lexer-class emissions + hard BMES
  constraint transitions.  Output provably equals a relational
  window rule -> DuckDB-oracle-checkable end-to-end.
* mode="neural": seeded hash-vocab embedding + BiLSTM + dense +
  seeded CRF transitions (model_lstm_crf.py graph shape, M1-M7).
  Decode parity is pinned by committed fixtures.
* mode="cascade": dual-head decode — 5-label BMEO boundary Viterbi +
  type argmax + trans_label merge (run_multitask_bert_crf.py:620-635,
  ner_utils.py:9-39; the label-vocab-shrink speedup the reference
  notes at predict_multitask_lm_model.py:8-10).
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CODE_ETYPES, DOC_ETYPES, DOC_OBJ_WORDS, DOC_OP_WORDS, SEED
from ..functions.crf import (
    bmes_tags_from_classes,
    viterbi_decode_batch,
)
from ..functions.hashing import md5_int
from ..functions.model import (
    SeededAlbertBiLSTM,
    SeededBertBiLSTM,
    SeededBiLSTM,
)


def _build_encoder(mode: str, n_types: int, seed: int,
                   opts: dict | None = None) -> SeededBiLSTM:
    """Encoder per mode: 'albert' = factorized-embedding shared-layer
    variant (modeling_albert.py semantics), else the BERT-style stack;
    both feed the same BiLSTM + Viterbi machinery.

    ``opts`` overrides the encoder SHAPE (n_layers, n_heads, embed_dim,
    hidden, vocab_size) — the M13 depth-study knob (real-BERT regime:
    12 layers x 12 heads over a 21128 wordpiece vocab,
    bert/modeling_bert.py:784-1157).  Defaults unchanged, so every
    fixture-pinned path is untouched."""
    opts = opts or {}
    cls = SeededAlbertBiLSTM if mode == "albert" else SeededBertBiLSTM
    kw = {k: opts[k] for k in ("n_layers", "n_heads", "embed_dim", "hidden")
          if k in opts}
    vocab = opts.get("vocab_size", NEURAL_VOCAB)
    return cls(vocab, 1 + 4 * n_types, n_attr=n_types + 1, seed=seed, **kw)


TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[^\sA-Za-z0-9_]")
IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

KW_FUNC = frozenset({"def", "func", "function", "void"})
KW_CLASS = frozenset({"class", "type"})
KW_IMPORT = frozenset({"import", "from"})
KW_ALL = KW_FUNC | KW_CLASS | KW_IMPORT | {"package"}

MAX_LEN = 64
NEURAL_VOCAB = 4096

MENTION_COLS = "begin int, end int, text string, etype string, score float, model string"


# --------------------------------------------------------------------------
# tokenization (P4-P7 analog: precompiled regex, whole batch at once)
# --------------------------------------------------------------------------

def tokenize_batch(sentences: pd.Series, max_len: int = MAX_LEN):
    """-> (toks [B,S] object, tbegin [B,S] i32, tend [B,S] i32, lengths [B]).

    S is the batch max (dynamic per-batch padding, P3 semantics);
    sequences longer than max_len truncate like convert_single_example
    (run_bert_crf.py:378-381).  Duplicate sentences (very common in
    code corpora) are tokenized once and gathered back by inverse index.
    """
    codes, uniques = pd.factorize(sentences.astype(str))
    utoks, ubegin, uend, ulens = _tokenize_unique(list(uniques), max_len)
    return utoks[codes], ubegin[codes], uend[codes], ulens[codes]


# --------------------------------------------------------------------------
# feature extraction -> token class ids
# --------------------------------------------------------------------------

# token lexical categories (computed once per UNIQUE token per batch)
_K_OTHER, _K_DEF, _K_CLASS, _K_IMPORT, _K_FROM, _K_PKG, _K_DOT, _K_QUOTE, _K_IDENT = range(9)


def _token_categories(toks: np.ndarray) -> np.ndarray:
    """[B,S] object tokens -> int category matrix, via hash-factorize:
    string work happens once per unique token, the matrix ops are int.
    """
    codes, uniques = pd.factorize(toks.ravel())
    u = pd.Series(uniques, dtype=object)
    ucat = np.zeros(len(u), dtype=np.int8)
    ucat[u.isin(("def", "func", "function", "void")).to_numpy()] = _K_DEF
    ucat[u.isin(("class", "type")).to_numpy()] = _K_CLASS
    ucat[(u == "import").to_numpy()] = _K_IMPORT
    ucat[(u == "from").to_numpy()] = _K_FROM
    ucat[(u == "package").to_numpy()] = _K_PKG
    ucat[u.isin((".", "/")).to_numpy()] = _K_DOT
    ucat[(u == '"').to_numpy()] = _K_QUOTE
    is_id = (u.str.match(IDENT_RE) & ~u.isin(KW_ALL)).to_numpy()
    ucat[is_id] = _K_IDENT
    return ucat[codes].reshape(toks.shape)


def _shift_i(mat: np.ndarray, k: int) -> np.ndarray:
    out = np.zeros_like(mat)
    if k < mat.shape[1]:
        out[:, k:] = mat[:, :-k] if k else mat
    return out


def code_token_classes(toks: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Lexer-feature classes for source code: 0=O 1=func 2=class 3=module 4=package.

    Bounded-lookbehind rules over an int category matrix (string work
    is factorized to unique tokens): the code-domain analog of the
    reference's char-class folding (data_preprocess.py:89-92) and
    BasicTokenizer feature prep — zero per-row Python.
    """
    return _code_classes_from_categories(_token_categories(toks), lengths)


def _code_classes_from_categories(K: np.ndarray,
                                  lengths: np.ndarray) -> np.ndarray:
    """Positional lexer rules over a category matrix — shared by the
    string path (above) and the byte path (_code_categories_bytes)."""
    B, S = K.shape
    p1, p2, p3 = _shift_i(K, 1), _shift_i(K, 2), _shift_i(K, 3)
    is_ident = K == _K_IDENT
    imp = lambda m: (m == _K_IMPORT) | (m == _K_FROM)  # noqa: E731
    # has a 'from' strictly before this position (distinguishes the
    # imported-symbol slot of `from X import Y` from a module name)
    seen_from = np.cumsum(p1 == _K_FROM, axis=1) > 0

    cls = np.zeros((B, S), dtype=np.int64)
    cls[is_ident & (p1 == _K_DEF)] = 1
    cls[is_ident & (p1 == _K_CLASS)] = 2
    mod_first = is_ident & (
        ((p1 == _K_IMPORT) & ~seen_from)
        | (p1 == _K_FROM)
        | ((p1 == _K_QUOTE) & imp(p2))
    )
    mod_dot = (K == _K_DOT) & (p1 == _K_IDENT) & imp(p2)
    mod_second = is_ident & (p1 == _K_DOT) & (p2 == _K_IDENT) & imp(p3)
    cls[mod_first | mod_dot | mod_second] = 3
    cls[is_ident & (p1 == _K_PKG)] = 4
    # zero out padding
    mask = np.arange(S)[None, :] < lengths[:, None]
    return np.where(mask, cls, 0)


def doc_token_classes(toks: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Word-class features for the `documents` word-soup domain:
    0=O, 1=op, 2=obj.  Consecutive same-class runs form entities."""
    B, S = toks.shape
    codes, uniques = pd.factorize(toks.ravel())
    u = pd.Series(uniques, dtype=object)
    ucls = np.zeros(len(u), dtype=np.int64)
    ucls[u.isin(frozenset(DOC_OP_WORDS)).to_numpy()] = 1
    ucls[u.isin(frozenset(DOC_OBJ_WORDS)).to_numpy()] = 2
    cls = ucls[codes].reshape(B, S)
    mask = np.arange(S)[None, :] < lengths[:, None]
    return np.where(mask, cls, 0)


CLASS_FNS = {"code": (code_token_classes, CODE_ETYPES), "doc": (doc_token_classes, DOC_ETYPES)}


# --------------------------------------------------------------------------
# byte-path classification (no Python strings — functions/fast_tokenize.py)
# --------------------------------------------------------------------------

def _code_categories_bytes(data: np.ndarray, tok_start: np.ndarray,
                           tok_len: np.ndarray) -> np.ndarray:
    """Token categories straight from the UTF-8 buffer via
    (length, 8-byte-prefix) keys — equals _token_categories on the
    materialized strings (pytest-proven)."""
    from ..functions.fast_tokenize import (
        first_byte,
        match_words,
        prefix_keys,
        starts_with_letter,
    )

    keys = prefix_keys(data, tok_start, tok_len)
    K = np.zeros(keys.shape, dtype=np.int8)
    K[match_words(keys, tok_len, KW_FUNC)] = _K_DEF
    K[match_words(keys, tok_len, KW_CLASS)] = _K_CLASS
    K[match_words(keys, tok_len, ("import",))] = _K_IMPORT
    K[match_words(keys, tok_len, ("from",))] = _K_FROM
    K[match_words(keys, tok_len, ("package",))] = _K_PKG
    fb = first_byte(keys)
    one = tok_len == 1
    K[one & ((fb == ord(".")) | (fb == ord("/")))] = _K_DOT
    K[one & (fb == ord('"'))] = _K_QUOTE
    is_id = starts_with_letter(keys) & ~match_words(keys, tok_len, KW_ALL)
    K[is_id] = _K_IDENT
    return K


def _classes_bytes(domain: str, data: np.ndarray, tok_start: np.ndarray,
                   tok_len: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Byte-path analog of CLASS_FNS[domain][0]."""
    from ..functions.fast_tokenize import match_words, prefix_keys

    if domain == "code":
        K = _code_categories_bytes(data, tok_start, tok_len)
        return _code_classes_from_categories(K, lengths)
    keys = prefix_keys(data, tok_start, tok_len)
    cls = np.zeros(keys.shape, dtype=np.int64)
    cls[match_words(keys, tok_len, DOC_OP_WORDS)] = 1
    cls[match_words(keys, tok_len, DOC_OBJ_WORDS)] = 2
    # padding slots have tok_len 0 and can never match a word
    return cls


# --------------------------------------------------------------------------
# vectorized mention extraction from decoded tag ids
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# the fused Spark stage
# --------------------------------------------------------------------------

# memoized token->id maps, one per vocab size: encoders with different
# hash-vocab sizes (the depth/vocab study) must not share cached ids
_ID_CACHES: dict[int, dict[str, int]] = {}
_ID_CACHE_MAX = 1_000_000


def _ids_from_tokens(toks: np.ndarray, vocab_size: int = NEURAL_VOCAB) -> np.ndarray:
    """Hash-vocab token ids — the scale-path analog of the char2id
    broadcast lookup with UNK folding (data_preprocess.py:144-160):
    no driver-side dictionary, deterministic on any executor.  The
    token->id map is pure, so it is memoized across Arrow batches for
    the lifetime of the worker (bounded)."""
    cache = _ID_CACHES.setdefault(vocab_size, {})
    codes, uniq = pd.factorize(toks.ravel())
    uids = np.empty(len(uniq), dtype=np.int64)
    for i, u in enumerate(uniq):
        v = cache.get(u)
        if v is None:
            v = 0 if u == "" else md5_int(u) % (vocab_size - 1) + 1
            if len(cache) < _ID_CACHE_MAX:
                cache[u] = v
        uids[i] = v
    return uids[codes].reshape(toks.shape)


def tag_mentions(df: DataFrame, *, domain: str = "code", mode: str = "rules",
                 sentence_col: str = "sentence", max_len: int = MAX_LEN,
                 seed: int = SEED,
                 encoder_opts: dict | None = None) -> DataFrame:
    """sentences -> mention rows; all pass-through columns preserved.

    Output adds (begin, end, text, etype, score, model); char offsets
    into the sentence, end exclusive.

    Implemented over ``mapInArrow``: pass-through columns never
    materialize as python objects — duplicate sentences are
    dictionary-encoded in Arrow C++, only unique sentences cross into
    python for tokenization, and mention rows are gathered with Arrow
    ``take``.  Cuts worker time roughly in half vs the pandas path
    (measured via executorRunTime - executorCpuTime).
    """
    import pyarrow as pa

    class_fn, etypes = CLASS_FNS[domain]
    n_types = len(etypes)
    pass_cols = list(df.columns)
    sent_idx = pass_cols.index(sentence_col)
    out_schema = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in pass_cols)
    out_schema += ", " + MENTION_COLS
    model_name = f"{mode}_{domain}_v1"
    etypes_arr = list(etypes)

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from ..functions.fast_tokenize import padded_spans

        neural = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            enc = pa.compute.dictionary_encode(rb.column(sent_idx))
            codes = enc.indices.to_numpy(zero_copy_only=False)
            fast = padded_spans(enc.dictionary, max_len) if mode == "rules" else None
            if fast is not None:
                # byte path: token spans, classes and mention texts all
                # come from the Arrow buffer — zero Python strings per
                # token (the 8->32 scaling lever, BENCH r1 analysis)
                data, offs, utb, ute, ulens, tstart, tlen = fast
                ucls = _classes_bytes(domain, data, tstart, tlen, ulens)
                cls, tb, te, lens = ucls[codes], utb[codes], ute[codes], ulens[codes]
                # closed-form maximal-run BMES decode — provably equal
                # to the fused class-indicator Viterbi (crf.py r6 note)
                # with the whole [B,S]xV DP removed (the measured 8->32
                # residual scaling cost, BENCH/BASELINE.md)
                tags = bmes_tags_from_classes(cls, lens)
                uniques = None
            else:
                uniques = enc.dictionary.to_pylist()
                utoks, utb, ute, ulens = _tokenize_unique(uniques, max_len)
                toks, tb, te, lens = utoks[codes], utb[codes], ute[codes], ulens[codes]
                if mode == "rules":
                    cls = class_fn(toks, lens)
                    tags = bmes_tags_from_classes(cls, lens)
                elif mode in ("neural", "cascade", "albert"):
                    if neural is None:
                        neural = _build_encoder(mode, n_types, seed,
                                                encoder_opts)
                    ids = _ids_from_tokens(
                        toks,
                        (encoder_opts or {}).get("vocab_size", NEURAL_VOCAB),
                    )
                    tags = _neural_decode(
                        neural, ids, lens, n_types,
                        "neural" if mode == "albert" else mode,
                    )
                else:
                    raise ValueError(mode)
            m = extract_mentions_arrays(tags, tb, te, lens)
            if len(m["row"]) == 0:
                continue
            rows_idx = pa.array(m["row"])
            if uniques is None:
                base = offs[codes[m["row"]]]
                texts = [
                    data[s:e].tobytes().decode("ascii")
                    for s, e in zip(base + m["begin"], base + m["end"])
                ]
            else:
                sent_lookup = np.asarray(uniques, dtype=object)[codes[m["row"]]]
                texts = [s[b:e] for s, b, e in zip(sent_lookup, m["begin"], m["end"])]
            arrays = [rb.column(i).take(rows_idx) for i in range(rb.num_columns)]
            arrays += [
                pa.array(m["begin"], type=pa.int32()),
                pa.array(m["end"], type=pa.int32()),
                pa.array(texts, type=pa.string()),
                pa.array([etypes_arr[t] for t in m["etype_id"]], type=pa.string()),
                pa.array(m["score"], type=pa.float32()),
                pa.array([model_name] * len(texts), type=pa.string()),
            ]
            yield pa.RecordBatch.from_arrays(
                arrays,
                names=pass_cols + ["begin", "end", "text", "etype", "score", "model"],
            )

    return df.mapInArrow(run, schema=out_schema)


def _tokenize_unique(uniques: list, max_len: int):
    """Tokenize unique sentences -> padded matrices (shared by the
    Arrow stage and tokenize_batch)."""
    all_toks, all_b, all_e = [], [], []
    for s in uniques:
        toks, bs, es = [], [], []
        for mt in TOKEN_RE.finditer(s):
            toks.append(mt.group(0))
            bs.append(mt.start())
            es.append(mt.end())
            if len(toks) >= max_len:
                break
        all_toks.append(toks)
        all_b.append(bs)
        all_e.append(es)
    ulens = np.array([max(len(t), 1) for t in all_toks], dtype=np.int64)
    S = max(1, int(ulens.max()))
    U = max(1, len(uniques))
    utoks = np.full((U, S), "", dtype=object)
    ubegin = np.zeros((U, S), dtype=np.int32)
    uend = np.zeros((U, S), dtype=np.int32)
    for i, (t, b, e) in enumerate(zip(all_toks, all_b, all_e)):
        n = len(t)
        if n:
            utoks[i, :n] = t
            ubegin[i, :n] = b
            uend[i, :n] = e
    return utoks, ubegin, uend, ulens


def extract_mentions_arrays(tags: np.ndarray, tbegin: np.ndarray,
                            tend: np.ndarray, lengths: np.ndarray) -> dict:
    """Vectorized pipeline-rule extraction returning plain arrays
    (row, begin, end, etype_id, score); callers slice sentence text by
    the char offsets.  Same group logic as extract_mentions, but with
    run boundaries found by index arithmetic (no pandas groupby)."""
    B, S = tags.shape
    mask = (np.arange(S)[None, :] < lengths[:, None]) & (tags > 0)
    r_idx, c_idx = np.nonzero(mask)
    empty = dict(
        row=np.array([], dtype=np.int64),
        begin=np.array([], dtype=np.int32),
        end=np.array([], dtype=np.int32),
        etype_id=np.array([], dtype=np.int64),
        score=np.array([], dtype=np.float32),
    )
    if len(r_idx) == 0:
        return empty
    tag_v = tags[r_idx, c_idx]
    b_code = (tag_v - 1) % 4  # 0=B 1=M 2=E 3=S
    t_code = (tag_v - 1) // 4
    same_prev = np.zeros(len(r_idx), dtype=bool)
    same_prev[1:] = (r_idx[1:] == r_idx[:-1]) & (c_idx[1:] == c_idx[:-1] + 1)
    pb = np.roll(b_code, 1)
    pt = np.roll(t_code, 1)
    continues = same_prev & np.isin(b_code, (1, 2)) & np.isin(pb, (0, 1)) & (pt == t_code)
    starts = np.nonzero(~continues)[0]
    ends = np.append(starts[1:], len(r_idx)) - 1
    first_b = b_code[starts]
    last_b = b_code[ends]
    sizes = ends - starts + 1
    ok = ((first_b == 0) & (last_b == 2) & (sizes >= 2)) | (
        (first_b == 3) & (sizes == 1)
    )
    s_ok, e_ok = starts[ok], ends[ok]
    if len(s_ok) == 0:
        return empty
    rows = r_idx[s_ok]
    return dict(
        row=rows,
        begin=tbegin[rows, c_idx[s_ok]].astype(np.int32),
        end=tend[rows, c_idx[e_ok]].astype(np.int32),
        etype_id=t_code[s_ok],
        score=np.zeros(len(s_ok), dtype=np.float32),
    )


def _neural_decode(neural: SeededBiLSTM, ids: np.ndarray, lens: np.ndarray,
                   n_types: int, mode: str) -> np.ndarray:
    """Neural decode paths.

    neural: full-tagset Viterbi with the seeded transition matrix (M7).
    cascade: 5-label BMEO boundary Viterbi + attr-head argmax + the
    trans_label merge rule — attr of O-boundary tokens masked to O
    (ner_utils.py:28-34; loss-mask analog run_multitask_bert_crf.py:646-651).
    """
    if mode == "neural":
        logits = neural.logits(ids, lens)
        return viterbi_decode_batch(logits, neural.transitions.astype(np.float64), lens)
    bnd_logits, attr_logits = neural.dual_logits(ids, lens)
    # boundary head: O + B/M/E/S (5 labels) = tagset of ONE pseudo-type
    bnd5 = np.zeros(bnd_logits.shape[:2] + (5,), dtype=np.float64)
    # fold the full head onto 5 labels: O stays, per-boundary max over types
    bnd5[:, :, 0] = bnd_logits[:, :, 0]
    for b in range(4):
        bnd5[:, :, 1 + b] = bnd_logits[:, :, 1 + b :: 4].max(axis=2)
    trans5 = _boundary_transitions(neural)
    bpath = viterbi_decode_batch(bnd5, trans5, lens)  # 0=O 1=B 2=M 3=E 4=S
    attr = np.argmax(attr_logits, axis=2)  # 0=O-attr, 1..n_types
    # trans_label merge: O boundary or O attr -> O
    merged = np.where((bpath == 0) | (attr == 0), 0, (attr - 1) * 4 + bpath)
    mask = np.arange(ids.shape[1])[None, :] < np.asarray(lens)[:, None]
    return np.where(mask, merged, 0).astype(np.int32)


def _boundary_transitions(neural: SeededBiLSTM) -> np.ndarray:
    """Seeded 5x5 boundary transition matrix (deterministic slice of the
    full seeded transitions — fixture-pinned like the rest)."""
    t = neural.transitions
    idx = [0, 1, 2, 3, 4]
    return t[np.ix_(idx, idx)].astype(np.float64)


def tag_sequences(df: DataFrame, *, domain: str = "code", mode: str = "rules",
                  sentence_col: str = "sentence", max_len: int = MAX_LEN,
                  seed: int = SEED) -> DataFrame:
    """sentences -> per-token (tokens, tags) arrays — the decode-parity
    surface used by fixtures and the metric operators (A3-A12)."""
    class_fn, etypes = CLASS_FNS[domain]
    n_types = len(etypes)
    tagnames = np.asarray(
        ["O"] + [f"{b}-{t}" for t in etypes for b in ("B", "M", "E", "S")], dtype=object
    )
    pass_cols = df.columns
    out_schema = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in pass_cols)
    out_schema += ", tokens array<string>, tags array<string>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        neural = None
        for pdf in batches:
            if pdf.empty:
                continue
            sents = pdf[sentence_col].astype(str)
            toks, _tb, _te, lens = tokenize_batch(sents, max_len)
            if mode == "rules":
                cls = class_fn(toks, lens)
                # closed-form maximal-run BMES decode (crf.py r6 note)
                tags = bmes_tags_from_classes(cls, lens)
            else:
                if neural is None:
                    neural = _build_encoder(mode, n_types, seed)
                ids = _ids_from_tokens(toks)
                tags = _neural_decode(
                    neural, ids, lens, n_types,
                    "neural" if mode == "albert" else mode,
                )
            res = pdf.reset_index(drop=True).copy()
            res["tokens"] = [list(toks[i, : lens[i]]) for i in range(len(pdf))]
            res["tags"] = [list(tagnames[tags[i, : lens[i]]]) for i in range(len(pdf))]
            yield res

    return df.mapInPandas(run, schema=out_schema)
