"""WordPiece example encoding as a production Spark stage (P4-P7 at
engine scale).

The reference's flagship encode path (run_bert_crf.py:340-433,
convert_single_example) turns (words, labels) rows into fixed-length
id features: greedy WordPiece split against a vocab, word labels
aligned to the FIRST piece with ``X`` on continuations, truncation to
max_len-2, [CLS]/[SEP] wrap, zero padding.  Round 1 proved those
semantics as pure functions (functions/wordpiece.py, pytest-pinned);
this module runs them as an Arrow-batched ``mapInPandas`` stage over a
broadcast vocab — the same shape as the engine's tagging stage:

* the vocab + label map travel once per executor via a Spark
  broadcast, never per task closure;
* WordPiece is memoized per UNIQUE word within a batch
  (pd.factorize) — code corpora repeat identifiers heavily, so the
  greedy match runs once per distinct word;
* output ids are fixed-width int32 arrays, Arrow-encoded back to the
  JVM — no per-row Python objects beyond the batch boundary.

Driver surface: Q:wordpiece_features (rows-only check — greedy
longest-match is not SQL-expressible; alignment semantics are pinned
by tests/test_wordpiece.py fixtures instead).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.wordpiece import CLS, PAD, SEP, UNK, X_LABEL, encode_words, wordpiece

FEATURE_COLS = (
    "tokens array<string>, input_ids array<int>, input_mask array<int>, "
    "label_ids array<int>"
)

DEFAULT_LABEL_MAP = {PAD: 0, CLS: 1, SEP: 2, "O": 3, X_LABEL: 4}


def build_label_map(labels: list[str]) -> dict[str, int]:
    """Label vocabulary: specials first, then task labels in order."""
    m = dict(DEFAULT_LABEL_MAP)
    for lab in labels:
        if lab not in m:
            m[lab] = len(m)
    return m


def wordpiece_encode(df: DataFrame, vocab: dict[str, int],
                     label_map: dict[str, int], *,
                     words_col: str = "words", labels_col: str = "labels",
                     max_len: int = 64) -> DataFrame:
    """(words, labels) array rows -> reference-faithful id features.

    Adds (tokens, input_ids, input_mask, label_ids) to every row; all
    other columns pass through.  ``vocab`` maps piece -> id and must
    contain [UNK]; ``label_map`` must contain [CLS]/[SEP]/X/O.
    """
    spark = df.sparkSession
    bc_vocab = spark.sparkContext.broadcast(vocab)
    bc_labels = spark.sparkContext.broadcast(label_map)
    pass_cols = list(df.columns)
    out_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in pass_cols
    )
    out_schema += ", " + FEATURE_COLS

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = bc_vocab.value
        lm = bc_labels.value
        piece_cache: dict[str, list[str]] = {}

        def pieces_of(word: str) -> list[str]:
            p = piece_cache.get(word)
            if p is None:
                p = wordpiece(word, v)
                piece_cache[word] = p
            return p

        for pdf in batches:
            if pdf.empty:
                continue
            toks_out, ids_out, mask_out, labids_out = [], [], [], []
            for words, labels in zip(pdf[words_col], pdf[labels_col]):
                enc = encode_words(
                    list(words), list(labels), v, max_len, lm,
                    piece_fn=pieces_of,
                )
                toks_out.append(enc["tokens"])
                ids_out.append(enc["input_ids"])
                mask_out.append(enc["input_mask"])
                labids_out.append(enc["label_ids"])
            res = pdf.reset_index(drop=True).copy()
            res["tokens"] = toks_out
            res["input_ids"] = ids_out
            res["input_mask"] = mask_out
            res["label_ids"] = labids_out
            yield res

    return df.mapInPandas(run, schema=out_schema)


def corpus_vocab(documents: DataFrame, text_col: str = "text",
                 min_freq: int = 10, max_vocab: int = 30_000) -> dict[str, int]:
    """Deterministic WordPiece vocab from the corpus itself: specials,
    single-char pieces (full coverage fallback: every rare word splits
    to chars instead of [UNK]), then the top ``max_vocab`` whole tokens
    with frequency >= min_freq ordered by (freq desc, token).

    The collect is STRUCTURALLY bounded: ``min_freq`` alone does not
    cap the set on a large corpus (tens of millions of tokens can clear
    any fixed frequency floor at 100 TB), so the total order is
    limited to ``max_vocab`` rows BEFORE reaching the driver — a top-N
    cap is semantics-faithful because the reference's vocab is a fixed
    finite file (bert/tokenization.py:121-133, 21128 entries), and the
    (freq desc, token) order is total so the cut is deterministic.
    The bounded dimension is then broadcast back by wordpiece_encode.
    """
    chars = "abcdefghijklmnopqrstuvwxyz0123456789_"
    pieces = [PAD, UNK, CLS, SEP]
    pieces += list(chars) + ["##" + c for c in chars]
    freq = (
        documents.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .groupBy("tok").count()
        .filter(F.col("count") >= min_freq)
        .orderBy(F.desc("count"), F.asc("tok"))
        .limit(max_vocab)
    )
    for r in freq.collect():
        if r["tok"] and r["tok"] not in (PAD, UNK, CLS, SEP):
            pieces.append(r["tok"])
    seen: dict[str, int] = {}
    for p in pieces:
        if p not in seen:
            seen[p] = len(seen)
    return seen


def corpus_vocab_with_subwords(documents: DataFrame, text_col: str = "text",
                               min_freq: int = 10,
                               max_vocab: int = 30_000) -> dict[str, int]:
    """corpus_vocab + a MULTI-CHAR continuation piece ('##' + token)
    for every frequent whole token — the vocab shape that exercises
    the general greedy longest-match (a continuation can consume many
    characters at once, not just one ##char).  Continuation ids extend
    the base vocab in the same (freq desc, token) order, so the DuckDB
    mirror can re-derive identical ids."""
    base = corpus_vocab(documents, text_col, min_freq, max_vocab)
    out = dict(base)
    for tok, _ in sorted(base.items(), key=lambda kv: kv[1]):
        if tok.startswith("##") or tok.startswith("[") or len(tok) < 2:
            continue
        cont = "##" + tok
        if cont not in out:
            out[cont] = len(out)
    return out
