"""Deterministic seeded model kernels (numpy, batch-vectorized).

Re-expresses the reference's inference graph — embedding lookup ->
BiLSTM encoder -> dense projection -> CRF decode — as pure numpy over
``[B, S]`` integer batches, executed inside Arrow-batched
``mapInPandas`` stages.  Weights are seeded (not trained): the engine
is an inference/dataflow engine, and decode parity is pinned by
committed fixtures (SURVEY.md §5, M13 note).

Reference graph being mirrored:
* M1 embedding lookup, frozen vectors   — model_lstm_crf.py:23-28
* M2 BiLSTM, fw+bw outputs **added**    — model_lstm_crf.py:30-40
* M4 dense projection to tag logits     — model_lstm_crf.py:47
* M5 argmax decode (non-CRF path)       — model_lstm_crf.py:48-51
* M11 cascade dual heads (5-label BMEO boundary + attr type head,
  CRF only on the boundary head)        — run_multitask_bert_crf.py:620-635
* M12 lengths from mask                 — model_bert_crf.py:18

Two emission providers share the same Viterbi kernel (functions/crf.py):

* :class:`SeededBiLSTM` — random seeded weights; parity via fixtures.
* :func:`class_emissions` — interpretable emissions from token-class
  features; combined with the hard BMES-constraint transitions this
  decoder's output provably equals a relational window rule, giving
  the end-to-end pipeline a DuckDB-SQL oracle.
"""

from __future__ import annotations

import numpy as np

from ..config import EMBED_DIM, HIDDEN_DIM, SEED

EMIT_SCORE = 10.0  # margin for the token's own class >> ENTITY_BONUS


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))


class SeededBiLSTM:
    """Seeded embedding + BiLSTM(+add) + dense head(s).

    All weights drawn from ``np.random.RandomState(seed)`` in a fixed
    order, so every executor reconstructs identical weights from the
    integer seed alone — nothing but the seed ships in the closure.
    """

    def __init__(self, vocab_size: int, n_tags: int, *, n_attr: int | None = None,
                 embed_dim: int = EMBED_DIM, hidden: int = HIDDEN_DIM,
                 seed: int = SEED):
        rng = np.random.RandomState(seed)
        # scales chosen so decoded paths vary with the input (a uniform
        # 0.1-scale init collapses to one dominant tag — test_tagger.py)
        self.embed = rng.randn(vocab_size, embed_dim).astype(np.float32)
        # one weight block per direction: [x->4H, h->4H, bias 4H]
        self.wx = [rng.randn(embed_dim, 4 * hidden).astype(np.float32) * 0.3 for _ in range(2)]
        self.wh = [rng.randn(hidden, 4 * hidden).astype(np.float32) * 0.3 for _ in range(2)]
        self.b = [rng.randn(4 * hidden).astype(np.float32) * 0.3 for _ in range(2)]
        self.w_out = rng.randn(hidden, n_tags).astype(np.float32)
        self.b_out = rng.randn(n_tags).astype(np.float32)
        # learned-CRF analog: seeded transition matrix (lstm_crf_layer.py:155-158)
        self.transitions = rng.randn(n_tags, n_tags).astype(np.float32)
        # optional cascade attr head (M11)
        if n_attr is not None:
            self.w_attr = rng.randn(hidden, n_attr).astype(np.float32)
            self.b_attr = rng.randn(n_attr).astype(np.float32)
        self.hidden = hidden

    def _lstm(self, x: np.ndarray, mask: np.ndarray, d: int, reverse: bool) -> np.ndarray:
        """Masked LSTM over [B,S,D] -> [B,S,H]; padded steps carry state."""
        B, S, _ = x.shape
        H = self.hidden
        h = np.zeros((B, H), dtype=np.float32)
        c = np.zeros((B, H), dtype=np.float32)
        out = np.zeros((B, S, H), dtype=np.float32)
        steps = range(S - 1, -1, -1) if reverse else range(S)
        wx, wh, b = self.wx[d], self.wh[d], self.b[d]
        for t in steps:
            g = x[:, t, :] @ wx + h @ wh + b
            i, f, o, u = np.split(g, 4, axis=1)
            c_new = _sigmoid(f) * c + _sigmoid(i) * np.tanh(u)
            h_new = _sigmoid(o) * np.tanh(c_new)
            m = mask[:, t][:, None]
            c = np.where(m, c_new, c)
            h = np.where(m, h_new, h)
            out[:, t, :] = h * m
        return out

    def encode(self, ids: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """ids [B,S] int -> hidden states [B,S,H] (fw+bw added, M2)."""
        S = ids.shape[1]
        mask = np.arange(S)[None, :] < np.asarray(lengths)[:, None]
        x = self.embed[ids]  # M1 gather
        fw = self._lstm(x, mask, 0, reverse=False)
        bw = self._lstm(x, mask, 1, reverse=True)
        return fw + bw  # reference adds, not concats (model_lstm_crf.py:38)

    def logits(self, ids: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        return self.encode(ids, lengths) @ self.w_out + self.b_out  # M4

    def dual_logits(self, ids: np.ndarray, lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Cascade: (boundary logits [B,S,Vb], attr logits [B,S,Va])."""
        h = self.encode(ids, lengths)
        return h @ self.w_out + self.b_out, h @ self.w_attr + self.b_attr


def class_emissions(cls: np.ndarray, n_types: int) -> np.ndarray:
    """Emission scores from token-class ids.

    cls [B,S] int in 0..n_types (0 = filler/O).  Tag layout: 0=O, then
    per type t the block [B,M,E,S] at 1+4(t-1)..4+4(t-1) for class t.
    A token of class c scores EMIT_SCORE on all four boundary tags of
    its own type and on nothing else; filler scores EMIT_SCORE on O.
    Combined with crf.bmes_transitions the Viterbi path is exactly the
    maximal-run BMES labeling (proved in tests/test_crf.py).
    """
    B, S = cls.shape
    V = 1 + 4 * n_types
    em = np.zeros((B, S, V), dtype=np.float64)
    em[:, :, 0] = np.where(cls == 0, EMIT_SCORE, 0.0)
    for t in range(1, n_types + 1):
        blk = slice(1 + 4 * (t - 1), 5 + 4 * (t - 1))
        em[:, :, blk] = np.where((cls == t)[:, :, None], EMIT_SCORE, 0.0)
    return em
