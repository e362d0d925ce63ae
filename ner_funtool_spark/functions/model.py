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


def _gelu(x: np.ndarray) -> np.ndarray:
    """BERT's tanh-approximation gelu (bert/modeling_bert.py gelu)."""
    return 0.5 * x * (1.0 + np.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)
    ))


def _layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray,
                eps: float = 1e-12) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


class SeededBertBiLSTM(SeededBiLSTM):
    """Seeded toy-scale BERT encoder (M13) composed with the BiLSTM
    (M2) — the model_bert_crf.py shape (BERT -> blstm -> CRF,
    layers/lstm_crf_layer.py:12-164 on top of the transformer).

    Encoder semantics mirror bert/modeling_bert.py:963-1157 at toy
    scale: token + position embeddings; per layer multi-head
    self-attention (Q/K/V projections, scaled dot-product, additive
    -1e4 key mask for padding, softmax, output projection) with
    residual + LayerNorm, then a gelu FFN (D -> 4D -> D) with residual
    + LayerNorm.  Heads/Viterbi interface is inherited unchanged
    (logits / dual_logits / transitions), so the cascade path and the
    fixture machinery work as before.

    Weights are seeded, not trained (the accepted M13 design): the
    attention stack draws from ``RandomState(seed + 101)`` so the base
    class's draw order — embedding, LSTM blocks, heads, transitions —
    is untouched and everything keyed off the base seed (boundary
    transitions, emission fixtures) stays stable.
    """

    def __init__(self, vocab_size: int, n_tags: int, *,
                 n_attr: int | None = None, embed_dim: int = EMBED_DIM,
                 hidden: int = HIDDEN_DIM, seed: int = SEED,
                 n_layers: int = 2, n_heads: int = 4, max_pos: int = 128):
        super().__init__(vocab_size, n_tags, n_attr=n_attr,
                         embed_dim=embed_dim, hidden=hidden, seed=seed)
        rng = np.random.RandomState(seed + 101)
        D = embed_dim
        assert D % n_heads == 0
        self.n_heads = n_heads
        self.pos = (rng.randn(max_pos, D) * 0.1).astype(np.float32)
        self.att_layers = []
        for _ in range(n_layers):
            lw = {}
            for name in ("wq", "wk", "wv", "wo"):
                lw[name] = (rng.randn(D, D) * 0.3).astype(np.float32)
                lw["b" + name[1]] = (rng.randn(D) * 0.1).astype(np.float32)
            lw["g1"] = np.ones(D, dtype=np.float32)
            lw["be1"] = np.zeros(D, dtype=np.float32)
            lw["w1"] = (rng.randn(D, 4 * D) * 0.3).astype(np.float32)
            lw["c1"] = (rng.randn(4 * D) * 0.1).astype(np.float32)
            lw["w2"] = (rng.randn(4 * D, D) * 0.3).astype(np.float32)
            lw["c2"] = (rng.randn(D) * 0.1).astype(np.float32)
            lw["g2"] = np.ones(D, dtype=np.float32)
            lw["be2"] = np.zeros(D, dtype=np.float32)
            self.att_layers.append(lw)

    def encode(self, ids: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """ids [B,S] -> [B,S,H]: attention stack then BiLSTM fw+bw."""
        B, S = ids.shape
        mask = np.arange(S)[None, :] < np.asarray(lengths)[:, None]
        x = (self.embed[ids] + self.pos[None, :S]).astype(np.float32)
        dh = x.shape[-1] // self.n_heads
        # additive key mask: no position attends TO padding
        neg = np.where(mask, 0.0, -1e4).astype(np.float32)[:, None, None, :]
        for lw in self.att_layers:

            def heads(w, b):
                return (x @ w + b).reshape(B, S, self.n_heads, dh).transpose(0, 2, 1, 3)

            q, k, v = heads(lw["wq"], lw["bq"]), heads(lw["wk"], lw["bk"]), heads(lw["wv"], lw["bv"])
            sc = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh) + neg
            sc -= sc.max(axis=-1, keepdims=True)
            p = np.exp(sc)
            p /= p.sum(axis=-1, keepdims=True)
            ctx = (p @ v).transpose(0, 2, 1, 3).reshape(B, S, -1)
            a = ctx @ lw["wo"] + lw["bo"]
            x = _layer_norm(x + a, lw["g1"], lw["be1"])
            f = _gelu(x @ lw["w1"] + lw["c1"]) @ lw["w2"] + lw["c2"]
            x = _layer_norm(x + f, lw["g2"], lw["be2"])
        x = (x * mask[:, :, None]).astype(np.float32)
        fw = self._lstm(x, mask, 0, reverse=False)
        bw = self._lstm(x, mask, 1, reverse=True)
        return fw + bw


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


class SeededAlbertBiLSTM(SeededBiLSTM):
    """Seeded toy-scale ALBERT encoder — the reference's two ALBERT
    variants (bert/modeling_albert.py:130, modeling_google_albert.py:
    126) share exactly two structural deltas vs BERT, both mirrored
    here:

    * FACTORIZED embedding parameterization: tokens embed at a small
      E (= embed_dim // 2) with position embeddings in the same space,
      then ONE learned projection E -> D feeds the stack (ALBERT's
      "embedding size != hidden size" decoupling);
    * CROSS-LAYER PARAMETER SHARING: a single transformer layer's
      weights (attention + FFN + LayerNorms) are applied ``n_layers``
      times — the layer loop reuses the same dict, so sharing is
      structural, not an initialization coincidence.

    Per-layer semantics (multi-head self-attention with additive pad
    mask, residual + LayerNorm, gelu FFN) are identical to
    SeededBertBiLSTM; heads/Viterbi interface inherited, so the decode
    machinery and fixtures work unchanged.  Weights draw from
    ``RandomState(seed + 103)`` AFTER the base draws, keeping every
    base-seeded artifact stable.
    """

    def __init__(self, vocab_size: int, n_tags: int, *,
                 n_attr: int | None = None, embed_dim: int = EMBED_DIM,
                 hidden: int = HIDDEN_DIM, seed: int = SEED,
                 n_layers: int = 2, n_heads: int = 4, max_pos: int = 128,
                 factor_dim: int | None = None):
        super().__init__(vocab_size, n_tags, n_attr=n_attr,
                         embed_dim=embed_dim, hidden=hidden, seed=seed)
        rng = np.random.RandomState(seed + 103)
        D = embed_dim
        E = factor_dim if factor_dim is not None else D // 2
        assert D % n_heads == 0 and E < D
        self.n_layers = n_layers
        self.n_heads = n_heads
        self.factor_dim = E
        self.emb_e = (rng.randn(vocab_size, E) * 0.3).astype(np.float32)
        self.pos_e = (rng.randn(max_pos, E) * 0.1).astype(np.float32)
        self.emb_proj = (rng.randn(E, D) * 0.3).astype(np.float32)
        lw = {}
        for name in ("wq", "wk", "wv", "wo"):
            lw[name] = (rng.randn(D, D) * 0.3).astype(np.float32)
            lw["b" + name[1]] = (rng.randn(D) * 0.1).astype(np.float32)
        lw["g1"] = np.ones(D, dtype=np.float32)
        lw["be1"] = np.zeros(D, dtype=np.float32)
        lw["w1"] = (rng.randn(D, 4 * D) * 0.3).astype(np.float32)
        lw["c1"] = (rng.randn(4 * D) * 0.1).astype(np.float32)
        lw["w2"] = (rng.randn(4 * D, D) * 0.3).astype(np.float32)
        lw["c2"] = (rng.randn(D) * 0.1).astype(np.float32)
        lw["g2"] = np.ones(D, dtype=np.float32)
        lw["be2"] = np.zeros(D, dtype=np.float32)
        self.shared_layer = lw

    def encode(self, ids: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """ids [B,S] -> [B,S,H]: factorized embed -> shared-layer
        stack (same weights n_layers times) -> BiLSTM fw+bw."""
        B, S = ids.shape
        mask = np.arange(S)[None, :] < np.asarray(lengths)[:, None]
        x = ((self.emb_e[ids] + self.pos_e[None, :S]) @ self.emb_proj) \
            .astype(np.float32)
        dh = x.shape[-1] // self.n_heads
        neg = np.where(mask, 0.0, -1e4).astype(np.float32)[:, None, None, :]
        lw = self.shared_layer
        for _ in range(self.n_layers):

            def heads(w, b):
                return (x @ w + b).reshape(
                    B, S, self.n_heads, dh).transpose(0, 2, 1, 3)

            q, k, v = (heads(lw["wq"], lw["bq"]), heads(lw["wk"], lw["bk"]),
                       heads(lw["wv"], lw["bv"]))
            sc = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh) + neg
            sc -= sc.max(axis=-1, keepdims=True)
            p = np.exp(sc)
            p /= p.sum(axis=-1, keepdims=True)
            ctx = (p @ v).transpose(0, 2, 1, 3).reshape(B, S, -1)
            a = ctx @ lw["wo"] + lw["bo"]
            x = _layer_norm(x + a, lw["g1"], lw["be1"])
            f = _gelu(x @ lw["w1"] + lw["c1"]) @ lw["w2"] + lw["c2"]
            x = _layer_norm(x + f, lw["g2"], lw["be2"])
        x = (x * mask[:, :, None]).astype(np.float32)
        fw = self._lstm(x, mask, 0, reverse=False)
        bw = self._lstm(x, mask, 1, reverse=True)
        return fw + bw
