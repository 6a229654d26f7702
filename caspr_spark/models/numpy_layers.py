"""Forward-only numpy encoders over the 4-way tensor bundle.

Architecture parity (not a port) with the reference encoders:

- ``CategoricalEmbedding`` — per-column embedding tables, concatenated
  (caspr/models/embedding_layer.py:8-51).
- ``LSTMEncoder`` — embeddings + continuous -> LSTM -> last hidden state,
  profile branch concatenated and projected (caspr/models/
  unified_encoder.py:25-282, caspr/models/multi_layer_lstm.py:7-63).
- ``TransformerEncoder`` — input projection + learned positions, profile
  vector appended as an extra sequence position, pre-softmax scaling by
  sqrt(hid); embedding = flattened encoder states (caspr/models/
  unified_transformer_encoder.py:18-114, transformer.py:62-132).
- ``LinearEncoder`` — the matmul-only projection used for oracle-checkable
  scoring.

All weights come from one seeded ``default_rng`` so every forward pass is
bit-reproducible; ``encode`` is the scoring surface.
"""

from __future__ import annotations

import numpy as np


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


class CategoricalEmbedding:
    """Per-column embedding lookup + concat; index 0 is the UNK row."""

    def __init__(self, vocab_sizes: list[int], emb_dims: list[int],
                 rng: np.random.Generator):
        assert len(vocab_sizes) == len(emb_dims)
        self.tables = [rng.normal(0, 0.1, size=(v, d)).astype(np.float32)
                       for v, d in zip(vocab_sizes, emb_dims)]
        self.out_dim = int(sum(emb_dims))

    def __call__(self, cat: np.ndarray) -> np.ndarray:
        """``[..., C]`` int64 -> ``[..., sum(emb_dims)]`` float32."""
        if not self.tables:
            return np.zeros((*cat.shape[:-1], 0), dtype=np.float32)
        cols = []
        for i, table in enumerate(self.tables):
            idx = np.clip(cat[..., i], 0, len(table) - 1)
            cols.append(table[idx])
        return np.concatenate(cols, axis=-1)

    def parameters(self):
        return list(self.tables)


class LSTMEncoder:
    """Single-layer LSTM over [N,T,F]; embedding = last hidden (+ profile)."""

    def __init__(self, seq_vocab: list[int], seq_emb_dims: list[int],
                 n_seq_cont: int, non_seq_vocab: list[int],
                 non_seq_emb_dims: list[int], n_non_seq_cont: int,
                 hidden_dim: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.seq_emb = CategoricalEmbedding(seq_vocab, seq_emb_dims, rng)
        self.non_seq_emb = CategoricalEmbedding(non_seq_vocab, non_seq_emb_dims, rng)
        f = self.seq_emb.out_dim + n_seq_cont
        h = hidden_dim
        s = 1.0 / np.sqrt(max(f + h, 1))
        # gate order: input, forget, cell, output
        self.W = rng.uniform(-s, s, size=(f, 4 * h)).astype(np.float32)
        self.U = rng.uniform(-s, s, size=(h, 4 * h)).astype(np.float32)
        self.b = np.zeros(4 * h, dtype=np.float32)
        self.b[h:2 * h] = 1.0  # forget-gate bias 1 (standard init)
        p = self.non_seq_emb.out_dim + n_non_seq_cont
        self.Wp = rng.uniform(-0.1, 0.1, size=(p, h)).astype(np.float32) if p else None
        self.hidden_dim = h

    def encode(self, seq_cat, seq_cont, non_seq_cat, non_seq_cont) -> np.ndarray:
        x = np.concatenate([self.seq_emb(seq_cat),
                            seq_cont.astype(np.float32)], axis=-1)
        n, t, _ = x.shape
        h = np.zeros((n, self.hidden_dim), dtype=np.float32)
        c = np.zeros((n, self.hidden_dim), dtype=np.float32)
        hd = self.hidden_dim
        for step in range(t):
            g = x[:, step, :] @ self.W + h @ self.U + self.b
            i = _sigmoid(g[:, :hd])
            f = _sigmoid(g[:, hd:2 * hd])
            z = np.tanh(g[:, 2 * hd:3 * hd])
            o = _sigmoid(g[:, 3 * hd:])
            c = f * c + i * z
            h = o * np.tanh(c)
        if self.Wp is not None:
            prof = np.concatenate([self.non_seq_emb(non_seq_cat),
                                   non_seq_cont.astype(np.float32)], axis=-1)
            h = np.maximum(h + prof @ self.Wp, 0.0)
        return h

    def parameters(self):
        out = self.seq_emb.parameters() + self.non_seq_emb.parameters()
        out += [self.W, self.U, self.b]
        if self.Wp is not None:
            out.append(self.Wp)
        return out


class TransformerEncoder:
    """Self-attention encoder; embedding = flattened per-position states.

    Profile vector is appended as one extra sequence position, matching the
    reference's ``adjust_seq_len = seq_len + 1`` convention
    (caspr/models/unified_transformer_encoder.py:94-96, factory.py:43).
    """

    def __init__(self, seq_vocab: list[int], seq_emb_dims: list[int],
                 n_seq_cont: int, non_seq_vocab: list[int],
                 non_seq_emb_dims: list[int], n_non_seq_cont: int,
                 hidden_dim: int = 64, n_layers: int = 2, n_heads: int = 2,
                 max_len: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.seq_emb = CategoricalEmbedding(seq_vocab, seq_emb_dims, rng)
        self.non_seq_emb = CategoricalEmbedding(non_seq_vocab, non_seq_emb_dims, rng)
        f = self.seq_emb.out_dim + n_seq_cont
        p = self.non_seq_emb.out_dim + n_non_seq_cont
        h, s = hidden_dim, 0.1
        self.W_in = rng.uniform(-s, s, size=(max(f, 1), h)).astype(np.float32)
        self.W_prof = rng.uniform(-s, s, size=(max(p, 1), h)).astype(np.float32)
        self.pos = rng.uniform(-s, s, size=(max_len, h)).astype(np.float32)
        self.layers = []
        for _ in range(n_layers):
            self.layers.append({
                "Wq": rng.uniform(-s, s, size=(h, h)).astype(np.float32),
                "Wk": rng.uniform(-s, s, size=(h, h)).astype(np.float32),
                "Wv": rng.uniform(-s, s, size=(h, h)).astype(np.float32),
                "Wo": rng.uniform(-s, s, size=(h, h)).astype(np.float32),
                "W1": rng.uniform(-s, s, size=(h, 2 * h)).astype(np.float32),
                "W2": rng.uniform(-s, s, size=(2 * h, h)).astype(np.float32),
            })
        self.h, self.heads = h, n_heads
        self.has_profile = p > 0
        self.n_seq_feats = f

    @staticmethod
    def _layernorm(x, eps=1e-5):
        mu = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps)

    def _attention(self, x, layer):
        n, t, h = x.shape
        heads, dh = self.heads, h // self.heads
        q = (x @ layer["Wq"]).reshape(n, t, heads, dh).transpose(0, 2, 1, 3)
        k = (x @ layer["Wk"]).reshape(n, t, heads, dh).transpose(0, 2, 1, 3)
        v = (x @ layer["Wv"]).reshape(n, t, heads, dh).transpose(0, 2, 1, 3)
        att = _softmax(q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh), axis=-1)
        out = (att @ v).transpose(0, 2, 1, 3).reshape(n, t, h)
        return out @ layer["Wo"]

    def encode(self, seq_cat, seq_cont, non_seq_cat, non_seq_cont) -> np.ndarray:
        x = np.concatenate([self.seq_emb(seq_cat),
                            seq_cont.astype(np.float32)], axis=-1)
        n, t, _ = x.shape
        z = (x @ self.W_in) * np.sqrt(self.h)
        if self.has_profile:
            prof = np.concatenate([self.non_seq_emb(non_seq_cat),
                                   non_seq_cont.astype(np.float32)], axis=-1)
            z = np.concatenate([z, (prof @ self.W_prof)[:, None, :]], axis=1)
            t += 1
        z = z + self.pos[:t][None, :, :]
        for layer in self.layers:
            z = self._layernorm(z + self._attention(z, layer))
            ff = np.maximum(z @ layer["W1"], 0.0) @ layer["W2"]
            z = self._layernorm(z + ff)
        return z.reshape(n, t * self.h)

    def parameters(self):
        out = self.seq_emb.parameters() + self.non_seq_emb.parameters()
        out += [self.W_in, self.W_prof, self.pos]
        for layer in self.layers:
            out += list(layer.values())
        return out


class LinearEncoder:
    """Pure matmul embedding over the continuous features — the one encoder
    whose output a SQL oracle can recompute exactly."""

    def __init__(self, weights: np.ndarray):
        self.W = np.asarray(weights, dtype=np.float64)

    def encode(self, seq_cat, seq_cont, non_seq_cat, non_seq_cont) -> np.ndarray:
        n = len(seq_cont) if seq_cont.size else len(non_seq_cont)
        flat = np.concatenate([seq_cont.reshape(n, -1),
                               non_seq_cont.reshape(n, -1)], axis=1)
        return flat.astype(np.float64) @ self.W.T

    def parameters(self):
        return [self.W]
