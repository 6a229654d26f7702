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


class DenseBnDropout:
    """[Linear -> ReLU -> BatchNorm] stack, eval-mode forward.

    Parity with caspr/models/dense_bn_dropout.py:7-56: same layer order
    (ReLU before BN, per the reference forward), BN applied over the last
    axis for both 2-D and 3-D inputs, dropout is identity at inference.
    BN uses stored running stats (0 mean / unit var at init, so the layer
    is affine-equivalent until stats are loaded from a checkpoint).
    """

    def __init__(self, input_size: int, layer_sizes: list[int],
                 rng: np.random.Generator):
        self.Ws, self.bs, self.mu, self.var = [], [], [], []
        prev = input_size
        for size in layer_sizes:
            # kaiming-normal fan-in, like the reference init
            std = np.sqrt(2.0 / max(prev, 1))
            self.Ws.append(rng.normal(0, std, size=(prev, size)).astype(np.float32))
            self.bs.append(np.zeros(size, dtype=np.float32))
            self.mu.append(np.zeros(size, dtype=np.float32))
            self.var.append(np.ones(size, dtype=np.float32))
            prev = size
        self.out_dim = prev

    def __call__(self, x: np.ndarray) -> np.ndarray:
        for W, b, mu, var in zip(self.Ws, self.bs, self.mu, self.var):
            x = np.maximum(x @ W + b, 0.0)
            x = (x - mu) / np.sqrt(var + 1e-5)
        return x

    def parameters(self):
        return self.Ws + self.bs


class MLP:
    """DenseBnDropout trunk + linear head (caspr/models/mlp.py:10-38)."""

    def __init__(self, input_size: int, layer_sizes: list[int],
                 output_size: int, use_sigmoid: bool = False, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.trunk = DenseBnDropout(input_size, list(layer_sizes), rng)
        std = np.sqrt(2.0 / max(self.trunk.out_dim, 1))
        self.W_out = rng.normal(0, std, size=(self.trunk.out_dim,
                                              output_size)).astype(np.float32)
        self.b_out = np.zeros(output_size, dtype=np.float32)
        self.use_sigmoid = use_sigmoid

    def __call__(self, x: np.ndarray) -> np.ndarray:
        out = self.trunk(x) @ self.W_out + self.b_out
        return _sigmoid(out) if self.use_sigmoid else out

    def parameters(self):
        return self.trunk.parameters() + [self.W_out, self.b_out]


class ConvAggregation:
    """Single-channel 2-D conv + tanh + max-pool over [N, T, F].

    Parity with caspr/models/convolutional_aggregation.py:8-50: the
    sequence block is treated as a 1-channel image, valid-padding strided
    convolution, tanh, then non-overlapping max pooling; dropout is
    identity at inference.
    """

    def __init__(self, kernel_size=(3, 3), stride=(2, 2), max_pool_size=(2, 2),
                 rng: np.random.Generator | None = None):
        rng = rng or np.random.default_rng(42)
        k0, k1 = kernel_size
        s = 1.0 / np.sqrt(k0 * k1)
        self.K = rng.uniform(-s, s, size=(k0, k1)).astype(np.float32)
        self.b = rng.uniform(-s, s, size=1).astype(np.float32)
        self.stride = stride
        self.pool = max_pool_size

    @staticmethod
    def out_shape(t: int, f: int, kernel_size, stride, max_pool_size):
        """Output (T', F') — the reference's sizing formula
        (unified_encoder.py:163-177)."""
        k0, k1 = kernel_size
        s0, s1 = stride
        p0, p1 = max_pool_size
        ct = (t - (k0 - 1) - 1) // s0 + 1
        cf = (f - (k1 - 1) - 1) // s1 + 1
        return ct // p0, cf // p1

    def __call__(self, x: np.ndarray) -> np.ndarray:
        n, t, f = x.shape
        k0, k1 = self.K.shape
        s0, s1 = self.stride
        ct = (t - k0) // s0 + 1
        cf = (f - k1) // s1 + 1
        conv = np.zeros((n, ct, cf), dtype=np.float32)
        for i in range(ct):
            for j in range(cf):
                patch = x[:, i * s0:i * s0 + k0, j * s1:j * s1 + k1]
                conv[:, i, j] = np.tensordot(patch, self.K, axes=([1, 2], [0, 1]))
        conv = np.tanh(conv + self.b[0])
        p0, p1 = self.pool
        pt, pf = ct // p0, cf // p1
        pooled = conv[:, :pt * p0, :pf * p1].reshape(n, pt, p0, pf, p1)
        return pooled.max(axis=(2, 4))

    def parameters(self):
        return [self.K, self.b]


class BahdanauAttention:
    """Additive attention over encoder outputs -> context vector.

    Parity with caspr/models/attention_mechanisms.py:102-123: scores are
    ``v(tanh(W_enc @ out))`` softmaxed over time; the context is the
    score-weighted sum of the (direction-concatenated) encoder outputs.
    """

    def __init__(self, hidden_size: int, num_directions: int,
                 rng: np.random.Generator):
        d = num_directions * hidden_size
        s = 1.0 / np.sqrt(max(d, 1))
        self.W_enc = rng.uniform(-s, s, size=(d, hidden_size)).astype(np.float32)
        s2 = 1.0 / np.sqrt(max(hidden_size, 1))
        self.v = rng.uniform(-s2, s2, size=(hidden_size, 1)).astype(np.float32)
        self.v_b = np.zeros(1, dtype=np.float32)

    def __call__(self, enc: np.ndarray) -> np.ndarray:
        scores = np.tanh(enc @ self.W_enc) @ self.v + self.v_b   # [N, T, 1]
        weights = _softmax(scores, axis=1)
        return (weights * enc).sum(axis=1)                        # [N, D*h]

    def parameters(self):
        return [self.W_enc, self.v, self.v_b]


class MultiHeadAttentionLSTMWrapper:
    """Self-MHA over encoder outputs + residual layernorm, summed over time.

    Parity with caspr/models/attention_mechanisms.py:8-99 in eval mode.
    """

    def __init__(self, n_heads: int, d_model: int, rng: np.random.Generator):
        assert d_model % n_heads == 0
        s = 1.0 / np.sqrt(max(d_model, 1))
        self.Wq, self.Wk, self.Wv, self.Wo = (
            rng.uniform(-s, s, size=(d_model, d_model)).astype(np.float32)
            for _ in range(4))
        self.heads = n_heads
        self.d_model = d_model

    def __call__(self, q: np.ndarray) -> np.ndarray:
        n, t, h = q.shape
        heads, dh = self.heads, h // self.heads
        Q = (q @ self.Wq).reshape(n, t, heads, dh).transpose(0, 2, 1, 3)
        K = (q @ self.Wk).reshape(n, t, heads, dh).transpose(0, 2, 1, 3)
        V = (q @ self.Wv).reshape(n, t, heads, dh).transpose(0, 2, 1, 3)
        att = _softmax(Q @ K.transpose(0, 1, 3, 2) / np.sqrt(dh), axis=-1)
        out = (att @ V).transpose(0, 2, 1, 3).reshape(n, t, h) @ self.Wo
        z = q + out
        mu = z.mean(axis=-1, keepdims=True)
        var = z.var(axis=-1, keepdims=True)
        return ((z - mu) / np.sqrt(var + 1e-5)).sum(axis=1)       # [N, h]

    def parameters(self):
        return [self.Wq, self.Wk, self.Wv, self.Wo]


class MultiLayerLSTM:
    """Stacked, optionally bidirectional LSTM over [N, T, F].

    Parity with caspr/models/multi_layer_lstm.py:7-63: returns the full
    per-step output (directions concatenated), the last layer's
    direction-0 (h, c), and the dense projection of the last layer's
    direction-concatenated final hidden state (``seq_inp``).
    """

    def __init__(self, input_size: int, hidden_size: int, num_layers: int = 1,
                 bidirectional: bool = False,
                 rng: np.random.Generator | None = None):
        rng = rng or np.random.default_rng(42)
        self.h = hidden_size
        self.layers = []
        d = 2 if bidirectional else 1
        for layer in range(num_layers):
            f = input_size if layer == 0 else d * hidden_size
            dirs = []
            for _ in range(d):
                s = 1.0 / np.sqrt(max(f + hidden_size, 1))
                W = rng.uniform(-s, s, size=(f, 4 * hidden_size)).astype(np.float32)
                U = rng.uniform(-s, s, size=(hidden_size, 4 * hidden_size)).astype(np.float32)
                b = np.zeros(4 * hidden_size, dtype=np.float32)
                b[hidden_size:2 * hidden_size] = 1.0
                dirs.append((W, U, b))
            self.layers.append(dirs)
        self.num_directions = d
        s = 1.0 / np.sqrt(max(d * hidden_size, 1))
        self.W_dense = rng.uniform(-s, s, size=(d * hidden_size,
                                                hidden_size)).astype(np.float32)
        self.b_dense = np.zeros(hidden_size, dtype=np.float32)

    def _run_direction(self, x, W, U, b, reverse: bool):
        n, t, _ = x.shape
        hd = self.h
        h = np.zeros((n, hd), dtype=np.float32)
        c = np.zeros((n, hd), dtype=np.float32)
        out = np.zeros((n, t, hd), dtype=np.float32)
        steps = range(t - 1, -1, -1) if reverse else range(t)
        for step in steps:
            g = x[:, step, :] @ W + h @ U + b
            i = _sigmoid(g[:, :hd])
            f = _sigmoid(g[:, hd:2 * hd])
            z = np.tanh(g[:, 2 * hd:3 * hd])
            o = _sigmoid(g[:, 3 * hd:])
            c = f * c + i * z
            h = o * np.tanh(c)
            out[:, step, :] = h
        return out, h, c

    def __call__(self, x: np.ndarray):
        finals = None
        for dirs in self.layers:
            outs, finals = [], []
            for d, (W, U, b) in enumerate(dirs):
                out, h, c = self._run_direction(x, W, U, b, reverse=(d == 1))
                outs.append(out)
                finals.append((h, c))
            x = np.concatenate(outs, axis=-1)
        h0, c0 = finals[0]
        last_hidden = (np.concatenate([finals[0][0], finals[1][0]], axis=1)
                       if self.num_directions > 1 else h0)
        seq_inp = last_hidden @ self.W_dense + self.b_dense
        return x, (h0, c0), seq_inp

    def parameters(self):
        out = []
        for dirs in self.layers:
            for W, U, b in dirs:
                out += [W, U, b]
        return out + [self.W_dense, self.b_dense]


class TransformerDecoderBlocks:
    """Stack of the reference's ``TransformerDecoderLayer``
    (caspr/models/transformer.py:169-233): masked multi-head
    self-attention -> encoder cross-attention -> positionwise
    feedforward, each with a post-norm residual (``norm(x + sublayer)``,
    :207-227), plus the learned positional embedding the reference's
    ``TransformerDecoder`` adds on entry (:234-260). Eval-mode forward
    parity (dropout = identity); training remains on the recurrent
    decoder head in ``models/autoencoder.py`` — hand-deriving backprop
    through two attention sublayers per block is where numpy parity
    stops paying for itself.

    ``__call__(trg, enc_src)`` takes teacher-forced target states
    ``[n, t, h]`` and encoder states ``[n, s, h]``; returns
    ``(decoded [n, t, h], cross_attention [n, heads, t, s])`` — the
    same pair the reference layer returns.
    """

    def __init__(self, hid_dim: int = 64, n_layers: int = 2,
                 n_heads: int = 4, pf_dim: int = 128, max_len: int = 64,
                 seed: int = 42):
        # defaults mirror the reference factory's decoder configuration:
        # 2 layers x 4 heads, pf 128 (caspr/models/factory.py:68-77)
        assert hid_dim % n_heads == 0, "hid_dim must divide by n_heads"
        rng = np.random.default_rng(seed)
        s = 0.1
        self.pos = rng.uniform(-s, s, size=(max_len, hid_dim)).astype(np.float32)
        self.layers = []
        for _ in range(n_layers):
            layer = {}
            for pfx in ("s", "c"):      # self-attn / cross-attn projections
                for nm in ("Wq", "Wk", "Wv", "Wo"):
                    layer[f"{pfx}_{nm}"] = rng.uniform(
                        -s, s, size=(hid_dim, hid_dim)).astype(np.float32)
            layer["W1"] = rng.uniform(-s, s, size=(hid_dim, pf_dim)).astype(np.float32)
            layer["W2"] = rng.uniform(-s, s, size=(pf_dim, hid_dim)).astype(np.float32)
            self.layers.append(layer)
        self.h, self.heads = hid_dim, n_heads

    @staticmethod
    def _layernorm(x, eps=1e-5):
        mu = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        return (x - mu) / np.sqrt(var + eps)

    def _mha(self, q_in, kv_in, layer, pfx, mask=None):
        n, t, h = q_in.shape
        srclen = kv_in.shape[1]
        heads, dh = self.heads, h // self.heads
        q = (q_in @ layer[f"{pfx}_Wq"]).reshape(n, t, heads, dh).transpose(0, 2, 1, 3)
        k = (kv_in @ layer[f"{pfx}_Wk"]).reshape(n, srclen, heads, dh).transpose(0, 2, 1, 3)
        v = (kv_in @ layer[f"{pfx}_Wv"]).reshape(n, srclen, heads, dh).transpose(0, 2, 1, 3)
        logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh)
        if mask is not None:
            logits = np.where(mask[None, None, :, :], logits, -1e9)
        att = _softmax(logits, axis=-1)
        out = (att @ v).transpose(0, 2, 1, 3).reshape(n, t, h)
        return out @ layer[f"{pfx}_Wo"], att

    def __call__(self, trg: np.ndarray, enc_src: np.ndarray):
        n, t, h = trg.shape
        trg = trg + self.pos[:t][None, :, :]
        causal = np.tril(np.ones((t, t), dtype=bool))   # trg_mask, :205-207
        attention = None
        for layer in self.layers:
            _trg, _ = self._mha(trg, trg, layer, "s", mask=causal)
            trg = self._layernorm(trg + _trg)
            _trg, attention = self._mha(trg, enc_src, layer, "c")
            trg = self._layernorm(trg + _trg)
            ff = np.maximum(trg @ layer["W1"], 0.0) @ layer["W2"]
            trg = self._layernorm(trg + ff)
        return trg, attention

    def parameters(self):
        out = [self.pos]
        for layer in self.layers:
            out += list(layer.values())
        return out


class UnifiedEncoder:
    """The reference's default encoder: embeddings -> DenseBnDropout ->
    (conv aggregation) -> multi-layer/bi-LSTM -> Bahdanau or multi-head
    attention -> ReLU output projection.

    Forward parity (eval mode) with caspr/models/unified_encoder.py:25-282:
    ``attention_heads == 1`` selects Bahdanau, ``> 1`` multi-head self
    attention, ``0`` disables attention; conv aggregation is gated on the
    reference's shape conditions (unified_encoder.py:163-179) and silently
    disabled when the window doesn't fit, exactly like the reference.
    """

    def __init__(self, seq_vocab: list[int], seq_emb_dims: list[int],
                 n_seq_cont: int, non_seq_vocab: list[int],
                 non_seq_emb_dims: list[int], n_non_seq_cont: int,
                 hidden_dim: int = 64, seq_len: int = 8,
                 lin_layer_sizes: tuple[int, ...] = (50, 25),
                 attention_heads: int = 1, lstm_num_layers: int = 1,
                 lstm_bidirectional: bool = False, use_conv_agg: bool = False,
                 kernel_size=(3, 3), stride=(2, 2), max_pool_size=(2, 2),
                 seed: int = 42):
        rng = np.random.default_rng(seed)
        self.seq_emb = CategoricalEmbedding(seq_vocab, seq_emb_dims, rng)
        self.non_seq_emb = CategoricalEmbedding(non_seq_vocab, non_seq_emb_dims, rng)
        sizes = list(lin_layer_sizes)
        self.seq_lin = (DenseBnDropout(self.seq_emb.out_dim, sizes, rng)
                        if self.seq_emb.out_dim else None)
        self.non_seq_lin = (DenseBnDropout(self.non_seq_emb.out_dim, sizes, rng)
                            if self.non_seq_emb.out_dim else None)
        lstm_in = (self.seq_lin.out_dim if self.seq_lin else 0) + n_seq_cont

        self.conv = None
        if use_conv_agg:
            ct, cf = ConvAggregation.out_shape(seq_len, lstm_in, kernel_size,
                                               stride, max_pool_size)
            if (seq_len >= kernel_size[0] and lstm_in >= kernel_size[1]
                    and ct >= 1 and cf >= 1):
                self.conv = ConvAggregation(kernel_size, stride, max_pool_size, rng)
                lstm_in = cf

        self.lstm = (MultiLayerLSTM(lstm_in, hidden_dim, lstm_num_layers,
                                    lstm_bidirectional, rng)
                     if lstm_in > 0 else None)
        d = 2 if lstm_bidirectional else 1
        self.attention = None
        if self.lstm is not None and attention_heads == 1:
            self.attention = BahdanauAttention(hidden_dim, d, rng)
        elif self.lstm is not None and attention_heads > 1:
            assert not lstm_bidirectional, \
                "multi-head attention requires a unidirectional LSTM"
            self.attention = MultiHeadAttentionLSTMWrapper(attention_heads,
                                                           hidden_dim, rng)
        non_seq_dim = ((self.non_seq_lin.out_dim if self.non_seq_lin else 0)
                       + n_non_seq_cont)
        fin = non_seq_dim
        if self.lstm is not None:
            fin += hidden_dim                      # seq_inp projection
            if self.attention is not None:
                fin += d * hidden_dim              # attention context
        std = np.sqrt(2.0 / max(fin, 1))
        self.W_out = rng.normal(0, std, size=(fin, hidden_dim)).astype(np.float32)
        self.b_out = np.zeros(hidden_dim, dtype=np.float32)
        self.hidden_dim = hidden_dim
        self.n_seq_cont = n_seq_cont
        self.n_non_seq_cont = n_non_seq_cont

    def encode(self, seq_cat, seq_cont, non_seq_cat, non_seq_cont) -> np.ndarray:
        n = max(len(np.atleast_1d(a)) for a in
                (seq_cat, seq_cont, non_seq_cat, non_seq_cont))
        parts = []
        if self.non_seq_lin is not None:
            parts.append(self.non_seq_lin(self.non_seq_emb(non_seq_cat)))
        if self.n_non_seq_cont:
            parts.append(np.asarray(non_seq_cont, dtype=np.float32).reshape(n, -1))
        if self.lstm is not None:
            seq_parts = []
            if self.seq_lin is not None:
                seq_parts.append(self.seq_lin(self.seq_emb(seq_cat)))
            if self.n_seq_cont:
                seq_parts.append(np.asarray(seq_cont, dtype=np.float32))
            x = np.concatenate(seq_parts, axis=-1)
            if self.conv is not None:
                x = self.conv(x)
            output, _, seq_inp = self.lstm(x)
            parts.append(seq_inp)
            if self.attention is not None:
                parts.append(self.attention(output))
        fin = np.concatenate(parts, axis=1)
        return np.maximum(fin @ self.W_out + self.b_out, 0.0)

    def parameters(self):
        out = self.seq_emb.parameters() + self.non_seq_emb.parameters()
        for layer in (self.seq_lin, self.non_seq_lin, self.conv, self.lstm,
                      self.attention):
            if layer is not None:
                out += layer.parameters()
        return out + [self.W_out, self.b_out]


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
