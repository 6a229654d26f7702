"""Trainable teacher-forced sequence autoencoder — numpy backprop.

Training-semantics parity with the reference's torch stack (torch is
absent from this environment, so the backward pass is hand-written):

- **Teacher forcing** — the decoder consumes the ground-truth sequence
  shifted right by one step with a zero first input, exactly
  ``AutoencoderTeacherTraining.forward``
  (caspr/models/model_wrapper.py:182-187) and
  ``TransformerAutoEncoder.forward``'s ``trg_inp`` (:237).
- **Multi-criterion loss** — Σ cross-entropy per categorical column
  (sequential and profile) + MSE over continuous blocks, identical
  structure to ``LSTMAutoencoder.run`` (model_wrapper.py:110-119) and
  ``TransformerAutoEncoder.run`` (:262-279); mean reductions match the
  torch ``nn.CrossEntropyLoss``/``nn.MSELoss`` defaults.
- **Decoder shape** — recurrent cell with hidden state initialized from
  the encoder embedding, per-step linear heads: ReLU'd continuous head
  and one logits head per categorical column
  (caspr/models/lstm_decoder.py:35-57); profile columns decode from the
  encoder state through per-column MLP heads
  (model_wrapper.py:54-58).
- **Optimizer** — Adam (caspr/utils/train.py:146), linear warmup
  (:120-130), early stopping with best-state restore
  (caspr/utils/early_stopping.py), seeded minibatch shuffling.

Two encoders: the default tractable flatten-MLP + tanh, and (round 5)
``encoder="lstm"`` — a real single-layer LSTM with hand-written BPTT
through the gate recurrence, the reference architecture's encoder
family without torch. Scale note: training
runs driver-side on a sampled/collected ``TensorBundle``, matching the
reference's single-node torch loop (caspr/utils/train.py:133-176);
tensorization and scoring stay distributed (``caspr_spark.score``).
"""

from __future__ import annotations

import numpy as np

from caspr_spark.data.tensorize import TensorBundle
from caspr_spark.train import EarlyStopping, warmup_lr


def _softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def _ce_loss_grad(logits: np.ndarray, targets: np.ndarray):
    """Mean cross-entropy over flattened rows; returns (loss, dlogits)."""
    flat_logits = logits.reshape(-1, logits.shape[-1])
    flat_t = targets.reshape(-1).astype(np.int64)
    flat_t = np.clip(flat_t, 0, flat_logits.shape[-1] - 1)
    n = len(flat_t)
    p = _softmax(flat_logits)
    loss = float(-np.log(np.maximum(p[np.arange(n), flat_t], 1e-12)).mean())
    d = p
    d[np.arange(n), flat_t] -= 1.0
    return loss, (d / n).reshape(logits.shape)


def _mse_loss_grad(pred: np.ndarray, target: np.ndarray):
    """Mean squared error over all elements; returns (loss, dpred)."""
    diff = pred - target
    n = max(diff.size, 1)
    return float((diff ** 2).sum() / n), 2.0 * diff / n


class SequenceAutoencoder:
    """Teacher-forced recurrent autoencoder (numpy) with a choice of
    encoder:

    - ``encoder="mlp"`` (default, round-4 behavior) — flatten-MLP +
      tanh over the embedded sequence; tractable and fast.
    - ``encoder="lstm"`` — a REAL single-layer LSTM over the embedded
      steps (gate order i,f,z,o; forget bias 1), last hidden state
      projected + tanh, full hand-written BPTT through the gates —
      the reference ``LSTMAutoencoder``'s actual encoder family
      (caspr/models/unified_encoder.py MultiLayerLSTM path,
      multi_layer_lstm.py:7-63), closing the "swap in torch for a real
      LSTM" caveat without torch.
    - ``encoder="lstm_attention"`` (round 6) — the same LSTM, pooled by
      BAHDANAU additive attention over ALL hidden states instead of
      taking the last one: scores ``v·tanh(h_t Wa)`` softmaxed over
      time, context = score-weighted state sum — the reference's
      DEFAULT UnifiedEncoder configuration
      (caspr/models/unified_encoder.py:25-282, attention pooling per
      caspr/models/attention_mechanisms.py:102-123), now TRAINED
      end-to-end: the attention VJP feeds per-step gradients into the
      gate BPTT, so every hidden state (not just the last) carries
      gradient signal.

    Parameters live in ``self.params`` (name -> array) so the Adam state,
    gradient check, and npz checkpointing all address them uniformly.
    """

    def __init__(self, seq_vocab: list[int], seq_emb_dims: list[int],
                 n_seq_cont: int, non_seq_vocab: list[int],
                 non_seq_emb_dims: list[int], n_non_seq_cont: int,
                 seq_len: int, hidden_dim: int = 32, seed: int = 42,
                 encoder: str = "mlp"):
        if encoder not in ("mlp", "lstm", "lstm_attention"):
            raise ValueError(f"encoder must be 'mlp', 'lstm', or "
                             f"'lstm_attention', got {encoder!r}")
        self.encoder = encoder
        rng = np.random.default_rng(seed)
        self.seq_vocab = list(seq_vocab)
        self.seq_emb_dims = list(seq_emb_dims)
        self.non_seq_vocab = list(non_seq_vocab)
        self.non_seq_emb_dims = list(non_seq_emb_dims)
        self.n_seq_cont = n_seq_cont
        self.n_non_seq_cont = n_non_seq_cont
        self.seq_len = seq_len
        self.hidden_dim = hidden_dim

        F = int(sum(seq_emb_dims)) + n_seq_cont   # per-step feature width
        P = int(sum(non_seq_emb_dims)) + n_non_seq_cont
        H = hidden_dim
        self.F, self.P = F, P

        def u(*shape, s=None):
            s = s if s is not None else 1.0 / np.sqrt(max(shape[0], 1))
            return rng.uniform(-s, s, size=shape).astype(np.float64)

        p: dict[str, np.ndarray] = {}
        for i, (v, d) in enumerate(zip(seq_vocab, seq_emb_dims)):
            p[f"emb_s{i}"] = rng.normal(0, 0.1, size=(v, d))
        for j, (v, d) in enumerate(zip(non_seq_vocab, non_seq_emb_dims)):
            p[f"emb_n{j}"] = rng.normal(0, 0.1, size=(v, d))
        if encoder in ("lstm", "lstm_attention"):
            p["We"] = u(F, 4 * H)
            p["Ue"] = u(H, 4 * H)
            p["be"] = np.zeros(4 * H)
            p["be"][H:2 * H] = 1.0        # forget-gate bias 1
            p["W_enc"] = u(H, H)          # pooled-state projection
            if encoder == "lstm_attention":
                p["Wa"] = u(H, H)         # additive-attention score net
                p["va"] = u(H, s=1.0 / np.sqrt(H))
                p["vb"] = np.zeros(1)
        else:
            p["W_enc"] = u(seq_len * F, H)
        p["b_enc"] = np.zeros(H)
        if P:
            p["W_prof"] = u(P, H)
        p["Wx"] = u(F, H)
        p["Wd"] = u(H, H)
        p["bd"] = np.zeros(H)
        if n_seq_cont:
            p["W_oc"] = u(H, n_seq_cont)
            p["b_oc"] = np.zeros(n_seq_cont)
        for i, v in enumerate(seq_vocab):
            p[f"W_os{i}"] = u(H, v)
            p[f"b_os{i}"] = np.zeros(v)
        if n_non_seq_cont:
            p["W_nc"] = u(H, n_non_seq_cont)
            p["b_nc"] = np.zeros(n_non_seq_cont)
        for j, v in enumerate(non_seq_vocab):
            p[f"W_nn{j}"] = u(H, v)
            p[f"b_nn{j}"] = np.zeros(v)
        self.params = p

    # -- embedding helpers -------------------------------------------------
    def _embed(self, cat: np.ndarray, prefix: str, dims: list[int],
               vocab: list[int]) -> np.ndarray:
        if not dims:
            return np.zeros((*cat.shape[:-1], 0))
        cols = []
        for i, (v, _) in enumerate(zip(vocab, dims)):
            idx = np.clip(cat[..., i], 0, v - 1)
            cols.append(self.params[f"{prefix}{i}"][idx])
        return np.concatenate(cols, axis=-1)

    def _embed_grad(self, cat: np.ndarray, dE: np.ndarray, prefix: str,
                    dims: list[int], vocab: list[int],
                    grads: dict[str, np.ndarray]):
        off = 0
        for i, (v, d) in enumerate(zip(vocab, dims)):
            idx = np.clip(cat[..., i], 0, v - 1).reshape(-1)
            g = grads[f"{prefix}{i}"]
            np.add.at(g, idx, dE[..., off:off + d].reshape(-1, d))
            off += d

    # -- encoder LSTM (BPTT-capable) ---------------------------------------
    def _enc_lstm_forward(self, E):
        """Single-layer LSTM over [N,T,F]; returns (h_T, gate tape)."""
        p = self.params
        N, T = E.shape[0], E.shape[1]
        H = self.hidden_dim
        I = np.empty((N, T, H)); Fg = np.empty((N, T, H))
        Z = np.empty((N, T, H)); O = np.empty((N, T, H))
        C = np.empty((N, T, H)); Hs = np.empty((N, T, H))
        h = np.zeros((N, H)); c = np.zeros((N, H))
        for t in range(T):
            gates = E[:, t, :] @ p["We"] + h @ p["Ue"] + p["be"]
            i = 1.0 / (1.0 + np.exp(-gates[:, :H]))
            f = 1.0 / (1.0 + np.exp(-gates[:, H:2 * H]))
            z = np.tanh(gates[:, 2 * H:3 * H])
            o = 1.0 / (1.0 + np.exp(-gates[:, 3 * H:]))
            c = f * c + i * z
            h = o * np.tanh(c)
            I[:, t], Fg[:, t], Z[:, t], O[:, t] = i, f, z, o
            C[:, t], Hs[:, t] = c, h
        return h, (E, I, Fg, Z, O, C, Hs)

    def _enc_lstm_backward(self, dHs, tape, g, dE):
        """BPTT through the encoder LSTM; accumulates We/Ue/be grads and
        the input grad into ``dE``. ``dHs`` is the PER-STEP upstream
        gradient [N,T,H] — all-zero except the last step for last-state
        pooling, dense for attention pooling (every state feeds the
        context)."""
        p = self.params
        E, I, Fg, Z, O, C, Hs = tape
        N, T, H = I.shape
        dh, dc = np.zeros((N, H)), np.zeros((N, H))
        for t in range(T - 1, -1, -1):
            dh = dh + dHs[:, t]
            i, f, z, o, c = I[:, t], Fg[:, t], Z[:, t], O[:, t], C[:, t]
            tc = np.tanh(c)
            do = dh * tc
            dc = dc + dh * o * (1.0 - tc * tc)
            di = dc * z
            dz = dc * i
            c_prev = C[:, t - 1] if t > 0 else np.zeros((N, H))
            df = dc * c_prev
            dg = np.concatenate([di * i * (1 - i), df * f * (1 - f),
                                 dz * (1 - z * z), do * o * (1 - o)],
                                axis=1)                      # [N,4H]
            g["We"] += E[:, t, :].T @ dg
            if t > 0:
                g["Ue"] += Hs[:, t - 1].T @ dg
            g["be"] += dg.sum(axis=0)
            dE[:, t, :] += dg @ p["We"].T
            dh = dg @ p["Ue"].T
            dc = dc * f

    # -- Bahdanau attention pooling (VJP-complete) -------------------------
    def _attn_pool_forward(self, Hs):
        """Additive attention over the LSTM states
        (attention_mechanisms.py:102-123): scores ``v·tanh(h_t Wa)+b``
        softmaxed over time, context = weighted state sum. Returns
        (context [N,H], tape)."""
        p = self.params
        u = np.tanh(Hs @ p["Wa"])                   # [N,T,H]
        s = u @ p["va"] + p["vb"][0]                # [N,T]
        a = _softmax(s, axis=1)
        ctx = (a[:, :, None] * Hs).sum(axis=1)      # [N,H]
        return ctx, (u, a, Hs)

    def _attn_pool_backward(self, dctx, tape, g):
        """VJP of the pooling: accumulates Wa/va/vb grads, returns the
        PER-STEP state gradient [N,T,H] the gate BPTT consumes (states
        feed the context both directly and through their scores)."""
        p = self.params
        u, a, Hs = tape
        dalpha = np.einsum("nh,nth->nt", dctx, Hs)
        dHs = a[:, :, None] * dctx[:, None, :]
        ds = a * (dalpha - (a * dalpha).sum(axis=1, keepdims=True))
        g["va"] += np.einsum("nt,nth->h", ds, u)
        g["vb"] += ds.sum()
        dpre = (ds[:, :, None] * p["va"][None, None, :]) * (1.0 - u * u)
        g["Wa"] += np.einsum("nth,ntk->hk", Hs, dpre)
        return dHs + dpre @ p["Wa"].T

    # -- forward -----------------------------------------------------------
    def _forward(self, seq_cat, seq_cont, non_seq_cat, non_seq_cont):
        """Full teacher-forced forward pass; returns loss + tape."""
        p = self.params
        N, T = seq_cat.shape[0], self.seq_len
        E = np.concatenate(
            [self._embed(seq_cat, "emb_s", self.seq_emb_dims, self.seq_vocab),
             seq_cont.astype(np.float64)], axis=-1)          # [N,T,F]
        enc_tape = flat = attn_tape = ctx = None
        if self.encoder == "lstm":
            hT, enc_tape = self._enc_lstm_forward(E)
            pre = hT @ p["W_enc"] + p["b_enc"]
        elif self.encoder == "lstm_attention":
            _, enc_tape = self._enc_lstm_forward(E)
            ctx, attn_tape = self._attn_pool_forward(enc_tape[6])
            pre = ctx @ p["W_enc"] + p["b_enc"]
        else:
            flat = E.reshape(N, T * self.F)
            pre = flat @ p["W_enc"] + p["b_enc"]
        prof = None
        if self.P:
            prof = np.concatenate(
                [self._embed(non_seq_cat, "emb_n", self.non_seq_emb_dims,
                             self.non_seq_vocab),
                 non_seq_cont.astype(np.float64)], axis=-1)   # [N,P]
            pre = pre + prof @ p["W_prof"]
        h = np.tanh(pre)                                      # [N,H]

        # teacher inputs: zeros at t=0, E[t-1] after (model_wrapper.py:182-187)
        X = np.concatenate([np.zeros((N, 1, self.F)), E[:, :-1, :]], axis=1)
        D = np.empty((N, T, self.hidden_dim))
        d_prev = h
        for t in range(T):
            D[:, t, :] = np.tanh(X[:, t, :] @ p["Wx"] + d_prev @ p["Wd"]
                                 + p["bd"])
            d_prev = D[:, t, :]

        losses, tape = [], {"E": E, "flat": flat, "h": h, "prof": prof,
                            "X": X, "D": D, "enc_tape": enc_tape,
                            "attn_tape": attn_tape, "ctx": ctx}
        if self.n_seq_cont:
            oc_pre = D @ p["W_oc"] + p["b_oc"]
            cont_hat = np.maximum(oc_pre, 0.0)   # relu, lstm_decoder.py:49
            l, dl = _mse_loss_grad(cont_hat, seq_cont.astype(np.float64))
            losses.append(l)
            tape["d_oc_pre"] = dl * (oc_pre > 0)
        seq_cat_dlogits = []
        for i in range(len(self.seq_vocab)):
            logits = D @ p[f"W_os{i}"] + p[f"b_os{i}"]
            l, dl = _ce_loss_grad(logits, seq_cat[:, :, i])
            losses.append(l)
            seq_cat_dlogits.append(dl)
        tape["seq_cat_dlogits"] = seq_cat_dlogits
        if self.n_non_seq_cont:
            nc_hat = h @ p["W_nc"] + p["b_nc"]
            l, dl = _mse_loss_grad(nc_hat, non_seq_cont.astype(np.float64))
            losses.append(l)
            tape["d_nc"] = dl
        nn_dlogits = []
        for j in range(len(self.non_seq_vocab)):
            logits = h @ p[f"W_nn{j}"] + p[f"b_nn{j}"]
            l, dl = _ce_loss_grad(logits, non_seq_cat[:, j])
            losses.append(l)
            nn_dlogits.append(dl)
        tape["nn_dlogits"] = nn_dlogits
        return float(sum(losses)), tape

    def loss(self, bundle: TensorBundle) -> float:
        l, _ = self._forward(bundle.seq_cat, bundle.seq_cont,
                             bundle.non_seq_cat, bundle.non_seq_cont)
        return l

    # -- backward ----------------------------------------------------------
    def loss_and_grads(self, seq_cat, seq_cont, non_seq_cat, non_seq_cont):
        p = self.params
        loss, tp = self._forward(seq_cat, seq_cont, non_seq_cat, non_seq_cont)
        g = {k: np.zeros_like(v) for k, v in p.items()}
        E, flat, h, prof = tp["E"], tp["flat"], tp["h"], tp["prof"]
        X, D = tp["X"], tp["D"]
        N, T = seq_cat.shape[0], self.seq_len

        # head grads -> per-step decoder-state grads dD and encoder dh
        dD = np.zeros_like(D)
        if self.n_seq_cont:
            d_oc = tp["d_oc_pre"]                    # [N,T,Fc]
            g["W_oc"] += np.einsum("nth,ntf->hf", D, d_oc)
            g["b_oc"] += d_oc.sum(axis=(0, 1))
            dD += d_oc @ p["W_oc"].T
        for i, dl in enumerate(tp["seq_cat_dlogits"]):
            g[f"W_os{i}"] += np.einsum("nth,ntv->hv", D, dl)
            g[f"b_os{i}"] += dl.sum(axis=(0, 1))
            dD += dl @ p[f"W_os{i}"].T
        dh = np.zeros_like(h)
        if self.n_non_seq_cont:
            g["W_nc"] += h.T @ tp["d_nc"]
            g["b_nc"] += tp["d_nc"].sum(axis=0)
            dh += tp["d_nc"] @ p["W_nc"].T
        for j, dl in enumerate(tp["nn_dlogits"]):
            g[f"W_nn{j}"] += h.T @ dl
            g[f"b_nn{j}"] += dl.sum(axis=0)
            dh += dl @ p[f"W_nn{j}"].T

        # BPTT through the tanh recurrence d_t = tanh(x_t Wx + d_{t-1} Wd + bd)
        dE = np.zeros_like(E)
        carry = np.zeros((N, self.hidden_dim))
        for t in range(T - 1, -1, -1):
            total = dD[:, t, :] + carry
            dpre = total * (1.0 - D[:, t, :] ** 2)
            g["Wx"] += X[:, t, :].T @ dpre
            d_prev = h if t == 0 else D[:, t - 1, :]
            g["Wd"] += d_prev.T @ dpre
            g["bd"] += dpre.sum(axis=0)
            dx = dpre @ p["Wx"].T
            if t >= 1:
                dE[:, t - 1, :] += dx      # teacher input path
                carry = dpre @ p["Wd"].T
            else:
                dh += dpre @ p["Wd"].T     # d_{-1} = h

        # encoder backward
        self._encoder_backward(tp, dh, g, dE, seq_cat, non_seq_cat)
        return loss, g

    def _encoder_backward(self, tp, dh, g, dE, seq_cat, non_seq_cat):
        """Backprop an upstream embedding gradient ``dh`` [N,H] through
        the encoder (whichever variant), accumulating into ``g``.
        ``dE`` carries any pre-existing input-embedding gradient (the
        decoder's teacher-forcing path in full training; zeros when the
        encoder is driven standalone, e.g. by joint DEC)."""
        p = self.params
        h, flat, prof = tp["h"], tp["flat"], tp["prof"]
        dpre_enc = dh * (1.0 - h ** 2)
        g["b_enc"] += dpre_enc.sum(axis=0)
        if self.encoder == "lstm":
            Hs = tp["enc_tape"][6]
            g["W_enc"] += Hs[:, -1].T @ dpre_enc
            dHs = np.zeros_like(Hs)
            dHs[:, -1] = dpre_enc @ p["W_enc"].T
            self._enc_lstm_backward(dHs, tp["enc_tape"], g, dE)
        elif self.encoder == "lstm_attention":
            g["W_enc"] += tp["ctx"].T @ dpre_enc
            dctx = dpre_enc @ p["W_enc"].T
            dHs = self._attn_pool_backward(dctx, tp["attn_tape"], g)
            self._enc_lstm_backward(dHs, tp["enc_tape"], g, dE)
        else:
            N = dE.shape[0]
            g["W_enc"] += flat.T @ dpre_enc
            dE += (dpre_enc @ p["W_enc"].T).reshape(N, self.seq_len, self.F)
        if self.P:
            g["W_prof"] += prof.T @ dpre_enc
            dprof = dpre_enc @ p["W_prof"].T
            self._embed_grad(non_seq_cat, dprof, "emb_n",
                             self.non_seq_emb_dims, self.non_seq_vocab, g)
        n_emb = int(sum(self.seq_emb_dims))
        if n_emb:
            self._embed_grad(seq_cat, dE[..., :n_emb], "emb_s",
                             self.seq_emb_dims, self.seq_vocab, g)

    def encode_and_grads(self, seq_cat, seq_cont, non_seq_cat, non_seq_cont,
                         dh):
        """Encoder-only VJP: forward-encode, then backprop the upstream
        embedding gradient ``dh`` [N,H] into every encoder parameter
        (embeddings, LSTM gates, attention pool, projections) — what
        joint DEC (``caspr_spark.dec.fit_dec_joint``) chains the KL
        embedding gradient through, mirroring the reference's autograd
        through the wrapped AE (caspr/models/dec.py:10-119). Decoder
        parameters receive zero gradient. Returns ``(h, grads)``."""
        _, tp = self._forward(seq_cat, seq_cont, non_seq_cat, non_seq_cont)
        g = {k: np.zeros_like(v) for k, v in self.params.items()}
        dE = np.zeros_like(tp["E"])
        self._encoder_backward(tp, np.asarray(dh, dtype=np.float64), g, dE,
                               seq_cat, non_seq_cat)
        return tp["h"], g

    # -- scoring surface ----------------------------------------------------
    def encode(self, seq_cat, seq_cont, non_seq_cat, non_seq_cont):
        """[N,H] embedding — the duck-typed surface ``caspr_spark.score`` uses."""
        p = self.params
        N = seq_cat.shape[0]
        E = np.concatenate(
            [self._embed(seq_cat, "emb_s", self.seq_emb_dims, self.seq_vocab),
             seq_cont.astype(np.float64)], axis=-1)
        if self.encoder in ("lstm", "lstm_attention"):
            hT, tape = self._enc_lstm_forward(E)
            pooled = (self._attn_pool_forward(tape[6])[0]
                      if self.encoder == "lstm_attention" else hT)
            pre = pooled @ p["W_enc"] + p["b_enc"]
        else:
            pre = E.reshape(N, -1) @ p["W_enc"] + p["b_enc"]
        if self.P:
            prof = np.concatenate(
                [self._embed(non_seq_cat, "emb_n", self.non_seq_emb_dims,
                             self.non_seq_vocab),
                 non_seq_cont.astype(np.float64)], axis=-1)
            pre = pre + prof @ p["W_prof"]
        return np.tanh(pre)

    def reconstruct_cont(self, bundle: TensorBundle) -> np.ndarray:
        """Teacher-forced reconstruction of the sequential continuous block."""
        _, tp = self._forward(bundle.seq_cat, bundle.seq_cont,
                              bundle.non_seq_cat, bundle.non_seq_cont)
        D = tp["D"]
        p = self.params
        return np.maximum(D @ p["W_oc"] + p["b_oc"], 0.0)

    def parameters(self):
        return [self.params[k] for k in sorted(self.params)]

    # -- persistence (SURVEY S6 checkpoint sink) -----------------------------
    def state_dict(self) -> dict[str, np.ndarray]:
        return dict(self.params)

    def save(self, path: str):
        np.savez(path, **{k: v for k, v in self.params.items()},
                 __meta__=np.array([self.seq_len, self.hidden_dim,
                                    self.n_seq_cont, self.n_non_seq_cont]))

    def load_state(self, state: dict[str, np.ndarray]):
        for k in self.params:
            self.params[k] = np.asarray(state[k], dtype=np.float64)


class Adam:
    """Plain Adam (caspr/utils/train.py:146) over a named-param dict."""

    def __init__(self, params: dict[str, np.ndarray], lr: float = 1e-3,
                 betas=(0.9, 0.999), eps: float = 1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, betas[0], betas[1], eps
        self.m = {k: np.zeros_like(v) for k, v in params.items()}
        self.v = {k: np.zeros_like(v) for k, v in params.items()}
        self.t = 0

    def step(self, params: dict[str, np.ndarray],
             grads: dict[str, np.ndarray], lr: float | None = None):
        self.t += 1
        lr = self.lr if lr is None else lr
        bc1 = 1.0 - self.b1 ** self.t
        bc2 = 1.0 - self.b2 ** self.t
        for k, g in grads.items():
            self.m[k] = self.b1 * self.m[k] + (1 - self.b1) * g
            self.v[k] = self.b2 * self.v[k] + (1 - self.b2) * g * g
            params[k] -= lr * (self.m[k] / bc1) / (np.sqrt(self.v[k] / bc2)
                                                   + self.eps)


def fit_autoencoder(bundle: TensorBundle, hidden_dim: int = 32,
                    epochs: int = 50, lr: float = 1e-3, batch_size: int = 256,
                    warmup_epochs: int = 5, patience: int = 8,
                    min_delta: float = 1e-5, seed: int = 42,
                    val_bundle: TensorBundle | None = None,
                    checkpoint_path: str | None = None,
                    encoder: str = "mlp"):
    """Minibatch Adam over the multi-criterion loss; returns (model, history).

    Mirrors ``train_model`` (caspr/utils/train.py:133-176): Adam, linear
    warmup, early stopping on the validation (or train) epoch loss with
    best-state restore; seeded shuffling stands in for the DataLoader.
    """
    from caspr_spark.models.factory import embedding_dim

    seq_vocab = [max(int(bundle.seq_cat[..., i].max()) + 1, 2)
                 for i in range(bundle.seq_cat.shape[-1])]
    non_seq_vocab = [max(int(bundle.non_seq_cat[:, j].max()) + 1, 2)
                     for j in range(bundle.non_seq_cat.shape[-1])]
    model = SequenceAutoencoder(
        seq_vocab, [embedding_dim(v) for v in seq_vocab],
        bundle.seq_cont.shape[-1],
        non_seq_vocab, [embedding_dim(v) for v in non_seq_vocab],
        bundle.non_seq_cont.shape[-1],
        seq_len=bundle.seq_cat.shape[1] or bundle.seq_cont.shape[1],
        hidden_dim=hidden_dim, seed=seed, encoder=encoder)
    opt = Adam(model.params, lr=lr)
    stopper = EarlyStopping(patience=patience, min_delta=min_delta)
    rng = np.random.default_rng(seed)
    n = len(bundle)
    eval_bundle = val_bundle if val_bundle is not None else bundle
    history: list[float] = []
    for epoch in range(epochs):
        order = rng.permutation(n)
        for start in range(0, n, batch_size):
            idx = order[start:start + batch_size]
            _, grads = model.loss_and_grads(
                bundle.seq_cat[idx], bundle.seq_cont[idx],
                bundle.non_seq_cat[idx], bundle.non_seq_cont[idx])
            opt.step(model.params, grads, warmup_lr(lr, epoch, warmup_epochs))
        epoch_loss = model.loss(eval_bundle)
        history.append(epoch_loss)
        if stopper.step(epoch_loss, epoch,
                        [model.params[k] for k in sorted(model.params)],
                        checkpoint_path=checkpoint_path):
            break
    if stopper.best_state:
        for k, w in zip(sorted(model.params), stopper.best_state):
            model.params[k] = w
    return model, history
