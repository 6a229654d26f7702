"""Trainable teacher-forced TRANSFORMER autoencoder — numpy backprop.

Closes the round-4 gap: ``models/autoencoder.py`` trains the recurrent-
decoder architecture; this module hand-derives backprop through the
reference's *other* autoencoder — ``TransformerAutoEncoder``
(caspr/models/model_wrapper.py:217-281) — so both reference
architectures train end-to-end in this torch-free environment.

Forward semantics mirrored from the reference:

- **Encoder** — ``UnifiedTransformerEncoder``
  (caspr/models/unified_transformer_encoder.py:73-103): per-step
  [embedded seq cats ‖ seq conts] through one linear to ``hid_dim``;
  the profile vector ([embedded non-seq cats ‖ non-seq conts] through
  its own linear) appended as ONE EXTRA SEQUENCE POSITION; then
  ``TransformerEncoder`` blocks (caspr/models/transformer.py:62-132):
  ``x·√H + pos_emb`` on entry, per block self-attention and ReLU
  positionwise-FF sublayers, each wrapped ``LayerNorm(x + sublayer(x))``
  (post-norm, affine γ/β as nn.LayerNorm defaults).
- **Teacher forcing** — ``trg_inp = [0, src_inp[:, :-1]]`` (shift right,
  zero first step; model_wrapper.py:237).
- **Decoder** — ``TransformerDecoder`` (transformer.py:234-306):
  ``trg·√H + pos_emb``, per block causally-masked self-attention
  (tril mask, :271-276), encoder cross-attention, positionwise FF,
  post-norm residuals.
- **Output heads** — ``OutputLayer`` (model_wrapper.py:319-360):
  decoder positions ``:-1`` feed the sequential heads (one logits
  linear per cat column + one continuous linear), position ``-1``
  feeds the profile heads.
- **Loss** — Σ CE per categorical column + MSE per continuous block
  (model_wrapper.py:262-279), mean reductions as the torch criteria
  default.

Dropout is identity (eval-mode parity — the reference's stochastic
regularizer, not part of the loss semantics). Training runs driver-side
on a collected ``TensorBundle`` like the reference's single-node loop
(caspr/utils/train.py:133-176); tensorization/scoring stay distributed.

Every VJP here is checked against central finite differences in
``tests/test_transformer_ae.py`` (same gradcheck harness as the
recurrent AE).
"""

from __future__ import annotations

import numpy as np

from caspr_spark.data.tensorize import TensorBundle
from caspr_spark.models.autoencoder import (Adam, _ce_loss_grad,
                                            _mse_loss_grad)
from caspr_spark.train import EarlyStopping, warmup_lr

_EPS = 1e-5


def _layernorm_fwd(x, gamma, beta):
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    inv = 1.0 / np.sqrt(var + _EPS)
    xhat = (x - mu) * inv
    return gamma * xhat + beta, (xhat, inv)


def _layernorm_bwd(dy, gamma, tape):
    """Standard affine-LN VJP over the last axis."""
    xhat, inv = tape
    H = xhat.shape[-1]
    dgamma = (dy * xhat).sum(axis=tuple(range(dy.ndim - 1)))
    dbeta = dy.sum(axis=tuple(range(dy.ndim - 1)))
    dxhat = dy * gamma
    dx = (dxhat - dxhat.mean(axis=-1, keepdims=True)
          - xhat * (dxhat * xhat).mean(axis=-1, keepdims=True)) * inv
    # correction: mean over H of (dxhat·xhat) uses 1/H; np.var is the
    # biased estimator so the three-term form above is exact for it
    assert H == xhat.shape[-1]
    return dx, dgamma, dbeta


class TransformerSequenceAutoencoder:
    """Numpy twin of the reference ``TransformerAutoEncoder`` with
    hand-written, gradcheck'd backprop through the full encoder/decoder
    attention stack. Parameters live in ``self.params`` (name -> array)
    so Adam, gradcheck, and npz checkpoints address them uniformly —
    the same contract as ``SequenceAutoencoder``."""

    def __init__(self, seq_vocab: list[int], seq_emb_dims: list[int],
                 n_seq_cont: int, non_seq_vocab: list[int],
                 non_seq_emb_dims: list[int], n_non_seq_cont: int,
                 seq_len: int, hid_dim: int = 32, n_heads: int = 4,
                 n_enc_layers: int = 1, n_dec_layers: int = 1,
                 pf_dim: int = 64, seed: int = 42):
        if hid_dim % n_heads:
            raise ValueError(f"hid_dim {hid_dim} must divide n_heads {n_heads}")
        rng = np.random.default_rng(seed)
        self.seq_vocab = list(seq_vocab)
        self.seq_emb_dims = list(seq_emb_dims)
        self.non_seq_vocab = list(non_seq_vocab)
        self.non_seq_emb_dims = list(non_seq_emb_dims)
        self.n_seq_cont = n_seq_cont
        self.n_non_seq_cont = n_non_seq_cont
        self.seq_len = seq_len
        self.h, self.heads, self.pf = hid_dim, n_heads, pf_dim
        self.n_enc, self.n_dec = n_enc_layers, n_dec_layers

        F = int(sum(seq_emb_dims)) + n_seq_cont
        P = int(sum(non_seq_emb_dims)) + n_non_seq_cont
        self.F, self.P = F, P
        self.has_prof = P > 0
        self.S = seq_len + (1 if self.has_prof else 0)   # src/trg length
        H = hid_dim

        def u(*shape, s=None):
            s = s if s is not None else 1.0 / np.sqrt(max(shape[0], 1))
            return rng.uniform(-s, s, size=shape).astype(np.float64)

        p: dict[str, np.ndarray] = {}
        for i, (v, d) in enumerate(zip(seq_vocab, seq_emb_dims)):
            p[f"emb_s{i}"] = rng.normal(0, 0.1, size=(v, d))
        for j, (v, d) in enumerate(zip(non_seq_vocab, non_seq_emb_dims)):
            p[f"emb_n{j}"] = rng.normal(0, 0.1, size=(v, d))
        p["W_in"], p["b_in"] = u(F, H), np.zeros(H)      # linear_seq
        if self.has_prof:
            p["W_pin"], p["b_pin"] = u(P, H), np.zeros(H)  # linear_non_seq
        p["pos_enc"] = rng.normal(0, 0.1, size=(self.S, H))
        p["pos_dec"] = rng.normal(0, 0.1, size=(self.S, H))

        def block(pfx: str, cross: bool):
            names = ["s"] + (["c"] if cross else [])
            for a in names:
                for nm in ("Wq", "Wk", "Wv", "Wo"):
                    p[f"{pfx}_{a}_{nm}"] = u(H, H)
                    p[f"{pfx}_{a}_b{nm[1].lower()}"] = np.zeros(H)
            p[f"{pfx}_W1"], p[f"{pfx}_b1"] = u(H, pf_dim), np.zeros(pf_dim)
            p[f"{pfx}_W2"], p[f"{pfx}_b2"] = u(pf_dim, H), np.zeros(H)
            n_ln = 3 if cross else 2
            for k in range(n_ln):
                p[f"{pfx}_g{k}"] = np.ones(H)
                p[f"{pfx}_be{k}"] = np.zeros(H)

        for li in range(n_enc_layers):
            block(f"enc{li}", cross=False)
        for li in range(n_dec_layers):
            block(f"dec{li}", cross=True)

        if n_seq_cont:
            p["W_oc"], p["b_oc"] = u(H, n_seq_cont), np.zeros(n_seq_cont)
        for i, v in enumerate(seq_vocab):
            p[f"W_os{i}"], p[f"b_os{i}"] = u(H, v), np.zeros(v)
        if n_non_seq_cont:
            p["W_nc"], p["b_nc"] = u(H, n_non_seq_cont), np.zeros(n_non_seq_cont)
        for j, v in enumerate(non_seq_vocab):
            p[f"W_nn{j}"], p[f"b_nn{j}"] = u(H, v), np.zeros(v)
        self.params = p

    # -- embeddings (same pattern as SequenceAutoencoder) -----------------
    def _embed(self, cat, prefix, dims, vocab):
        if not dims:
            return np.zeros((*cat.shape[:-1], 0))
        cols = []
        for i, (v, _) in enumerate(zip(vocab, dims)):
            idx = np.clip(cat[..., i], 0, v - 1)
            cols.append(self.params[f"{prefix}{i}"][idx])
        return np.concatenate(cols, axis=-1)

    def _embed_grad(self, cat, dE, prefix, dims, vocab, grads):
        off = 0
        for i, (v, d) in enumerate(zip(vocab, dims)):
            idx = np.clip(cat[..., i], 0, v - 1).reshape(-1)
            np.add.at(grads[f"{prefix}{i}"], idx,
                      dE[..., off:off + d].reshape(-1, d))
            off += d

    # -- attention sublayer ------------------------------------------------
    def _mha_fwd(self, q_in, kv_in, pfx, a, mask):
        p = self.params
        n, lq, H = q_in.shape
        lk = kv_in.shape[1]
        hd, dh = self.heads, H // self.heads
        q = q_in @ p[f"{pfx}_{a}_Wq"] + p[f"{pfx}_{a}_bq"]
        k = kv_in @ p[f"{pfx}_{a}_Wk"] + p[f"{pfx}_{a}_bk"]
        v = kv_in @ p[f"{pfx}_{a}_Wv"] + p[f"{pfx}_{a}_bv"]
        qh = q.reshape(n, lq, hd, dh).transpose(0, 2, 1, 3)
        kh = k.reshape(n, lk, hd, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(n, lk, hd, dh).transpose(0, 2, 1, 3)
        logits = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(dh)
        if mask is not None:
            logits = np.where(mask[None, None, :, :], logits, -1e9)
        m = logits.max(axis=-1, keepdims=True)
        e = np.exp(logits - m)
        att = e / e.sum(axis=-1, keepdims=True)            # [n,hd,lq,lk]
        ctx = (att @ vh).transpose(0, 2, 1, 3).reshape(n, lq, H)
        out = ctx @ p[f"{pfx}_{a}_Wo"] + p[f"{pfx}_{a}_bo"]
        return out, (q_in, kv_in, qh, kh, vh, att, ctx, mask)

    def _mha_bwd(self, dout, pfx, a, tape, g):
        p = self.params
        q_in, kv_in, qh, kh, vh, att, ctx, mask = tape
        n, lq, H = q_in.shape
        lk = kv_in.shape[1]
        hd, dh = self.heads, H // self.heads
        g[f"{pfx}_{a}_Wo"] += np.einsum("nlh,nlo->ho", ctx, dout)
        g[f"{pfx}_{a}_bo"] += dout.sum(axis=(0, 1))
        dctx = (dout @ p[f"{pfx}_{a}_Wo"].T) \
            .reshape(n, lq, hd, dh).transpose(0, 2, 1, 3)
        datt = dctx @ vh.transpose(0, 1, 3, 2)             # [n,hd,lq,lk]
        dvh = att.transpose(0, 1, 3, 2) @ dctx
        dlogits = att * (datt - (datt * att).sum(axis=-1, keepdims=True))
        if mask is not None:
            dlogits = np.where(mask[None, None, :, :], dlogits, 0.0)
        dqh = dlogits @ kh / np.sqrt(dh)
        dkh = dlogits.transpose(0, 1, 3, 2) @ qh / np.sqrt(dh)
        dq = dqh.transpose(0, 2, 1, 3).reshape(n, lq, H)
        dk = dkh.transpose(0, 2, 1, 3).reshape(n, lk, H)
        dv = dvh.transpose(0, 2, 1, 3).reshape(n, lk, H)
        g[f"{pfx}_{a}_Wq"] += np.einsum("nlh,nlo->ho", q_in, dq)
        g[f"{pfx}_{a}_bq"] += dq.sum(axis=(0, 1))
        g[f"{pfx}_{a}_Wk"] += np.einsum("nlh,nlo->ho", kv_in, dk)
        g[f"{pfx}_{a}_bk"] += dk.sum(axis=(0, 1))
        g[f"{pfx}_{a}_Wv"] += np.einsum("nlh,nlo->ho", kv_in, dv)
        g[f"{pfx}_{a}_bv"] += dv.sum(axis=(0, 1))
        dq_in = dq @ p[f"{pfx}_{a}_Wq"].T
        dkv_in = dk @ p[f"{pfx}_{a}_Wk"].T + dv @ p[f"{pfx}_{a}_Wv"].T
        return dq_in, dkv_in

    # -- residual + LN sublayer wrappers -----------------------------------
    def _sub_fwd(self, x, sub_out, pfx, k):
        p = self.params
        y, ln_tape = _layernorm_fwd(x + sub_out, p[f"{pfx}_g{k}"],
                                    p[f"{pfx}_be{k}"])
        return y, ln_tape

    def _sub_bwd(self, dy, pfx, k, ln_tape, g):
        dx, dgamma, dbeta = _layernorm_bwd(dy, self.params[f"{pfx}_g{k}"],
                                           ln_tape)
        g[f"{pfx}_g{k}"] += dgamma
        g[f"{pfx}_be{k}"] += dbeta
        return dx   # same grad flows to x and to sub_out

    def _ff_fwd(self, x, pfx):
        p = self.params
        pre = x @ p[f"{pfx}_W1"] + p[f"{pfx}_b1"]
        relu = np.maximum(pre, 0.0)
        out = relu @ p[f"{pfx}_W2"] + p[f"{pfx}_b2"]
        return out, (x, pre, relu)

    def _ff_bwd(self, dout, pfx, tape, g):
        p = self.params
        x, pre, relu = tape
        g[f"{pfx}_W2"] += np.einsum("nlh,nlo->ho", relu, dout)
        g[f"{pfx}_b2"] += dout.sum(axis=(0, 1))
        drelu = dout @ p[f"{pfx}_W2"].T
        dpre = drelu * (pre > 0)
        g[f"{pfx}_W1"] += np.einsum("nlh,nlo->ho", x, dpre)
        g[f"{pfx}_b1"] += dpre.sum(axis=(0, 1))
        return dpre @ p[f"{pfx}_W1"].T

    # -- forward -----------------------------------------------------------
    def _forward(self, seq_cat, seq_cont, non_seq_cat, non_seq_cont):
        p = self.params
        N, T, H = seq_cat.shape[0], self.seq_len, self.h
        scale = np.sqrt(float(H))

        E = np.concatenate(
            [self._embed(seq_cat, "emb_s", self.seq_emb_dims, self.seq_vocab),
             seq_cont.astype(np.float64)], axis=-1)        # [N,T,F]
        seq_inp = E @ p["W_in"] + p["b_in"]                # [N,T,H]
        prof = None
        if self.has_prof:
            prof = np.concatenate(
                [self._embed(non_seq_cat, "emb_n", self.non_seq_emb_dims,
                             self.non_seq_vocab),
                 non_seq_cont.astype(np.float64)], axis=-1)  # [N,P]
            prof_inp = prof @ p["W_pin"] + p["b_pin"]       # [N,H]
            src_inp = np.concatenate([seq_inp, prof_inp[:, None, :]], axis=1)
        else:
            src_inp = seq_inp                               # [N,S,H]
        S = self.S

        tape: dict = {"E": E, "prof": prof, "src_inp": src_inp}

        # ---- encoder blocks
        x = src_inp * scale + p["pos_enc"][None, :S, :]
        enc_tapes = []
        for li in range(self.n_enc):
            pfx = f"enc{li}"
            a_out, a_tape = self._mha_fwd(x, x, pfx, "s", mask=None)
            x1, ln0 = self._sub_fwd(x, a_out, pfx, 0)
            f_out, f_tape = self._ff_fwd(x1, pfx)
            x, ln1 = self._sub_fwd(x1, f_out, pfx, 1)
            enc_tapes.append((a_tape, ln0, f_tape, ln1))
        enc_src = x
        tape["enc_tapes"], tape["enc_src"] = enc_tapes, enc_src

        # ---- teacher-forced decoder input (model_wrapper.py:237)
        trg_inp = np.concatenate(
            [np.zeros((N, 1, H)), src_inp[:, :-1, :]], axis=1)
        tape["trg_inp"] = trg_inp
        y = trg_inp * scale + p["pos_dec"][None, :S, :]
        causal = np.tril(np.ones((S, S), dtype=bool))
        dec_tapes = []
        for li in range(self.n_dec):
            pfx = f"dec{li}"
            a_out, sa_tape = self._mha_fwd(y, y, pfx, "s", mask=causal)
            y1, ln0 = self._sub_fwd(y, a_out, pfx, 0)
            c_out, ca_tape = self._mha_fwd(y1, enc_src, pfx, "c", mask=None)
            y2, ln1 = self._sub_fwd(y1, c_out, pfx, 1)
            f_out, f_tape = self._ff_fwd(y2, pfx)
            y, ln2 = self._sub_fwd(y2, f_out, pfx, 2)
            dec_tapes.append((sa_tape, ln0, ca_tape, ln1, f_tape, ln2))
        tape["dec_tapes"], tape["dec_out"] = dec_tapes, y

        # ---- output heads (model_wrapper.py:319-360)
        dseq = y[:, :-1, :] if self.has_prof else y        # [N,T,H]
        dnon = y[:, -1, :] if self.has_prof else None      # [N,H]
        tape["dseq"], tape["dnon"] = dseq, dnon
        losses = []
        if self.n_seq_cont:
            cont_hat = dseq @ p["W_oc"] + p["b_oc"]
            l, dl = _mse_loss_grad(cont_hat, seq_cont.astype(np.float64))
            losses.append(l)
            tape["d_oc"] = dl
        seq_cat_dl = []
        for i in range(len(self.seq_vocab)):
            logits = dseq @ p[f"W_os{i}"] + p[f"b_os{i}"]
            l, dl = _ce_loss_grad(logits, seq_cat[:, :, i])
            losses.append(l)
            seq_cat_dl.append(dl)
        tape["seq_cat_dl"] = seq_cat_dl
        if self.has_prof and self.n_non_seq_cont:
            nc_hat = dnon @ p["W_nc"] + p["b_nc"]
            l, dl = _mse_loss_grad(nc_hat, non_seq_cont.astype(np.float64))
            losses.append(l)
            tape["d_nc"] = dl
        nn_dl = []
        if self.has_prof:
            for j in range(len(self.non_seq_vocab)):
                logits = dnon @ p[f"W_nn{j}"] + p[f"b_nn{j}"]
                l, dl = _ce_loss_grad(logits, non_seq_cat[:, j])
                losses.append(l)
                nn_dl.append(dl)
        tape["nn_dl"] = nn_dl
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
        N, T, H, S = seq_cat.shape[0], self.seq_len, self.h, self.S
        scale = np.sqrt(float(H))
        dseq, dnon = tp["dseq"], tp["dnon"]

        # heads -> grad wrt decoder output positions
        dd_seq = np.zeros_like(dseq)
        if self.n_seq_cont:
            g["W_oc"] += np.einsum("nth,ntf->hf", dseq, tp["d_oc"])
            g["b_oc"] += tp["d_oc"].sum(axis=(0, 1))
            dd_seq += tp["d_oc"] @ p["W_oc"].T
        for i, dl in enumerate(tp["seq_cat_dl"]):
            g[f"W_os{i}"] += np.einsum("nth,ntv->hv", dseq, dl)
            g[f"b_os{i}"] += dl.sum(axis=(0, 1))
            dd_seq += dl @ p[f"W_os{i}"].T
        dy = np.zeros((N, S, H))
        if self.has_prof:
            dy[:, :-1, :] = dd_seq
            dd_non = np.zeros_like(dnon)
            if self.n_non_seq_cont:
                g["W_nc"] += dnon.T @ tp["d_nc"]
                g["b_nc"] += tp["d_nc"].sum(axis=0)
                dd_non += tp["d_nc"] @ p["W_nc"].T
            for j, dl in enumerate(tp["nn_dl"]):
                g[f"W_nn{j}"] += dnon.T @ dl
                g[f"b_nn{j}"] += dl.sum(axis=0)
                dd_non += dl @ p[f"W_nn{j}"].T
            dy[:, -1, :] = dd_non
        else:
            dy = dd_seq

        # ---- decoder blocks backward
        denc_src = np.zeros_like(tp["enc_src"])
        for li in range(self.n_dec - 1, -1, -1):
            pfx = f"dec{li}"
            sa_tape, ln0, ca_tape, ln1, f_tape, ln2 = tp["dec_tapes"][li]
            d2 = self._sub_bwd(dy, pfx, 2, ln2, g)          # -> y2 + ff_out
            dy2 = d2 + self._ff_bwd(d2, pfx, f_tape, g)
            d1 = self._sub_bwd(dy2, pfx, 1, ln1, g)         # -> y1 + cross
            dq, dkv = self._mha_bwd(d1, pfx, "c", ca_tape, g)
            denc_src += dkv
            dy1 = d1 + dq
            d0 = self._sub_bwd(dy1, pfx, 0, ln0, g)         # -> y + self
            dq, dkv = self._mha_bwd(d0, pfx, "s", sa_tape, g)
            dy = d0 + dq + dkv

        # entry transform: y0 = trg_inp*scale + pos_dec
        g["pos_dec"][:S] += dy.sum(axis=0)
        dtrg_inp = dy * scale
        # teacher shift: trg_inp[:,1:] = src_inp[:,:-1]
        dsrc_inp = np.zeros((N, S, H))
        dsrc_inp[:, :-1, :] += dtrg_inp[:, 1:, :]

        # ---- encoder blocks backward
        dx = denc_src
        for li in range(self.n_enc - 1, -1, -1):
            pfx = f"enc{li}"
            a_tape, ln0, f_tape, ln1 = tp["enc_tapes"][li]
            d1 = self._sub_bwd(dx, pfx, 1, ln1, g)
            dx1 = d1 + self._ff_bwd(d1, pfx, f_tape, g)
            d0 = self._sub_bwd(dx1, pfx, 0, ln0, g)
            dq, dkv = self._mha_bwd(d0, pfx, "s", a_tape, g)
            dx = d0 + dq + dkv
        g["pos_enc"][:S] += dx.sum(axis=0)
        dsrc_inp += dx * scale

        # ---- input projections + embeddings
        E, prof = tp["E"], tp["prof"]
        if self.has_prof:
            dseq_inp = dsrc_inp[:, :T, :]
            dprof_inp = dsrc_inp[:, T, :]
            g["W_pin"] += prof.T @ dprof_inp
            g["b_pin"] += dprof_inp.sum(axis=0)
            dprof = dprof_inp @ p["W_pin"].T
            self._embed_grad(non_seq_cat, dprof, "emb_n",
                             self.non_seq_emb_dims, self.non_seq_vocab, g)
        else:
            dseq_inp = dsrc_inp
        g["W_in"] += np.einsum("ntf,nth->fh", E, dseq_inp)
        g["b_in"] += dseq_inp.sum(axis=(0, 1))
        dE = dseq_inp @ p["W_in"].T
        n_emb = int(sum(self.seq_emb_dims))
        if n_emb:
            self._embed_grad(seq_cat, dE[..., :n_emb], "emb_s",
                             self.seq_emb_dims, self.seq_vocab, g)
        return loss, g

    # -- scoring surface ----------------------------------------------------
    def encode(self, seq_cat, seq_cont, non_seq_cat, non_seq_cont):
        """Flattened encoder states [N, S·H] — the transformer embedding
        convention the reference scorer uses (caspr/utils/score.py:53-61)."""
        _, tp = self._forward(seq_cat, seq_cont, non_seq_cat, non_seq_cont)
        enc = tp["enc_src"]
        return enc.reshape(enc.shape[0], -1)

    def reconstruct_cont(self, bundle: TensorBundle) -> np.ndarray:
        _, tp = self._forward(bundle.seq_cat, bundle.seq_cont,
                              bundle.non_seq_cat, bundle.non_seq_cont)
        return tp["dseq"] @ self.params["W_oc"] + self.params["b_oc"]

    def parameters(self):
        return [self.params[k] for k in sorted(self.params)]

    # -- persistence (S6 checkpoint sink) -----------------------------------
    def state_dict(self) -> dict[str, np.ndarray]:
        return dict(self.params)

    def save(self, path: str):
        np.savez(path, **self.params,
                 __meta__=np.array([self.seq_len, self.h, self.heads,
                                    self.n_enc, self.n_dec, self.pf]))

    def load_state(self, state: dict[str, np.ndarray]):
        for k in self.params:
            self.params[k] = np.asarray(state[k], dtype=np.float64)


def fit_transformer_autoencoder(
        bundle: TensorBundle, hid_dim: int = 32, n_heads: int = 4,
        n_enc_layers: int = 1, n_dec_layers: int = 1, pf_dim: int = 64,
        epochs: int = 50, lr: float = 1e-3, batch_size: int = 256,
        warmup_epochs: int = 5, patience: int = 8, min_delta: float = 1e-5,
        seed: int = 42, val_bundle: TensorBundle | None = None,
        checkpoint_path: str | None = None):
    """Minibatch Adam over the transformer AE's multi-criterion loss —
    the same training-loop semantics as ``fit_autoencoder`` (Adam +
    linear warmup + early stopping with best-state restore, mirroring
    caspr/utils/train.py:133-176) applied to the reference's second
    autoencoder architecture."""
    from caspr_spark.models.factory import embedding_dim

    seq_vocab = [max(int(bundle.seq_cat[..., i].max()) + 1, 2)
                 for i in range(bundle.seq_cat.shape[-1])]
    non_seq_vocab = [max(int(bundle.non_seq_cat[:, j].max()) + 1, 2)
                     for j in range(bundle.non_seq_cat.shape[-1])]
    model = TransformerSequenceAutoencoder(
        seq_vocab, [embedding_dim(v) for v in seq_vocab],
        bundle.seq_cont.shape[-1],
        non_seq_vocab, [embedding_dim(v) for v in non_seq_vocab],
        bundle.non_seq_cont.shape[-1],
        seq_len=bundle.seq_cat.shape[1] or bundle.seq_cont.shape[1],
        hid_dim=hid_dim, n_heads=n_heads, n_enc_layers=n_enc_layers,
        n_dec_layers=n_dec_layers, pf_dim=pf_dim, seed=seed)
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
