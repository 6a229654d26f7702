"""Numpy-backprop transformer autoencoder (r4 verdict item 4).

The reference trains TWO autoencoder architectures end-to-end
(caspr/models/model_wrapper.py: LSTMAutoencoder :28-120 and
TransformerAutoEncoder :217-281); ``models/autoencoder.py`` covered the
recurrent one, this suite certifies the hand-derived backprop through
the full transformer encoder/decoder stack — masked multi-head
self-attention, cross-attention, affine post-norm LayerNorms,
positionwise FF, learned positional embeddings, teacher forcing, and
the OutputLayer position split."""

import numpy as np

from caspr_spark.data.tensorize import TensorBundle
from caspr_spark.models.transformer_ae import (
    TransformerSequenceAutoencoder, _layernorm_bwd, _layernorm_fwd,
    fit_transformer_autoencoder,
)


def _tiny_model_and_data(seed=0, has_prof=True, n_enc=1, n_dec=1):
    rng = np.random.default_rng(seed)
    N, T = 4, 3
    m = TransformerSequenceAutoencoder(
        seq_vocab=[4, 3], seq_emb_dims=[2, 2], n_seq_cont=2,
        non_seq_vocab=[3] if has_prof else [],
        non_seq_emb_dims=[2] if has_prof else [],
        n_non_seq_cont=2 if has_prof else 0,
        seq_len=T, hid_dim=8, n_heads=2, n_enc_layers=n_enc,
        n_dec_layers=n_dec, pf_dim=12, seed=1)
    data = (rng.integers(0, 3, size=(N, T, 2)),
            rng.normal(size=(N, T, 2)),
            rng.integers(0, 3, size=(N, 1 if has_prof else 0)),
            rng.normal(size=(N, 2 if has_prof else 0)))
    return m, data


def _num_grad(m, data, key, idx, eps=1e-6):
    flat = m.params[key].reshape(-1)
    keep = flat[idx]
    flat[idx] = keep + eps
    lp, _ = m._forward(*data)
    flat[idx] = keep - eps
    lm, _ = m._forward(*data)
    flat[idx] = keep
    return (lp - lm) / (2 * eps)


class TestLayerNorm:
    def test_ln_vjp_matches_numerical(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(3, 4, 6))
        gamma, beta = rng.normal(size=6) + 1.0, rng.normal(size=6)
        dy = rng.normal(size=x.shape)
        y, tape = _layernorm_fwd(x, gamma, beta)
        dx, dgamma, dbeta = _layernorm_bwd(dy, gamma, tape)
        eps = 1e-6
        for _ in range(8):
            i = tuple(rng.integers(0, s) for s in x.shape)
            keep = x[i]
            x[i] = keep + eps
            yp, _ = _layernorm_fwd(x, gamma, beta)
            x[i] = keep - eps
            ym, _ = _layernorm_fwd(x, gamma, beta)
            x[i] = keep
            num = ((yp - ym) * dy).sum() / (2 * eps)
            assert abs(num - dx[i]) < 1e-5 * max(1.0, abs(num))
        j = int(rng.integers(0, 6))
        keep = gamma[j]
        gamma[j] = keep + eps
        yp, _ = _layernorm_fwd(x, gamma, beta)
        gamma[j] = keep - eps
        ym, _ = _layernorm_fwd(x, gamma, beta)
        gamma[j] = keep
        num = ((yp - ym) * dy).sum() / (2 * eps)
        assert abs(num - dgamma[j]) < 1e-5 * max(1.0, abs(num))


class TestBackprop:
    def _check(self, m, data, n_per_param=4, tol=2e-4):
        _, grads = m.loss_and_grads(*data)
        rng = np.random.default_rng(42)
        worst = 0.0
        for k, W in m.params.items():
            flat = W.reshape(-1)
            for i in rng.choice(flat.size, size=min(n_per_param, flat.size),
                                replace=False):
                num = _num_grad(m, data, k, i)
                ana = grads[k].reshape(-1)[i]
                err = abs(num - ana) / max(1.0, abs(num), abs(ana))
                worst = max(worst, err)
                assert err < tol, (k, i, num, ana)
        return worst

    def test_gradients_match_numerical(self):
        m, data = _tiny_model_and_data()
        self._check(m, data)

    def test_gradients_no_profile_branch(self):
        m, data = _tiny_model_and_data(has_prof=False)
        self._check(m, data)

    def test_gradients_two_layer_stack(self):
        m, data = _tiny_model_and_data(n_enc=2, n_dec=2)
        self._check(m, data, n_per_param=2)

    def test_causal_mask_blocks_future(self):
        # position t of the decoder output must not depend on teacher
        # inputs at positions > t: perturbing the LAST sequential step's
        # continuous input cannot change the FIRST position's
        # reconstruction (teacher shift moves step t-1 into position t,
        # so position 0 sees only the zero vector + encoder states...
        # which DO see everything — so check the decoder self-attn path
        # in isolation by zeroing cross-attn value weights)
        m, (sc, scont, nsc, nscont) = _tiny_model_and_data()
        for li in range(m.n_dec):
            m.params[f"dec{li}_c_Wv"][:] = 0.0
            m.params[f"dec{li}_c_bv"][:] = 0.0
        _, tp = m._forward(sc, scont, nsc, nscont)
        base = tp["dec_out"][:, 0, :].copy()
        scont2 = scont.copy()
        scont2[:, -1, :] += 10.0
        _, tp2 = m._forward(sc, scont2, nsc, nscont)
        np.testing.assert_allclose(tp2["dec_out"][:, 0, :], base,
                                   rtol=0, atol=1e-12)

    def test_loss_decreases_training(self):
        rng = np.random.default_rng(7)
        n, t = 240, 4
        x = np.empty((n, t))
        x[:, 0] = rng.uniform(0.05, 0.95, n)
        for step in range(1, t):
            x[:, step] = 3.9 * x[:, step - 1] * (1 - x[:, step - 1])
        bundle = TensorBundle(
            seq_cat=(x[:, :, None] * 3).astype(np.int64).clip(0, 2),
            seq_cont=x[:, :, None].astype(np.float32),
            non_seq_cat=np.zeros((n, 0), np.int64),
            non_seq_cont=np.zeros((n, 0), np.float32),
            y=np.zeros((n, 0), np.float32))
        model, hist = fit_transformer_autoencoder(
            bundle, hid_dim=8, n_heads=2, epochs=12, lr=3e-3,
            batch_size=64, seed=3)
        assert min(hist) < hist[0] * 0.9
        emb = model.encode(bundle.seq_cat, bundle.seq_cont,
                           bundle.non_seq_cat, bundle.non_seq_cont)
        assert emb.shape == (n, model.S * model.h)
        assert emb.var(axis=0).mean() > 0

    def test_save_load_roundtrip(self, tmp_path):
        m, data = _tiny_model_and_data()
        l0, _ = m._forward(*data)
        path = str(tmp_path / "tae.npz")
        m.save(path)
        m2, _ = _tiny_model_and_data(seed=9)
        with np.load(path) as z:
            m2.load_state({k: z[k] for k in z.files if k != "__meta__"})
        l1, _ = m2._forward(*data)
        assert abs(l0 - l1) < 1e-12

    def test_forward_deterministic(self):
        m, data = _tiny_model_and_data()
        a, _ = m._forward(*data)
        b, _ = m._forward(*data)
        assert a == b
