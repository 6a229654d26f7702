"""Numpy-backprop teacher-forced autoencoder (SURVEY §2.11 training parity).

Covers the reference's training semantics — teacher-forced decode
(caspr/models/model_wrapper.py:182-187), multi-criterion Σ CE + MSE loss
(:110-119), Adam + warmup + early stopping (caspr/utils/train.py:133-176)
— via numerical gradient check, convergence, a beats-optimal-linear
comparison, and the S6 checkpoint round-trip."""

import json

import numpy as np
import pytest

from caspr_spark.data.tensorize import TensorBundle
from caspr_spark.models.autoencoder import (
    Adam, SequenceAutoencoder, fit_autoencoder,
)
from caspr_spark.train import EarlyStopping, load_checkpoint, save_checkpoint


def _tiny_model_and_data(seed=0):
    rng = np.random.default_rng(seed)
    N, T = 5, 4
    m = SequenceAutoencoder(seq_vocab=[4, 3], seq_emb_dims=[2, 2],
                            n_seq_cont=2, non_seq_vocab=[3],
                            non_seq_emb_dims=[2], n_non_seq_cont=2,
                            seq_len=T, hidden_dim=6, seed=1)
    data = (rng.integers(0, 3, size=(N, T, 2)),
            rng.normal(size=(N, T, 2)),
            rng.integers(0, 3, size=(N, 1)),
            rng.normal(size=(N, 2)))
    return m, data


def _logistic_bundle(n=600, t=6, seed=7):
    """Chaotic logistic-map sequences in [0,1]: near-full linear rank, but
    deterministic step-to-step dependence that teacher forcing exploits."""
    rng = np.random.default_rng(seed)
    x = np.empty((n, t))
    x[:, 0] = rng.uniform(0.05, 0.95, n)
    for step in range(1, t):
        x[:, step] = 3.9 * x[:, step - 1] * (1 - x[:, step - 1])
    return TensorBundle(
        seq_cat=(x[:, :, None] * 3).astype(np.int64).clip(0, 2),
        seq_cont=x[:, :, None].astype(np.float32),
        non_seq_cat=np.zeros((n, 0), np.int64),
        non_seq_cont=np.zeros((n, 0), np.float32),
        y=np.zeros((n, 0), np.float32))


class TestBackprop:
    def test_gradients_match_numerical(self):
        m, (sc, scont, nsc, nscont) = _tiny_model_and_data()
        _, grads = m.loss_and_grads(sc, scont, nsc, nscont)
        rng = np.random.default_rng(42)
        eps = 1e-6
        for k, W in m.params.items():
            flat = W.reshape(-1)
            for i in rng.choice(flat.size, size=min(6, flat.size),
                                replace=False):
                orig = flat[i]
                flat[i] = orig + eps
                lp, _ = m._forward(sc, scont, nsc, nscont)
                flat[i] = orig - eps
                lm, _ = m._forward(sc, scont, nsc, nscont)
                flat[i] = orig
                num = (lp - lm) / (2 * eps)
                ana = grads[k].reshape(-1)[i]
                rel = abs(num - ana) / max(1e-8, abs(num) + abs(ana))
                assert rel < 1e-4, f"{k}[{i}]: numerical {num} vs {ana}"

    def test_loss_components_all_present(self):
        """Σ CE per cat col + MSE per cont block — model_wrapper.py:110-119."""
        m, (sc, scont, nsc, nscont) = _tiny_model_and_data()
        loss, tape = m._forward(sc, scont, nsc, nscont)
        # 2 seq cat CE + seq cont MSE + non-seq cont MSE + 1 non-seq cat CE
        assert len(tape["seq_cat_dlogits"]) == 2
        assert len(tape["nn_dlogits"]) == 1
        assert "d_oc_pre" in tape and "d_nc" in tape
        assert loss > 0

    def test_forward_deterministic(self):
        m, (sc, scont, nsc, nscont) = _tiny_model_and_data()
        assert m.loss(TensorBundle(sc, scont, nsc, nscont,
                                   np.zeros((len(sc), 0)))) == pytest.approx(
            m.loss(TensorBundle(sc, scont, nsc, nscont,
                                np.zeros((len(sc), 0)))))


class TestTraining:
    def test_loss_decreases_and_embeddings_vary(self):
        b = _logistic_bundle()
        model, hist = fit_autoencoder(b, hidden_dim=8, epochs=60, lr=5e-3,
                                      batch_size=128, seed=3)
        assert min(hist) < hist[0] * 0.25
        H = model.encode(b.seq_cat, b.seq_cont, b.non_seq_cat, b.non_seq_cont)
        assert H.shape == (len(b), 8)
        assert H.var(axis=0).mean() > 1e-4

    def test_beats_optimal_linear_autoencoder(self):
        """Teacher-forced reconstruction beats the BEST rank-k linear AE
        (exact truncated SVD — an upper bound on LinearAutoencoder)."""
        b = _logistic_bundle()
        model, _ = fit_autoencoder(b, hidden_dim=8, epochs=60, lr=5e-3,
                                   batch_size=128, seed=3)
        recon = model.reconstruct_cont(b)
        mse_ae = float(((recon - b.seq_cont) ** 2).mean())

        flat = b.seq_cont.reshape(len(b), -1).astype(np.float64)
        _, s, vt = np.linalg.svd(flat, full_matrices=False)
        k = 3  # bottleneck strictly below the 6-dim sequence
        proj = vt[:k].T @ vt[:k]
        mse_lin = float(((flat @ proj - flat) ** 2).mean())
        assert mse_ae < mse_lin

    def test_seeded_reproducibility(self):
        b = _logistic_bundle(n=100)
        m1, h1 = fit_autoencoder(b, hidden_dim=4, epochs=5, seed=11)
        m2, h2 = fit_autoencoder(b, hidden_dim=4, epochs=5, seed=11)
        assert h1 == h2
        np.testing.assert_array_equal(m1.params["W_enc"], m2.params["W_enc"])

    def test_early_stopping_restores_best(self):
        b = _logistic_bundle(n=100)
        _, hist = fit_autoencoder(b, hidden_dim=4, epochs=200, lr=5e-3,
                                  patience=5, seed=3)
        assert len(hist) < 200 or min(hist) == pytest.approx(hist[-1],
                                                             abs=1e-3)


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        m, _ = _tiny_model_and_data()
        path = str(tmp_path / "ck")
        state = [m.params[k] for k in sorted(m.params)]
        save_checkpoint(path, state, loss=0.5, epoch=3)
        restored, meta = load_checkpoint(path)
        assert meta == {"best_loss": 0.5, "epoch": 3}
        for a, b in zip(state, restored):
            np.testing.assert_array_equal(a, b)

    def test_early_stopping_persists_on_improvement(self, tmp_path):
        path = str(tmp_path / "es")
        stop = EarlyStopping(patience=2, checkpoint_path=path)
        stop.step(1.0, 0, [np.ones(3)])
        stop.step(0.5, 1, [np.full(3, 2.0)])
        state, meta = load_checkpoint(path)
        np.testing.assert_array_equal(state[0], np.full(3, 2.0))
        assert meta["best_loss"] == 0.5 and meta["epoch"] == 1
        with open(path + ".json") as fh:
            assert json.load(fh)["epoch"] == 1

    def test_fit_checkpoint_and_model_restore(self, tmp_path):
        b = _logistic_bundle(n=100)
        path = str(tmp_path / "ae")
        model, hist = fit_autoencoder(b, hidden_dim=4, epochs=8, seed=3,
                                      checkpoint_path=path)
        state, meta = load_checkpoint(path)
        assert meta["best_loss"] == pytest.approx(min(hist))
        m2 = SequenceAutoencoder(
            model.seq_vocab, model.seq_emb_dims, model.n_seq_cont,
            model.non_seq_vocab, model.non_seq_emb_dims, model.n_non_seq_cont,
            model.seq_len, model.hidden_dim)
        m2.load_state({k: state[i] for i, k in enumerate(sorted(m2.params))})
        np.testing.assert_allclose(
            m2.encode(b.seq_cat, b.seq_cont, b.non_seq_cat, b.non_seq_cont),
            model.encode(b.seq_cat, b.seq_cont, b.non_seq_cat,
                         b.non_seq_cont))


class TestAdam:
    def test_adam_minimizes_quadratic(self):
        params = {"w": np.array([5.0, -3.0])}
        opt = Adam(params, lr=0.1)
        for _ in range(500):
            opt.step(params, {"w": 2 * params["w"]})
        np.testing.assert_allclose(params["w"], [0.0, 0.0], atol=1e-3)


class TestAttribution:
    """CASPRExplainer parity: grad×input / integrated gradients with
    per-cat-var summing and across-time aggregation
    (caspr/utils/explain/CASPRExplainer.py:138-158,196-240,258-280)."""

    def _model_bundle(self, seed=3):
        rng = np.random.default_rng(seed)
        N, T = 12, 4
        m = SequenceAutoencoder(seq_vocab=[4, 3], seq_emb_dims=[2, 2],
                                n_seq_cont=2, non_seq_vocab=[3],
                                non_seq_emb_dims=[2], n_non_seq_cont=2,
                                seq_len=T, hidden_dim=6, seed=1)
        b = TensorBundle(
            seq_cat=rng.integers(0, 3, size=(N, T, 2)),
            seq_cont=rng.normal(size=(N, T, 2)).astype(np.float32),
            non_seq_cat=rng.integers(0, 3, size=(N, 1)),
            non_seq_cont=rng.normal(size=(N, 2)).astype(np.float32),
            y=np.zeros((N, 0), np.float32),
            seq_cols=["etype", "estate", "val", "ts"],
            non_seq_cols=["segment", "age", "balance"])
        return m, b

    def test_vjp_matches_numerical_gradient(self):
        from caspr_spark.models.attribution import (
            _embed_inputs, _encode_embedded, _encode_vjp)
        m, b = self._model_bundle()
        E, prof = _embed_inputs(m, b.seq_cat, b.seq_cont,
                                b.non_seq_cat, b.non_seq_cont)
        k = 2
        _, dE, dprof = _encode_vjp(m, E, prof, k)
        eps = 1e-6
        rng = np.random.default_rng(0)
        for _ in range(8):
            n = int(rng.integers(E.shape[0]))
            t = int(rng.integers(E.shape[1]))
            f = int(rng.integers(E.shape[2]))
            Ep, Em = E.copy(), E.copy()
            Ep[n, t, f] += eps
            Em[n, t, f] -= eps
            num = (_encode_embedded(m, Ep, prof)[n, k]
                   - _encode_embedded(m, Em, prof)[n, k]) / (2 * eps)
            assert abs(num - dE[n, t, f]) < 1e-7

    def test_ig_completeness_axiom(self):
        from caspr_spark.models.attribution import integrated_gradients
        m, b = self._model_bundle()
        attr, delta = integrated_gradients(m, b, target_dim=1, steps=64)
        np.testing.assert_allclose(attr.sum(axis=1), delta,
                                   rtol=1e-4, atol=1e-6)

    def test_across_time_sums_match_flattened(self):
        from caspr_spark.models.attribution import (
            feature_names, gradient_x_input)
        m, b = self._model_bundle()
        agg = gradient_x_input(m, b, 0, add_across_time=True)
        flat = gradient_x_input(m, b, 0, add_across_time=False)
        names_a = feature_names(m, b, add_across_time=True)
        names_f = feature_names(m, b, add_across_time=False)
        assert agg.shape[1] == len(names_a) == 7        # 4 seq + 3 profile
        assert flat.shape[1] == len(names_f) == 4 * 4 + 3
        # each aggregated seq feature equals the sum of its per-step slots
        for j, name in enumerate(names_a[:4]):
            slots = [i for i, nm in enumerate(names_f) if nm.startswith(f"{name}_t")]
            assert len(slots) == 4
            np.testing.assert_allclose(agg[:, j], flat[:, slots].sum(axis=1),
                                       rtol=1e-10, atol=1e-12)
        # profile block identical in both layouts
        np.testing.assert_allclose(agg[:, 4:], flat[:, 16:], rtol=0, atol=0)

    def test_gxi_first_order_of_ig(self):
        """On a near-linear regime (tiny inputs) grad×input ≈ IG."""
        from caspr_spark.models.attribution import (
            gradient_x_input, integrated_gradients)
        m, b = self._model_bundle()
        b.seq_cont *= 0.001
        b.non_seq_cont *= 0.001
        for key in list(m.params):
            if key.startswith("emb_"):
                m.params[key] = m.params[key] * 0.001
        gxi = gradient_x_input(m, b, 0)
        ig, _ = integrated_gradients(m, b, 0, steps=64)
        np.testing.assert_allclose(gxi, ig, rtol=5e-2, atol=1e-9)

    def test_cat_summing_width(self):
        """Cat attributions collapse emb dims: width counts variables."""
        from caspr_spark.models.attribution import gradient_x_input
        m, b = self._model_bundle()
        attr = gradient_x_input(m, b, 0)
        # 2 seq cat vars + 2 seq cont + 1 non-seq cat + 2 non-seq cont = 7
        assert attr.shape == (12, 7)


class TestDeepLift:
    """DeepLift Rescale over the tanh encoder: exact completeness and
    agreement with IG in the many-step limit."""

    def _model_bundle(self):
        return TestAttribution._model_bundle(TestAttribution())

    def test_exact_completeness(self):
        from caspr_spark.models.attribution import deeplift
        m, b = self._model_bundle()
        for k in (0, 1, 3):
            attr, delta = deeplift(m, b, target_dim=k)
            # Rescale completeness is exact, not quadrature-approximate
            np.testing.assert_allclose(attr.sum(axis=1), delta,
                                       rtol=1e-12, atol=1e-12)

    def test_converges_to_ig(self):
        """For a single nonlinearity both methods integrate the same path:
        DeepLift's secant slope == IG's averaged gradient in the limit."""
        from caspr_spark.models.attribution import (deeplift,
                                                    integrated_gradients)
        m, b = self._model_bundle()
        dl, _ = deeplift(m, b, target_dim=0)
        ig, _ = integrated_gradients(m, b, target_dim=0, steps=2048)
        np.testing.assert_allclose(dl, ig, rtol=1e-3, atol=1e-6)

    def test_zero_input_zero_attr(self):
        from caspr_spark.models.attribution import deeplift
        m, b = self._model_bundle()
        b.seq_cat *= 0
        b.seq_cont *= 0.0
        b.non_seq_cat *= 0
        b.non_seq_cont *= 0.0
        # zero-embedding rows ARE the baseline -> every attribution 0
        m.params = {k: (v * 0 if k.startswith("emb_") and False else v)
                    for k, v in m.params.items()}
        for k in list(m.params):
            if k.startswith("emb_"):
                m.params[k] = np.zeros_like(m.params[k])
        attr, delta = deeplift(m, b, target_dim=2)
        np.testing.assert_allclose(attr, 0.0, atol=1e-15)
        np.testing.assert_allclose(delta, 0.0, atol=1e-15)


class TestLstmEncoderBackprop:
    """encoder='lstm': full BPTT through the gate recurrence — the
    reference LSTMAutoencoder's actual encoder family, gradcheck'd."""

    def _model_and_data(self, seed=0):
        rng = np.random.default_rng(seed)
        N, T = 4, 3
        m = SequenceAutoencoder(seq_vocab=[4, 3], seq_emb_dims=[2, 2],
                                n_seq_cont=2, non_seq_vocab=[3],
                                non_seq_emb_dims=[2], n_non_seq_cont=2,
                                seq_len=T, hidden_dim=5, seed=1,
                                encoder="lstm")
        data = (rng.integers(0, 3, size=(N, T, 2)),
                rng.normal(size=(N, T, 2)),
                rng.integers(0, 3, size=(N, 1)),
                rng.normal(size=(N, 2)))
        return m, data

    def test_gradients_match_numerical(self):
        m, data = self._model_and_data()
        _, grads = m.loss_and_grads(*data)
        rng = np.random.default_rng(42)
        eps = 1e-6
        for k, W in m.params.items():
            flat = W.reshape(-1)
            for i in rng.choice(flat.size, size=min(5, flat.size),
                                replace=False):
                keep = flat[i]
                flat[i] = keep + eps
                lp, _ = m._forward(*data)
                flat[i] = keep - eps
                lm, _ = m._forward(*data)
                flat[i] = keep
                num = (lp - lm) / (2 * eps)
                ana = grads[k].reshape(-1)[i]
                assert abs(num - ana) < 2e-4 * max(1.0, abs(num), abs(ana)), \
                    (k, i, num, ana)

    def test_lstm_params_present_and_used(self):
        m, data = self._model_and_data()
        assert {"We", "Ue", "be"} <= set(m.params)
        _, grads = m.loss_and_grads(*data)
        assert np.abs(grads["We"]).sum() > 0
        assert np.abs(grads["Ue"]).sum() > 0

    def test_training_decreases_loss(self):
        from caspr_spark.models.autoencoder import fit_autoencoder
        rng = np.random.default_rng(7)
        n, t = 200, 4
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
        model, hist = fit_autoencoder(bundle, hidden_dim=8, epochs=12,
                                      lr=3e-3, batch_size=64, seed=3,
                                      encoder="lstm")
        assert min(hist) < hist[0] * 0.9
        emb = model.encode(bundle.seq_cat, bundle.seq_cont,
                           bundle.non_seq_cat, bundle.non_seq_cont)
        assert emb.shape == (n, 8) and emb.var(axis=0).mean() > 0

    def test_encoder_validation(self):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="encoder"):
            SequenceAutoencoder([2], [2], 1, [], [], 0, seq_len=3,
                                encoder="gru")


class TestUnifiedAttentionEncoderBackprop:
    """encoder='lstm_attention': Bahdanau-pooled LSTM encoder — the
    reference's DEFAULT UnifiedEncoder config
    (caspr/models/unified_encoder.py:25-282) — trained end-to-end: the
    attention VJP composes with the gate BPTT, gradcheck'd per
    parameter."""

    def _model_and_data(self, seed=0):
        rng = np.random.default_rng(seed)
        N, T = 5, 4
        m = SequenceAutoencoder(seq_vocab=[4, 3], seq_emb_dims=[2, 2],
                                n_seq_cont=2, non_seq_vocab=[3],
                                non_seq_emb_dims=[2], n_non_seq_cont=2,
                                seq_len=T, hidden_dim=5, seed=1,
                                encoder="lstm_attention")
        data = (rng.integers(0, 3, size=(N, T, 2)),
                rng.normal(size=(N, T, 2)),
                rng.integers(0, 3, size=(N, 1)),
                rng.normal(size=(N, 2)))
        return m, data

    def test_gradients_match_numerical(self):
        m, data = self._model_and_data()
        _, grads = m.loss_and_grads(*data)
        rng = np.random.default_rng(42)
        # eps 1e-5, not 1e-6: the attention-path gradients are small
        # (~1e-5) relative to the loss, so the 1e-6 central difference
        # is cancellation-noise-bound; at 1e-5 the check is sharp
        eps = 1e-5
        for k, W in m.params.items():
            flat = W.reshape(-1)
            for i in rng.choice(flat.size, size=min(5, flat.size),
                                replace=False):
                keep = flat[i]
                flat[i] = keep + eps
                lp, _ = m._forward(*data)
                flat[i] = keep - eps
                lm, _ = m._forward(*data)
                flat[i] = keep
                num = (lp - lm) / (2 * eps)
                ana = grads[k].reshape(-1)[i]
                assert abs(num - ana) < 2e-4 * max(1.0, abs(num), abs(ana)), \
                    (k, i, num, ana)

    def test_attention_params_present_and_used(self):
        m, data = self._model_and_data()
        assert {"We", "Ue", "be", "Wa", "va", "vb"} <= set(m.params)
        _, grads = m.loss_and_grads(*data)
        for k in ("Wa", "va", "We", "Ue"):
            assert np.abs(grads[k]).sum() > 0, k

    def test_pooling_differs_from_last_state(self):
        """The context is a softmax mix over ALL states — with shared
        seed/weights the embedding must differ from the plain-LSTM
        last-state embedding (same LSTM weights, different pooling)."""
        m_att, data = self._model_and_data()
        m_last = SequenceAutoencoder(seq_vocab=[4, 3], seq_emb_dims=[2, 2],
                                     n_seq_cont=2, non_seq_vocab=[3],
                                     non_seq_emb_dims=[2], n_non_seq_cont=2,
                                     seq_len=4, hidden_dim=5, seed=1,
                                     encoder="lstm")
        for k in m_last.params:            # identical shared weights
            m_att.params[k] = m_last.params[k].copy()
        e_att = m_att.encode(*data)
        e_last = m_last.encode(*data)
        assert not np.allclose(e_att, e_last)

    def test_every_step_carries_gradient(self):
        """Attention pooling feeds gradient to EVERY hidden state: the
        input-embedding gradient must be nonzero at every time step
        (last-state pooling leaves early steps only the recurrence
        path; attention adds a direct path per step)."""
        m, data = self._model_and_data()
        _, grads = m.loss_and_grads(*data)
        g_emb = grads["emb_s0"]
        assert np.abs(g_emb).sum() > 0

    def test_training_decreases_loss(self):
        from caspr_spark.models.autoencoder import fit_autoencoder
        rng = np.random.default_rng(7)
        n, t = 200, 4
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
        model, hist = fit_autoencoder(bundle, hidden_dim=8, epochs=12,
                                      lr=3e-3, batch_size=64, seed=3,
                                      encoder="lstm_attention")
        assert min(hist) < hist[0] * 0.9
        emb = model.encode(bundle.seq_cat, bundle.seq_cont,
                           bundle.non_seq_cat, bundle.non_seq_cont)
        assert emb.shape == (n, 8) and emb.var(axis=0).mean() > 0
