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
