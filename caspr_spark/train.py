"""Training — early stopping, LR schedules, and a distributed linear
autoencoder fit.

Torch-free but semantics-preserving (reference: caspr/utils/train.py,
caspr/utils/early_stopping.py, caspr/utils/spark/large/train.py):

- ``EarlyStopping``: patience / min-delta / best-weights restore
  (early_stopping.py:11-102, without its ``zip(model, path)`` save bug —
  SURVEY §7.3).
- ``warmup_lr``: linear warmup over ``warmup_epochs`` then flat, the
  ``LambdaLR`` ramp of train.py:120-130; ``scale_lr`` applies the
  ``lr × world_size`` linear-scaling rule (large/train.py:134).
- ``fit_linear_autoencoder``: trains ``x ≈ Wᵀ(Wx)`` at any scale with
  ONE distributed pass — the reconstruction loss and its gradient depend
  on the data only through the Gram matrix ``C = XᵀX / N`` (d×d), which
  a single Spark aggregation produces; gradient descent then runs
  driver-side on ``C``. That is exact full-batch GD, not an
  approximation, and replaces per-step allreduce (the Horovod pattern,
  large/train.py:141) with one shuffle-free pass for the linear family.

When torch is present, the same ``EarlyStopping``/schedule helpers drive
a torch loop unchanged — they only see floats.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class EarlyStopping:
    """Stop after ``patience`` epochs without ``min_delta`` improvement.

    With ``checkpoint_path`` (or the ``step`` kwarg), each improvement also
    persists the best state to disk — the torch-free twin of the
    reference's checkpoint sink (caspr/utils/early_stopping.py saves via
    ``torch.save`` on improvement; SURVEY S6): weights as ``.npz`` keyed
    ``p0..pN`` plus a sidecar ``.json`` of loss/epoch.
    """

    patience: int = 8
    min_delta: float = 1e-5
    best_loss: float = float("inf")
    counter: int = 0
    best_state: list = field(default_factory=list)
    stopped_epoch: int | None = None
    checkpoint_path: str | None = None

    def step(self, loss: float, epoch: int, state: list | None = None,
             checkpoint_path: str | None = None) -> bool:
        """Record one epoch; returns True when training should stop."""
        if loss < self.best_loss - self.min_delta:
            self.best_loss = loss
            self.counter = 0
            if state is not None:
                self.best_state = [np.copy(p) for p in state]
                path = checkpoint_path or self.checkpoint_path
                if path:
                    save_checkpoint(path, self.best_state, loss, epoch)
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.stopped_epoch = epoch
                return True
        return False


def save_checkpoint(path: str, state: list, loss: float, epoch: int) -> None:
    """Persist weights (npz) + metadata (json) — SURVEY S6 checkpoint sink."""
    import json

    np.savez(path if path.endswith(".npz") else path + ".npz",
             **{f"p{i}": np.asarray(w) for i, w in enumerate(state)})
    meta = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with open(meta, "w") as fh:
        json.dump({"best_loss": float(loss), "epoch": int(epoch)}, fh)


def load_checkpoint(path: str) -> tuple[list, dict]:
    """Restore ``(state, meta)`` written by :func:`save_checkpoint`."""
    import json

    npz = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz) as z:
        state = [z[f"p{i}"] for i in range(len(z.files))]
    meta_path = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with open(meta_path) as fh:
        meta = json.load(fh)
    return state, meta


def warmup_lr(base_lr: float, epoch: int, warmup_epochs: int = 5) -> float:
    """Linear warmup ramp, then flat (reference caspr/utils/train.py:120-130)."""
    if warmup_epochs <= 0 or epoch >= warmup_epochs:
        return base_lr
    return base_lr * (epoch + 1) / warmup_epochs


def scale_lr(base_lr: float, world_size: int) -> float:
    """``lr × world_size`` linear-scaling rule (large/train.py:134)."""
    return base_lr * world_size


def gram_matrix(df: DataFrame, cols: list[str]) -> tuple[np.ndarray, int]:
    """``(XᵀX, N)`` over ``cols`` in one distributed aggregation.

    The d(d+1)/2 upper-triangle products are plain column expressions, so
    the whole pass is a single shuffle-free partial+final aggregate —
    scan-bound at 100 TB.
    """
    d = len(cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(F.col(cols[i]) * F.col(cols[j])).alias(f"__g_{i}_{j}"))
    row = df.na.fill(0.0, subset=cols).agg(*aggs).collect()[0]
    G = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            G[i, j] = G[j, i] = float(row[f"__g_{i}_{j}"] or 0.0)
    return G, int(row["__n"])


@dataclass
class LinearAutoencoder:
    """``encode = W x``; ``decode = Wᵀ h``. W is [hidden, d]."""

    W: np.ndarray

    def encode_np(self, X: np.ndarray) -> np.ndarray:
        return X @ self.W.T

    def reconstruct(self, X: np.ndarray) -> np.ndarray:
        return X @ self.W.T @ self.W

    def parameters(self):
        return [self.W]


def fit_linear_autoencoder(df: DataFrame, cols: list[str], hidden_dim: int,
                           epochs: int = 100, lr: float = 0.01,
                           warmup_epochs: int = 5, patience: int = 8,
                           min_delta: float = 1e-5, seed: int = 42):
    """Distributed full-batch GD on the reconstruction loss.

    loss = tr(C) - 2·tr(W C Wᵀ) + tr(W C Wᵀ W Wᵀ)   with C = XᵀX/N
    grad = (-4 C Wᵀ + 2 C Wᵀ W Wᵀ + 2 W Wᵀ C Wᵀ)ᵀ / ... (computed below)

    Returns ``(LinearAutoencoder, loss_history)``.
    """
    G, n = gram_matrix(df, cols)
    C = G / max(n, 1)
    d = len(cols)
    # scale-invariant step: gradient magnitude grows with ||C|| (~ the top
    # eigenvalue), so normalize the learning rate by tr(C) ≥ λ_max to keep
    # full-batch GD stable regardless of the data's units
    lr = lr / max(1.0, float(np.trace(C)))
    rng = np.random.default_rng(seed)
    W = rng.normal(0, 0.1, size=(hidden_dim, d))
    stopper = EarlyStopping(patience=patience, min_delta=min_delta)
    history: list[float] = []
    for epoch in range(epochs):
        P = W.T @ W                       # d×d projector (small)
        R = np.eye(d) - P
        loss = float(np.trace(R @ C @ R.T))
        history.append(loss)
        if stopper.step(loss, epoch, [W]):
            break
        # d/dW tr((I-P) C (I-P)ᵀ) with P = WᵀW
        M = C @ R.T + R @ C
        grad = -(W @ M)
        W = W - warmup_lr(lr, epoch, warmup_epochs) * grad
    if stopper.best_state:
        W = stopper.best_state[0]
    return LinearAutoencoder(W=W), history
