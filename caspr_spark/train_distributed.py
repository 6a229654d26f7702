"""Distributed-training semantics: allreduce data pass, consensus stop,
and a TorchDistributor scaffold gated on torch's presence.

Reference: ``caspr/utils/spark/large/train.py:114-183`` and
``caspr/utils/horovod/train.py:30-170`` — the semantics are

1. **lr × world_size** (large/train.py:134): synchronous data-parallel
   training multiplies the effective batch by the worker count; the
   linear-scaling rule compensates.
2. **Broadcast initial parameters** (large/train.py:137) so every worker
   starts from the same point.
3. **Allreduce** gradients/metrics (horovod/train.py:31 —
   ``metric_average``), weighted here by shard row counts so unequal
   shards still reproduce the global objective exactly.
4. **Root-rank early-stop consensus** (horovod/train.py:44 — the stop
   decision is taken once on the allreduced loss and broadcast, so no
   worker leaves the collective early and deadlocks the rest).

This container has no torch, so the file provides the semantics at two
levels: :func:`fit_linear_autoencoder_ddp` runs REAL data-parallel
training — per-shard Gram matrices from one distributed aggregation,
weighted allreduce on the driver, consensus early stop — and is tested
for exact parity with the single-process fit;
:func:`fit_torch_distributed` wires the same choices into
``pyspark.ml.torch.distributor.TorchDistributor`` behind a lazy import
and raises with guidance until torch exists.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from caspr_spark.train import (EarlyStopping, LinearAutoencoder, scale_lr,
                               warmup_lr)

ROOT_RANK = 0  # large/train.py:49


class DistributedEarlyStopping:
    """Consensus early stopping (horovod/train.py:36-52).

    Every rank feeds the same allreduced loss; only the root's stopper
    state decides, and the decision is "broadcast" (returned to every
    caller) so all ranks stop at the same epoch. In-process the broadcast
    is trivial, but the contract — one decision, taken on the averaged
    loss, applied everywhere — is what prevents the distributed deadlock.
    """

    def __init__(self, patience: int = 8, min_delta: float = 1e-5):
        self._root = EarlyStopping(patience=patience, min_delta=min_delta)

    def step_all(self, allreduced_loss: float, epoch: int,
                 state: list[np.ndarray]) -> bool:
        stop = self._root.step(allreduced_loss, epoch, state)
        return stop  # same value delivered to every rank

    @property
    def best_state(self):
        return self._root.best_state


def allreduce_weighted(parts: list[tuple[np.ndarray, int]]) -> tuple[np.ndarray, int]:
    """Weighted allreduce: Σ contributions and Σ counts.

    Horovod's ``metric_average`` is an unweighted mean — correct only for
    equal shards; summing (value, count) pairs reproduces the exact
    global statistic for any sharding, which is what makes the DDP fit
    below bit-for-bit match the single-process objective.
    """
    total = sum(n for _, n in parts)
    acc = np.zeros_like(parts[0][0])
    for v, _ in parts:
        acc = acc + v
    return acc, total


def _sharded_gram(df: DataFrame, cols: list[str],
                  world_size: int) -> list[tuple[np.ndarray, int]]:
    """Per-worker partial ``XᵀX``: ONE distributed aggregation grouped by
    a deterministic shard id (what each DDP worker would compute over its
    own partition of the data). Still a single scan + one tiny shuffle of
    ``world_size`` partial rows."""
    d = len(cols)
    shard = F.pmod(F.xxhash64(*[F.col(c) for c in cols]),
                   F.lit(world_size)).alias("__shard")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(F.col(cols[i]) * F.col(cols[j]))
                        .alias(f"__g_{i}_{j}"))
    rows = (df.na.fill(0.0, subset=cols).select(shard, *cols)
              .groupBy("__shard").agg(*aggs).collect())
    parts = []
    for r in rows:
        G = np.zeros((d, d))
        for i in range(d):
            for j in range(i, d):
                G[i, j] = G[j, i] = float(r[f"__g_{i}_{j}"] or 0.0)
        parts.append((G, int(r["__n"])))
    return parts


def fit_linear_autoencoder_ddp(df: DataFrame, cols: list[str],
                               hidden_dim: int, world_size: int = 4,
                               epochs: int = 100, lr: float = 0.01,
                               warmup_epochs: int = 5, patience: int = 8,
                               min_delta: float = 1e-5, seed: int = 42):
    """Data-parallel twin of ``fit_linear_autoencoder``.

    Each of the ``world_size`` logical workers contributes its shard's
    Gram matrix (computed distributed, one pass); the weighted allreduce
    rebuilds the exact global ``C``, every worker starts from the same
    broadcast ``W`` (same seed), steps see the per-worker lr
    ``scale_lr(lr, world) / world`` — the linear-scaling rule followed by
    the gradient mean, which is why DDP training matches single-process
    training exactly for full-batch GD — and the stop decision comes
    from :class:`DistributedEarlyStopping` on the allreduced loss.

    Returns ``(LinearAutoencoder, loss_history)``; for any
    ``world_size`` the result equals the single-process fit up to float
    summation order (asserted by tests).
    """
    parts = _sharded_gram(df, cols, world_size)
    G, n = allreduce_weighted(parts)
    C = G / max(n, 1)
    d = len(cols)
    # identical normalization + schedule as the local loop
    eff_lr = scale_lr(lr, world_size) / world_size
    eff_lr = eff_lr / max(1.0, float(np.trace(C)))
    rng = np.random.default_rng(seed)          # broadcast init: same W on
    W = rng.normal(0, 0.1, size=(hidden_dim, d))   # every rank
    stopper = DistributedEarlyStopping(patience=patience, min_delta=min_delta)
    history: list[float] = []
    for epoch in range(epochs):
        P = W.T @ W
        R = np.eye(d) - P
        loss = float(np.trace(R @ C @ R.T))    # allreduced loss (exact C)
        history.append(loss)
        if stopper.step_all(loss, epoch, [W]):
            break
        M = C @ R.T + R @ C
        grad = -(W @ M)
        W = W - warmup_lr(eff_lr, epoch, warmup_epochs) * grad
    if stopper.best_state:
        W = stopper.best_state[0]
    return LinearAutoencoder(W=W), history


def fit_torch_distributed(train_fn=None, num_processes: int = 2,
                          local_mode: bool = True, use_gpu: bool = False,
                          **train_kwargs):
    """TorchDistributor entry point (gated): runs ``train_fn`` under
    ``pyspark.ml.torch.distributor.TorchDistributor`` with the reference
    semantics pre-wired into ``train_kwargs``:

    - ``train_kwargs['lr']`` is scaled by ``num_processes`` (the
      large/train.py:134 rule) before dispatch;
    - ``train_fn`` receives ``(rank-local) train_kwargs`` and must
      broadcast parameters from ``ROOT_RANK`` and take its stop decision
      from the allreduced loss — :class:`DistributedEarlyStopping` shows
      the exact contract.

    Raises ImportError with guidance while torch is absent; the wiring
    activates unchanged the moment it is installed.
    """
    try:
        import torch  # noqa: F401
        from pyspark.ml.torch.distributor import TorchDistributor
    except ImportError as exc:
        raise ImportError(
            "fit_torch_distributed needs the optional 'torch' package "
            "(TorchDistributor ships with pyspark but dispatches torch "
            "processes). Install torch to enable distributed deep "
            "training; fit_linear_autoencoder_ddp provides the same "
            "allreduce/consensus semantics torch-free.") from exc
    if train_fn is None:
        raise ValueError("train_fn is required")
    train_kwargs = dict(train_kwargs)
    if "lr" in train_kwargs:
        train_kwargs["lr"] = scale_lr(train_kwargs["lr"], num_processes)
    dist = TorchDistributor(num_processes=num_processes,
                            local_mode=local_mode, use_gpu=use_gpu)
    return dist.run(train_fn, **train_kwargs)
