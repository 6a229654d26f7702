"""DEC — deep embedded clustering (Xie/Girshick/Farhadi, ICML'16) without
torch.

Reference: ``ClusterAssignment``/``DEC`` (caspr/models/dec.py:10-119) and
the KMeans init + accuracy utilities (caspr/utils/segmentation/
dec_utils.py:9-66). The student-t soft assignment and the target
distribution are closed-form given centroids, so the *scoring* side is
pure Spark column expressions — map-only over the embeddings, one tiny
global aggregate for the target distribution's cluster frequencies —
and is exactly recomputable by a SQL oracle. The *training* side
(centroid updates under the KL objective) is an iterative numpy loop on
the driver, mirroring the reference's single-node torch loop; the
gradient is the DEC paper's closed form, verified against numerical
differentiation in tests.

Scale shape: ``soft_assignment`` adds k map-side expressions per row (no
shuffle, no UDF); ``target_distribution`` adds one single-row aggregate
broadcast back with a cross join. At 100 TB both are scan-bound.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Spark-side closed-form scoring
# --------------------------------------------------------------------------

def xavier_centers(k: int, dim: int, seed: int = 42) -> np.ndarray:
    """Xavier-uniform initial centroids — ``ClusterAssignment.__init__``'s
    default when no centers are given (caspr/models/dec.py:31-37)."""
    a = float(np.sqrt(6.0 / (k + dim)))
    return np.random.default_rng(seed).uniform(-a, a, size=(k, dim))


def _norm_sq(vec_col, center: np.ndarray):
    """Σ_d (x_d - c_d)² as a left-fold so SQL oracles can match the
    floating-point addition order exactly."""
    lit = F.array(*[F.lit(float(v)) for v in center])
    diffs = F.zip_with(F.col(vec_col).cast("array<double>"), lit,
                       lambda x, c: (x - c) * (x - c))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def soft_assignment(df: DataFrame, vec_col: str, centers: np.ndarray,
                    alpha: float = 1.0, prefix: str = "q") -> DataFrame:
    """Student-t soft assignment q_ij (caspr/models/dec.py:42-57):

        q_ij = (1 + ||z_i - mu_j||^2 / alpha)^-((alpha+1)/2) / Z_i

    One column per cluster, all map-side expressions."""
    k = len(centers)
    power = (alpha + 1.0) / 2.0
    nums = [F.pow(1.0 / (1.0 + _norm_sq(vec_col, centers[j]) / alpha), power)
            for j in range(k)]
    total = nums[0]
    for expr in nums[1:]:
        total = total + expr
    out = df
    for j in range(k):
        out = out.withColumn(f"{prefix}{j}", nums[j] / total)
    return out


def target_distribution(df: DataFrame, k: int, prefix: str = "q",
                        out_prefix: str = "p",
                        int_sum_scale: int | None = None) -> DataFrame:
    """Auxiliary target p_ij (caspr/models/dec.py:107-119, Eq. 3):

        p_ij = (q_ij^2 / f_j) / Σ_j' (q_ij'^2 / f_j'),   f_j = Σ_i q_ij

    The f_j vector is one single-row aggregate, broadcast back via a
    cross join — the only non-map step, and it carries k doubles.

    ``int_sum_scale`` makes f_j partition-order independent: q is scaled,
    rounded to a long, and summed as integers (exact, associative), then
    divided back. With q pre-rounded to 6dp and scale=10**6 the sum is
    bit-identical on any engine and any row order — use it whenever the
    result feeds a hash-compared oracle at scale."""
    if int_sum_scale:
        freqs = df.agg(*[
            (F.sum(F.round(F.col(f"{prefix}{j}") * int_sum_scale)
                   .cast("long")).cast("double") / float(int_sum_scale))
            .alias(f"__f{j}") for j in range(k)])
    else:
        freqs = df.agg(*[F.sum(f"{prefix}{j}").alias(f"__f{j}")
                         for j in range(k)])
    out = df.crossJoin(F.broadcast(freqs))
    # q*q rather than pow(q, 2) so a SQL oracle can reproduce it bit-for-bit
    weights = [F.col(f"{prefix}{j}") * F.col(f"{prefix}{j}")
               / F.col(f"__f{j}") for j in range(k)]
    total = weights[0]
    for expr in weights[1:]:
        total = total + expr
    for j in range(k):
        out = out.withColumn(f"{out_prefix}{j}", weights[j] / total)
    return out.drop(*[f"__f{j}" for j in range(k)])


def hard_assignment(df: DataFrame, k: int, prefix: str = "q",
                    out_col: str = "cluster") -> DataFrame:
    """argmax_j q_ij (dec_utils.py:91 ``max(1)[1]``); ties -> lowest j."""
    best = F.greatest(*[F.col(f"{prefix}{j}") for j in range(k)])
    expr = F.lit(k - 1)
    for j in range(k - 2, -1, -1):
        expr = F.when(F.col(f"{prefix}{j}") == best, j).otherwise(expr)
    return df.withColumn(out_col, expr.cast("int"))


def kl_divergence(df: DataFrame, k: int, p_prefix: str = "p",
                  q_prefix: str = "q") -> float:
    """Mean KL(P || Q) — the DEC objective (dec.py:103, KLDivLoss / N)."""
    terms = [F.col(f"{p_prefix}{j}")
             * F.log(F.col(f"{p_prefix}{j}") / F.col(f"{q_prefix}{j}"))
             for j in range(k)]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return float(df.agg(F.avg(total)).collect()[0][0])


# --------------------------------------------------------------------------
# numpy-side training (centroid refinement under the KL objective)
# --------------------------------------------------------------------------

def _soft_np(Z: np.ndarray, centers: np.ndarray, alpha: float = 1.0):
    nsq = ((Z[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    num = (1.0 + nsq / alpha) ** (-(alpha + 1.0) / 2.0)
    return num / num.sum(axis=1, keepdims=True)


def _target_np(q: np.ndarray) -> np.ndarray:
    w = q ** 2 / q.sum(axis=0)
    return w / w.sum(axis=1, keepdims=True)


def kmeans_np(Z: np.ndarray, k: int, seed: int = 42, n_init: int = 20,
              iters: int = 100) -> tuple[np.ndarray, np.ndarray]:
    """Seeded Lloyd KMeans with ``n_init`` restarts (the reference init,
    dec_utils.py:17 ``KMeans(model.cluster_number, n_init=20)``)."""
    rng = np.random.default_rng(seed)
    best_inertia, best = np.inf, None
    for _ in range(n_init):
        centers = Z[rng.choice(len(Z), size=k, replace=False)].copy()
        for _ in range(iters):
            d = ((Z[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            lab = d.argmin(axis=1)
            new = np.stack([Z[lab == j].mean(axis=0) if (lab == j).any()
                            else centers[j] for j in range(k)])
            if np.allclose(new, centers):
                centers = new
                break
            centers = new
        lab = ((Z[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2) \
            .argmin(axis=1)
        inertia = float(((Z - centers[lab]) ** 2).sum())
        if inertia < best_inertia:
            best_inertia, best = inertia, (centers, lab)
    return best


def dec_loss_and_grad(Z: np.ndarray, centers: np.ndarray,
                      alpha: float = 1.0, p: np.ndarray | None = None):
    """Mean KL(P||Q) and its gradient w.r.t. the centroids.

    DEC paper §3.1.3: dL/dmu_j = -((alpha+1)/alpha) Σ_i
    (1 + ||z_i - mu_j||²/alpha)^{-1} (p_ij - q_ij)(z_i - mu_j) — here
    scaled by 1/N to match the mean loss (dec.py:103 divides by batch).
    Pass ``p`` to hold the target distribution fixed (DEC refreshes the
    target only every ``update_interval`` steps); ``None`` recomputes it
    from the current ``q``."""
    n = len(Z)
    diff = Z[:, None, :] - centers[None, :, :]          # [N,k,d]
    nsq = (diff ** 2).sum(axis=2)
    inv = 1.0 / (1.0 + nsq / alpha)
    q = _soft_np(Z, centers, alpha)
    if p is None:
        p = _target_np(q)
    loss = float((p * np.log(p / q)).sum() / n)
    coef = ((alpha + 1.0) / alpha) * inv * (p - q) / n  # [N,k]
    grad = -(coef[:, :, None] * diff).sum(axis=0)       # [k,d]
    return loss, grad, q, p


def fit_dec(Z: np.ndarray, k: int, alpha: float = 1.0, epochs: int = 100,
            lr: float = 0.5, seed: int = 42, tol: float = 1e-3,
            target_refresh: int = 1) -> tuple[np.ndarray, list[float]]:
    """KMeans init + gradient refinement of centroids under the KL
    objective (encoder frozen — the closed-form half of the reference's
    joint optimization; the AE embedding is trained separately by
    ``caspr_spark.models.autoencoder``). Stops when the assignment-change
    fraction drops below ``tol`` (the reference's delta-label criterion).
    """
    centers, labels = kmeans_np(Z, k, seed=seed)
    centers = centers.astype(np.float64)
    prev = labels
    history: list[float] = []
    p = None
    for epoch in range(epochs):
        if epoch % max(target_refresh, 1) == 0:
            p = None                       # refresh target from current q
        loss, grad, q, p = dec_loss_and_grad(Z, centers, alpha, p=p)
        history.append(loss)
        centers = centers - lr * grad
        lab = q.argmax(axis=1)
        if (lab != prev).mean() < tol:
            break
        prev = lab
    return centers, history


def cluster_accuracy(y_true: np.ndarray, y_pred: np.ndarray,
                     cluster_number: int | None = None):
    """Best-permutation accuracy via the Hungarian method
    (dec_utils.py:47-66; scipy absent, so the O(n³) potentials-and-
    augmenting-paths assignment solver is inlined)."""
    y_true = np.asarray(y_true, dtype=np.int64)
    y_pred = np.asarray(y_pred, dtype=np.int64)
    if cluster_number is None:
        cluster_number = int(max(y_pred.max(), y_true.max()) + 1)
    count = np.zeros((cluster_number, cluster_number), dtype=np.int64)
    for pr, tr in zip(y_pred, y_true):
        count[pr, tr] += 1
    row, col = _linear_sum_assignment(count.max() - count)
    reassignment = dict(zip(row.tolist(), col.tolist()))
    accuracy = count[row, col].sum() / len(y_pred)
    return reassignment, float(accuracy)


def _linear_sum_assignment(cost: np.ndarray):
    """Hungarian algorithm (square cost, minimize): classic potentials +
    augmenting paths, O(n³)."""
    cost = np.asarray(cost, dtype=np.float64)
    n = cost.shape[0]
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    match = np.zeros(n + 1, dtype=np.int64)   # match[j] = row assigned to col j
    way = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, n + 1):
        match[0] = i
        j0 = 0
        minv = np.full(n + 1, np.inf)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0, delta, j1 = match[j0], np.inf, -1
            for j in range(1, n + 1):
                if used[j]:
                    continue
                cur = cost[i0 - 1, j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[match[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if match[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            match[j0] = match[j1]
            j0 = j1
    rows = np.empty(n, dtype=np.int64)
    for j in range(1, n + 1):
        rows[j - 1] = match[j] - 1
    # rows[j] = row assigned to col j; invert to (row_ind, col_ind)
    col_of_row = np.empty(n, dtype=np.int64)
    for j in range(n):
        col_of_row[rows[j]] = j
    idx = np.arange(n)
    return idx, col_of_row
