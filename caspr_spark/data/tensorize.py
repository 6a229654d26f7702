"""Wide flat ``{rank}_{col}`` layout -> 4-way tensor bundle.

Reference contract (``transform_and_load``, caspr/data/load.py:9-61, and
``CommonDataset``, caspr/data/common_dataset.py:8-48): the flat wide
matrix holds each sequential column's ``seq_len`` slots contiguously —
column-major over ranks — so the reshape is ``(N, C*T) -> (N, C, T) ->
transpose -> (N, T, C)``. Four groups:

- ``seq_cat``  int64  ``[N, T, C_sc]`` — encoded sequential categoricals
- ``seq_cont`` float32 ``[N, T, C_cn]`` — normalized sequential continuous
- ``non_seq_cat``  int64  ``[N, C_nc]`` — profile categoricals
- ``non_seq_cont`` float32 ``[N, C_nn]`` — profile continuous
- ``y`` float32 ``[N, L]``, ``tgt_id`` carried through

At scale this never materializes on the driver: ``bundles_from_dataframe``
runs the same transform per Arrow batch inside ``mapInPandas``-style
iteration, so tensorization is embarrassingly parallel over partitions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from caspr_spark.roles import ColumnRoles


@dataclass
class TensorBundle:
    """The 4-way array bundle one batch of entities tensorizes into."""

    seq_cat: np.ndarray        # [N, T, C_sc] int64
    seq_cont: np.ndarray       # [N, T, C_cn] float32
    non_seq_cat: np.ndarray    # [N, C_nc] int64
    non_seq_cont: np.ndarray   # [N, C_nn] float32
    y: np.ndarray              # [N, L] float32
    tgt_id: pd.DataFrame | None = None
    seq_cols: list = field(default_factory=list)
    non_seq_cols: list = field(default_factory=list)

    def __len__(self) -> int:
        return len(self.seq_cat)

    def __getitem__(self, idx):
        return (self.seq_cat[idx], self.seq_cont[idx],
                self.non_seq_cat[idx], self.non_seq_cont[idx], self.y[idx])

    def batches(self, batch_size: int):
        """Yield fixed-size sub-bundles (the reference's DataLoader role)."""
        for start in range(0, len(self), batch_size):
            sl = slice(start, start + batch_size)
            yield TensorBundle(self.seq_cat[sl], self.seq_cont[sl],
                               self.non_seq_cat[sl], self.non_seq_cont[sl],
                               self.y[sl],
                               None if self.tgt_id is None else self.tgt_id.iloc[sl],
                               self.seq_cols, self.non_seq_cols)


def _seq_block(pdf: pd.DataFrame, cols: list[str], seq_len: int,
               dtype) -> np.ndarray:
    """Flat slot columns -> [N, T, C]; the (N, C, T)->(N, T, C) transpose."""
    n = len(pdf)
    c = len(cols)
    if c == 0:
        return np.zeros((n, seq_len, 0), dtype=dtype)
    flat_cols = [f"{s}_{col}" for col in cols for s in range(1, seq_len + 1)]
    flat = pdf[flat_cols].to_numpy(dtype=dtype, na_value=0)
    return flat.reshape(n, c, seq_len).transpose(0, 2, 1)


def transform_and_load(pdf: pd.DataFrame, roles: ColumnRoles, seq_len: int,
                       keep_ids: bool = True) -> TensorBundle:
    """One pandas batch of the wide layout -> ``TensorBundle``.

    Reference: caspr/data/load.py:9-61 (reshape contract :19-25; label and
    id handling :32-34, :49-53).
    """
    seq_cat = [c for c in roles.seq_cols if c in roles.cat_cols]
    seq_cont = [c for c in roles.seq_cols
                if c in roles.cont_cols or c in roles.date_cols]
    non_seq_cat = [c for c in roles.non_seq_cols if c in roles.cat_cols]
    non_seq_cont = [c for c in roles.non_seq_cols
                    if c in roles.cont_cols or c in roles.date_cols]

    n = len(pdf)
    y = (pdf[roles.output_cols].to_numpy(dtype=np.float32, na_value=0.0)
         if roles.output_cols else np.zeros((n, 0), dtype=np.float32))
    return TensorBundle(
        seq_cat=_seq_block(pdf, seq_cat, seq_len, np.int64),
        seq_cont=_seq_block(pdf, seq_cont, seq_len, np.float32),
        non_seq_cat=(pdf[non_seq_cat].to_numpy(dtype=np.int64, na_value=0)
                     if non_seq_cat else np.zeros((n, 0), dtype=np.int64)),
        non_seq_cont=(pdf[non_seq_cont].to_numpy(dtype=np.float32, na_value=0.0)
                      if non_seq_cont else np.zeros((n, 0), dtype=np.float32)),
        y=y,
        tgt_id=pdf[roles.tgt_id].copy() if keep_ids else None,
        seq_cols=seq_cat + seq_cont,
        non_seq_cols=non_seq_cat + non_seq_cont,
    )


def bundles_from_dataframe(df, roles: ColumnRoles, seq_len: int,
                           batch_size: int = 32768):
    """Iterate Arrow batches of a wide DataFrame as ``TensorBundle``s.

    Driver-side generator built on ``toLocalIterator`` over Arrow record
    batches — for the distributed path, call ``transform_and_load`` inside
    your own ``mapInPandas`` kernel instead (see ``caspr_spark.score``).
    """
    rows = []
    for row in df.toLocalIterator(prefetchPartitions=True):
        rows.append(row.asDict())
        if len(rows) >= batch_size:
            yield transform_and_load(pd.DataFrame(rows), roles, seq_len)
            rows = []
    if rows:
        yield transform_and_load(pd.DataFrame(rows), roles, seq_len)


def init_datasets(df, roles: ColumnRoles, seq_len: int, test_ratio: float = 0.2,
                  seed: int = 42):
    """Seeded train/val split -> two local ``TensorBundle``s (S4/X2).

    Reference: ``init_datasets`` (caspr/data/load.py:64-79); the split is
    Spark-side (``randomSplit``) so only the two slices materialize.
    """
    train_df, val_df = df.randomSplit([1 - test_ratio, test_ratio], seed=seed)
    train = transform_and_load(train_df.toPandas(), roles, seq_len)
    val = transform_and_load(val_df.toPandas(), roles, seq_len)
    return train, val
