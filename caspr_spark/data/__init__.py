"""Tensorization — wide featurized DataFrames -> 4-way array bundles.

Mirrors the reference's ``caspr/data/`` layer (``CommonDataset``,
``transform_and_load``) with numpy arrays instead of torch tensors; the
bundles convert to torch with ``torch.from_numpy`` zero-copy when torch
is present.
"""

from caspr_spark.data.tensorize import (
    TensorBundle, transform_and_load, bundles_from_dataframe, init_datasets,
)

__all__ = ["TensorBundle", "transform_and_load", "bundles_from_dataframe",
           "init_datasets"]
