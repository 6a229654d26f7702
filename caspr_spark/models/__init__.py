"""Model zoo — forward-only numpy encoders + factory.

Capability parity with the reference's PyTorch model layer
(caspr/models/, SURVEY.md §2.11) in an environment without torch: the
encoders are deterministic, seeded, forward-only numpy implementations
with the same input convention (4-way tensor bundle) and the same
embedding-dimension rule. When torch is available the same factory can
hand back trainable torch modules; nothing else in the scoring path
changes (the pandas-UDF scorer only calls ``model.encode``).
"""

from caspr_spark.models.numpy_layers import (
    BahdanauAttention, CategoricalEmbedding, ConvAggregation, DenseBnDropout,
    LSTMEncoder, LinearEncoder, MLP, MultiHeadAttentionLSTMWrapper,
    MultiLayerLSTM, TransformerDecoderBlocks, TransformerEncoder,
    UnifiedEncoder,
)
from caspr_spark.models.factory import CASPRFactory, embedding_dim
from caspr_spark.models.estimate import count_parameters, estimate_parameters
from caspr_spark.models.transformer_ae import (
    TransformerSequenceAutoencoder, fit_transformer_autoencoder,
)

__all__ = [
    "TransformerSequenceAutoencoder", "fit_transformer_autoencoder",
    "BahdanauAttention", "CategoricalEmbedding", "ConvAggregation",
    "DenseBnDropout", "LSTMEncoder", "LinearEncoder", "MLP",
    "MultiHeadAttentionLSTMWrapper", "MultiLayerLSTM",
    "TransformerDecoderBlocks", "TransformerEncoder", "UnifiedEncoder",
    "CASPRFactory", "embedding_dim", "count_parameters", "estimate_parameters",
]
