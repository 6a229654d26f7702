"""Model factory — name + hyperparameters -> encoder instance.

Reference: ``CASPRFactory`` (caspr/models/factory.py:17-164). Same
surface: ``create('LSTMAutoencoder' | 'TransformerAutoEncoder', **hp)``,
the embedding-dimension rule ``min(25, (vocab + 1) // 2)``
(factory.py:63-64), and the transformer's ``seq_len + 1`` position for
the profile vector (factory.py:43). Torch-free: hands back the numpy
forward-only encoders; if torch is installed a torch-backed zoo can be
registered under the same names.
"""

from __future__ import annotations

from caspr_spark.models.numpy_layers import (
    LSTMEncoder, TransformerEncoder, UnifiedEncoder,
)

MAX_EMB_SIZE = 25  # reference caspr/models/factory.py:19

ARCHITECTURES = ("LSTMAutoencoder", "TransformerAutoEncoder", "UnifiedEncoder")


def embedding_dim(vocab_size: int, max_emb_size: int = MAX_EMB_SIZE) -> int:
    """``min(25, (V + 1) // 2)`` — reference caspr/models/factory.py:63-64."""
    return min(max_emb_size, (vocab_size + 1) // 2)


class CASPRFactory:
    """Builds encoders from column-role vocabularies.

    ``vocab_sizes`` maps categorical column -> vocabulary size *including*
    the reserved 0/UNK code (``CategoricalEncoding.vocab_sizes()``).
    """

    def __init__(self, seq_vocab_sizes: dict[str, int],
                 non_seq_vocab_sizes: dict[str, int],
                 n_seq_cont: int, n_non_seq_cont: int, seq_len: int):
        self.seq_vocab = [seq_vocab_sizes[c] for c in sorted(seq_vocab_sizes)]
        self.non_seq_vocab = [non_seq_vocab_sizes[c]
                              for c in sorted(non_seq_vocab_sizes)]
        self.n_seq_cont = n_seq_cont
        self.n_non_seq_cont = n_non_seq_cont
        self.seq_len = seq_len

    def create(self, architecture: str = "TransformerAutoEncoder",
               hidden_dim: int = 64, n_layers: int = 2, n_heads: int = 2,
               seed: int = 42, **kwargs):
        seq_dims = [embedding_dim(v) for v in self.seq_vocab]
        non_seq_dims = [embedding_dim(v) for v in self.non_seq_vocab]
        if architecture == "LSTMAutoencoder":
            return LSTMEncoder(self.seq_vocab, seq_dims, self.n_seq_cont,
                               self.non_seq_vocab, non_seq_dims,
                               self.n_non_seq_cont, hidden_dim, seed)
        if architecture == "TransformerAutoEncoder":
            return TransformerEncoder(self.seq_vocab, seq_dims, self.n_seq_cont,
                                      self.non_seq_vocab, non_seq_dims,
                                      self.n_non_seq_cont, hidden_dim,
                                      n_layers, n_heads,
                                      max_len=self.seq_len + 2, seed=seed)
        if architecture == "UnifiedEncoder":
            # the reference's default LSTMAutoencoder encoder configuration:
            # DenseBnDropout [50, 25] embedding transforms, Bahdanau
            # attention (heads=1), optional conv aggregation and
            # multi-layer/bidirectional LSTM (factory.py:107-154)
            return UnifiedEncoder(self.seq_vocab, seq_dims, self.n_seq_cont,
                                  self.non_seq_vocab, non_seq_dims,
                                  self.n_non_seq_cont, hidden_dim,
                                  seq_len=self.seq_len, seed=seed, **kwargs)
        raise ValueError(f"unknown architecture {architecture!r}; "
                         f"expected one of {ARCHITECTURES}")

    def create_trainable(self, architecture: str = "TransformerAutoEncoder",
                         hidden_dim: int = 32, seed: int = 42, **kwargs):
        """Trainable (numpy-backprop) autoencoder for either reference
        architecture — the ``fit``-capable twins of :meth:`create`'s
        forward-only encoders. ``LSTMAutoencoder`` maps to the
        recurrent-decoder ``SequenceAutoencoder`` (model_wrapper.py:28-120
        training semantics), ``TransformerAutoEncoder`` to
        ``TransformerSequenceAutoencoder`` (:217-281)."""
        from caspr_spark.models.autoencoder import SequenceAutoencoder
        from caspr_spark.models.transformer_ae import (
            TransformerSequenceAutoencoder)
        seq_dims = [embedding_dim(v) for v in self.seq_vocab]
        non_seq_dims = [embedding_dim(v) for v in self.non_seq_vocab]
        common = (self.seq_vocab, seq_dims, self.n_seq_cont,
                  self.non_seq_vocab, non_seq_dims, self.n_non_seq_cont)
        if architecture == "LSTMAutoencoder":
            return SequenceAutoencoder(*common, seq_len=self.seq_len,
                                       hidden_dim=hidden_dim, seed=seed,
                                       **kwargs)
        if architecture == "TransformerAutoEncoder":
            return TransformerSequenceAutoencoder(
                *common, seq_len=self.seq_len, hid_dim=hidden_dim,
                seed=seed, **kwargs)
        raise ValueError(f"unknown trainable architecture {architecture!r}; "
                         "expected 'LSTMAutoencoder' or "
                         "'TransformerAutoEncoder'")
