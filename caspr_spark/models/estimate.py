"""Parameter counting / estimation.

Reference: ``count_parameters`` (caspr/utils/train.py:286-287) and the
closed-form transformer estimate driven by distinct counts
(caspr/utils/estimate_parameters.py:1-58). The closed forms below are for
*our* numpy architectures — derived from their constructors, verified in
tests against ``count_parameters`` — serving the same purpose: size a
model from catalog statistics (A1 distinct counts) before building it.
"""

from __future__ import annotations

from caspr_spark.models.factory import embedding_dim


def count_parameters(model) -> int:
    """Total parameter count of an instantiated model (any ``parameters()``)."""
    return int(sum(p.size for p in model.parameters()))


def _emb_params(vocab_sizes: list[int]) -> tuple[int, int]:
    total = sum(v * embedding_dim(v) for v in vocab_sizes)
    out_dim = sum(embedding_dim(v) for v in vocab_sizes)
    return total, out_dim


def estimate_parameters(architecture: str, seq_vocab_sizes: dict[str, int],
                        non_seq_vocab_sizes: dict[str, int], n_seq_cont: int,
                        n_non_seq_cont: int, seq_len: int, hidden_dim: int = 64,
                        n_layers: int = 2) -> int:
    """Closed-form parameter count from vocabulary statistics alone."""
    seq_emb, seq_emb_dim = _emb_params(list(seq_vocab_sizes.values()))
    non_emb, non_emb_dim = _emb_params(list(non_seq_vocab_sizes.values()))
    f = seq_emb_dim + n_seq_cont
    p = non_emb_dim + n_non_seq_cont
    h = hidden_dim
    if architecture == "LSTMAutoencoder":
        total = seq_emb + non_emb + f * 4 * h + h * 4 * h + 4 * h
        if p:
            total += p * h
        return total
    if architecture == "TransformerAutoEncoder":
        per_layer = 4 * h * h + h * 2 * h + 2 * h * h  # attn + FFN
        total = (seq_emb + non_emb + max(f, 1) * h + max(p, 1) * h
                 + (seq_len + 2) * h + n_layers * per_layer)
        return total
    raise ValueError(f"unknown architecture {architecture!r}")
