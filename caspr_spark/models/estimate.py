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
                        n_layers: int = 2, **kwargs) -> int:
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
    if architecture == "UnifiedEncoder":
        return _estimate_unified(seq_emb, seq_emb_dim, non_emb, non_emb_dim,
                                 n_seq_cont, n_non_seq_cont, seq_len, h,
                                 **kwargs)
    raise ValueError(f"unknown architecture {architecture!r}")


def _estimate_unified(seq_emb, seq_emb_dim, non_emb, non_emb_dim, n_seq_cont,
                      n_non_seq_cont, seq_len, h, lin_layer_sizes=(50, 25),
                      attention_heads=1, lstm_num_layers=1,
                      lstm_bidirectional=False, use_conv_agg=False,
                      kernel_size=(3, 3), stride=(2, 2),
                      max_pool_size=(2, 2)) -> int:
    """Closed form for ``UnifiedEncoder`` — mirrors its constructor gating."""
    from caspr_spark.models.numpy_layers import ConvAggregation

    def dense_bn(inp: int) -> int:
        total = 0
        for size in lin_layer_sizes:
            total += inp * size + size
            inp = size
        return total

    sizes = list(lin_layer_sizes)
    total = seq_emb + non_emb
    lstm_in = (sizes[-1] if seq_emb_dim else 0) + n_seq_cont
    if seq_emb_dim:
        total += dense_bn(seq_emb_dim)
    if non_emb_dim:
        total += dense_bn(non_emb_dim)
    if use_conv_agg:
        ct, cf = ConvAggregation.out_shape(seq_len, lstm_in, kernel_size,
                                           stride, max_pool_size)
        if (seq_len >= kernel_size[0] and lstm_in >= kernel_size[1]
                and ct >= 1 and cf >= 1):
            total += kernel_size[0] * kernel_size[1] + 1
            lstm_in = cf
    d = 2 if lstm_bidirectional else 1
    has_lstm = lstm_in > 0
    if has_lstm:
        f_in = lstm_in
        for _ in range(lstm_num_layers):
            total += d * (f_in * 4 * h + h * 4 * h + 4 * h)
            f_in = d * h
        total += d * h * h + h                       # lstm-to-dense projection
        if attention_heads == 1:
            total += d * h * h + h + 1               # Bahdanau
        elif attention_heads > 1:
            total += 4 * h * h                       # MHA q/k/v/o
    fin = (sizes[-1] if non_emb_dim else 0) + n_non_seq_cont
    if has_lstm:
        fin += h + (d * h if attention_heads > 0 else 0)
    return total + fin * h + h
