"""S5 — ONNX export / inference, gated on the optional onnx runtime.

Reference surface: ``caspr/utils/onnx.py`` — ``export_onnx(model, path)``
(:104-124) serializes the fitted encoder to an ONNX graph, and
``ONNXWrapper`` (:135-181) wraps an ``onnxruntime.InferenceSession`` so
the session is rebuilt after pickling (``__getstate__`` drops it), which
is what makes the wrapper broadcast-safe inside a Spark UDF closure.

This container ships neither torch nor onnx, so every entry point is
gated behind a lazy import with an actionable error; the module imports
clean regardless. When ``onnx``/``onnxruntime`` are present:

- :func:`export_linear_autoencoder_onnx` builds the MatMul graph for the
  fitted :class:`~caspr_spark.train.LinearAutoencoder` directly with
  ``onnx.helper`` — no torch tracer needed for a weights-only model.
- :class:`ONNXWrapper` mirrors the reference wrapper and additionally
  exposes ``encode(seq_cat, seq_cont, non_seq_cat, non_seq_cont)``, the
  duck-type contract of :func:`caspr_spark.score.score`, so an exported
  model scores through the existing Arrow-batched UDF path unchanged.

The deep encoders (LSTM / transformer numpy forward passes) are NOT
exported: hand-assembling their graphs node-by-node would duplicate the
whole forward pass in a second dialect. They raise with a message saying
so rather than pretending.
"""

from __future__ import annotations

import numpy as np

OPSET_VERSION = 17  # reference pins 12 (caspr/utils/onnx.py:10) for
#                     torch-1.x tracer compat; helper-built graphs can
#                     target a current opset


def _require_onnx():
    """Import (onnx, onnxruntime) or raise with install guidance."""
    try:
        import onnx
        import onnxruntime
    except ImportError as exc:  # pragma: no cover - exercised when absent
        raise ImportError(
            "ONNX export/inference needs the optional 'onnx' and "
            "'onnxruntime' packages, which are not installed in this "
            "environment. Install them to enable the S5 sink/source; "
            "every other caspr_spark capability works without them."
        ) from exc
    return onnx, onnxruntime


def export_linear_autoencoder_onnx(model, path: str) -> None:
    """Serialize a fitted ``LinearAutoencoder`` encoder to ``path``.

    The graph is ``embedding = X @ W.T`` with a dynamic batch axis —
    the reference's ``dynamic_axes={0: 'batch_size'}`` contract
    (caspr/utils/onnx.py:112-121) so one export serves any batch size.
    """
    onnx, _ = _require_onnx()
    from onnx import TensorProto, helper, numpy_helper

    W = np.asarray(model.W, dtype=np.float32)          # [hidden, in]
    in_dim, hidden = W.shape[1], W.shape[0]
    inp = helper.make_tensor_value_info(
        "features", TensorProto.FLOAT, ["batch_size", in_dim])
    out = helper.make_tensor_value_info(
        "output_0", TensorProto.FLOAT, ["batch_size", hidden])
    wt = numpy_helper.from_array(W.T.copy(), name="W_T")
    node = helper.make_node("MatMul", ["features", "W_T"], ["output_0"])
    graph = helper.make_graph([node], "caspr_linear_encoder", [inp], [out],
                              initializer=[wt])
    onnx_model = helper.make_model(
        graph, opset_imports=[helper.make_opsetid("", OPSET_VERSION)])
    onnx.checker.check_model(onnx_model)
    onnx.save(onnx_model, path)


def export_onnx(model, model_path: str) -> None:
    """Reference-shaped entry point (caspr/utils/onnx.py:104).

    Dispatches on the fitted model type; currently only the linear
    autoencoder has a graph builder (see module docstring for why the
    deep encoders raise).
    """
    if hasattr(model, "W") and not hasattr(model, "enc"):
        export_linear_autoencoder_onnx(model, model_path)
        return
    raise NotImplementedError(
        f"ONNX export is implemented for LinearAutoencoder only; got "
        f"{type(model).__name__}. The numpy deep encoders would need a "
        "hand-assembled graph per layer — score them through "
        "caspr_spark.score.score instead.")


class ONNXWrapper:
    """Pickle-safe ONNX scoring wrapper (caspr/utils/onnx.py:135-181).

    The ``InferenceSession`` holds native state that cannot cross a
    pickle boundary; ``__getstate__`` keeps only the model bytes and the
    session is rebuilt lazily on the other side — exactly what a Spark
    UDF closure needs (serialized once on the driver, deserialized per
    python worker).
    """

    def __init__(self, model_path_or_bytes):
        _require_onnx()
        if isinstance(model_path_or_bytes, bytes):
            self.model_bytes = model_path_or_bytes
        else:
            with open(model_path_or_bytes, "rb") as fh:
                self.model_bytes = fh.read()
        self._session = None

    # -- pickling (reference :146-153) ----------------------------------
    def __getstate__(self):
        state = self.__dict__.copy()
        state["_session"] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)

    # -- session ---------------------------------------------------------
    @property
    def session(self):
        if self._session is None:
            _, ort = _require_onnx()
            opts = ort.SessionOptions()
            opts.graph_optimization_level = \
                ort.GraphOptimizationLevel.ORT_ENABLE_ALL
            self._session = ort.InferenceSession(
                self.model_bytes, opts, providers=["CPUExecutionProvider"])
        return self._session

    def run(self, **inputs) -> list:
        feeds = {k: np.asarray(v, dtype=np.float32)
                 for k, v in inputs.items()}
        return self.session.run(None, feeds)

    # -- score() duck-type ------------------------------------------------
    def encode(self, seq_cat, seq_cont, non_seq_cat, non_seq_cont):
        """Flatten the four tensor groups back to the wide feature vector
        and run the graph — the inverse of ``score()``'s reshape, so the
        wrapper drops into the existing scoring UDF unchanged."""
        b = len(seq_cont)
        feats = np.concatenate(
            [seq_cont.transpose(0, 2, 1).reshape(b, -1),
             np.asarray(non_seq_cont, dtype=np.float32).reshape(b, -1)],
            axis=1).astype(np.float32)
        return self.run(features=feats)[0]
