#!/usr/bin/env bash
# Optional-extras test lane (r8 verdict item 6).
#
# Two pytest skips are honest dependency gates that never run in the
# driver sandbox (installs are forbidden there):
#   - tests/test_ml_layer.py — ONNX export/load round-trip parity
#     (pytest.importorskip("onnxruntime") at :598 and :697); the
#     in-sandbox tests cover the numpy-replay parity half only.
#   - tests/test_extensions.py::*matplotlib* — the plotting gate's
#     positive path (:166 skips when matplotlib is ABSENT-gate-only).
#
# Run this on any host where installs are allowed to keep the ONNX
# parity claims live:
#
#   bash tools/optional_extras_lane.sh
#
# It builds a throwaway venv (inheriting the system pyspark), installs
# the extras, and runs ONLY the gated tests.
set -euo pipefail
cd "$(dirname "$0")/.."

VENV="$(mktemp -d)/extras-venv"
python -m venv --system-site-packages "$VENV"
# shellcheck disable=SC1091
source "$VENV/bin/activate"
pip install --quiet onnx onnxruntime matplotlib scikit-learn
python -m pytest tests/test_ml_layer.py tests/test_extensions.py -q \
  -o addopts= --no-header
echo "optional-extras lane green"
