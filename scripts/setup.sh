#!/usr/bin/env bash
# Environment setup for openvision_tpu on a Cloud TPU VM.
# Capability parity with reference setup.sh: python env + jax[tpu] install
# (stable / nightly / pinned modes) + project deps. Run on every pod worker.
set -euo pipefail

MODE="${1:-stable}"           # stable | nightly
PYTHON="${PYTHON:-python3.12}"
VENV="${VENV:-$HOME/.venvs/openvision_tpu}"

sudo apt-get update -qq || true
sudo apt-get install -y -qq python3-venv python3-pip || true

$PYTHON -m venv "$VENV"
source "$VENV/bin/activate"
pip install -q --upgrade pip

case "$MODE" in
  stable)
    pip install -q "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
    ;;
  nightly)
    pip install -q --pre "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
      -f https://storage.googleapis.com/jax-releases/jax_nightly_releases.html
    ;;
  *)
    echo "unknown mode: $MODE" >&2; exit 1;;
esac

pip install -q flax optax orbax-checkpoint chex einops ml_collections grain \
  pillow numpy transformers pytest
# CPU torch only — used by the converter/export and local tools.
pip install -q torch --index-url https://download.pytorch.org/whl/cpu

echo "openvision_tpu environment ready in $VENV"
