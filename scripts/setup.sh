#!/usr/bin/env bash
# Environment setup for openvision_tpu on a Cloud TPU VM.
# Capability parity with reference setup.sh: python env + jax[tpu] install
# (stable / nightly / pinned modes) + project deps. Run on every pod worker.
set -euo pipefail

MODE="${1:-stable}"           # stable | nightly | libtpu-only
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
  libtpu-only)
    # refresh just the TPU runtime under an existing jax (reference mode)
    pip install -q --upgrade libtpu-nightly \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
    ;;
  *)
    echo "unknown mode: $MODE" >&2; exit 1;;
esac

pip install -q flax optax orbax-checkpoint chex einops ml_collections grain \
  pillow numpy transformers pytest
# CPU torch only — used by the converter/export and local tools.
pip install -q torch --index-url https://download.pytorch.org/whl/cpu

# gcsfuse for gs:// workdir mounts (reference setup.sh gcsfuse block)
if ! command -v gcsfuse >/dev/null 2>&1; then
  export GCSFUSE_REPO="gcsfuse-$(lsb_release -c -s 2>/dev/null || echo jammy)"
  echo "deb https://packages.cloud.google.com/apt $GCSFUSE_REPO main" \
    | sudo tee /etc/apt/sources.list.d/gcsfuse.list >/dev/null || true
  curl -fsSL https://packages.cloud.google.com/apt/doc/apt-key.gpg \
    | sudo apt-key add - 2>/dev/null || true
  sudo apt-get update -qq || true
  sudo apt-get install -y -qq gcsfuse || echo "gcsfuse install skipped"
fi

# optional telemetry + profiling extras (reference installs tbp-nightly)
pip install -q wandb tensorboard-plugin-profile 2>/dev/null || true

# native C++ tokenizer (falls back to pure Python if the toolchain is absent)
(cd "$(dirname "$0")/.." && python -m openvision_tpu.native.build) || true

echo "openvision_tpu environment ready in $VENV"
