"""Live Model-Zoo parity gate (NETWORK-GATED — runs the moment egress exists).

BASELINE.json's north star: published OpenVision checkpoints load directly
and reproduce reference logits to <=1e-3 cosine, with bit-faithful testcat
top-1. In-container there is no egress, so the offline gate is
tests/test_reference_checkpoint.py (reference-format Orbax round-trip) and
tests/test_openclip_parity.py (torch-side numeric parity on synthetic
weights). THIS script closes the remaining distance on a machine with
network access:

1. downloads a PUBLISHED checkpoint (default
   hf-hub:UCSC-VLAA/openvision-vit-large-patch14-224 — the repo the
   reference's own README demos, ov-zero-shot-test.py:21),
2. loads it through the repo's torch-free reader (tools/model_io.py),
3. runs the SAME testcat/ images through (a) our JAX towers and (b) the
   independent torch open_clip implementation of the same weights,
4. asserts per-image logits cosine >= 1 - 1e-3 and identical top-1 labels.

Usage: python scripts/zoo_parity.py [--model hf-hub:ORG/NAME] [--atol 1e-3]
Exit 0 + one JSON line; prints {"skipped": "no network"} without egress.
"""

import argparse
import glob
import json
import os
import socket
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# the reference tool's probe set (ov-zero-shot-test.py)
LABELS = [
    "a photo of a cat", "a photo of a dog", "a photo of a bat",
    "a photo of the word hey", "a photo of text", "an image of a cat",
    "cat", "dog", "bat",
]


def have_network(host="huggingface.co", timeout=3.0) -> bool:
    try:
        socket.create_connection((host, 443), timeout=timeout).close()
        return True
    except OSError:
        return False


def _import_open_clip():
    """open_clip, from the environment or the reference's vendored copy
    (read-only external dependency; torchvision stubbed the same way
    tests/test_openclip_parity.py does)."""
    import types

    import torch

    try:
        import open_clip  # noqa: F401

        return open_clip
    except ImportError:
        pass
    ref = "/root/reference/src/convert_upload"
    if os.path.isdir(os.path.join(ref, "open_clip")) and ref not in sys.path:
        sys.path.insert(0, ref)

    import importlib.machinery
    from unittest import mock

    class _Stub(types.ModuleType):
        """Permissive module stub: unknown attributes become MagicMocks."""

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            val = mock.MagicMock(name=f"{self.__name__}.{name}")
            setattr(self, name, val)
            return val

    def _stub(name):
        mod = _Stub(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        mod.__path__ = []
        sys.modules[name] = mod

    for name in (
        "torchvision", "torchvision.ops", "torchvision.ops.misc",
        "torchvision.transforms", "torchvision.transforms.functional",
        "ftfy", "timm", "timm.layers", "timm.models",
    ):
        if name not in sys.modules:
            _stub(name)
    sys.modules["torchvision.ops.misc"].FrozenBatchNorm2d = (
        torch.nn.BatchNorm2d
    )
    import open_clip

    return open_clip


def torch_logits(model_dir, images_f32, tokens):
    """The independent check: same .bin through torch open_clip."""
    import torch

    open_clip = _import_open_clip()

    with open(os.path.join(model_dir, "open_clip_config.json")) as f:
        cfg = json.load(f)["model_cfg"]
    model = open_clip.model.CLIP(
        **{k: open_clip.model.CLIPVisionCfg(**v) if k == "vision_cfg"
           else open_clip.model.CLIPTextCfg(**v) if k == "text_cfg" else v
           for k, v in cfg.items()}
    )
    sd = torch.load(
        os.path.join(model_dir, "open_clip_pytorch_model.bin"),
        map_location="cpu", weights_only=True,
    )
    model.load_state_dict(sd)
    model.eval()
    with torch.no_grad():
        zi = model.encode_image(
            torch.tensor(images_f32).permute(0, 3, 1, 2), normalize=True)
        zt = model.encode_text(torch.tensor(tokens), normalize=True)
    return (zi @ zt.T).numpy()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--model", default="hf-hub:UCSC-VLAA/openvision-vit-large-patch14-224"
    )
    ap.add_argument("--img_folder", default="testcat")
    ap.add_argument("--atol", type=float, default=1e-3)
    args = ap.parse_args()

    if args.model.startswith("hf-hub:") and not have_network():
        print(json.dumps({"skipped": "no network egress to huggingface.co"}))
        return

    import jax.numpy as jnp
    from PIL import Image

    from openvision_tpu.tools.model_io import load_model

    m = load_model(args.model)
    files = sorted(glob.glob(os.path.join(args.img_folder, "*.png")))
    imgs = np.stack([
        m.preprocess(np.asarray(
            Image.open(f).convert("RGB").resize((m.image_size, m.image_size))
        ))
        for f in files
    ]).astype(np.float32)
    tokens = np.asarray(m.tokenize(LABELS))

    zi = np.asarray(m.encode_image(jnp.asarray(imgs)))
    zt = np.asarray(m.encode_text(jnp.asarray(tokens)))
    logits_jax = zi @ zt.T

    logits_ref = torch_logits(m.model_dir, imgs, tokens)

    # per-image cosine between the two logit rows + top-1 agreement
    def rows_cos(a, b):
        return np.sum(a * b, -1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
        )

    cos = rows_cos(logits_jax, logits_ref)
    top1_jax = logits_jax.argmax(-1)
    top1_ref = logits_ref.argmax(-1)
    result = {
        "model": args.model,
        "n_images": len(files),
        "min_logits_cosine": round(float(cos.min()), 6),
        "top1_bitfaithful": bool((top1_jax == top1_ref).all()),
        "predictions": {
            os.path.basename(f): LABELS[i] for f, i in zip(files, top1_jax)
        },
    }
    print(json.dumps(result))
    assert cos.min() >= 1 - args.atol, f"logits cosine {cos.min()} < 1-{args.atol}"
    assert result["top1_bitfaithful"], (top1_jax.tolist(), top1_ref.tolist())


if __name__ == "__main__":
    main()
