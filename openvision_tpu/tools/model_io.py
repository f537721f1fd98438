"""Shared model loading for the local interpretability tools.

Loads a converted OpenVision checkpoint directory — the same artifacts the
reference tools consume (`open_clip_config.json` + `open_clip_pytorch_model.bin`,
ov-zero-shot-test.py:38-56) — into the JAX towers via convert.openclip, or an
Orbax/npz checkpoint directly. One inference core serves all three tools
(zero-shot, gradient ascent, feature viz), per BASELINE.json.
"""

from __future__ import annotations

import dataclasses
import json
import os
import zipfile
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from openvision_tpu.convert.openclip import openclip_to_jax
from openvision_tpu.models import text as text_mod
from openvision_tpu.models import vit as vit_mod


@dataclasses.dataclass
class LoadedModel:
    vision: Any  # flax module
    text: Any
    params: dict  # {"img": ..., "txt": ..., "t": ...}
    image_size: int
    context_length: int
    vocab_size: int
    mean: tuple
    std: tuple
    vocab_path: str

    def encode_image(self, images: jax.Array) -> jax.Array:
        z = self.vision.apply({"params": self.params["img"]}, images)
        return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)

    def encode_text(self, tokens: jax.Array) -> jax.Array:
        z = self.text.apply({"params": self.params["txt"]}, tokens)
        return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)

    @property
    def logit_scale(self) -> float:
        return float(np.exp(np.asarray(self.params["t"]).reshape(-1)[0]))

    model_dir: str = ""

    def tokenize(self, texts) -> np.ndarray:
        """Tokenizes label strings with the checkpoint's OWN tokenizer.

        Preference order (ROUND2_PLAN #7 — converted repos may ship a
        tokenizer that differs from the native bos/eos/CLS-at-end
        convention): an HF tokenizer in the model dir (`tokenizer.json` /
        `tokenizer_config.json`, loaded via transformers) → the dir's
        `vocab.txt` → the repo's default vocab, both through the native
        WordPiece convention.
        """
        if self.model_dir and any(
            os.path.exists(os.path.join(self.model_dir, f))
            for f in ("tokenizer.json", "tokenizer_config.json")
        ):
            try:
                from transformers import AutoTokenizer

                hf = AutoTokenizer.from_pretrained(self.model_dir)
                out = hf(
                    list(texts), padding="max_length", truncation=True,
                    max_length=self.context_length, return_tensors="np",
                )
                return out["input_ids"].astype(np.int32)
            except Exception:
                pass  # fall through to the native convention
        return tokenize_labels(list(texts), self.vocab_path,
                               self.context_length)

    def preprocess(self, image: np.ndarray) -> np.ndarray:
        """resize-small → center-crop → normalize, like the torch transform."""
        from openvision_tpu.data.ops_image import _resize, _to_image_array

        img = _to_image_array(image)
        s = self.image_size
        h, w = img.shape[:2]
        ratio = s / min(h, w)
        img = _resize(img, round(h * ratio), round(w * ratio), "bicubic", True)
        h, w = img.shape[:2]
        top, left = (h - s) // 2, (w - s) // 2
        img = img[top : top + s, left : left + s].astype(np.float32) / 255.0
        return (img - np.asarray(self.mean)) / np.asarray(self.std)


_DEFAULT_MEAN = (0.48145466, 0.4578275, 0.40821073)
_DEFAULT_STD = (0.26862954, 0.26130258, 0.27577711)


def resolve_model_dir(model_dir: str) -> str:
    """Resolve an `hf-hub:org/name[@rev]` tag to a local snapshot dir.

    Pull-side parity with the reference's vendored OpenCLIP factory
    (reference src/convert_upload/open_clip/factory.py,
    pretrained.py:655): tools accept either a local converted directory or
    an HF Hub tag. Downloads only the files load_model reads, through the
    standard HF cache, so repeat loads are offline-capable. Raises a clear
    error when huggingface_hub is unavailable or there is no network.
    """
    if not model_dir.startswith("hf-hub:"):
        return model_dir
    ref = model_dir[len("hf-hub:"):]
    repo_id, _, revision = ref.partition("@")
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise RuntimeError(
            f"{model_dir!r} needs the huggingface_hub package; install it "
            "or pass a local directory containing open_clip_config.json + "
            "open_clip_pytorch_model.bin"
        ) from e
    try:
        return snapshot_download(
            repo_id,
            revision=revision or None,
            allow_patterns=[
                "open_clip_config.json",
                "open_clip_pytorch_model.bin",
                "vocab.txt",
                "tokenizer*",
            ],
        )
    except Exception as e:
        raise RuntimeError(
            f"could not fetch {repo_id!r} from the HF Hub ({e}); if you "
            "have the files locally, pass the directory instead of the "
            "hf-hub: tag"
        ) from e


def load_model(
    model_dir: str,
    *,
    vocab_path: str = "assets/bert_base_vocab_bos_eos.txt",
    dtype=jnp.float32,
    attn_impl: str = "xla",
    fast_gelu: bool = False,
) -> LoadedModel:
    """Loads `open_clip_config.json` + `open_clip_pytorch_model.bin` from a
    local directory or an `hf-hub:org/name` tag (resolve_model_dir)."""
    model_dir = resolve_model_dir(model_dir)
    cfg_path = os.path.join(model_dir, "open_clip_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    mcfg = cfg["model_cfg"]
    vcfg, tcfg = mcfg["vision_cfg"], mcfg["text_cfg"]
    embed_dim = mcfg["embed_dim"]
    pp = cfg.get("preprocess_cfg", {})

    v_width = vcfg["width"]
    v_heads = v_width // vcfg.get("head_width", 64)
    t_heads = tcfg["heads"]
    v_mlp = int(v_width * vcfg.get("mlp_ratio", 4.0))
    t_mlp = int(tcfg["width"] * tcfg.get("mlp_ratio", 4.0))

    vision = vit_mod.ViT(
        num_classes=embed_dim,
        patch_size=(vcfg["patch_size"], vcfg["patch_size"]),
        width=v_width,
        depth=vcfg["layers"],
        mlp_dim=v_mlp,
        num_heads=v_heads,
        posemb="learn",
        pool_type="gap",
        emb_head_bias=False,
        output_tokens=False,
        attn_impl=attn_impl,
        fast_gelu=fast_gelu,
        dtype=dtype,
    )
    text = text_mod.TextTransformer(
        num_classes=embed_dim,
        width=tcfg["width"],
        depth=tcfg["layers"],
        mlp_dim=t_mlp,
        num_heads=t_heads,
        vocab_size=tcfg["vocab_size"],
        posemb="learn",
        pool_type=tcfg.get("pool_type", "last"),
        causal=not tcfg.get("no_causal_mask", False),
        output_tokens=False,
        dtype=dtype,
    )

    bin_path = os.path.join(model_dir, "open_clip_pytorch_model.bin")
    # Torch-free by default: the restricted-unpickler zip reader keeps the
    # serving/encode path runnable on torch-less TPU VMs (VERDICT r3 #9).
    # torch only enters as a fallback for the pre-1.6 tar format.
    try:
        from openvision_tpu.convert.torch_pickle import load_torch_bin

        sd = load_torch_bin(bin_path)
    except zipfile.BadZipFile:
        import torch

        state_dict = torch.load(bin_path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in state_dict.items()}
    params = openclip_to_jax(sd, num_heads_vision=v_heads, num_heads_text=t_heads)

    # a vocab.txt in the model dir (our exports write one) overrides the
    # repo default so the export is fully self-contained
    local_vocab = os.path.join(model_dir, "vocab.txt")
    if os.path.exists(local_vocab):
        vocab_path = local_vocab

    # Converted checkpoints carry a learned pos-emb; drop fixed sincos remnants
    # if the config says the JAX side used sincos (then params lack it anyway).
    return LoadedModel(
        model_dir=model_dir,
        vision=vision,
        text=text,
        params=params,
        image_size=vcfg.get("image_size", 224),
        context_length=tcfg.get("context_length", 80),
        vocab_size=tcfg["vocab_size"],
        mean=tuple(pp.get("mean", _DEFAULT_MEAN)),
        std=tuple(pp.get("std", _DEFAULT_STD)),
        vocab_path=vocab_path,
    )


def tokenize_labels(labels, vocab_path: str, max_len: int) -> np.ndarray:
    """bos+tokens+eos … CLS-at-end tokenization for a list of strings."""
    from openvision_tpu.data.bert_ops import _encode_special, _finalize_clip_tokens
    from openvision_tpu.data.tokenizer import get_tokenizer

    tok = get_tokenizer(vocab_path)
    out = []
    for text in labels:
        ids = _encode_special(tok, text, True, True)
        out.append(_finalize_clip_tokens(tok, ids, max_len, True))
    return np.stack(out)
