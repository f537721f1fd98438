"""Export CLI: Orbax/npz checkpoint → OpenCLIP artifacts (+ optional HF push).

Capability parity with reference src/convert_upload/transfer_jax2hf.py: loads
a train-state checkpoint, maps params to an OpenCLIP state_dict
(convert/openclip.py), synthesizes `open_clip_config.json` from the variant
tables, saves `open_clip_pytorch_model.bin`, runs a JAX-vs-converted parity
probe, and optionally uploads to the Hugging Face Hub (gated on
huggingface_hub being importable and a token being provided).

Usage:
  python -m openvision_tpu.convert.export \
      --checkpoint /path/to/orbax_dir_or.npz --out /path/to/export \
      --img L/14 --txt L --res 224 --out_dim 768 [--repo user/name --token ...]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from openvision_tpu.convert.openclip import jax_to_openclip

# OpenCLIP config tables per variant (reference transfer_jax2hf.py:76-92).
VISION_MODEL_CONFIG = {
    "Ti": {"layers": 12, "width": 192, "head_width": 64},
    "S": {"layers": 12, "width": 384, "head_width": 64},
    "B": {"layers": 12, "width": 768, "head_width": 64},
    "L": {"layers": 24, "width": 1024, "head_width": 64},
    "So400m": {"layers": 27, "width": 1152, "head_width": 72, "mlp_ratio": 3.7362},
    "H": {"layers": 32, "width": 1280, "head_width": 80},
}
TEXT_MODEL_CONFIG = {
    "Ti": {"layers": 12, "width": 192, "heads": 3},
    "S": {"layers": 12, "width": 384, "heads": 6},
    "B": {"layers": 12, "width": 512, "heads": 8},
    "L": {"layers": 12, "width": 768, "heads": 12},
    "So400m": {"layers": 27, "width": 1152, "heads": 16, "mlp_ratio": 3.7362},
    "H": {"layers": 24, "width": 1024, "heads": 16},
}


def synthesize_config(
    img_variant: str,
    txt_variant: str,
    *,
    res: int,
    out_dim: int,
    context_length: int = 80,
    vocab_size: int = 32000,
) -> dict:
    v = img_variant.split("/")[0]
    patch = int(img_variant.split("/")[1]) if "/" in img_variant else 16
    vision_cfg = dict(
        VISION_MODEL_CONFIG[v],
        patch_size=patch,
        image_size=res,
        pool_type="avg",
        final_ln_after_pool=True,
        no_ln_pre=True,
    )
    text_cfg = dict(
        TEXT_MODEL_CONFIG[txt_variant.split("/")[0]],
        context_length=context_length,
        vocab_size=vocab_size,
        pool_type="last",
        no_causal_mask=True,
        act_kwargs={"approximate": "tanh"},
    )
    return {
        "model_cfg": {
            "embed_dim": out_dim,
            "vision_cfg": vision_cfg,
            "text_cfg": text_cfg,
        },
        "preprocess_cfg": {
            "mean": [0.485, 0.456, 0.406],
            "std": [0.229, 0.224, 0.225],
        },
    }


def load_params_any(path: str):
    """Loads params from an Orbax dir or a flat npz file."""
    from openvision_tpu.train import checkpoint as ckpt_lib

    if path.endswith(".npz") or ":" in os.path.basename(path):
        tree = ckpt_lib.load_npz(path)
        return tree.get("params", tree)
    return ckpt_lib.restore_params(path, None)


def parity_probe(params, cfg: dict, state_dict) -> float:
    """Max |Δ| between the JAX vision tower and the converted torch model."""
    try:
        import torch
    except ImportError:
        return float("nan")
    # Re-load through the converted artifacts path (tools/model_io) and
    # compare against the original params' forward.
    from openvision_tpu.convert.openclip import openclip_to_jax
    from openvision_tpu.models import vit as vit_mod

    vcfg = cfg["model_cfg"]["vision_cfg"]
    heads = vcfg["width"] // vcfg["head_width"]
    back = openclip_to_jax(
        {k: np.asarray(v) for k, v in state_dict.items()},
        num_heads_vision=heads,
        num_heads_text=cfg["model_cfg"]["text_cfg"]["heads"],
    )
    def tower(posemb):
        return vit_mod.ViT(
            num_classes=cfg["model_cfg"]["embed_dim"],
            patch_size=(vcfg["patch_size"], vcfg["patch_size"]),
            width=vcfg["width"], depth=vcfg["layers"],
            mlp_dim=int(vcfg["width"] * vcfg.get("mlp_ratio", 4.0)),
            num_heads=heads, posemb=posemb, pool_type="gap",
            emb_head_bias=False,
        )

    x = jnp.ones((1, vcfg["image_size"], vcfg["image_size"], 3)) * 0.5
    src_posemb = "learn" if "pos_embedding" in params["img"] else "sincos2d"
    a = tower(src_posemb).apply({"params": params["img"]}, x)
    b = tower("learn").apply({"params": back["img"]}, x)
    return float(jnp.max(jnp.abs(a - b)))


def export(
    checkpoint: str,
    out_dir: str,
    *,
    img: str,
    txt: str,
    res: int,
    out_dim: int,
    context_length: int = 80,
    vocab_size: int = 30522,
    repo: str | None = None,
    token: str | None = None,
):
    params = load_params_any(checkpoint)
    params = jax.device_get(params)
    state_np = jax_to_openclip(params)
    cfg = synthesize_config(
        img, txt, res=res, out_dim=out_dim,
        context_length=context_length, vocab_size=vocab_size,
    )

    # The source may use fixed sincos2d posembs (no param); materialize them
    # so the torch model has a positional_embedding buffer.
    if "visual.positional_embedding" not in state_np:
        from openvision_tpu.models.layers import posemb_sincos_2d

        grid = res // cfg["model_cfg"]["vision_cfg"]["patch_size"]
        pe = posemb_sincos_2d(
            grid, grid, cfg["model_cfg"]["vision_cfg"]["width"], cls_token=True
        )
        state_np["visual.positional_embedding"] = np.asarray(pe[0])

    os.makedirs(out_dir, exist_ok=True)
    import torch

    torch.save(
        {k: torch.tensor(v) for k, v in state_np.items()},
        os.path.join(out_dir, "open_clip_pytorch_model.bin"),
    )
    with open(os.path.join(out_dir, "open_clip_config.json"), "w") as f:
        json.dump(cfg, f, indent=2)

    # copy the tokenizer vocab so the export is self-contained
    vocab_src = "assets/bert_base_vocab_bos_eos.txt"
    if os.path.exists(vocab_src):
        import shutil

        shutil.copy(vocab_src, os.path.join(out_dir, "vocab.txt"))

    gap = parity_probe(params, cfg, state_np)
    print(f"export written to {out_dir}; vision parity max|Δ| = {gap:.2e}")

    if repo:
        try:
            from huggingface_hub import HfApi, create_repo, login
        except ImportError:
            print("huggingface_hub not installed; skipping upload")
            return
        login(token=token)
        create_repo(repo, private=True, repo_type="model", exist_ok=True)
        HfApi().upload_folder(folder_path=out_dir, repo_id=repo, path_in_repo="")
        print(f"uploaded to {repo}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--img", default="L/14")
    p.add_argument("--txt", default="L")
    p.add_argument("--res", type=int, default=224)
    p.add_argument("--out_dim", type=int, default=768)
    p.add_argument("--context_length", type=int, default=80)
    p.add_argument("--vocab_size", type=int, default=30522)
    p.add_argument("--repo", default=None)
    p.add_argument("--token", default=None)
    a = p.parse_args(argv)
    export(
        a.checkpoint, a.out, img=a.img, txt=a.txt, res=a.res, out_dim=a.out_dim,
        context_length=a.context_length, vocab_size=a.vocab_size,
        repo=a.repo, token=a.token,
    )


if __name__ == "__main__":
    main()
