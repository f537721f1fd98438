"""Per-tower checkpoint loading helpers.

Capability parity with reference vit.py:903 (`load` with posemb resampling and
dont_load regexes) and two_towers.py:121 (per-tower `init_files` dict with
"img"/"txt"/"t" keys, `"file.npz:img"` subtree shortcuts).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from openvision_tpu.utils import merge_params


def _load_tree(init_file: str):
    from openvision_tpu.train.checkpoint import load_npz, restore_params

    if init_file.endswith(".npz") or ".npz:" in init_file:
        return load_npz(init_file)
    return restore_params(init_file, None)


def load_vit(init_params, init_file: str, dont_load=()):
    """Loads a ViT tower, resampling posemb for resolution changes."""
    from openvision_tpu.models.vit import resample_posemb

    restored = _load_tree(init_file)
    if "img" in restored and "Transformer" not in restored:
        restored = restored["img"]
    restored = merge_params(restored, init_params, dont_load=dont_load)
    if init_params and "pos_embedding" in init_params and "pos_embedding" in restored:
        restored["pos_embedding"] = np.asarray(
            resample_posemb(
                jnp.asarray(restored["pos_embedding"]),
                init_params["pos_embedding"].shape[1],
            )
        )
    return restored


def load_text(init_params, init_file: str, dont_load=()):
    restored = _load_tree(init_file)
    if "txt" in restored and "Transformer" not in restored:
        restored = restored["txt"]
    return merge_params(restored, init_params, dont_load=dont_load)


def load_two_towers(init_params, init_files, img_load_kw=None, txt_load_kw=None):
    """Loads both towers; `init_files` is a path or {"img","txt","t"} dict."""
    if isinstance(init_files, str):
        init_files = {k: f"{init_files}:{k}" for k in ("img", "txt", "t")}
    else:
        init_files = dict(init_files)

    restored = dict(init_params)
    img_init = init_files.pop("image", init_files.pop("img", None))
    if img_init:
        restored["img"] = load_vit(
            init_params["img"], img_init, **(img_load_kw or {})
        )
    txt_init = init_files.pop("text", init_files.pop("txt", None))
    if txt_init:
        restored["txt"] = load_text(
            init_params["txt"], txt_init, **(txt_load_kw or {})
        )
    t_init = init_files.pop("temperature", init_files.pop("t", None))
    if t_init:
        restored["t"] = np.asarray(_load_tree(t_init))
    assert not init_files, f"unused keys in init_files: {list(init_files)}"
    return restored
