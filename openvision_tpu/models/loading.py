"""Per-tower checkpoint loading helpers.

Capability parity with reference vit.py:903 (`load` with posemb resampling and
dont_load regexes) and two_towers.py:121 (per-tower `init_files` dict with
"img"/"txt"/"t" keys, `"file.npz:img"` subtree shortcuts).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from openvision_tpu.utils import merge_params


# Published-checkpoint vanity names (reference vit.py:935-968): short names
# resolve to their gs:// npz paths. Fetch requires GCS access (a pod VM or
# gcsfuse mount); local paths work directly.
VANITY_NAMES = {
    "howto-i21k-Ti/16": "gs://vit_models/augreg/Ti_16-i21k-300ep-lr_0.001-aug_none-wd_0.03-do_0.0-sd_0.0.npz",
    "howto-i21k-S/32": "gs://vit_models/augreg/S_32-i21k-300ep-lr_0.001-aug_none-wd_0.1-do_0.0-sd_0.0.npz",
    "howto-i21k-S/16": "gs://vit_models/augreg/S_16-i21k-300ep-lr_0.001-aug_light1-wd_0.03-do_0.0-sd_0.0.npz",
    "howto-i21k-B/32": "gs://vit_models/augreg/B_32-i21k-300ep-lr_0.001-aug_light1-wd_0.1-do_0.0-sd_0.0.npz",
    "howto-i21k-B/16": "gs://vit_models/augreg/B_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.0-sd_0.0.npz",
    "howto-i21k-B/8": "gs://vit_models/augreg/B_8-i21k-300ep-lr_0.001-aug_medium2-wd_0.1-do_0.0-sd_0.0.npz",
    "howto-i21k-L/16": "gs://vit_models/augreg/L_16-i21k-300ep-lr_0.001-aug_strong1-wd_0.1-do_0.0-sd_0.0.npz",
    "i1k-s16-90ep": "gs://big_vision/vit_s16_i1k_90ep.npz",
    "i1k-s16-150ep": "gs://big_vision/vit_s16_i1k_150ep.npz",
    "i1k-s16-300ep": "gs://big_vision/vit_s16_i1k_300ep.npz",
    "deit3_S_224_1k": "gs://big_vision/zoo/deit3/bv_deit_3_small_224_1k.npz",
    "deit3_S_224_21k": "gs://big_vision/zoo/deit3/bv_deit_3_small_224_21k.npz",
    "deit3_S_384_1k": "gs://big_vision/zoo/deit3/bv_deit_3_small_384_1k.npz",
    "deit3_S_384_21k": "gs://big_vision/zoo/deit3/bv_deit_3_small_384_21k.npz",
    "deit3_B_224_1k": "gs://big_vision/zoo/deit3/bv_deit_3_base_224_1k.npz",
    "deit3_B_224_21k": "gs://big_vision/zoo/deit3/bv_deit_3_base_224_21k.npz",
    "deit3_B_384_1k": "gs://big_vision/zoo/deit3/bv_deit_3_base_384_1k.npz",
    "deit3_B_384_21k": "gs://big_vision/zoo/deit3/bv_deit_3_base_384_21k.npz",
    "deit3_L_224_1k": "gs://big_vision/zoo/deit3/bv_deit_3_large_224_1k.npz",
    "deit3_L_224_21k": "gs://big_vision/zoo/deit3/bv_deit_3_large_224_21k.npz",
    "deit3_L_384_1k": "gs://big_vision/zoo/deit3/bv_deit_3_large_384_1k.npz",
    "deit3_L_384_21k": "gs://big_vision/zoo/deit3/bv_deit_3_large_384_21k.npz",
}


def _load_tree(init_file: str):
    from openvision_tpu.train.checkpoint import load_npz, restore_params

    init_file = VANITY_NAMES.get(init_file, init_file)
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
