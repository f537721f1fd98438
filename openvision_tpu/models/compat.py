"""Reference-config compatibility: translate OpenVision model kwargs.

Configs written for the reference (src/configs/openvision.py:200-263) use
keys like `use_flash_attn`, `scan_attn`, `mlp_chunck`, string dtypes, and a
`mesh` argument. This maps them onto openvision_tpu's native fields so those
configs keep working unchanged.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    "f32": jnp.float32,
    "bf16": jnp.bfloat16,
}


def translate_model_kwargs(kw: dict[str, Any]) -> dict[str, Any]:
    kw = dict(kw)
    kw.pop("mesh", None)  # the mesh is ambient (jit shardings), not a module arg
    kw.pop("block_size", None)

    if kw.pop("use_flash_attn", False):
        kw["attn_impl"] = "flash"
    elif kw.pop("scan_attn", False):
        kw["attn_impl"] = "scan"
    else:
        kw.pop("scan_attn", None)

    if "mlp_chunck" in kw:  # the reference's (sic) spelling
        kw["chunk"] = kw.pop("mlp_chunck")
    if "patch_embeding" in kw:
        kw["patch_embedding"] = kw.pop("patch_embeding")
    if "casual_mask" in kw:  # the reference's (sic) spelling
        kw["causal"] = kw.pop("casual_mask")

    for key in ("dtype", "param_dtype"):
        v = kw.get(key)
        if isinstance(v, str):
            kw[key] = _DTYPES[v]

    return kw
