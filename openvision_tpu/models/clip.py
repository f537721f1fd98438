"""Two-tower CLIP/CoCa model: ViT image tower + text tower (+ caption decoder).

Capability parity with reference src/models/two_towers.py: L2-normalized
zimg/ztxt with their norms in the out-dict, a learnable log-temperature `t`
(exp'd in outputs), optional logit bias `b`, and the CoCa decoder consuming
image tokens + the FIRST caption view's text tokens during training
(two_towers.py:95-98 halves token_embs because the batch carries two text
views per image).

Checkpoint layout: towers under `img` / `txt`, decoder under `txt_decoder`,
scalars `t` (+ optional `b`) at the root.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from openvision_tpu.models import decoder as decoder_mod
from openvision_tpu.models import text as text_mod
from openvision_tpu.models import vit as vit_mod
from openvision_tpu.models.layers import ACT_BD, logical

ConfigDict = Any


class CLIPModel(nn.Module):
    out_dim: Union[int, Tuple[Optional[int], int]] = 512
    image: Optional[ConfigDict] = None
    text: Optional[ConfigDict] = None
    text_decoder_config: Optional[ConfigDict] = None
    text_decoder: Optional[str] = "text_decoder"  # "none" disables captioning
    temperature_init: float = 10.0
    init_logit_bias: Optional[float] = None

    @nn.compact
    def __call__(
        self,
        image: Optional[jax.Array],
        text: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ):
        zimg = ztxt = None
        out = {"logits": None}
        out_dims = self.out_dim
        if isinstance(out_dims, int):
            out_dims = (out_dims, out_dims)

        image_embs = token_embs = None
        if image is not None:
            img_tower = vit_mod.Model(
                num_classes=out_dims[0],
                **dict(self.image or {}),
                name="img",
            )
            result = img_tower(image, train=train)
            zimg, image_embs = result if isinstance(result, tuple) else (result, None)
            zimg = logical(zimg.astype(jnp.float32), ACT_BD)
            out["img/norm"] = jnp.linalg.norm(zimg, axis=1, keepdims=True)
            zimg = zimg / (out["img/norm"] + 1e-8)
            out["img/normalized"] = zimg

        if text is not None:
            txt_tower = text_mod.Model(
                num_classes=out_dims[1],
                **dict(self.text or {}),
                name="txt",
            )
            result = txt_tower(text, train=train)
            ztxt, token_embs = result if isinstance(result, tuple) else (result, None)
            ztxt = logical(ztxt.astype(jnp.float32), ACT_BD)
            out["txt/norm"] = jnp.linalg.norm(ztxt, axis=1, keepdims=True)
            ztxt = ztxt / (out["txt/norm"] + 1e-8)
            out["txt/normalized"] = ztxt

        if (
            image is not None
            and text is not None
            and self.text_decoder not in (None, "none")
            and image_embs is not None
            and token_embs is not None
        ):
            cap = decoder_mod.Model(
                **dict(self.text_decoder_config or {}), name="txt_decoder"
            )
            if train:
                # Training batches stack two text views; caption only view 1.
                token_embs = token_embs[: token_embs.shape[0] // 2]
            logits, cap_aux = cap(image_embs, token_embs, train=train)
            out["logits"] = logits
            if "prelogits" in cap_aux:
                # head-fused caption loss path (losses.linear_softmax_xent)
                out["cap_prelogits"] = cap_aux["prelogits"]

        t = self.param(
            "t",
            lambda key, shape, dtype: jnp.log(self.temperature_init)
            * jnp.ones(shape, dtype),
            (1,),
            jnp.float32,
        )
        out["t"] = jnp.exp(t)
        out["t/parameter"] = t

        if self.init_logit_bias is not None:
            out["b"] = self.param(
                "b",
                lambda k, s, d: self.init_logit_bias * jnp.ones(s, d),
                (1,),
                jnp.float32,
            )
            out["logit_bias"] = out["b"]

        return zimg, ztxt, out


def Model(**kw):
    """Factory accepting reference-style two_towers config kwargs."""
    kw = dict(kw)
    kw.pop("mesh", None)
    kw.pop("image_model", None)  # only the ViT tower exists (as in practice)
    kw.pop("text_model", None)
    kw.pop("quick_gelu", None)
    kw.pop("cast_dtype", None)
    kw.pop("pad_id", None)
    return CLIPModel(**kw)
