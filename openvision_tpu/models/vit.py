"""ViT image tower.

Capability parity with reference src/models/vit.py (patch-embed conv/stem/
linear, cls token, learned/sincos2d posemb, MAE-style random token masking,
gap/tok/map/0/avg pooling, variant table mu→e, posemb resampling for hi-res
finetuning), on the shared Encoder with selectable attention backends.

Checkpoint layout (Model-Zoo Orbax / transfer_jax2hf.py:137-249):
  embedding/{kernel,bias}, cls, pos_embedding?, Transformer/encoderblock_i/...,
  encoder_norm/{scale,bias}, head/{kernel,bias?}.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openvision_tpu.models.encoder import Encoder
from openvision_tpu.models.layers import (
    ACT_BD,
    ACT_BLD,
    MlpBlock,
    get_posemb,
    layer_norm,
    logical,
)

Dtype = Any

# Width/depth/mlp/heads per variant — Table 2 of arXiv:2106.04560 (same table
# the reference uses, vit.py:826-835).
VARIANTS = {
    "mu": (32, 1, 128, 2),
    "Ti": (192, 12, 768, 3),
    "S": (384, 12, 1536, 6),
    "M": (512, 12, 2048, 8),
    "B": (768, 12, 3072, 12),
    "L": (1024, 24, 4096, 16),
    "So400m": (1152, 27, 4304, 16),
    "H": (1280, 32, 5120, 16),
    "g": (1408, 40, 6144, 16),
    "g-opt": (1536, 40, 6144, 16),
    "G": (1664, 48, 8192, 16),
    "G-opt": (1536, 48, 8192, 16),
    "e": (1792, 56, 15360, 16),
}


def decode_variant(variant: str | None) -> dict:
    """Parses "L/14" → dict(width=1024, depth=24, mlp_dim=4096, num_heads=16, patch_size=(14,14))."""
    if variant is None:
        return {}
    v, patch = (variant.split("/") + [None])[:2]
    width, depth, mlp_dim, num_heads = VARIANTS[v]
    out = dict(width=width, depth=depth, mlp_dim=mlp_dim, num_heads=num_heads)
    if patch is not None:
        out["patch_size"] = (int(patch), int(patch))
    return out


class MAPHead(nn.Module):
    """Multihead attention pooling (learned probe token)."""

    num_heads: int = 12
    mlp_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, _, d = x.shape
        probe = self.param(
            "probe", nn.initializers.xavier_uniform(), (1, 1, d), x.dtype
        )
        probe = jnp.tile(probe, (n, 1, 1))
        x = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, kernel_init=nn.initializers.xavier_uniform()
        )(probe, x)
        y = nn.LayerNorm()(x)
        x = x + MlpBlock(mlp_dim=self.mlp_dim)(y)
        return x[:, 0]


# (mask_ratio → candidate window heights/widths) for 'square' masking on a
# 14x14 grid — same tables as reference vit.py:476-520.
_SQUARE_WINDOWS = {
    0.5: ([3, 14], [14, 3]),
    0.25: ([16, 12], [12, 16]),
    0.525: ([11], [11]),
    0.4375: ([12], [12]),
    0.75: ([7], [7]),
    0.816: ([4, 6, 9], [9, 6, 4]),
    0.875: ([2, 3, 4, 6, 8, 12], [12, 8, 6, 4, 3, 2]),
    0.918: ([2, 4, 8], [8, 4, 2]),
}


def _keep_by_noise(x, noise, len_keep):
    """Sorts per-sample noise ascending, keeping the lowest-noise tokens."""
    n, l, _ = x.shape
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = jnp.ones((n, l))
    mask = mask.at[:, :len_keep].set(0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore


def random_token_masking(
    x: jax.Array,
    mask_ratio: float,
    rng: jax.Array,
    mask_mode: str = "random",
    height: int = 14,
    width: int = 14,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """MAE-style token masking; returns (kept_tokens, mask, ids_restore).

    Modes (reference vit.py:464-636): 'random' uniform subset; 'square' keeps
    a random rectangular window (sizes per _SQUARE_WINDOWS); and
    'per2x2_random_grid' keeps a random cell of each 2x2 patch block.
    """
    n, l, _ = x.shape
    len_keep = int(l * (1.0 - mask_ratio))

    if mask_mode == "random":
        noise = jax.random.uniform(rng, (n, l))
        return _keep_by_noise(x, noise, len_keep)

    if mask_mode == "square":
        hs, ws = _SQUARE_WINDOWS[mask_ratio]
        k_idx, k_top, k_left = jax.random.split(rng, 3)
        pick = jax.random.randint(k_idx, (n,), 0, len(hs))
        mh = jnp.asarray(hs)[pick]
        mw = jnp.asarray(ws)[pick]
        top = jax.random.randint(k_top, (n,), 0, height)
        left = jax.random.randint(k_left, (n,), 0, width)
        top = jnp.minimum(top, height - mh)
        left = jnp.minimum(left, width - mw)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, height, width), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, height, width), 2)
        window = (
            (rows >= top[:, None, None])
            & (rows < (top + mh)[:, None, None])
            & (cols >= left[:, None, None])
            & (cols < (left + mw)[:, None, None])
        )
        # Low noise = keep → the window is the kept region.
        noise = (~window).astype(jnp.float32).reshape(n, l)
        return _keep_by_noise(x, noise, len_keep)

    if mask_mode == "per2x2_random_grid":
        assert mask_ratio in (0.25, 0.5, 0.75), mask_ratio
        h2, w2 = height // 2, width // 2
        if mask_ratio == 0.5:
            # keep 2 of 4 cells per 2x2 block
            scores = jax.random.uniform(rng, (n, h2, w2, 4))
        else:
            scores = jax.random.uniform(rng, (n, h2, w2, 4))
        order = jnp.argsort(scores, axis=-1)
        keep_cells = {0.25: 3, 0.5: 2, 0.75: 1}[mask_ratio]
        rank = jnp.argsort(order, axis=-1)  # rank of each cell
        keep = rank < keep_cells  # (n, h2, w2, 4) bool
        keep = keep.reshape(n, h2, w2, 2, 2)
        keep = jnp.transpose(keep, (0, 1, 3, 2, 4)).reshape(n, height, width)
        noise = (~keep).astype(jnp.float32).reshape(n, l)
        return _keep_by_noise(x, noise, len_keep)

    raise ValueError(f"Unknown mask_mode: {mask_mode!r}")


class ViT(nn.Module):
    """Vision transformer tower producing (pooled_embedding, patch_tokens)."""

    num_classes: Optional[int] = None  # projection dim (CLIP head)
    patch_size: Sequence[int] = (16, 16)
    width: int = 768
    depth: int = 12
    mlp_dim: Optional[int] = None
    num_heads: int = 12
    posemb: str = "learn"  # "learn" | "sincos2d"
    dropout: float = 0.0
    drop_path: float = 0.0
    pool_type: str = "gap"  # "gap" | "tok" | "map" | "0" | "avg"
    patch_embedding: str = "conv"  # "conv" | "linear"
    init_values: Optional[float] = None  # LayerScale
    remat_policy: str = "none"
    attn_impl: str = "xla"
    chunk: int = 128
    scan_mlp: bool = False
    fast_gelu: bool = False  # tanh GELU: ≤5e-6 output cosine deviation, ~17% faster
    nomax_softmax: bool = False  # fused_t: skip softmax max-subtraction (clamp 80)
    mask_ratio: float = 0.0
    mask_mode: str = "random"  # "random" | "square" | "per2x2_random_grid"
    emb_head_bias: bool = True
    head_zeroinit: bool = False
    # In-model ImageNet normalization (reference vit.py:448-451,658-663):
    # an alternative to the pp-string `vgg_value_range` / trainer uint8 prologue.
    post_norm: bool = False
    mean: Sequence[float] = (0.485, 0.456, 0.406)
    std: Sequence[float] = (0.229, 0.224, 0.225)
    final_drop: float = 0.0
    ignore_cls: bool = False
    output_tokens: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_dense_general: bool = False

    @nn.compact
    def __call__(self, image: jax.Array, *, train: bool = False):
        if self.post_norm:
            mean = jnp.asarray(self.mean, image.dtype)[None, None, None, :]
            std = jnp.asarray(self.std, image.dtype)[None, None, None, :]
            image = (image - mean) / std
        if self.patch_embedding == "conv":
            x = nn.Conv(
                self.width,
                tuple(self.patch_size),
                strides=tuple(self.patch_size),
                padding="VALID",
                use_bias=self.emb_head_bias,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.kaiming_uniform(), (None, None, None, None)
                ),
                bias_init=nn.with_logical_partitioning(
                    nn.initializers.zeros, (None,)
                ),
                dtype=jnp.float32,
                param_dtype=self.param_dtype,
                name="embedding",
            )(image)
            n, h, w, c = x.shape
            x = x.reshape(n, h * w, c)
        elif self.patch_embedding == "stem":
            # 3-conv stem + 1x1 projection (reference vit.py:677-698).
            x = image
            for i, (wd, st) in enumerate(zip((96, 192, 384), (1, 2, 2))):
                x = nn.Conv(
                    wd, (3, 3), strides=st, padding="SAME",
                    kernel_init=nn.initializers.kaiming_uniform(),
                    name=f"stem_{i}",
                )(x)
                x = nn.LayerNorm(name=f"stem_norm_{i}")(x)
                x = nn.gelu(x)
            x = nn.Conv(
                self.width, (1, 1), strides=1, padding="SAME",
                kernel_init=nn.initializers.kaiming_uniform(),
                name="embedding",
            )(x)
            n, h, w, c = x.shape
            x = x.reshape(n, h * w, c)
        elif self.patch_embedding == "linear":
            p = self.patch_size[0]
            n = image.shape[0]
            h = w = image.shape[2] // p
            x = image.reshape(n, h, p, w, p, 3)
            x = jnp.einsum("nhpwqc->nhwpqc", x).reshape(n, h * w, p * p * 3)
            x = nn.Dense(self.width, name="embedding")(x)
            c = self.width
        else:
            raise ValueError(f"Unknown patch_embedding: {self.patch_embedding!r}")

        cls = self.param(
            "cls",
            nn.with_logical_partitioning(nn.initializers.normal(1e-6), (None,)),
            (1, 1, c),
            x.dtype,
        )
        x = jnp.concatenate([jnp.tile(cls, (n, 1, 1)), x], axis=1)
        x = x + get_posemb(
            self, self.posemb, (h, w), c, "pos_embedding", x.dtype, cls_token=True
        )

        x = logical(x.astype(self.dtype), ACT_BLD)
        x = nn.Dropout(rate=self.dropout)(x, not train)

        if self.mask_ratio > 0 and train:
            cls_tok, rest = x[:, :1], x[:, 1:]
            rest, _, _ = random_token_masking(
                rest, self.mask_ratio, self.make_rng("random_mask"),
                mask_mode=self.mask_mode, height=h, width=w,
            )
            x = jnp.concatenate([cls_tok, rest], axis=1)

        if self.ignore_cls:
            x = x[:, 1:]

        x = Encoder(
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            drop_path=self.drop_path,
            init_values=self.init_values,
            init_style="vit",
            remat_policy=self.remat_policy,
            attn_impl=self.attn_impl,
            chunk=self.chunk,
            scan_mlp=self.scan_mlp,
            fast_gelu=self.fast_gelu,
            nomax_softmax=self.nomax_softmax,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_dense_general=self.use_dense_general,
            name="Transformer",
        )(x, deterministic=not train)
        encoded = x

        if self.pool_type == "map":
            pooled = MAPHead(num_heads=self.num_heads, mlp_dim=self.mlp_dim)(x)
        elif self.pool_type == "gap":
            pooled = jnp.mean(x if self.ignore_cls else x[:, 1:], axis=1)
            # Pin the pooled (B, D) vector to the activation-batch sharding
            # BEFORE the LN: left unannotated, GSPMD prefers an 8-way batch
            # split for the feature-reduction LN, and the mismatched
            # cotangent then forces involuntary full rematerialization in
            # the head transpose (multi-chip dryrun spmd warnings).
            pooled = logical(pooled, ACT_BD)
            pooled = layer_norm(self.dtype, self.param_dtype, name="encoder_norm")(
                pooled
            )
        elif self.pool_type == "avg":
            pooled = jnp.mean(x[:, 1:] if not self.ignore_cls else x, axis=1)
        elif self.pool_type == "0":
            pooled = x[:, 0]
        elif self.pool_type == "tok":
            x = layer_norm(self.dtype, self.param_dtype, name="encoder_norm")(x)
            pooled = x[:, 0]
        else:
            raise ValueError(f"Unknown pool_type: {self.pool_type!r}")

        tokens = encoded[:, 1:] if not self.ignore_cls else encoded

        if self.num_classes:
            head_init = (
                nn.initializers.zeros
                if self.head_zeroinit
                else nn.initializers.normal(stddev=0.02)
            )
            pooled = logical(pooled, ACT_BD)
            pooled = nn.Dropout(rate=self.final_drop)(pooled, not train)
            pooled = nn.Dense(
                self.num_classes,
                use_bias=self.emb_head_bias,
                kernel_init=nn.with_logical_partitioning(
                    head_init, ("embed", "vocab")
                ),
                bias_init=nn.with_logical_partitioning(
                    nn.initializers.zeros, (None,)
                ),
                dtype=jnp.float32,
                param_dtype=self.param_dtype,
                name="head",
            )(pooled)

        if self.output_tokens:
            return pooled, tokens
        return pooled


def Model(num_classes=None, *, variant=None, **kw):
    """Factory mirroring the reference API (`Model(variant="L/14", ...)`)."""
    from openvision_tpu.models.compat import translate_model_kwargs

    kw = translate_model_kwargs(kw)
    return ViT(num_classes=num_classes, **{**decode_variant(variant), **kw})


def resample_posemb(old: jax.Array, new_shape_len: int) -> jax.Array:
    """Bilinearly resizes a (1, 1+N, D) posemb grid for hi-res finetuning."""
    if old.shape[1] == new_shape_len:
        return old
    cls_pos, grid = old[:, :1], old[:, 1:]
    gs_old = int(np.sqrt(grid.shape[1]))
    gs_new = int(np.sqrt(new_shape_len - 1))
    grid = grid.reshape(gs_old, gs_old, -1)
    grid = jax.image.resize(
        grid, (gs_new, gs_new, grid.shape[-1]), method="bilinear"
    )
    grid = grid.reshape(1, gs_new * gs_new, -1)
    return jnp.concatenate([cls_pos, grid], axis=1)
