"""Shared building blocks: position embeddings, MLP, LayerScale, DropPath.

Numeric-parity notes vs the reference (for Model-Zoo checkpoint fidelity):
- vision MLP uses exact GELU (vit.py:202), text MLP uses tanh-approx GELU
  (text_transformer.py:117) — the `gelu_approx` flag selects this.
- sincos2d posemb follows MoCo-v3 ordering sin(x),cos(x),sin(y),cos(y) with a
  zero row prepended for [cls] (vit.py:142-164); sincos1d follows
  text_transformer.py:45-61.
- LayerScale stores its param under `ls{i}/ls{i}` (vit.py:227-240 uses the
  module name as the param name — a quirk we must reproduce for checkpoints).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# Logical activation sharding for (batch, length, embed) activations.
ACT_BLD = ("activation_batch", "activation_length", "activation_embed")
# Pooled (batch, embed) vectors: keep the embed dim REPLICATED. These are
# tiny (B, D) tensors right before heads whose kernels ride the
# (embed->fsdp, vocab->tensor) param rules; tensor-sharding their embed dim
# forces GSPMD into involuntary full rematerialization in the head/projection
# transposes (spmd_partitioner.cc warnings in the multi-chip dryrun), and the
# losses all_gather them anyway.
ACT_BD = ("activation_batch", None)
ACT_BLHD = (
    "activation_batch",
    "activation_length",
    "activation_heads",
    "activation_kv",
)


def logical(x: jax.Array, names) -> jax.Array:
    """Logical-axes activation sharding constraint.

    flax's with_logical_constraint silently no-ops unless a legacy global
    mesh context is active or a mesh is passed explicitly — so the active
    mesh (openvision_tpu.parallel.use_mesh) is forwarded here. Skipped
    inside shard_map-manual regions (PP stages, fused TP kernels), where a
    NamedSharding constraint over manual axes is illegal; there the
    enclosing shard_map specs already pin the layout."""
    from openvision_tpu.parallel import active_mesh

    mesh = active_mesh()
    if mesh is None:
        return nn.with_logical_constraint(x, names)
    if jax.sharding.get_abstract_mesh()._any_axis_manual:
        return x
    return nn.with_logical_constraint(x, names, mesh=mesh)


def posemb_sincos_2d(
    h: int,
    w: int,
    width: int,
    temperature: float = 10_000.0,
    dtype: Dtype = jnp.float32,
    cls_token: bool = False,
) -> jax.Array:
    """MoCo-v3 style fixed 2-D sincos position embedding, shape (1, [1+]hw, width)."""
    assert width % 4 == 0, "width must be a multiple of 4 for sincos2d"
    y, x = np.mgrid[:h, :w]
    omega = np.arange(width // 4) / (width // 4 - 1)
    omega = 1.0 / (temperature**omega)
    y = np.einsum("m,d->md", y.flatten(), omega)
    x = np.einsum("m,d->md", x.flatten(), omega)
    pe = np.concatenate([np.sin(x), np.cos(x), np.sin(y), np.cos(y)], axis=1)
    if cls_token:
        pe = np.concatenate([np.zeros((1, width)), pe], axis=0)
    return jnp.asarray(pe, dtype)[None]


def posemb_sincos_1d(
    max_len: int,
    width: int,
    min_scale: float = 1.0,
    max_scale: float = 10_000.0,
    dtype: Dtype = jnp.float32,
) -> jax.Array:
    """1-D sincos position embedding (sin in first half of dims, cos second)."""
    pe = np.zeros((max_len, width), dtype=np.float32)
    pos = np.arange(max_len)[:, None]
    half = width // 2
    scale = -np.log(max_scale / min_scale) / (half - 1)
    div = min_scale * np.exp(np.arange(half) * scale)
    pe[:, :half] = np.sin(pos * div)
    pe[:, half : 2 * half] = np.cos(pos * div)
    return jnp.asarray(pe, dtype)[None]


def get_posemb(
    module: nn.Module,
    typ: str,
    seqshape,
    width: int,
    name: str = "pos_embedding",
    dtype: Dtype = jnp.float32,
    cls_token: bool = False,
    init_std: float = 0.02,
) -> jax.Array:
    """Returns a (1, L, width) position embedding; learned ones are params.

    `seqshape` is (h, w) for 2-D or an int length for 1-D. For `learn` with
    cls_token, length is prod(seqshape)+1 (posemb covers the cls slot too for
    1-D text; for vision the cls slot is prepended as zeros only in sincos2d —
    learned vision posembs also include the cls slot, vit.py:166-173).
    """
    if typ == "learn":
        if isinstance(seqshape, (tuple, list)):
            length = int(np.prod(seqshape)) + (1 if cls_token else 0)
        else:
            length = int(seqshape)
        return module.param(
            name,
            nn.with_logical_partitioning(
                nn.initializers.normal(stddev=init_std), (None, None, "embed")
            ),
            (1, length, width),
            dtype,
        )
    if typ == "sincos2d":
        h, w = seqshape
        return posemb_sincos_2d(h, w, width, dtype=dtype, cls_token=cls_token)
    if typ == "sincos1d":
        return posemb_sincos_1d(int(seqshape), width, dtype=dtype)
    raise ValueError(f"Unknown posemb type: {typ!r}")


class MlpBlock(nn.Module):
    """Transformer feed-forward block: Dense → GELU → Dense.

    Child Dense layers are auto-named Dense_0 / Dense_1 (checkpoint layout).
    """

    mlp_dim: Optional[int] = None  # default 4x input width
    dropout: float = 0.0
    gelu_approx: bool = False  # False: vision towers; True: text towers
    fc_init: Callable = nn.initializers.normal(stddev=0.02)
    proj_init: Callable = nn.initializers.variance_scaling(
        scale=0.3072, distribution="truncated_normal", mode="fan_out"
    )
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        d = x.shape[-1]
        x = logical(x, ACT_BLD)
        x = nn.Dense(
            self.mlp_dim or 4 * d,
            kernel_init=nn.with_logical_partitioning(self.fc_init, ("embed", "mlp")),
            bias_init=nn.with_logical_partitioning(nn.initializers.zeros, (None,)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = nn.gelu(x.astype(self.dtype), approximate=self.gelu_approx)
        # Exposed for activation-maximization tools (feature_viz hooks GELU
        # activations like reference cliptoolsoptimized.py:1149); recorded
        # only when apply() is called with mutable=["intermediates"].
        self.sow("intermediates", "gelu", x)
        x = logical(x, ACT_BLD)
        x = nn.Dropout(rate=self.dropout)(x, deterministic)
        x = nn.Dense(
            d,
            kernel_init=nn.with_logical_partitioning(self.proj_init, ("mlp", "embed")),
            bias_init=nn.with_logical_partitioning(nn.initializers.zeros, (None,)),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x.astype(self.dtype))
        return logical(x, ACT_BLD)


class LayerScale(nn.Module):
    """Per-channel learnable residual scaling (CaiT).

    Checkpoint quirk: the param inside module `ls1` is also called `ls1`
    (flat name `.../ls1/ls1`), matching reference vit.py:227-240.
    """

    dim: int
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param(
            self.name, nn.initializers.constant(self.init_values), (self.dim,)
        )
        return x * scale


class DropPath(nn.Module):
    """Stochastic depth: drops entire residual branches per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("drop_path")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=jnp.float32))
        return x / keep * mask


def layer_norm(dtype, param_dtype, name: str | None = None, **kw) -> nn.LayerNorm:
    """LayerNorm with the framework's logical partitioning (scale on 'norm')."""
    return nn.LayerNorm(
        dtype=dtype,
        param_dtype=param_dtype,
        scale_init=nn.with_logical_partitioning(nn.initializers.ones_init(), ("norm",)),
        bias_init=nn.with_logical_partitioning(nn.initializers.zeros_init(), (None,)),
        name=name,
        **kw,
    )
