"""Text transformer tower.

Capability parity with reference src/models/text_transformer.py: 32k-vocab
embedding, learned/sincos1d posemb, pre-LN encoder with width/depth-scaled
inits and tanh-approx GELU, optional causal masking, and the reference's
modified pooling — final LayerNorm then take the LAST token
(text_transformer.py:677-685); tokens output drops the last position.

Checkpoint layout (transfer_jax2hf.py:342-354):
  Embed_0/embedding, pos_embedding, Transformer/encoderblock_i/...,
  encoder_norm/{scale,bias}, head/kernel (no bias).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from openvision_tpu.models.encoder import Encoder
from openvision_tpu.models.layers import ACT_BD, ACT_BLD, get_posemb, logical

Dtype = Any

# Text variant table differs from vision (text_transformer.py:751-758).
VARIANTS = {
    "Ti": (192, 12, 768, 3),
    "S": (384, 12, 1536, 6),
    "M": (512, 12, 2048, 8),
    "B": (512, 12, 2048, 8),
    "L": (768, 12, 3072, 12),
    "So400m": (1152, 27, 4304, 16),
    "H": (1024, 24, 4096, 16),
    "g": (1280, 32, 5120, 16),
    "G": (1664, 48, 8192, 16),
    "e": (1792, 56, 15360, 16),
}


def decode_variant(variant: str | None) -> dict:
    if variant is None:
        return {}
    v = variant.split("/")[0]  # "B/16" → text width table ignores patch
    width, depth, mlp_dim, num_heads = VARIANTS[v]
    return dict(width=width, depth=depth, mlp_dim=mlp_dim, num_heads=num_heads)


def text_global_pool(
    x: jax.Array, text: Optional[jax.Array] = None, pool_type: str = "last"
):
    """Pools token features: 'first' | 'last' | 'argmax' (eot) | none."""
    if pool_type == "first":
        return x[:, 0], x[:, 1:]
    if pool_type == "last":
        return x[:, -1], x[:, :-1]
    if pool_type == "argmax":
        assert text is not None
        return x[jnp.arange(x.shape[0]), jnp.argmax(text, axis=-1)], x
    return x, x


class TextTransformer(nn.Module):
    """Text tower producing (pooled_embedding, token_features)."""

    num_classes: Optional[int] = None  # projection dim
    width: int = 512
    depth: int = 12
    mlp_dim: Optional[int] = None
    num_heads: int = 8
    vocab_size: int = 32000
    posemb: str = "learn"  # "learn" | "sincos1d"
    pool_type: str = "last"
    dropout: float = 0.0
    drop_path: float = 0.0
    causal: bool = False
    remat_policy: str = "none"
    attn_impl: str = "xla"
    chunk: int = 128
    scan_mlp: bool = False
    head_zeroinit: bool = False
    embed_cls: bool = False  # kept for config compat (pooling covers it)
    output_tokens: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_dense_general: bool = False

    @nn.compact
    def __call__(self, text: jax.Array, *, train: bool = False):
        embedding = nn.Embed(
            num_embeddings=self.vocab_size,
            features=self.width,
            dtype=jnp.float32,  # fp32 embeds for logit/training stability
            param_dtype=self.param_dtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), ("vocab", "embed")
            ),
        )
        if text.ndim == 3:
            # Soft one-hot tokens (gradient-ascent tool): text @ embedding
            # matrix, like reference ov-gradient-ascent.py:106.
            table = embedding(jnp.arange(self.vocab_size))
            x = text.astype(jnp.float32) @ table
        else:
            # Reshard the (tiny, int32) token ids onto the activation batch
            # axes BEFORE the table gather: ids arrive batch-sharded over
            # every mesh axis (BATCH_SPEC) and a gather whose indices are
            # 8-way batch-sharded forces GSPMD into involuntary full
            # rematerialization when its (B, L, D) output meets the
            # (data, fsdp)-batch ACT_BLD stream. Moving the ids costs ~KB;
            # moving the embedded stream costs a full remat.
            x = embedding(
                logical(text.astype(jnp.int32), ("activation_batch", None))
            )
        _, l, d = x.shape

        x = logical(x, ACT_BLD)
        x = x.astype(self.param_dtype) + get_posemb(
            self, self.posemb, l, d, "pos_embedding", self.param_dtype,
            cls_token=True, init_std=0.01,
        )
        x = logical(x.astype(self.dtype), ACT_BLD)
        x = nn.Dropout(rate=self.dropout)(x, not train)

        x = Encoder(
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            drop_path=self.drop_path,
            init_style="scaled",
            causal=self.causal,
            remat_policy=self.remat_policy,
            attn_impl=self.attn_impl,
            chunk=self.chunk,
            scan_mlp=self.scan_mlp,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_dense_general=self.use_dense_general,
            name="Transformer",
        )(x, deterministic=not train)

        # Reference-modified pooling (text_transformer.py:682-685): token
        # features for the decoder are PRE-norm; the pooled embedding is
        # LN'd then pooled ('last' = the appended [CLS] position).
        if self.pool_type == "last":
            tokens = x[:, :-1]
        elif self.pool_type == "first":
            tokens = x[:, 1:]
        else:
            tokens = x
        x = nn.LayerNorm(name="encoder_norm")(x)
        pooled, _ = text_global_pool(x, text, self.pool_type)

        if self.num_classes:
            pooled = logical(pooled, ACT_BD)
            head_init = (
                nn.initializers.zeros
                if self.head_zeroinit
                else nn.initializers.normal(stddev=self.width**-0.5)
            )
            pooled = nn.Dense(
                self.num_classes,
                use_bias=False,
                dtype=jnp.float32,
                param_dtype=self.param_dtype,
                kernel_init=nn.with_logical_partitioning(
                    head_init, ("embed", "vocab")
                ),
                name="head",
            )(pooled)

        if self.output_tokens:
            return pooled, tokens
        return pooled


def Model(num_classes=None, *, variant=None, **kw):
    """Factory mirroring the reference API."""
    from openvision_tpu.models.compat import translate_model_kwargs

    kw = translate_model_kwargs(kw)
    return TextTransformer(num_classes=num_classes, **{**decode_variant(variant), **kw})
