"""CoCa-style caption decoder.

Capability parity with reference src/models/text_decoder.py: projects image
tokens and text-tower token features into decoder width, appends learnable
query tokens, and decodes them with either

- `concat` fusion: one self-attention stack over [image+text | queries] with
  a prefix-LM mask (prefix fully visible, queries causal), or
- `cross_attn` fusion: depth//2 pairs of (causal self-attn over queries,
  cross-attn queries ← image+text).

Output: vocab logits over the query positions (LN + tied-width Dense head).

Checkpoint layout mirrors the reference (`image_projection_layer`,
`text_projection_layer`, `learnable_tokens`, Transformer/encoderblock_i
[+ crossattn_encoderblock_i], decoder_norm, head) so Orbax train states
interchange.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openvision_tpu.models.attention_module import MultiHeadAttention
from openvision_tpu.models.encoder import Encoder, EncoderBlock
from openvision_tpu.models.layers import ACT_BLD, MlpBlock, layer_norm, logical

Dtype = Any

# Decoder variant table (text_decoder.py:591-600; H/g differ from the text tower).
VARIANTS = {
    "Ti": (192, 12, 768, 3),
    "S": (384, 12, 1536, 6),
    "M": (512, 12, 2048, 8),
    "B": (512, 12, 2048, 8),
    "L": (768, 12, 3072, 12),
    "So400m": (1152, 27, 4304, 16),
    "H": (1024, 24, 4096, 16),
    "g": (1024, 24, 4096, 16),
    "G": (1664, 48, 8192, 16),
    "e": (1792, 56, 15360, 16),
}


def decode_variant(variant: str | None) -> dict:
    if variant is None:
        return {}
    width, depth, mlp_dim, num_heads = VARIANTS[variant]
    return dict(width=width, depth=depth, mlp_dim=mlp_dim, num_heads=num_heads)


class CrossAttnBlock(nn.Module):
    """Pre-LN cross-attention + MLP residual block (queries ← context).

    Attention params are ALWAYS DenseGeneral-shaped — query/key/value
    kernels (embed, heads, head_dim), out kernel (heads, head_dim, embed) —
    because the reference's crossattn blocks use its nn.MHA subclass
    unconditionally (text_decoder.py:51,98-108,164-173), unlike its
    self-attn blocks whose layout follows `use_dense_general`. Matching
    that layout makes reference cross_attn checkpoints load verbatim
    (tests/test_reference_checkpoint.py round-trips them).
    """

    num_heads: int
    mlp_dim: Optional[int] = None
    dropout: float = 0.0
    drop_path: float = 0.0
    depth: int = 12
    attn_impl: str = "xla"
    chunk: int = 128
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        width = x.shape[-1]
        init_std = dict(
            attn=width**-0.5,
            proj=(width**-0.5) * ((2 * self.depth) ** -0.5),
            fc=(2 * width) ** -0.5,
        )
        x = logical(x.astype(self.dtype), ACT_BLD)
        y = layer_norm(self.dtype, self.param_dtype)(x)
        ctx = layer_norm(self.dtype, self.param_dtype)(context.astype(self.dtype))
        y = MultiHeadAttention(
            num_heads=self.num_heads,
            qkv_init=nn.initializers.normal(stddev=init_std["attn"]),
            out_init=nn.initializers.normal(stddev=init_std["proj"]),
            dropout_rate=self.dropout,
            attn_impl=self.attn_impl,
            chunk=self.chunk,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_dense_general=True,  # reference crossattn layout (see class doc)
            name="MultiHeadDotProductAttention_0",
        )(y, ctx, deterministic=deterministic)
        y = nn.Dropout(rate=self.dropout)(y, deterministic)
        x = logical(x + y, ACT_BLD)

        y = layer_norm(self.dtype, self.param_dtype)(x)
        y = MlpBlock(
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            gelu_approx=True,
            fc_init=nn.initializers.normal(stddev=init_std["fc"]),
            proj_init=nn.initializers.normal(stddev=init_std["proj"]),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="MlpBlock_0",
        )(y, deterministic)
        y = nn.Dropout(rate=self.dropout)(y, deterministic)
        return logical(x + y, ACT_BLD)


class TextDecoder(nn.Module):
    """Caption decoder head over (image_tokens, text_tokens)."""

    num_classes: int = 32000  # vocab size
    width: int = 512
    depth: int = 12
    mlp_dim: Optional[int] = None
    num_heads: int = 8
    dropout: float = 0.0
    drop_path: float = 0.0
    fusion_style: str = "concat"  # "concat" | "cross_attn"
    causal: bool = True
    num_learnable_tokens: int = 80
    drop_token: int = 0
    remat_policy: str = "none"
    attn_impl: str = "xla"
    chunk: int = 128
    scan_mlp: bool = False
    # skip the head matmul and expose decoder_norm output instead; the
    # train step then computes the caption loss via the head-fused
    # losses.linear_softmax_xent, never materializing (B, L, V) logits
    return_prelogits: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_dense_general: bool = False

    @nn.compact
    def __call__(
        self, image_embeds: jax.Array, text_embeds: jax.Array, *, train: bool = False
    ):
        if self.drop_token > 0:
            image_embeds = image_embeds[:, : image_embeds.shape[1] - self.drop_token + 1]
        ni, _, di = image_embeds.shape
        _, _, dt = text_embeds.shape

        # Constrain the incoming token streams to the activation rules BEFORE
        # the projection dots: raw inputs arrive batch-sharded over every mesh
        # axis (BATCH_SPEC), and letting that sharding flow into a dot whose
        # kernel rides the (fsdp/tensor) param rules makes GSPMD fall back to
        # involuntary full rematerialization in the transpose (seen as
        # spmd_partitioner.cc warnings around txt_decoder in the dryrun).
        image_embeds = logical(image_embeds, ACT_BLD)
        text_embeds = logical(text_embeds, ACT_BLD)
        image_embeds = nn.Dense(
            self.width,
            use_bias=False,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=di**-0.5), (None, "embed")
            ),
            name="image_projection_layer",
        )(image_embeds)
        text_embeds = nn.Dense(
            self.width,
            use_bias=False,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=dt**-0.5), (None, "embed")
            ),
            name="text_projection_layer",
        )(text_embeds)

        queries = self.param(
            "learnable_tokens",
            nn.initializers.normal(stddev=1.0),
            (self.num_learnable_tokens, self.width),
        )
        queries = jnp.tile(queries[None], (ni, 1, 1))

        # The prefix the queries condition on: image tokens ++ text tokens.
        prefix = jnp.concatenate([image_embeds, text_embeds], axis=1)
        prefix = logical(prefix, ACT_BLD)
        li = prefix.shape[1]

        if self.fusion_style == "concat":
            x = jnp.concatenate([prefix, queries], axis=1)
            x = Encoder(
                depth=self.depth,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                dropout=self.dropout,
                drop_path=self.drop_path,
                init_style="scaled",
                causal=self.causal,
                prefix_len=li,
                remat_policy=self.remat_policy,
                attn_impl=self.attn_impl,
                chunk=self.chunk,
                scan_mlp=self.scan_mlp,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                use_dense_general=self.use_dense_general,
                name="Transformer",
            )(x, deterministic=not train)
            x = x[:, li:]
        elif self.fusion_style == "cross_attn":
            assert self.depth % 2 == 0, "cross_attn fusion needs even depth"
            half = self.depth // 2
            x = _CrossAttnStack(
                depth=half,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                dropout=self.dropout,
                drop_path=self.drop_path,
                causal=self.causal,
                remat_policy=self.remat_policy,
                attn_impl=self.attn_impl,
                chunk=self.chunk,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="Transformer",
            )(queries, prefix, deterministic=not train)
        else:
            raise ValueError(f"Unknown fusion_style: {self.fusion_style!r}")

        x = nn.LayerNorm(name="decoder_norm")(x)
        head = nn.Dense(
            self.num_classes,
            use_bias=False,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=self.width**-0.5), ("embed", "vocab")
            ),
            name="head",
        )
        if self.return_prelogits and train:
            # training only: the loss fuses the head (linear_softmax_xent)
            # so the full-sequence logits are never built. Touch the head
            # on ONE position so its params exist regardless (the
            # checkpoint tree must not depend on this flag). Inference
            # (generate, eval probes) still gets real logits below.
            _ = head(x[:, :1])
            return None, {"prelogits": x}
        return head(x), {}


class _CrossAttnStack(nn.Module):
    """Alternating (causal self-attn, cross-attn) pairs."""

    depth: int
    num_heads: int
    mlp_dim: Optional[int] = None
    dropout: float = 0.0
    drop_path: float = 0.0
    causal: bool = True
    remat_policy: str = "none"
    attn_impl: str = "xla"
    chunk: int = 128
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, context: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        dpr = np.linspace(0.0, self.drop_path, self.depth)
        self_cls, cross_cls = EncoderBlock, CrossAttnBlock
        if self.remat_policy != "none":
            from openvision_tpu.models.encoder import _remat_policy

            policy = _remat_policy(self.remat_policy)
            # static_argnums counts `self` (flax nn.remat)
            self_cls = nn.remat(
                EncoderBlock, prevent_cse=True, policy=policy, static_argnums=(2,)
            )
            cross_cls = nn.remat(
                CrossAttnBlock, prevent_cse=True, policy=policy, static_argnums=(3,)
            )
        for i in range(self.depth):
            x = self_cls(
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                dropout=self.dropout,
                drop_path=float(dpr[i]),
                init_style="scaled",
                depth=self.depth,
                causal=self.causal,
                attn_impl=self.attn_impl,
                chunk=self.chunk,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"encoderblock_{i}",
            )(x, deterministic)
            x = cross_cls(
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                dropout=self.dropout,
                drop_path=float(dpr[i]),
                depth=self.depth,
                attn_impl=self.attn_impl,
                chunk=self.chunk,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"crossattn_encoderblock_{i}",
            )(x, context, deterministic)
        return x


def Model(num_classes=None, *, variant=None, **kw):
    """Factory mirroring the reference API."""
    from openvision_tpu.models.compat import translate_model_kwargs

    kw = translate_model_kwargs(kw)
    if num_classes is not None:
        kw["num_classes"] = num_classes
    return TextDecoder(**{**decode_variant(variant), **kw})


def warp_logits(
    logits: jax.Array, *, top_k: int = 0, top_p: float = 0.0
) -> jax.Array:
    """Jittable top-k / top-p (nucleus) logit filtering.

    Semantics match the HF logits warpers the reference's vendored OpenCLIP
    generate() dispatches on (`convert_upload/open_clip/coca_model.py:30-41,
    265-268`): `top_k` keeps the k highest-probability tokens; `top_p` keeps
    the smallest descending-probability prefix whose cumulative probability
    reaches top_p (the top-1 token is always kept). Filtered positions get a
    large negative value. Both are static-shape (lax.top_k / sort — no
    data-dependent shapes), so the warp jits cleanly on TPU.
    """
    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
    if top_k > 0:
        kth = jax.lax.top_k(logits, min(top_k, logits.shape[-1]))[0][..., -1:]
        logits = jnp.where(logits < kth, neg, logits)
    if top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens whose cumulative prob EXCLUDING themselves is < top_p
        # (the minimal descending prefix reaching top_p; index 0 always kept)
        keep = (cum - probs) < top_p
        idx = jnp.sum(keep.astype(jnp.int32), axis=-1, keepdims=True) - 1
        threshold = jnp.take_along_axis(sorted_logits, idx, axis=-1)
        logits = jnp.where(logits < threshold, neg, logits)
    return logits


def generate(
    decoder: TextDecoder,
    params,
    image_tokens: jax.Array,
    text_tokens: jax.Array,
    *,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 0.0,
    rng: Optional[jax.Array] = None,
    eos_id: int = 2,
) -> jax.Array:
    """Decodes caption token ids from the query positions.

    The CoCa-style decoder conditions FIXED learnable query tokens on the
    [image ++ text] prefix under a prefix-LM mask, so caption logits for all
    positions come from ONE forward pass — position i's logits predict token
    i+1 of the caption (see reference training targets, bert_ops.py:555-576).
    Greedy (temperature=0) or temperature sampling, optionally top_k/top_p
    filtered (the vendored OpenCLIP generation_type surface; beam search is
    n/a here — sampled tokens never feed back through the fixed queries, so
    per-position argmax IS the optimal beam). Tokens after the first eos are
    replaced with pad (0).
    """
    logits, _ = decoder.apply({"params": params}, image_tokens, text_tokens)
    if temperature > 0.0:
        assert rng is not None, "sampling needs an rng"
        logits = warp_logits(logits / temperature, top_k=top_k, top_p=top_p)
        ids = jax.random.categorical(rng, logits, axis=-1)
    else:
        ids = jnp.argmax(logits, axis=-1)
    # mask everything after the first eos
    is_eos = (ids == eos_id).astype(jnp.int32)
    seen = jnp.cumsum(is_eos, axis=1) - is_eos  # eos itself kept
    return jnp.where(seen > 0, 0, ids)
