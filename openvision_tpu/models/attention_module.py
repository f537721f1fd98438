"""The single shared multi-head attention flax module.

One implementation serves the vision tower, text tower, and caption decoder
(the reference maintains three near-duplicate MHDPA classes:
src/models/common.py:203, text_transformer.py:133, text_decoder.py:51).
Compute is delegated to openvision_tpu.ops.dispatch_attention, so swapping
einsum / blockwise-scan / Pallas-flash paths never touches parameters.

Checkpoint layout (must match Model-Zoo Orbax trees, see reference
transfer_jax2hf.py:194-245): projection submodules are named
`query`/`key`/`value`/`out`; with `use_dense_general=False` kernels are rank-2
(embed, qkv); with True they are DenseGeneral-shaped (embed, heads, head_dim).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from openvision_tpu.models.layers import ACT_BLD, ACT_BLHD, logical
from openvision_tpu.ops import dispatch_attention
from openvision_tpu.parallel import on_accelerator

Dtype = Any


class _ProjParams(nn.Module):
    """Holds a Dense-shaped (kernel, bias) without applying it.

    Gives the fused QKV+attention kernel raw weight access while keeping the
    exact `query/kernel` etc. param layout of nn.Dense (checkpoint compat).
    """

    in_features: int
    features: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable
    param_dtype: Dtype

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(self.kernel_init, ("embed", "mlp")),
            (self.in_features, self.features),
            self.param_dtype,
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(self.bias_init, (None,)),
                (self.features,),
                self.param_dtype,
            )
        return kernel, bias


class MultiHeadAttention(nn.Module):
    num_heads: int
    qkv_init: Callable = nn.initializers.normal(stddev=0.02)
    out_init: Callable = nn.initializers.normal(stddev=0.02)
    bias_init: Callable = nn.initializers.zeros
    use_bias: bool = True
    dropout_rate: float = 0.0
    causal: bool = False
    prefix_len: int = 0  # >0 with causal=True: prefix-LM (flash native)
    attn_impl: str = "xla"  # "xla" | "scan" | "flash"
    chunk: int = 128
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_dense_general: bool = False
    decode: bool = False

    @nn.compact
    def __call__(
        self,
        inputs_q: jax.Array,
        inputs_kv: jax.Array,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        features = inputs_q.shape[-1]
        assert features % self.num_heads == 0, (features, self.num_heads)
        head_dim = features // self.num_heads

        # Fused QKV+attention kernel path: self-attention, no external mask,
        # no cache, plain-Dense params (the common CLIP encoder case).
        # Same degenerate-sequence guard as the encoder's block-fusion path
        # (the kernel pads the sequence to 128 lanes): on real hardware,
        # tiny sequences fall through to the unfused-XLA dispatch below
        # instead of re-entering a Pallas kernel.
        use_fused = (
            self.attn_impl == "fused"
            and inputs_q is inputs_kv
            and mask is None
            and not self.decode
            and not self.use_dense_general
            and (self.dropout_rate == 0.0 or deterministic)
            and (not on_accelerator() or inputs_q.shape[1] >= 32)
        )
        inputs_q = logical(inputs_q, ACT_BLD)
        inputs_kv = logical(inputs_kv, ACT_BLD)
        if use_fused:
            from openvision_tpu.ops.fused_attention import fused_qkv_attention

            def proj_params(name):
                return _ProjParams(
                    in_features=features,
                    features=features,
                    use_bias=self.use_bias,
                    kernel_init=self.qkv_init,
                    bias_init=self.bias_init,
                    param_dtype=self.param_dtype,
                    name=name,
                )()

            wq, bq = proj_params("query")
            wk, bk = proj_params("key")
            wv, bv = proj_params("value")
            x = fused_qkv_attention(
                inputs_q.astype(self.dtype),
                wq.astype(self.dtype), wk.astype(self.dtype),
                wv.astype(self.dtype),
                bq, bk, bv,
                num_heads=self.num_heads,
                causal=self.causal,
                prefix_len=self.prefix_len,
                interpret=not on_accelerator(),
            )
            x = logical(x, ACT_BLD)
            out = nn.Dense(
                features,
                kernel_init=nn.with_logical_partitioning(
                    self.out_init, ("mlp", "embed")
                ),
                bias_init=nn.with_logical_partitioning(self.bias_init, (None,)),
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="out",
            )(x)
            return logical(out, ACT_BLD)

        if self.use_dense_general:
            def proj_in(name):
                return nn.DenseGeneral(
                    features=(self.num_heads, head_dim),
                    axis=-1,
                    kernel_init=nn.with_logical_partitioning(
                        self.qkv_init, ("embed", "heads")
                    ),
                    bias_init=nn.with_logical_partitioning(self.bias_init, (None,)),
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=name,
                )
            q = proj_in("query")(inputs_q)
            k = proj_in("key")(inputs_kv)
            v = proj_in("value")(inputs_kv)
        else:
            def proj_in(name):
                return nn.Dense(
                    features,
                    kernel_init=nn.with_logical_partitioning(
                        self.qkv_init, ("embed", "mlp")
                    ),
                    bias_init=nn.with_logical_partitioning(self.bias_init, (None,)),
                    use_bias=self.use_bias,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=name,
                )
            shape = lambda x: x.shape[:-1] + (self.num_heads, head_dim)
            q = proj_in("query")(inputs_q).reshape(shape(inputs_q))
            k = proj_in("key")(inputs_kv).reshape(shape(inputs_kv))
            v = proj_in("value")(inputs_kv).reshape(shape(inputs_kv))

        q = logical(q.astype(self.dtype), ACT_BLHD)
        k = logical(k.astype(self.dtype), ACT_BLHD)
        v = logical(v.astype(self.dtype), ACT_BLHD)

        causal = self.causal
        if self.decode:
            # Autoregressive KV cache: one query position per call after init.
            is_init = self.has_variable("cache", "cached_key")
            ck = self.variable("cache", "cached_key", jnp.zeros, k.shape, k.dtype)
            cv = self.variable("cache", "cached_value", jnp.zeros, v.shape, v.dtype)
            idx = self.variable(
                "cache", "cache_index", lambda: jnp.array(0, dtype=jnp.int32)
            )
            if is_init:
                _, max_len, num_heads, depth = ck.value.shape
                cur = idx.value
                k = jax.lax.dynamic_update_slice(ck.value, k, (0, cur, 0, 0))
                v = jax.lax.dynamic_update_slice(cv.value, v, (0, cur, 0, 0))
                ck.value, cv.value = k, v
                idx.value = cur + 1
                step_mask = (jnp.arange(max_len) <= cur)[None, None, None, :]
                mask = step_mask if mask is None else (mask & step_mask)
                causal = False  # cache mask already enforces causality

        dropout_rng = None
        if self.dropout_rate > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        impl = self.attn_impl if mask is None else "xla"
        if impl == "fused":  # fused preconditions unmet — unfused XLA fallback
            impl = "xla"
        x = dispatch_attention(
            impl,
            q,
            k,
            v,
            mask=mask,
            causal=causal,
            prefix_len=self.prefix_len if not self.decode else 0,
            dropout_rate=self.dropout_rate,
            dropout_rng=dropout_rng,
            dtype=self.dtype,
            chunk=self.chunk,
            interpret=not on_accelerator(),
        )
        x = logical(x.astype(self.dtype), ACT_BLHD)

        if self.use_dense_general:
            out = nn.DenseGeneral(
                features=features,
                axis=(-2, -1),
                kernel_init=nn.with_logical_partitioning(
                    self.out_init, ("heads", "embed")
                ),
                bias_init=nn.with_logical_partitioning(self.bias_init, (None,)),
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="out",
            )(x)
        else:
            x = x.reshape(x.shape[:-2] + (features,))
            x = logical(x, ACT_BLD)
            out = nn.Dense(
                features,
                kernel_init=nn.with_logical_partitioning(
                    self.out_init, ("mlp", "embed")
                ),
                bias_init=nn.with_logical_partitioning(self.bias_init, (None,)),
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="out",
            )(x)
        return logical(out, ACT_BLD)
