"""Shared pre-LN transformer encoder stack (vision + text + decoder).

One parametrized block/stack replaces the reference's three copies
(vit.py:245-401, text_transformer.py:384-586, text_decoder.py). Differences
are pure configuration:

- init_style "vit": normal(0.02) qkv/fc, timm-trunc proj, exact GELU
  (vit.py:191-209, 276-280)
- init_style "scaled": width/depth-scaled normals, tanh-approx GELU
  (text_transformer.py:406-411, 117)
- optional LayerScale (`init_values`), DropPath decay, causal or
  prefix-LM masking, remat policies, blockwise-scanned MLP.

Checkpoint layout per block (transfer_jax2hf.py): `encoderblock_{i}` with
LayerNorm_0, MultiHeadDotProductAttention_0, LayerNorm_1, MlpBlock_0
(+ ls1/ls2 when LayerScale is enabled).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from openvision_tpu.models.attention_module import MultiHeadAttention
from openvision_tpu.parallel import on_accelerator
from openvision_tpu.models.layers import (
    ACT_BLD,
    DropPath,
    LayerScale,
    MlpBlock,
    layer_norm,
    logical,
)

Dtype = Any


def prefix_lm_mask(batch: int, length: int, prefix_len: int) -> jax.Array:
    """(B, 1, L, L) mask: prefix rows see the prefix; suffix rows are causal.

    Equivalent to the reference's concat-fusion mask built with at/set
    (text_transformer.py:418-442), expressed as one iota comparison:
    allow col j from row i iff j <= max(i, prefix_len - 1).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (length, length), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (length, length), 1)
    mask = cols <= jnp.maximum(rows, prefix_len - 1)
    return jnp.broadcast_to(mask[None, None], (batch, 1, length, length))


def _make_inits(style: str, width: int, depth: int):
    if style == "vit":
        return dict(
            qkv=nn.initializers.normal(stddev=0.02),
            out=nn.initializers.normal(stddev=0.02),
            fc=nn.initializers.normal(stddev=0.02),
            proj=nn.initializers.variance_scaling(
                scale=0.3072, distribution="truncated_normal", mode="fan_out"
            ),
            gelu_approx=False,
        )
    if style == "scaled":
        return dict(
            qkv=nn.initializers.normal(stddev=width**-0.5),
            out=nn.initializers.normal(stddev=(width**-0.5) * ((2 * depth) ** -0.5)),
            fc=nn.initializers.normal(stddev=(2 * width) ** -0.5),
            proj=nn.initializers.normal(stddev=(width**-0.5) * ((2 * depth) ** -0.5)),
            gelu_approx=True,
        )
    raise ValueError(f"Unknown init_style: {style!r}")


class EncoderBlock(nn.Module):
    """Pre-LN MHSA + MLP residual block."""

    num_heads: int
    mlp_dim: Optional[int] = None
    dropout: float = 0.0
    drop_path: float = 0.0
    init_values: Optional[float] = None  # LayerScale init; None disables
    init_style: str = "vit"
    depth: int = 12  # for scaled inits
    causal: bool = False
    prefix_len: int = 0  # >0 enables prefix-LM masking (with causal=True)
    attn_impl: str = "xla"
    chunk: int = 128
    scan_mlp: bool = False
    fast_gelu: bool = False  # tanh-approx GELU (≤5e-6 cosine deviation, ~17% faster)
    nomax_softmax: bool = False  # skip softmax max-subtraction (clamp at 80)
    fused_t_valid: int = 0  # static valid-patch count for the fused_t path
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_dense_general: bool = False
    decode: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if isinstance(x, tuple):  # transposed-stream (xT, cls) from Encoder
            return self._fused_t_block(x, deterministic)
        width = x.shape[-1]
        inits = _make_inits(self.init_style, width, self.depth)
        if self.fast_gelu:
            inits["gelu_approx"] = True
        x = logical(x.astype(self.dtype), ACT_BLD)

        mask = None
        causal = self.causal
        prefix_len = 0
        if self.causal and self.prefix_len > 0 and not self.decode:
            if self.attn_impl in ("flash", "fused"):
                # these kernels apply the prefix-LM mask natively
                # (ops/flash_attention.py:_band_mask,
                # ops/fused_attention.py:_tvalid) — no (B, 1, L, L) mask
                # tensor, no forced fallback to unfused XLA attention
                prefix_len = self.prefix_len
            else:
                mask = prefix_lm_mask(x.shape[0], x.shape[1], self.prefix_len)
                causal = False

        # Whole-sub-block fusion: LN + QKV + attention + out-proj + residual
        # in one Pallas kernel (2x the XLA sub-block on v5e). Applies to the
        # common CLIP case: self-attn, no LayerScale, no external mask, and
        # no active dropout/drop-path on the attention branch.
        # Degenerate sequences stay on XLA when running on real hardware: the
        # kernel tiles the sequence to 128 lanes, so a handful of tokens pays
        # >4x padding waste (XLA wins there anyway) and, at ~5 tokens inside
        # a grad-accum scan, crashes the AOT Mosaic compiler outright
        # (observed on v5e). Interpret-mode (CPU tests) keeps tiny shapes so
        # the kernels stay exercised by the unit suite.
        on_accel = on_accelerator()
        use_block_fusion = (
            self.attn_impl == "fused"
            and mask is None
            and not self.decode
            and not self.use_dense_general
            and self.init_values is None
            and (deterministic or (self.dropout == 0.0 and self.drop_path == 0.0))
            and (not on_accel or x.shape[1] >= 32)
        )
        if use_block_fusion:
            x = self._fused_attn_subblock(x, inits, causal, prefix_len)
        else:
            x = self._attn_subblock(
                x, inits, causal, prefix_len, mask, deterministic)

        y = layer_norm(self.dtype, self.param_dtype, name="LayerNorm_1")(x)
        mlp = MlpBlock(
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            gelu_approx=inits["gelu_approx"],
            fc_init=inits["fc"],
            proj_init=inits["proj"],
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="MlpBlock_0",
        )
        if self.scan_mlp:
            y = _blockwise_mlp(mlp, y, self.chunk, deterministic)
        else:
            y = mlp(y, deterministic)
        y = nn.Dropout(rate=self.dropout)(y, deterministic)
        if self.init_values is not None:
            y = LayerScale(width, init_values=self.init_values, name="ls2")(y)
        y = DropPath(rate=self.drop_path)(y, deterministic)
        return logical(x + y, ACT_BLD)

    def _attn_subblock(self, x, inits, causal, prefix_len, mask,
                       deterministic):
        """Standard path: LN → MHA → dropout/LayerScale/DropPath → residual."""
        width = x.shape[-1]
        y = layer_norm(self.dtype, self.param_dtype, name="LayerNorm_0")(x)
        y = MultiHeadAttention(
            num_heads=self.num_heads,
            qkv_init=inits["qkv"],
            out_init=inits["out"],
            dropout_rate=self.dropout,
            causal=causal,
            prefix_len=prefix_len,
            attn_impl=self.attn_impl,
            chunk=self.chunk,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_dense_general=self.use_dense_general,
            decode=self.decode,
            name="MultiHeadDotProductAttention_0",
        )(y, y, mask=mask, deterministic=deterministic)
        y = nn.Dropout(rate=self.dropout)(y, deterministic)
        if self.init_values is not None:
            y = LayerScale(width, init_values=self.init_values, name="ls1")(y)
        y = DropPath(rate=self.drop_path)(y, deterministic)
        return logical(x + y, ACT_BLD)

    def _fused_attn_subblock(self, x, inits, causal, prefix_len=0):
        """One Pallas kernel for LN + QKV + attention + out-proj + residual.

        Creates the exact same param tree as the standard path (LayerNorm_0
        scale/bias; MultiHeadDotProductAttention_0 query/key/value/out) so
        checkpoints are interchangeable between the two paths.
        """
        from openvision_tpu.models.attention_module import _ProjParams
        from openvision_tpu.ops.fused_attention import fused_mhsa_block

        width = x.shape[-1]
        ln = _LayerNormParams(width, self.param_dtype, name="LayerNorm_0")()
        mha = _MHSAParams(
            width=width,
            qkv_init=inits["qkv"],
            out_init=inits["out"],
            param_dtype=self.param_dtype,
            name="MultiHeadDotProductAttention_0",
        )()
        (wq, bq), (wk, bk), (wv, bv), (wo, bo) = mha
        out = fused_mhsa_block(
            x.astype(self.dtype),
            ln[0], ln[1],
            wq.astype(self.dtype), bq,
            wk.astype(self.dtype), bk,
            wv.astype(self.dtype), bv,
            wo.astype(self.dtype), bo,
            num_heads=self.num_heads,
            causal=causal,
            prefix_len=prefix_len,
            interpret=not on_accelerator(),
        )
        return logical(out, ACT_BLD)

    def _fused_t_block(self, x, deterministic):
        """Whole encoder block on the transposed patch stream.

        Input/output: (xT (B, D, Ppad), cls (B, D), valid) — see
        ops/fused_encoder.py. Creates the exact same param tree as the
        standard path, so checkpoints are interchangeable.
        """
        from openvision_tpu.ops.fused_encoder import fused_encoder_tblock

        xT, cls = x
        valid = self.fused_t_valid
        width = xT.shape[1]
        inits = _make_inits(self.init_style, width, self.depth)
        ln1 = _LayerNormParams(width, self.param_dtype, name="LayerNorm_0")()
        mha = _MHSAParams(
            width=width,
            qkv_init=inits["qkv"],
            out_init=inits["out"],
            param_dtype=self.param_dtype,
            name="MultiHeadDotProductAttention_0",
        )()
        ln2 = _LayerNormParams(width, self.param_dtype, name="LayerNorm_1")()
        (w1, b1), (w2, b2) = _MlpParams(
            width=width,
            mlp_dim=self.mlp_dim or 4 * width,
            fc_init=inits["fc"],
            proj_init=inits["proj"],
            param_dtype=self.param_dtype,
            name="MlpBlock_0",
        )()
        (wq, bq), (wk, bk), (wv, bv), (wo, bo) = mha
        wqkv = jnp.concatenate(
            [wq.astype(self.dtype), wk.astype(self.dtype), wv.astype(self.dtype)],
            axis=1,
        )
        bqkv = jnp.concatenate(
            [b.astype(jnp.float32) for b in (bq, bk, bv)], axis=0)
        xT, cls = fused_encoder_tblock(
            xT.astype(self.dtype), cls.astype(self.dtype),
            wqkv, bqkv, wo.astype(self.dtype), bo.astype(jnp.float32),
            ln1[0].astype(jnp.float32), ln1[1].astype(jnp.float32),
            w1.astype(self.dtype), b1.astype(jnp.float32),
            w2.astype(self.dtype), b2.astype(jnp.float32),
            ln2[0].astype(jnp.float32), ln2[1].astype(jnp.float32),
            num_heads=self.num_heads,
            valid=valid,
            nomax=self.nomax_softmax,
            interpret=not on_accelerator(),
        )
        return xT, cls


class _LayerNormParams(nn.Module):
    """LayerNorm scale/bias params without applying the norm (fused path)."""

    width: int
    param_dtype: Any

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale",
            nn.with_logical_partitioning(nn.initializers.ones_init(), ("norm",)),
            (self.width,),
            self.param_dtype,
        )
        bias = self.param(
            "bias",
            nn.with_logical_partitioning(nn.initializers.zeros_init(), (None,)),
            (self.width,),
            self.param_dtype,
        )
        return scale, bias


class _MHSAParams(nn.Module):
    """query/key/value/out Dense-shaped params for the fused block kernel."""

    width: int
    qkv_init: Any
    out_init: Any
    param_dtype: Any

    @nn.compact
    def __call__(self):
        from openvision_tpu.models.attention_module import _ProjParams

        def proj(name, init):
            return _ProjParams(
                in_features=self.width,
                features=self.width,
                use_bias=True,
                kernel_init=init,
                bias_init=nn.initializers.zeros,
                param_dtype=self.param_dtype,
                name=name,
            )()

        return (
            proj("query", self.qkv_init),
            proj("key", self.qkv_init),
            proj("value", self.qkv_init),
            proj("out", self.out_init),
        )


class _MlpParams(nn.Module):
    """Dense_0/Dense_1 params matching MlpBlock's tree, without applying."""

    width: int
    mlp_dim: int
    fc_init: Any
    proj_init: Any
    param_dtype: Any

    @nn.compact
    def __call__(self):
        from openvision_tpu.models.attention_module import _ProjParams

        fc = _ProjParams(
            in_features=self.width,
            features=self.mlp_dim,
            use_bias=True,
            kernel_init=self.fc_init,
            bias_init=nn.initializers.zeros,
            param_dtype=self.param_dtype,
            name="Dense_0",
        )()
        proj = _ProjParams(
            in_features=self.mlp_dim,
            features=self.width,
            use_bias=True,
            kernel_init=self.proj_init,
            bias_init=nn.initializers.zeros,
            param_dtype=self.param_dtype,
            name="Dense_1",
        )()
        return fc, proj


def _blockwise_mlp(mlp: nn.Module, x: jax.Array, chunk: int, deterministic: bool):
    """Applies the MLP over sequence chunks via nn.scan (BPT-style memory cap).

    Capability parity with reference bpt.py:21 (blockwise_ffn).
    """
    b, l, d = x.shape
    if l % chunk != 0 or l == chunk:
        return mlp(x, deterministic)
    n = l // chunk
    xs = x.reshape(b, n, chunk, d).swapaxes(0, 1)  # (n, b, chunk, d)
    scan = nn.scan(
        lambda m, _, xc: (None, m(xc, deterministic)),
        variable_broadcast="params",
        split_rngs={"params": False, "dropout": True},
        in_axes=0,
        out_axes=0,
    )
    _, ys = scan(mlp, None, xs)
    return ys.swapaxes(0, 1).reshape(b, l, d)


_REMAT_POLICIES: dict[str, Any] = {}


def _remat_policy(name: str):
    if not _REMAT_POLICIES:
        cp = jax.checkpoint_policies
        _REMAT_POLICIES.update(
            none=None,
            full=None,
            minimal=cp.checkpoint_dots_with_no_batch_dims,
            minimal_offloaded=cp.offload_dot_with_no_batch_dims(
                offload_src="device", offload_dst="pinned_host"
            ),
        )
    if name not in _REMAT_POLICIES:
        raise ValueError(f"Unknown remat policy: {name!r}")
    return _REMAT_POLICIES[name]


class Encoder(nn.Module):
    """A stack of EncoderBlocks with linear drop-path decay and remat."""

    depth: int
    num_heads: int
    mlp_dim: Optional[int] = None
    dropout: float = 0.0
    drop_path: float = 0.0
    init_values: Optional[float] = None
    init_style: str = "vit"
    causal: bool = False
    prefix_len: int = 0
    remat_policy: str = "none"
    attn_impl: str = "xla"
    chunk: int = 128
    scan_mlp: bool = False
    fast_gelu: bool = False
    nomax_softmax: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_dense_general: bool = False
    decode: bool = False
    pipe_microbatches: int = 0  # 0 = auto (2 x pipe stages) when pipe > 1
    pipe_interleave: int = 0  # chunks/stage; 0 = auto (2 when depth allows)

    def _pipe_eligible(self, x, deterministic) -> bool:
        """GPipe pipelining over the `pipe` mesh axis applies when the mesh
        has pipe > 1 dividing the depth, the blocks are pure functions of
        their own params (no per-layer drop-path schedule, no active
        dropout rngs, no KV-cache), and the attention impl doesn't open its
        own shard_map (the fused paths do — nested shard_map is illegal)."""
        from openvision_tpu.parallel import active_mesh

        mesh = active_mesh()
        if mesh is None or mesh.shape.get("pipe", 1) <= 1:
            return False
        # every microbatch must still split over the data axes (m >= 1 with
        # B % (m*dp) == 0 needs B itself divisible), else run sequentially
        dp = mesh.shape.get("data", 1) * mesh.shape.get("fsdp", 1)
        eligible = (
            self.depth % mesh.shape["pipe"] == 0
            and isinstance(x, jax.Array)
            and x.ndim == 3
            and self.attn_impl in ("xla", "scan", "flash")
            and self.drop_path == 0.0
            and not self.decode
            and (deterministic or self.dropout == 0.0)
            and x.shape[0] >= dp
            and x.shape[0] % dp == 0
        )
        if not eligible and self.attn_impl not in ("xla", "scan", "flash"):
            # the pipe axis was requested but this impl can't ride it —
            # say so rather than silently replicating across the stages
            import warnings

            warnings.warn(
                f"mesh has pipe={mesh.shape['pipe']} but attn_impl="
                f"{self.attn_impl!r} is not pipeline-eligible (the fused "
                "Pallas paths open their own shard_map); running the block "
                "stack sequentially — the pipe axis does no useful work. "
                "Use attn_impl in ('xla','scan','flash') with pipe "
                "parallelism.",
                stacklevel=2,
            )
        return eligible

    def _block_fields(self) -> dict:
        return dict(
            num_heads=self.num_heads,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            drop_path=0.0,
            init_values=self.init_values,
            init_style=self.init_style,
            depth=self.depth,
            causal=self.causal,
            prefix_len=self.prefix_len,
            attn_impl=self.attn_impl,
            chunk=self.chunk,
            scan_mlp=self.scan_mlp,
            fast_gelu=self.fast_gelu,
            nomax_softmax=self.nomax_softmax,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            use_dense_general=self.use_dense_general,
            decode=False,
        )

    def _pipelined(self, x, deterministic):
        """Runs the block stack through ops/pipeline_parallel.pipeline_apply.

        Params, names, and INIT RNG DERIVATION are exactly the sequential
        path's (the blocks are created as ordinary `encoderblock_i` child
        modules during init and only their param subtrees are read back at
        apply time), so checkpoints AND seeds are interchangeable with
        pipe=1; the per-step stack + reshard onto the `pipe` axis is
        GSPMD's. Beyond-reference capability (SURVEY §2.4 lists PP as
        absent upstream)."""
        from openvision_tpu.ops.pipeline_parallel import pipeline_apply
        from openvision_tpu.parallel import active_mesh, unbox

        mesh = active_mesh()

        if self.is_initializing():
            # create the standard child modules (identical rng folding to
            # the sequential path) by running the stack sequentially
            for i in range(self.depth):
                x = EncoderBlock(
                    **self._block_fields(), name=f"encoderblock_{i}"
                )(x, deterministic)
            return x

        block = EncoderBlock(**self._block_fields(), parent=None)
        layers = [
            unbox(self.get_variable("params", f"encoderblock_{i}"))
            for i in range(self.depth)
        ]

        def block_fn(prm, h):
            return block.apply({"params": prm}, h, deterministic)

        if self.remat_policy != "none":
            block_fn = jax.checkpoint(
                block_fn, policy=_remat_policy(self.remat_policy),
                prevent_cse=True)

        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        # each microbatch must still split over the data axes, so
        # m <= B / (data*fsdp) and B % (m * dp) == 0
        dp = mesh.shape.get("data", 1) * mesh.shape.get("fsdp", 1)
        n_stages = mesh.shape["pipe"]
        m = self.pipe_microbatches or 2 * n_stages
        m = max(1, min(m, x.shape[0] // dp))
        while x.shape[0] % (m * dp):
            m -= 1
        # interleaved schedule (v chunks per stage) shrinks the fill/drain
        # bubble (P-1)/(M+P-1) → (P-1)/(vM+P-1); auto picks v=2 when the
        # depth allows it, and any v falls back to GPipe when it doesn't
        v = self.pipe_interleave or 2
        if self.depth % (n_stages * v):
            v = 1
        return pipeline_apply(
            block_fn, stacked, x.astype(self.dtype), mesh,
            num_microbatches=m, interleave=v)

    def _fused_t_eligible(self, x, deterministic) -> bool:
        """Transposed-stream fusion needs the plain CLIP-vision-encode shape:
        cls-first self-attention, no masks/LayerScale/scan, inference-mode
        dropout, and tanh GELU (the in-kernel activation). Batch-sharded
        only: under tensor-parallelism the TP-aware fused path runs instead."""
        from openvision_tpu.parallel import active_mesh

        mesh = active_mesh()
        if mesh is not None and mesh.shape.get("tensor", 1) > 1:
            return False
        inits = _make_inits(self.init_style, x.shape[-1], self.depth)
        on_accel = on_accelerator()
        return (
            self.attn_impl == "fused_t"
            and x.ndim == 3
            and x.shape[1] >= 2
            # same degenerate-sequence guard as the fused block path (the
            # transposed stream pads patches to 128 lanes); falls back to
            # "fused", whose own guard cascades tiny shapes onto XLA.
            and (not on_accel or x.shape[1] >= 32)
            and not self.causal
            and self.prefix_len == 0
            and not self.decode
            and not self.use_dense_general
            and self.init_values is None
            and not self.scan_mlp
            and (inits["gelu_approx"] or self.fast_gelu)
            and (deterministic or (self.dropout == 0.0 and self.drop_path == 0.0))
        )

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self._pipe_eligible(x, deterministic):
            return self._pipelined(x, deterministic)
        dpr = np.linspace(0.0, self.drop_path, self.depth)

        attn_impl = self.attn_impl
        fused_t = self._fused_t_eligible(x, deterministic)
        if attn_impl == "fused_t" and not fused_t:
            # Safe fallback for unsupported configs. Under tensor>1 this
            # lands on the TP-aware natural-layout fused Pallas path
            # (fused_mhsa_block_tp / _tp_qkv — still fully fused fwd+bwd,
            # ~15% slower per block than the transposed stream). A TP
            # transposed stream would gain nothing structural: the psum
            # between attention and MLP forces a reshard per block, which
            # is exactly the relayout fused_t exists to avoid
            # (docs/PARITY.md "Known gaps"; tests/test_fused_tp.py
            # covers values+grads of this degrade).
            from openvision_tpu.parallel import active_mesh

            mesh = active_mesh()
            if mesh is not None and mesh.shape.get("tensor", 1) > 1:
                import logging

                logging.getLogger(__name__).warning(
                    "attn_impl=fused_t is batch-sharded only; tensor=%d "
                    "mesh active -> using the TP-aware 'fused' path "
                    "(natural layout, ~15%% slower per block)",
                    mesh.shape["tensor"],
                )
            attn_impl = "fused"

        block_cls = EncoderBlock
        if self.remat_policy != "none":
            # static_argnums counts `self` (flax nn.remat): deterministic = 2
            block_cls = nn.remat(
                EncoderBlock,
                prevent_cse=True,
                policy=_remat_policy(self.remat_policy),
                static_argnums=(2,),
            )

        if fused_t:
            from openvision_tpu.ops.fused_encoder import (
                from_transposed_stream,
                to_transposed_stream,
            )

            xT, cls, valid = to_transposed_stream(x.astype(self.dtype))
            x = (xT, cls)

        for i in range(self.depth):
            x = block_cls(
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                dropout=self.dropout,
                drop_path=float(dpr[i]),
                init_values=self.init_values,
                init_style=self.init_style,
                depth=self.depth,
                causal=self.causal,
                prefix_len=self.prefix_len,
                attn_impl=attn_impl,
                chunk=self.chunk,
                scan_mlp=self.scan_mlp,
                fast_gelu=self.fast_gelu,
                nomax_softmax=self.nomax_softmax,
                fused_t_valid=valid if fused_t else 0,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                use_dense_general=self.use_dense_general,
                decode=self.decode,
                name=f"encoderblock_{i}",
            )(x, deterministic)

        if fused_t:
            x = from_transposed_stream(x[0], x[1], valid)
        return x
