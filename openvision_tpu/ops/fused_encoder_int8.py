"""int8 (W8A8) transposed-stream fused encoder kernels — the serving path.

Round-1 groundwork (docs/PERF_NOTES.md "int8 serving experiment") showed raw
int8 matmuls run 1.75× bf16 on v5e but the XLA-composed W8A8 encode LOSES
overall: per-token quantize passes and f32 dequants cost more than int8
saves. The fix is here: quantize/dequant live INSIDE the fused block
kernels, so activations are quantized once per sub-block in VMEM and the
int8 MXU dots see no extra HBM traffic.

Layout matches ops/fused_encoder.py (patches transposed (B, D, Ppad), cls as
XLA rows): per-token activation quantization is a per-COLUMN max reduction
(a sublane reduce — cheap on the VPU), weights are per-output-channel int8
(rows of the transposed products), accumulation int32, dequant f32.

Serving-only accuracy (≥0.995 output cosine, see tests/test_quant.py) —
never the parity default. Inference-only: no custom VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from openvision_tpu.ops.fused_attention import _shard_over_batch
from openvision_tpu.ops.fused_encoder import _compiler_params


def _quant_cols(y):
    """Per-column (token) symmetric int8: y (D, L) f32 → (int8, (1, L) f32)."""
    amax = jnp.max(jnp.abs(y), axis=0, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(y / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _mhsa_t_int8_kernel(
    xT_ref, clsqkv_ref, wqkv_ref, wscale_ref, wo_ref, woscale_ref,
    vecT_ref, bqkvT_ref, o_ref, ocls_ref,
    *, num_heads, head_dim, lpat, valid, hchunk, eps, sm_scale, nomax,
    nimg=1,
):
    """int8 twin of fused_encoder._mhsa_t_kernel (same refs + weight scales).

    wqkv_ref: (D, 3D) int8; wscale_ref: (3D, 1) f32 per-output-channel;
    wo_ref: (D, D) int8; woscale_ref: (D, 1) f32. Like the bf16 twin,
    `nimg` images' lanes run CONCATENATED through LN / int8 projections /
    out-proj (per-column token scales keep the numerics identical);
    attention is per-image.
    """
    cdt = xT_ref.dtype
    d = num_heads * head_dim

    x2 = (xT_ref[0] if nimg == 1 else
          jnp.concatenate([xT_ref[i] for i in range(nimg)], axis=1))
    xf = x2.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(xf * xf, axis=0, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * vecT_ref[:, 0:1] + vecT_ref[:, 1:2]

    yq, ys = _quant_cols(y)
    qkv_i = jax.lax.dot_general(
        wqkv_ref[...], yq, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    qkvT = (qkv_i.astype(jnp.float32) * wscale_ref[...] * ys
            + bqkvT_ref[...]).astype(cdt)  # (3D, nimg*LPAT)

    lk = lpat + 1
    o_parts = [[] for _ in range(nimg)]
    ocls_parts = [[] for _ in range(nimg)]
    for c in range(num_heads // hchunk):
        r0 = c * hchunk * head_dim
        hs = hchunk * head_dim
        for i in range(nimg):
            cols = slice(i * lpat, (i + 1) * lpat)
            clsqkvT = clsqkv_ref[i].astype(cdt)  # (3D, 1)
            q3 = (qkvT[r0:r0 + hs, cols] * sm_scale).astype(cdt).reshape(
                hchunk, head_dim, lpat)
            k3p = qkvT[d + r0:d + r0 + hs, cols].reshape(
                hchunk, head_dim, lpat)
            v3p = qkvT[2 * d + r0:2 * d + r0 + hs, cols].reshape(
                hchunk, head_dim, lpat)
            qcls = (clsqkvT[r0:r0 + hs] * sm_scale).astype(cdt).reshape(
                hchunk, head_dim, 1)
            kcls = clsqkvT[d + r0:d + r0 + hs].reshape(hchunk, head_dim, 1)
            vcls = clsqkvT[2 * d + r0:2 * d + r0 + hs].reshape(
                hchunk, head_dim, 1)
            k_ext = jnp.concatenate([k3p, kcls], axis=2)
            v_ext = jnp.concatenate([v3p, vcls], axis=2)
            sT = jax.lax.dot_general(
                k_ext, q3, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            scls = jax.lax.dot_general(
                k_ext, qcls, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if valid < lpat:
                krow = jax.lax.broadcasted_iota(jnp.int32, (1, lk, 1), 1)
                keymask = (krow < valid) | (krow == lpat)
                sT = jnp.where(keymask, sT, -1e30)
                scls = jnp.where(keymask, scls, -1e30)
            if nomax:
                p = jnp.exp(jnp.minimum(sT, 80.0))
                pc = jnp.exp(jnp.minimum(scls, 80.0))
            else:
                p = jnp.exp(sT - jnp.max(sT, axis=1, keepdims=True))
                pc = jnp.exp(scls - jnp.max(scls, axis=1, keepdims=True))
            l = jnp.sum(p, axis=1, keepdims=True)
            lc = jnp.sum(pc, axis=1, keepdims=True)
            oT = jax.lax.dot_general(
                v_ext, p.astype(cdt), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) / l
            oc = jax.lax.dot_general(
                v_ext, pc.astype(cdt), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) / lc
            o_parts[i].append(oT.reshape(hs, lpat))
            ocls_parts[i].append(oc.reshape(hs, 1).astype(cdt))

    def cat(parts):
        return jnp.concatenate(parts, 0) if len(parts) > 1 else parts[0]

    o2 = (cat(o_parts[0]) if nimg == 1 else
          jnp.concatenate([cat(o_parts[i]) for i in range(nimg)], axis=1))
    oq, os_ = _quant_cols(o2)
    out_i = jax.lax.dot_general(
        wo_ref[...], oq, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    outT = out_i.astype(jnp.float32) * woscale_ref[...] * os_
    outT = outT + vecT_ref[:, 5:6]
    for i in range(nimg):
        o_ref[i] = (outT[:, i * lpat:(i + 1) * lpat]).astype(
            o_ref.dtype) + xT_ref[i]
        ocls_ref[i, 0, :] = cat(ocls_parts[i]).reshape(d)


def _mlp_t_int8_kernel(xT_ref, w1_ref, s1_ref, w2_ref, s2_ref, vecT_ref,
                       b1T_ref, o_ref, *, eps, nimg=1):
    """int8 twin of fused_encoder._mlp_t_kernel (nimg lanes concatenated)."""
    lpat = xT_ref.shape[2]
    xT = (xT_ref[0] if nimg == 1 else
          jnp.concatenate([xT_ref[i] for i in range(nimg)], axis=1))
    xf = xT.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(xf * xf, axis=0, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * vecT_ref[:, 0:1] + vecT_ref[:, 1:2]
    yq, ys = _quant_cols(y)
    h_i = jax.lax.dot_general(
        w1_ref[...], yq, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    h = h_i.astype(jnp.float32) * s1_ref[...] * ys + b1T_ref[...]
    h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h * h * h)))
    hq, hs = _quant_cols(h)
    out_i = jax.lax.dot_general(
        w2_ref[...], hq, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = out_i.astype(jnp.float32) * s2_ref[...] * hs
    out = out + vecT_ref[:, 2:3]
    for i in range(nimg):
        o_ref[i] = (out[:, i * lpat:(i + 1) * lpat]).astype(
            o_ref.dtype) + xT_ref[i]


def mhsa_t_int8(xT, clsqkv, wqkv_q, wqkv_s, wo_q, wo_s, vecT, bqkvT, *,
                num_heads, valid, eps=1e-6, sm_scale=None, nomax=True,
                interpret=False, nimg=None):
    """xT (B, D, LPAT) bf16; clsqkv (B, 3D) bf16 (this image's cls q/k/v);
    wqkv_q (D, 3D) int8 + wqkv_s (3D,) f32; wo_q (D, D) int8 + wo_s (D,).
    Returns (xT', ocls (B, D) pre-out-proj)."""
    b, d, lpat = xT.shape
    head_dim = d // num_heads
    if sm_scale is None:
        sm_scale = head_dim ** -0.5
    from openvision_tpu.ops.fused_encoder import _pick_hchunk

    hchunk = _pick_hchunk(num_heads, lpat + 8, lpat)

    def call(xT, clsqkv, wqkv_q, wqkv_s2, wo_q, wo_s2, vecT, bqkvT):
        # per-shard batch (under _shard_over_batch) must divide by nimg
        ni = nimg or 2
        if xT.shape[0] % ni:
            ni = 1
        return pl.pallas_call(
            functools.partial(
                _mhsa_t_int8_kernel, num_heads=num_heads, head_dim=head_dim,
                lpat=lpat, valid=valid, hchunk=hchunk, eps=eps,
                sm_scale=sm_scale, nomax=nomax, nimg=ni),
            grid=(xT.shape[0] // ni, 1, 1),
            in_specs=[
                pl.BlockSpec((ni, d, lpat), lambda i, _, __: (i, 0, 0)),
                pl.BlockSpec((ni, 3 * d, 1), lambda i, _, __: (i, 0, 0)),
                pl.BlockSpec((d, 3 * d), lambda i, _, __: (0, 0)),
                pl.BlockSpec((3 * d, 1), lambda i, _, __: (0, 0)),
                pl.BlockSpec((d, d), lambda i, _, __: (0, 0)),
                pl.BlockSpec((d, 1), lambda i, _, __: (0, 0)),
                pl.BlockSpec((d, 8), lambda i, _, __: (0, 0)),
                pl.BlockSpec((3 * d, 1), lambda i, _, __: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((ni, d, lpat), lambda i, _, __: (i, 0, 0)),
                pl.BlockSpec((ni, 1, d), lambda i, _, __: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(xT.shape, xT.dtype),
                jax.ShapeDtypeStruct((xT.shape[0], 1, d), xT.dtype),
            ],
            compiler_params=_compiler_params(interpret),
            interpret=interpret,
        )(xT, clsqkv, wqkv_q, wqkv_s2, wo_q, wo_s2, vecT, bqkvT)

    out, ocls = _shard_over_batch(
        call, xT, clsqkv[:, :, None], wqkv_q, wqkv_s[:, None], wo_q,
        wo_s[:, None], vecT, bqkvT, extra_batched=1, n_outs=2,
    )
    return out, ocls[:, 0, :]


def mlp_t_int8(xT, w1_q, w1_s, w2_q, w2_s, vecT, b1T, *, eps=1e-6,
               interpret=False, nimg=None):
    b, d, lpat = xT.shape
    mlp_dim = w1_q.shape[1]

    def call(xT, w1_q, s1, w2_q, s2, vecT, b1T):
        # per-shard batch (under _shard_over_batch) must divide by nimg
        ni = nimg or 2
        if xT.shape[0] % ni:
            ni = 1
        return pl.pallas_call(
            functools.partial(_mlp_t_int8_kernel, eps=eps, nimg=ni),
            grid=(xT.shape[0] // ni, 1, 1),
            in_specs=[
                pl.BlockSpec((ni, d, lpat), lambda i, _, __: (i, 0, 0)),
                pl.BlockSpec((d, mlp_dim), lambda i, _, __: (0, 0)),
                pl.BlockSpec((mlp_dim, 1), lambda i, _, __: (0, 0)),
                pl.BlockSpec((mlp_dim, d), lambda i, _, __: (0, 0)),
                pl.BlockSpec((d, 1), lambda i, _, __: (0, 0)),
                pl.BlockSpec((d, 8), lambda i, _, __: (0, 0)),
                pl.BlockSpec((mlp_dim, 1), lambda i, _, __: (0, 0)),
            ],
            out_specs=pl.BlockSpec((ni, d, lpat), lambda i, _, __: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(xT.shape, xT.dtype),
            compiler_params=_compiler_params(interpret),
            interpret=interpret,
        )(xT, w1_q, s1, w2_q, s2, vecT, b1T)

    return _shard_over_batch(
        call, xT, w1_q, w1_s[:, None], w2_q, w2_s[:, None], vecT, b1T,
    )
