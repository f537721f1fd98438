"""Transposed-stream fused encoder kernels (the flagship encode path).

The speed-of-light layout for ViT encoders on TPU: patch tokens ride through
the whole encoder TRANSPOSED as (B, D, P) with P padded to a lane multiple
(exactly 2x128 for ViT-L/14-224's 256 patches — zero padding), while the
single [cls] token rides as (B, D) rows through trivially-cheap XLA ops.

Why this wins over the natural-layout fused block (ops/fused_attention.py):
- ZERO per-block transposes. The natural-layout kernel spends ~25% of its
  MXU time transposing q/k/v into the lane-efficient attention layout and
  transposing the output back (measured: 1.9 ms of a 7.5 ms block at
  ViT-L/14-224, B=256 on v5e). Here the stream is already transposed, and
  all projections consume NATURAL (in, out) weights via AtB-form dots
  (contract both operands' sublane dims) — measured free on the MXU.
- Zero padding FLOPs at 224px: the 257-token sequence is the one thing that
  doesn't tile on TPU (257 = 2x128 + cls). Splitting the cls token out makes
  every large dot exact: (3D, D)x(D, 256), scores (h, 257, 256), out-proj
  (D, D)x(D, 256). The cls row's own q/k/v and MLP are (B, D)-row XLA ops
  (~0.1% of FLOPs); its keys/values enter the kernel as an extra column.
- The MLP sub-block is fused too (LN + fc1 + tanh-GELU + fc2 + residual in
  one kernel; the hidden (4D, P) activation never touches HBM).

Measured on TPU v5e (ViT-L/14-224, B=256, bf16): 11.6 -> beats the
natural-layout fused block + XLA MLP (13.3) by 15% per encoder block;
see docs/PERF_NOTES.md for the full ladder.

Reference capability parity: this computes exactly the reference pre-LN
block (vit.py:245-335 in /root/reference) — LN, MHSA with per-head softmax,
out-proj, residual, LN, MLP, residual — restricted to the vision-encode
configuration (no masks, no LayerScale, inference-mode dropout).

Both kernels have fused Pallas BACKWARDS too (round 3): each recomputes its
forward in-kernel (FlashAttention-style) and accumulates weight grads in f32
VMEM blocks across the grid, so the flagship inference layout is also the
training layout. The tiny cls-row side paths stay XLA and differentiate via
autodiff; grads match the jnp reference (tests/test_fused_encoder.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from openvision_tpu.ops.fused_attention import _shard_over_batch

NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_hchunk(num_heads: int, lk: int, lp: int,
                 budget: int = 10 * 1024 * 1024) -> int:
    """Largest divisor of num_heads whose f32 score chunk fits the budget."""
    best = 1
    for c in range(1, num_heads + 1):
        if num_heads % c == 0 and c * lk * lp * 4 <= budget:
            best = c
    return best


# ---------------------------------------------------------------------------
# MHSA-T kernel: LN + QKV + attention(patches + cls key) + out-proj + residual
# ---------------------------------------------------------------------------


def _mhsa_t_kernel(
    xT_ref, clsqkv_ref, wqkv_ref, wo_ref, vecT_ref, bqkvT_ref,
    o_ref, ocls_ref,
    *, num_heads, head_dim, lpat, valid, hchunk, eps, sm_scale, nomax, nimg,
):
    """`nimg` images per grid step, stream transposed.

    xT_ref: (nimg, D, LPAT) patches; clsqkv_ref: (nimg, 3D, 1) cls q/k/v
    columns (unscaled); wqkv_ref: (D, 3D) natural; wo_ref: (D, D) natural;
    vecT_ref (D, 8) cols: 0=ln_scale 1=ln_bias 5=bo; bqkvT_ref (3D, 1) qkv
    bias column. LN/projections/out-proj run on the images' lanes
    CONCATENATED (nimg·LPAT columns — wider MXU dots); attention is
    per-image. Emits the patch blocks and the cls attention output rows
    (pre-out-proj).
    """
    cdt = xT_ref.dtype
    d = num_heads * head_dim

    x2 = (xT_ref[0] if nimg == 1 else
          jnp.concatenate([xT_ref[i] for i in range(nimg)], axis=1))
    xf = x2.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(xf * xf, axis=0, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * vecT_ref[:, 0:1] + vecT_ref[:, 1:2]).astype(cdt)

    # qkvT[dout, l] = sum_din wqkv[din, dout] * y[din, l]   (AtB form)
    qkvT = jax.lax.dot_general(
        wqkv_ref[...], y, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkvT = (qkvT + bqkvT_ref[...]).astype(cdt)  # (3D, nimg*LPAT)

    lk = lpat + 1  # keys: patches then cls (last column)
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
            k3p = qkvT[d + r0:d + r0 + hs, cols].reshape(hchunk, head_dim, lpat)
            v3p = qkvT[2 * d + r0:2 * d + r0 + hs, cols].reshape(
                hchunk, head_dim, lpat)
            qcls = (clsqkvT[r0:r0 + hs] * sm_scale).astype(cdt).reshape(
                hchunk, head_dim, 1)
            kcls = clsqkvT[d + r0:d + r0 + hs].reshape(hchunk, head_dim, 1)
            vcls = clsqkvT[2 * d + r0:2 * d + r0 + hs].reshape(
                hchunk, head_dim, 1)

            k_ext = jnp.concatenate([k3p, kcls], axis=2)  # (h, HD, LK)
            v_ext = jnp.concatenate([v3p, vcls], axis=2)

            # patch-query scores (h, LK, LPAT): contract head_dim (sublanes)
            sT = jax.lax.dot_general(
                k_ext, q3, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            # cls-query scores (h, LK, 1)
            scls = jax.lax.dot_general(
                k_ext, qcls, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if valid < lpat:  # mask padded patch keys (keep the cls key)
                krow = jax.lax.broadcasted_iota(jnp.int32, (1, lk, 1), 1)
                keymask = (krow < valid) | (krow == lpat)
                sT = jnp.where(keymask, sT, NEG_INF)
                scls = jnp.where(keymask, scls, NEG_INF)
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
            o_parts[i].append(oT.reshape(hs, lpat).astype(cdt))
            ocls_parts[i].append(oc.reshape(hs, 1).astype(cdt))

    def cat(parts):
        return jnp.concatenate(parts, 0) if len(parts) > 1 else parts[0]

    o2 = (cat(o_parts[0]) if nimg == 1 else
          jnp.concatenate([cat(o_parts[i]) for i in range(nimg)], axis=1))
    # outT[dout, l] = sum_d wo[d, dout] * oT[d, l]   (AtB form)
    outT = jax.lax.dot_general(
        wo_ref[...], o2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    outT = outT + vecT_ref[:, 5:6]
    for i in range(nimg):
        o_ref[i] = (outT[:, i * lpat:(i + 1) * lpat]).astype(
            o_ref.dtype) + xT_ref[i]
        ocls_ref[i, 0, :] = cat(ocls_parts[i]).reshape(d)


def _mhsa_t_call(xT, clsqkv, wqkv, wo, vecT, bqkvT, *, num_heads, valid,
                 eps, sm_scale, nomax, interpret, nimg=None):
    b, d, lpat = xT.shape
    head_dim = d // num_heads
    hchunk = _pick_hchunk(num_heads, lpat + 8, lpat)
    # 2 images per step widens every projection dot to 2·LPAT lanes
    # (measured +2.6% on the sub-kernel at ViT-L shapes; 4 regresses — the
    # f32 qkvT and attention loop buffers crowd VMEM)
    if nimg is None:
        nimg = 2 if b % 2 == 0 else 1
    out, ocls = pl.pallas_call(
        functools.partial(
            _mhsa_t_kernel, num_heads=num_heads, head_dim=head_dim,
            lpat=lpat, valid=valid, hchunk=hchunk, eps=eps,
            sm_scale=sm_scale, nomax=nomax, nimg=nimg),
        grid=(b // nimg, 1, 1),
        in_specs=[
            pl.BlockSpec((nimg, d, lpat), lambda i, _, __: (i, 0, 0)),
            pl.BlockSpec((nimg, 3 * d, 1), lambda i, _, __: (i, 0, 0)),
            pl.BlockSpec((d, 3 * d), lambda i, _, __: (0, 0)),
            pl.BlockSpec((d, d), lambda i, _, __: (0, 0)),
            pl.BlockSpec((d, 8), lambda i, _, __: (0, 0)),
            pl.BlockSpec((3 * d, 1), lambda i, _, __: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nimg, d, lpat), lambda i, _, __: (i, 0, 0)),
            pl.BlockSpec((nimg, 1, d), lambda i, _, __: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d, lpat), xT.dtype),
            jax.ShapeDtypeStruct((b, 1, d), xT.dtype),
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(xT, clsqkv[:, :, None], wqkv, wo, vecT, bqkvT)
    return out, ocls[:, 0, :]


# ---------------------------------------------------------------------------
# MHSA-T backward kernel: recompute forward in-kernel, f32 weight-grad accum
# ---------------------------------------------------------------------------


def _mhsa_t_bwd_kernel(
    xT_ref, clsqkv_ref, g_ref, gclsT_ref, wqkv_ref, wo_ref, vecT_ref, bqkvT_ref,
    dx_ref, dcls_ref, dwqkv_ref, dwo_ref, dvec_ref, dbqkv_ref,
    *, num_heads, head_dim, lpat, valid, hchunk, eps, sm_scale, nomax, nimg,
):
    """Backward of the MHSA-T kernel (same math as _tblock_reference's
    attention sub-block). g: cotangent of the residual output blocks;
    gclsT: cotangent of the (pre-out-proj) cls attention rows, passed as
    (nimg, D, 1) COLUMNS so per-chunk slices are sublane slices.

    Weight/vector grads accumulate in f32 output blocks resident in VMEM
    across the whole grid (constant index maps -> one flush at the end)."""
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _zero():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dvec_ref[...] = jnp.zeros_like(dvec_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)

    cdt = xT_ref.dtype
    d = num_heads * head_dim
    lk = lpat + 1

    x2 = (xT_ref[0] if nimg == 1 else
          jnp.concatenate([xT_ref[i] for i in range(nimg)], axis=1))
    g2 = (g_ref[0] if nimg == 1 else
          jnp.concatenate([g_ref[i] for i in range(nimg)], axis=1))

    # ---- forward recompute: LN over features (sublane axis) ----
    xf = x2.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(xf * xf, axis=0, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    ln_s = vecT_ref[:, 0:1]
    y = (xhat * ln_s + vecT_ref[:, 1:2]).astype(cdt)

    qkvT = jax.lax.dot_general(
        wqkv_ref[...], y, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkvT = (qkvT + bqkvT_ref[...]).astype(cdt)  # (3D, N)

    gf2 = g2.astype(jnp.float32)
    # do2[d, l] = sum_dout wo[d, dout] g2[dout, l]
    do2 = jax.lax.dot_general(
        wo_ref[...], g2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdt)

    o_parts = [[] for _ in range(nimg)]
    dq_parts = [[] for _ in range(nimg)]
    dk_parts = [[] for _ in range(nimg)]
    dv_parts = [[] for _ in range(nimg)]
    dqc_parts = [[] for _ in range(nimg)]
    dkc_parts = [[] for _ in range(nimg)]
    dvc_parts = [[] for _ in range(nimg)]
    for c in range(num_heads // hchunk):
        r0 = c * hchunk * head_dim
        hs = hchunk * head_dim
        for i in range(nimg):
            cols = slice(i * lpat, (i + 1) * lpat)
            clsqkvT = clsqkv_ref[i].astype(cdt)  # (3D, 1)
            q3 = (qkvT[r0:r0 + hs, cols] * sm_scale).astype(cdt).reshape(
                hchunk, head_dim, lpat)
            k3p = qkvT[d + r0:d + r0 + hs, cols].reshape(hchunk, head_dim, lpat)
            v3p = qkvT[2 * d + r0:2 * d + r0 + hs, cols].reshape(
                hchunk, head_dim, lpat)
            qcls = (clsqkvT[r0:r0 + hs] * sm_scale).astype(cdt).reshape(
                hchunk, head_dim, 1)
            kcls = clsqkvT[d + r0:d + r0 + hs].reshape(hchunk, head_dim, 1)
            vcls = clsqkvT[2 * d + r0:2 * d + r0 + hs].reshape(
                hchunk, head_dim, 1)
            k_ext = jnp.concatenate([k3p, kcls], axis=2)  # (h, HD, LK)
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
                sT = jnp.where(keymask, sT, NEG_INF)
                scls = jnp.where(keymask, scls, NEG_INF)
            if nomax:
                p = jnp.exp(jnp.minimum(sT, 80.0))
                pc = jnp.exp(jnp.minimum(scls, 80.0))
            else:
                p = jnp.exp(sT - jnp.max(sT, axis=1, keepdims=True))
                pc = jnp.exp(scls - jnp.max(scls, axis=1, keepdims=True))
            a = p / jnp.sum(p, axis=1, keepdims=True)    # (h, LK, LPAT)
            ac = pc / jnp.sum(pc, axis=1, keepdims=True)  # (h, LK, 1)
            ab, acb = a.astype(cdt), ac.astype(cdt)

            # forward attention output (for dWo)
            o_parts[i].append(jax.lax.dot_general(
                v_ext, ab, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
                .reshape(hs, lpat).astype(cdt))

            do3 = do2[r0:r0 + hs, cols].reshape(hchunk, head_dim, lpat)
            doc = gclsT_ref[i, r0:r0 + hs].astype(cdt).reshape(
                hchunk, head_dim, 1)

            # dv[h,d,k] = sum_q do[h,d,q] a[h,k,q]   (+ cls-query term)
            dv3 = jax.lax.dot_general(
                do3, ab, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dv3 += jax.lax.dot_general(
                doc, acb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            # da[h,k,q] = sum_d v[h,d,k] do[h,d,q]
            da = jax.lax.dot_general(
                v_ext, do3, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dac = jax.lax.dot_general(
                v_ext, doc, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            # softmax backward over keys (axis 1)
            ds = a * (da - jnp.sum(da * a, axis=1, keepdims=True))
            dsc = ac * (dac - jnp.sum(dac * ac, axis=1, keepdims=True))
            dsb, dscb = ds.astype(cdt), dsc.astype(cdt)
            # dq[h,d,q] = sum_k k[h,d,k] ds[h,k,q]
            dq3 = jax.lax.dot_general(
                k_ext, dsb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dqc = jax.lax.dot_general(
                k_ext, dscb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            # dk[h,d,k] = sum_q q[h,d,q] ds[h,k,q]   (+ cls-query term)
            dk3 = jax.lax.dot_general(
                q3, dsb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dk3 += jax.lax.dot_general(
                qcls, dscb, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

            dq_parts[i].append(
                (dq3.reshape(hs, lpat) * sm_scale).astype(cdt))
            dk_parts[i].append(
                dk3[:, :, :lpat].reshape(hs, lpat).astype(cdt))
            dv_parts[i].append(
                dv3[:, :, :lpat].reshape(hs, lpat).astype(cdt))
            dqc_parts[i].append(dqc.reshape(hs, 1) * sm_scale)
            dkc_parts[i].append(dk3[:, :, lpat:].reshape(hs, 1))
            dvc_parts[i].append(dv3[:, :, lpat:].reshape(hs, 1))

    def cat(parts, axis=0):
        return jnp.concatenate(parts, axis) if len(parts) > 1 else parts[0]

    def img_cat(per_img):
        rows = [cat(per_img[i]) for i in range(nimg)]
        return cat(rows, axis=1) if nimg > 1 else rows[0]

    o2 = img_cat(o_parts)      # (D, N)
    dq2 = img_cat(dq_parts)
    dk2 = img_cat(dk_parts)
    dv2 = img_cat(dv_parts)
    dqkvT = jnp.concatenate([dq2, dk2, dv2], axis=0)  # (3D, N)

    # out-proj grads: dwo[d, dout] = sum_l o2[d,l] g2[dout,l]
    dwo_ref[...] += jax.lax.dot_general(
        o2, g2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dbo = jnp.sum(gf2, axis=1, keepdims=True)  # (D, 1)
    dbqkv_ref[...] += jnp.sum(
        dqkvT.astype(jnp.float32), axis=1, keepdims=True)

    # dy[d, l] = sum_o wqkv[d, o] dqkvT[o, l]
    dyf = jax.lax.dot_general(
        wqkv_ref[...], dqkvT, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dwqkv[d, o] = sum_l y[d,l] dqkvT[o,l]
    dwqkv_ref[...] += jax.lax.dot_general(
        y, dqkvT, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # LN backward (per-column; features on sublanes)
    zcol = jnp.zeros((d, 1), jnp.float32)
    dvec_ref[...] += jnp.concatenate(
        [
            jnp.sum(dyf * xhat, axis=1, keepdims=True),  # dln_scale
            jnp.sum(dyf, axis=1, keepdims=True),         # dln_bias
            zcol, zcol, zcol,
            dbo,                                         # col 5 = dbo
            zcol, zcol,
        ],
        axis=1,
    )
    dxhat = dyf * ln_s
    mean_dxhat = jnp.mean(dxhat, axis=0, keepdims=True)
    mean_dxhat_xhat = jnp.mean(dxhat * xhat, axis=0, keepdims=True)
    dx_ln = rstd * (dxhat - mean_dxhat - xhat * mean_dxhat_xhat)

    for i in range(nimg):
        dx_ref[i] = (g_ref[i].astype(jnp.float32)
                     + dx_ln[:, i * lpat:(i + 1) * lpat]).astype(dx_ref.dtype)
        dcls_ref[i] = jnp.concatenate(
            [cat(dqc_parts[i]), cat(dkc_parts[i]), cat(dvc_parts[i])], axis=0
        ).astype(dcls_ref.dtype)


def _mhsa_t_bwd_call(xT, clsqkv, g, gcls, wqkv, wo, vecT, bqkvT, *,
                     num_heads, valid, eps, sm_scale, nomax, interpret):
    b, d, lpat = xT.shape
    head_dim = d // num_heads
    # the bwd holds ~4 score-sized f32 tensors at once -> smaller budget
    hchunk = _pick_hchunk(num_heads, lpat + 8, lpat,
                          budget=int(2.5 * 1024 * 1024))
    nimg = 2 if b % 2 == 0 else 1
    outs = pl.pallas_call(
        functools.partial(
            _mhsa_t_bwd_kernel, num_heads=num_heads, head_dim=head_dim,
            lpat=lpat, valid=valid, hchunk=hchunk, eps=eps,
            sm_scale=sm_scale, nomax=nomax, nimg=nimg),
        grid=(b // nimg, 1, 1),
        in_specs=[
            pl.BlockSpec((nimg, d, lpat), lambda i, _, __: (i, 0, 0)),
            pl.BlockSpec((nimg, 3 * d, 1), lambda i, _, __: (i, 0, 0)),
            pl.BlockSpec((nimg, d, lpat), lambda i, _, __: (i, 0, 0)),
            pl.BlockSpec((nimg, d, 1), lambda i, _, __: (i, 0, 0)),
            pl.BlockSpec((d, 3 * d), lambda i, _, __: (0, 0)),
            pl.BlockSpec((d, d), lambda i, _, __: (0, 0)),
            pl.BlockSpec((d, 8), lambda i, _, __: (0, 0)),
            pl.BlockSpec((3 * d, 1), lambda i, _, __: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nimg, d, lpat), lambda i, _, __: (i, 0, 0)),
            pl.BlockSpec((nimg, 3 * d, 1), lambda i, _, __: (i, 0, 0)),
            pl.BlockSpec((d, 3 * d), lambda i, _, __: (0, 0)),
            pl.BlockSpec((d, d), lambda i, _, __: (0, 0)),
            pl.BlockSpec((d, 8), lambda i, _, __: (0, 0)),
            pl.BlockSpec((3 * d, 1), lambda i, _, __: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d, lpat), xT.dtype),
            jax.ShapeDtypeStruct((b, 3 * d, 1), xT.dtype),
            jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((d, 8), jnp.float32),
            jax.ShapeDtypeStruct((3 * d, 1), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(xT, clsqkv[:, :, None], g, gcls[:, :, None], wqkv, wo, vecT, bqkvT)
    dxT, dcls3, dwqkv, dwo, dvec, dbqkvT = outs
    return dxT, dcls3[:, :, 0], dwqkv, dwo, dvec, dbqkvT


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _mhsa_t(xT, clsqkv, wqkv, wo, vecT, bqkvT, num_heads, valid, eps,
            sm_scale, nomax, interpret):
    return _mhsa_t_call(xT, clsqkv, wqkv, wo, vecT, bqkvT,
                        num_heads=num_heads, valid=valid, eps=eps,
                        sm_scale=sm_scale, nomax=nomax, interpret=interpret)


def _mhsa_t_fwd(xT, clsqkv, wqkv, wo, vecT, bqkvT, num_heads, valid, eps,
                sm_scale, nomax, interpret):
    out = _mhsa_t_call(xT, clsqkv, wqkv, wo, vecT, bqkvT,
                       num_heads=num_heads, valid=valid, eps=eps,
                       sm_scale=sm_scale, nomax=nomax, interpret=interpret)
    return out, (xT, clsqkv, wqkv, wo, vecT, bqkvT)


def _mhsa_t_vjp(num_heads, valid, eps, sm_scale, nomax, interpret, res, g):
    xT, clsqkv, wqkv, wo, vecT, bqkvT = res
    dout, dcls = g
    dxT, dclsqkv, dwqkv, dwo, dvec, dbqkvT = _mhsa_t_bwd_call(
        xT, clsqkv, dout, dcls.astype(xT.dtype), wqkv, wo, vecT, bqkvT,
        num_heads=num_heads, valid=valid, eps=eps, sm_scale=sm_scale,
        nomax=nomax, interpret=interpret)
    return (dxT, dclsqkv.astype(clsqkv.dtype), dwqkv.astype(wqkv.dtype),
            dwo.astype(wo.dtype), dvec.astype(vecT.dtype),
            dbqkvT.astype(bqkvT.dtype))


_mhsa_t.defvjp(_mhsa_t_fwd, _mhsa_t_vjp)


# ---------------------------------------------------------------------------
# MLP-T kernel: LN + fc1 + tanh-GELU + fc2 + residual
# ---------------------------------------------------------------------------


def _mlp_t_kernel(xT_ref, w1_ref, w2_ref, vecT_ref, b1T_ref, o_ref, *,
                  eps, nimg=1, hchunks=1):
    """vecT_ref (D, 8) cols: 0=ln2_scale 1=ln2_bias 2=b2; b1T_ref (4D, 1).

    `nimg` images' lanes run CONCATENATED through LN and both dots
    (nimg·LPAT columns — wider MXU tiles, same trick as the MHSA-T kernel).

    `hchunks` splits the HIDDEN dim: fc1 columns / GELU / fc2 rows run
    chunk-by-chunk, so the VPU's tanh-GELU of chunk c overlaps the MXU
    dots of chunk c±1 instead of serializing between two monolithic
    matmuls (each h element still sees the full D contraction, so fc1 and
    GELU are bitwise unchanged; only fc2's f32 accumulation order moves).
    Measured on v5e (profile_encode.py round 5): chunking is a wash —
    the kernel already matches bare-XLA matmul throughput at identical
    shapes to 0.7% (61.4 vs 61.0 us/step), i.e. it sits on the chip's
    ACHIEVABLE matmul ceiling (~71-77% of the 197T nameplate at ViT
    lane widths), and the GELU/LN are fully hidden behind the dots.
    """
    lpat = xT_ref.shape[2]
    mlp_dim = w1_ref.shape[1]
    xT = (xT_ref[0] if nimg == 1 else
          jnp.concatenate([xT_ref[i] for i in range(nimg)], axis=1))
    cdt = xT.dtype
    xf = xT.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(xf * xf, axis=0, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * vecT_ref[:, 0:1] + vecT_ref[:, 1:2]).astype(cdt)

    out = None
    csz = mlp_dim // hchunks
    for c in range(hchunks):
        rows = slice(c * csz, (c + 1) * csz)
        h = jax.lax.dot_general(
            w1_ref[:, rows], y, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (csz, nimg*LPAT)
        h = h + b1T_ref[rows]
        # tanh-approximate GELU (jax.nn.gelu approximate=True)
        h = 0.5 * h * (
            1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h * h * h)))
        h = h.astype(cdt)
        part = jax.lax.dot_general(
            w2_ref[rows], h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (D, nimg*LPAT)
        out = part if out is None else out + part
    out = out + vecT_ref[:, 2:3]
    for i in range(nimg):
        o_ref[i] = (out[:, i * lpat:(i + 1) * lpat]).astype(
            o_ref.dtype) + xT_ref[i]


def _mlp_t_call(xT, w1, w2, vecT, b1T, *, eps, interpret, nimg=None,
                hchunks=None):
    b, d, lpat = xT.shape
    mlp_dim = w1.shape[1]
    if nimg is None:
        nimg = 2 if b % 2 == 0 else 1
    if hchunks is None:
        # A/B-measured on v5e at L/14 shapes (docs/PERF_NOTES.md round 5):
        # 1/2/4/8 chunks are all within noise (30.7-31.1 us/img) — Mosaic
        # already overlaps the VPU GELU with the MXU dots (an identity
        # activation times identically), so the monolithic form stays the
        # default and the knob remains for other geometries.
        hchunks = 1
    return pl.pallas_call(
        functools.partial(_mlp_t_kernel, eps=eps, nimg=nimg,
                          hchunks=hchunks),
        grid=(b // nimg, 1, 1),
        in_specs=[
            pl.BlockSpec((nimg, d, lpat), lambda i, _, __: (i, 0, 0)),
            pl.BlockSpec((d, mlp_dim), lambda i, _, __: (0, 0)),
            pl.BlockSpec((mlp_dim, d), lambda i, _, __: (0, 0)),
            pl.BlockSpec((d, 8), lambda i, _, __: (0, 0)),
            pl.BlockSpec((mlp_dim, 1), lambda i, _, __: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nimg, d, lpat), lambda i, _, __: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d, lpat), xT.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(xT, w1, w2, vecT, b1T)


# ---------------------------------------------------------------------------
# MLP-T backward kernel
# ---------------------------------------------------------------------------


_GELU_C = 0.7978845608028654  # sqrt(2/pi)
_GELU_A = 0.044715


def _mlp_t_bwd_kernel(xT_ref, g_ref, w1_ref, w2_ref, vecT_ref, b1T_ref,
                      dx_ref, dw1_ref, dw2_ref, dvec_ref, db1_ref, *, eps):
    """Backward of LN + fc1 + tanh-GELU + fc2 + residual. The (4D, LPAT)
    hidden is recomputed in VMEM; dw1/dw2 accumulate in f32 across the grid."""
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _zero():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        dvec_ref[...] = jnp.zeros_like(dvec_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    xT = xT_ref[0]
    g = g_ref[0]
    cdt = xT.dtype
    d = xT.shape[0]

    # ---- forward recompute ----
    xf = xT.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(xf * xf, axis=0, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    ln_s = vecT_ref[:, 0:1]
    y = (xhat * ln_s + vecT_ref[:, 1:2]).astype(cdt)
    h = jax.lax.dot_general(
        w1_ref[...], y, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (4D, LPAT)
    h = h + b1T_ref[...]
    t = jnp.tanh(_GELU_C * (h + _GELU_A * h * h * h))
    gact = (0.5 * h * (1.0 + t)).astype(cdt)

    gf = g.astype(jnp.float32)
    # dw2[m, d] = sum_l gact[m,l] g[d,l]
    dw2_ref[...] += jax.lax.dot_general(
        gact, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    # dgact[m, l] = sum_d w2[m, d] g[d, l]
    dgact = jax.lax.dot_general(
        w2_ref[...], g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # tanh-GELU derivative (f32)
    dh = dgact * (0.5 * (1.0 + t)
                  + 0.5 * h * (1.0 - t * t) * _GELU_C
                  * (1.0 + 3.0 * _GELU_A * h * h))
    db1_ref[...] += jnp.sum(dh, axis=1, keepdims=True)
    dhb = dh.astype(cdt)
    # dw1[d, m] = sum_l y[d,l] dh[m,l]
    dw1_ref[...] += jax.lax.dot_general(
        y, dhb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    # dy[d, l] = sum_m w1[d, m] dh[m, l]
    dyf = jax.lax.dot_general(
        w1_ref[...], dhb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    zcol = jnp.zeros((d, 1), jnp.float32)
    dvec_ref[...] += jnp.concatenate(
        [
            jnp.sum(dyf * xhat, axis=1, keepdims=True),  # dln2_scale
            jnp.sum(dyf, axis=1, keepdims=True),         # dln2_bias
            jnp.sum(gf, axis=1, keepdims=True),          # col 2 = db2
            zcol, zcol, zcol, zcol, zcol,
        ],
        axis=1,
    )
    dxhat = dyf * ln_s
    mean_dxhat = jnp.mean(dxhat, axis=0, keepdims=True)
    mean_dxhat_xhat = jnp.mean(dxhat * xhat, axis=0, keepdims=True)
    dx_ln = rstd * (dxhat - mean_dxhat - xhat * mean_dxhat_xhat)
    dx_ref[0] = (gf + dx_ln).astype(dx_ref.dtype)


def _mlp_t_bwd_call(xT, g, w1, w2, vecT, b1T, *, eps, interpret):
    b, d, lpat = xT.shape
    mlp_dim = w1.shape[1]
    outs = pl.pallas_call(
        functools.partial(_mlp_t_bwd_kernel, eps=eps),
        grid=(b, 1, 1),
        in_specs=[
            pl.BlockSpec((1, d, lpat), lambda i, _, __: (i, 0, 0)),
            pl.BlockSpec((1, d, lpat), lambda i, _, __: (i, 0, 0)),
            pl.BlockSpec((d, mlp_dim), lambda i, _, __: (0, 0)),
            pl.BlockSpec((mlp_dim, d), lambda i, _, __: (0, 0)),
            pl.BlockSpec((d, 8), lambda i, _, __: (0, 0)),
            pl.BlockSpec((mlp_dim, 1), lambda i, _, __: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d, lpat), lambda i, _, __: (i, 0, 0)),
            pl.BlockSpec((d, mlp_dim), lambda i, _, __: (0, 0)),
            pl.BlockSpec((mlp_dim, d), lambda i, _, __: (0, 0)),
            pl.BlockSpec((d, 8), lambda i, _, __: (0, 0)),
            pl.BlockSpec((mlp_dim, 1), lambda i, _, __: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d, lpat), xT.dtype),
            jax.ShapeDtypeStruct((d, mlp_dim), jnp.float32),
            jax.ShapeDtypeStruct((mlp_dim, d), jnp.float32),
            jax.ShapeDtypeStruct((d, 8), jnp.float32),
            jax.ShapeDtypeStruct((mlp_dim, 1), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(xT, g, w1, w2, vecT, b1T)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _mlp_t(xT, w1, w2, vecT, b1T, eps, interpret):
    return _mlp_t_call(xT, w1, w2, vecT, b1T, eps=eps, interpret=interpret)


def _mlp_t_fwd(xT, w1, w2, vecT, b1T, eps, interpret):
    out = _mlp_t_call(xT, w1, w2, vecT, b1T, eps=eps, interpret=interpret)
    return out, (xT, w1, w2, vecT, b1T)


def _mlp_t_vjp(eps, interpret, res, g):
    xT, w1, w2, vecT, b1T = res
    dxT, dw1, dw2, dvec, db1 = _mlp_t_bwd_call(
        xT, g, w1, w2, vecT, b1T, eps=eps, interpret=interpret)
    return (dxT, dw1.astype(w1.dtype), dw2.astype(w2.dtype),
            dvec.astype(vecT.dtype), db1.astype(b1T.dtype))


_mlp_t.defvjp(_mlp_t_fwd, _mlp_t_vjp)


def _compiler_params(interpret):
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# ---------------------------------------------------------------------------
# Whole encoder block on the transposed stream (+ cls XLA side path)
# ---------------------------------------------------------------------------


def _ln_rows(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias)


def _tblock_impl(xT, cls, wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2,
                 ln2s, ln2b, num_heads, valid, eps, nomax, interpret):
    cdt = xT.dtype
    d = xT.shape[1]
    sm_scale = (d // num_heads) ** -0.5

    # cls side path: LN1 + qkv row (unscaled; the kernel folds sm_scale)
    ycls = _ln_rows(cls, ln1s, ln1b, eps).astype(cdt)
    clsqkv = (ycls @ wqkv.astype(cdt) + bqkv).astype(cdt)  # (B, 3D)

    vecT_attn = jnp.stack(
        [ln1s, ln1b, z := jnp.zeros_like(ln1s), z, z, bo, z, z], axis=1
    ).astype(jnp.float32)  # (D, 8)
    bqkvT = bqkv.astype(jnp.float32)[:, None]  # (3D, 1)

    outT, ocls = _shard_over_batch(
        lambda x_, cq, w3, w4, vv, bb: _mhsa_t(
            x_, cq, w3, w4, vv, bb, num_heads, valid, eps, sm_scale, nomax,
            interpret),
        xT, clsqkv, wqkv.astype(cdt), wo.astype(cdt), vecT_attn, bqkvT,
        extra_batched=1, n_outs=2,
    )
    cls = cls + (ocls.astype(jnp.float32) @ wo.astype(jnp.float32) + bo).astype(cdt)

    # cls MLP (tanh GELU to match the kernel)
    ycls = _ln_rows(cls, ln2s, ln2b, eps).astype(cdt)
    hcls = jax.nn.gelu(
        (ycls @ w1.astype(cdt) + b1.astype(cdt)).astype(jnp.float32),
        approximate=True).astype(cdt)
    cls = cls + (hcls @ w2.astype(cdt) + b2.astype(cdt)).astype(cdt)

    vecT_mlp = jnp.stack(
        [ln2s, ln2b, b2, jnp.zeros_like(ln2s)] + [jnp.zeros_like(ln2s)] * 4,
        axis=1).astype(jnp.float32)
    b1T = b1.astype(jnp.float32)[:, None]
    outT = _shard_over_batch(
        lambda x_, a, b_, vv, bb: _mlp_t(x_, a, b_, vv, bb, eps, interpret),
        outT, w1.astype(cdt), w2.astype(cdt), vecT_mlp, b1T,
    )
    return outT, cls


def _tblock_reference(xT, cls, wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2,
                      b2, ln2s, ln2b, num_heads, valid, eps):
    """Mathematically identical jnp implementation (backward pass + tests)."""
    cdt = xT.dtype
    b, d, lpat = xT.shape
    hd = d // num_heads
    sm = hd ** -0.5

    x = jnp.concatenate([cls[:, None, :], jnp.swapaxes(xT, 1, 2)], axis=1)
    lvalid = 1 + valid
    y = _ln_rows(x, ln1s, ln1b, eps).astype(cdt)
    qkv = (y @ wqkv.astype(cdt) + bqkv.astype(cdt)).astype(cdt)
    q = qkv[..., :d].reshape(b, -1, num_heads, hd).astype(cdt) * sm
    k = qkv[..., d:2 * d].reshape(b, -1, num_heads, hd)
    v = qkv[..., 2 * d:].reshape(b, -1, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(cdt), k).astype(jnp.float32)
    kmask = jnp.arange(x.shape[1]) < lvalid
    s = jnp.where(kmask[None, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(cdt)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, -1, d)
    x = x + (o @ wo.astype(cdt) + bo).astype(cdt)
    y = _ln_rows(x, ln2s, ln2b, eps).astype(cdt)
    h = jax.nn.gelu(
        (y @ w1.astype(cdt) + b1.astype(cdt)).astype(jnp.float32),
        approximate=True).astype(cdt)
    x = x + (h @ w2.astype(cdt) + b2.astype(cdt)).astype(cdt)
    return jnp.swapaxes(x[:, 1:, :], 1, 2), x[:, 0, :]


def fused_encoder_tblock(
    xT: jax.Array,
    cls: jax.Array,
    wqkv: jax.Array, bqkv: jax.Array,
    wo: jax.Array, bo: jax.Array,
    ln1_scale: jax.Array, ln1_bias: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    ln2_scale: jax.Array, ln2_bias: jax.Array,
    *,
    num_heads: int,
    valid: int,
    eps: float = 1e-6,
    nomax: bool = False,
    interpret: bool = False,
):
    """One pre-LN encoder block on the transposed stream.

    xT: (B, D, LPAT) patch tokens, LPAT a multiple of 128 with `valid` real
    columns; cls: (B, D) the [cls] token rows. wqkv: (D, 3D) = concat of
    query/key/value kernels; w1/w2: MLP kernels. Returns (xT', cls').

    Differentiable: both Pallas kernels carry fused Pallas backwards
    (custom VJPs on _mhsa_t/_mlp_t); the cls row side paths are plain XLA
    and differentiate via autodiff.
    """
    return _tblock_impl(
        xT, cls, wqkv, bqkv, wo, bo, ln1_scale, ln1_bias, w1, b1, w2, b2,
        ln2_scale, ln2_bias, num_heads, valid, eps, nomax, interpret)


def to_transposed_stream(x: jax.Array):
    """(B, 1+P, D) cls-first tokens -> ((B, D, Ppad), (B, D), valid P)."""
    b, l, d = x.shape
    p = l - 1
    ppad = _ceil_to(max(p, 128), 128)
    patches = jnp.swapaxes(x[:, 1:, :], 1, 2)  # (B, D, P)
    if ppad != p:
        patches = jnp.pad(patches, ((0, 0), (0, 0), (0, ppad - p)))
    return patches, x[:, 0, :], p


def from_transposed_stream(xT: jax.Array, cls: jax.Array, valid: int):
    """Inverse of to_transposed_stream: -> (B, 1+valid, D)."""
    patches = jnp.swapaxes(xT[:, :, :valid], 1, 2)
    return jnp.concatenate([cls[:, None, :], patches], axis=1)
