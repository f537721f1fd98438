"""Custom Pallas TPU flash-attention kernel (forward + backward).

An online-softmax attention kernel built from scratch for this framework
(the reference imports JAX's stock flash/splash kernels instead —
src/models/common.py:36-38; here we own the kernel so block shapes, masking,
and the backward pass are tuned for OpenVision's shapes: head_dim 64-128 and
sequence lengths like 197/257/577 that are NOT multiples of the MXU tile).

Design:
- Layout (B*H, L, D). CLIP-scale attention has many small (batch·head) slices
  (e.g. ViT-L: B·H=4096 at L=257, D=64), so the grid groups G of them per
  step — (BH/G, q_blocks, k_blocks) — and computes batched dot_generals over
  the group, amortizing grid overhead and keeping the MXU fed despite D=64.
- The k axis is innermost, so VMEM scratch accumulators legally carry across
  k steps (TPU grids execute the innermost dimension sequentially).
- Arbitrary (non-tile-aligned) sequence lengths via padding + in-kernel iota
  masks; padded rows/cols contribute exactly zero, forward and backward.
- Causal support with block-level skipping (upper-triangle blocks do no work).
- f32 accumulation regardless of input dtype.
- Backward = FlashAttention-2 style recomputation: forward saves only the
  logsumexp; two kernels produce dq and (dk, dv).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128

# dot_general dimension numbers for group-batched products.
_QK = (((2,), (2,)), ((0,), (0,)))  # (G,bq,D)·(G,bk,D) → (G,bq,bk)
_PV = (((2,), (1,)), ((0,), (0,)))  # (G,bq,bk)·(G,bk,D) → (G,bq,D)
_PT_DO = (((1,), (1,)), ((0,), (0,)))  # (G,bq,bk)ᵀ·(G,bq,D) → (G,bk,D)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _band_mask(qi, ki, block_q, block_k, seq_q, seq_k, causal, prefix=0):
    rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = (cols < seq_k) & (rows < seq_q)
    if causal:
        band = cols <= rows
        if prefix > 0:
            # prefix-LM: the first `prefix` keys are visible to every row
            # (col j allowed from row i iff j <= max(i, prefix-1) — the
            # concat-fusion caption-decoder mask, models/encoder.py:41).
            band |= cols < prefix
        mask &= band
    return mask[None]  # broadcast over the group dim


def _live(qi, ki, block_q, block_k, causal, prefix):
    """Whether kv block `ki` can contribute to q block `qi` (block skipping)."""
    if not causal:
        return True
    live = ki * block_k <= qi * block_q + block_q - 1
    if prefix > 0:
        live |= ki * block_k < prefix
    return live


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel_single_k(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    *, sm_scale, block_q, block_k, seq_q, seq_k, causal, prefix,
):
    _single_k_body(q_ref, k_ref, v_ref, o_ref, lse_ref,
                   qi=pl.program_id(1), block_q=block_q, block_k=block_k,
                   seq_q=seq_q, seq_k=seq_k, causal=causal, prefix=prefix)


def _fwd_kernel_single_k_nolse(
    q_ref, k_ref, v_ref, o_ref,
    *, sm_scale, block_q, block_k, seq_q, seq_k, causal, prefix,
):
    _single_k_body(q_ref, k_ref, v_ref, o_ref, None,
                   qi=pl.program_id(1), block_q=block_q, block_k=block_k,
                   seq_q=seq_q, seq_k=seq_k, causal=causal, prefix=prefix)


def _single_k_body(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    *, qi, block_q, block_k, seq_q, seq_k, causal, prefix,
):
    """Fast path when all keys fit one block: plain fused softmax-attention.

    VPU-lean by design (softmax is the bottleneck at CLIP shapes, not FLOPs):
    - sm_scale is folded into q by the caller (no mul pass over s),
    - masking is one fused additive bias (built 2-D, broadcast over the group)
      instead of two `where` selects over (G, bq, bk) — exp(NEG_INF + bias)
      underflows to exactly 0, so no second mask on p is needed,
    - the normalizing divide runs over (bq, D), not (bq, bk),
    - padded q rows produce garbage and are sliced off by the caller.
    """
    q = q_ref[...]  # (G, bq, D), already scaled by sm_scale
    k = k_ref[...]
    v = v_ref[...]

    s = jax.lax.dot_general(q, k, _QK, preferred_element_type=jnp.float32)

    mask = _band_mask(qi, 0, block_q, block_k, seq_q, seq_k, causal, prefix)
    s = jnp.where(mask, s, NEG_INF)  # exp(NEG_INF - m) == 0, no second mask

    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    l_safe = jnp.where(l <= 0.0, 1.0, l)

    o = jax.lax.dot_general(
        p.astype(v.dtype), v, _PV, preferred_element_type=jnp.float32
    )
    o_ref[...] = (o / l_safe).astype(o_ref.dtype)
    if lse_ref is not None:
        lse = m + jnp.log(l_safe)
        lse_ref[...] = jnp.broadcast_to(
            jnp.swapaxes(lse, 1, 2), lse_ref.shape
        ).astype(lse_ref.dtype)


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, sm_scale, block_q, block_k, seq_q, seq_k, causal, prefix, num_k_blocks,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    live = _live(qi, ki, block_q, block_k, causal, prefix)

    @pl.when(live)
    def _compute():
        q = q_ref[...]  # (G, bq, D)
        k = k_ref[...]
        v = v_ref[...]

        s = jax.lax.dot_general(q, k, _QK, preferred_element_type=jnp.float32)
        s = s * sm_scale
        mask = _band_mask(qi, ki, block_q, block_k, seq_q, seq_k, causal,
                          prefix)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :, :1]  # (G, bq, 1)
        l_prev = l_scr[:, :, :1]
        m_cur = jnp.max(s, axis=2, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        l_new = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)

        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, _PV, preferred_element_type=jnp.float32
        )
        acc_scr[:] = acc_scr[:] * alpha + pv

    if causal:
        last_k = jnp.minimum(num_k_blocks - 1, (qi * block_q + block_q - 1) // block_k)
        if prefix > 0:
            # live blocks stay a contiguous range from 0: the prefix range
            # [0, prefix) unions with the causal band ending at the diagonal.
            last_k = jnp.maximum(last_k, (prefix - 1) // block_k)
    else:
        last_k = num_k_blocks - 1

    @pl.when(ki == last_k)
    def _finalize():
        l = l_scr[:, :, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse = m_scr[:, :, :1] + jnp.log(l_safe)  # (G, bq, 1)
        lse_ref[...] = jnp.broadcast_to(
            jnp.swapaxes(lse, 1, 2), lse_ref.shape
        ).astype(lse_ref.dtype)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _recompute_p(q, k, lse_row, mask, sm_scale):
    s = jax.lax.dot_general(q, k, _QK, preferred_element_type=jnp.float32)
    p = jnp.exp(s * sm_scale - lse_row)
    return jnp.where(mask, p, 0.0)


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr,
    *, sm_scale, block_q, block_k, seq_q, seq_k, causal, prefix, num_k_blocks,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    live = _live(qi, ki, block_q, block_k, causal, prefix)

    @pl.when(live)
    def _compute():
        q = q_ref[...]
        k = k_ref[...]
        v = v_ref[...]
        do = do_ref[...].astype(jnp.float32)
        lse_row = jnp.swapaxes(lse_ref[:, :1, :], 1, 2)  # (G, bq, 1)
        delta_row = jnp.swapaxes(delta_ref[:, :1, :], 1, 2)

        mask = _band_mask(qi, ki, block_q, block_k, seq_q, seq_k, causal,
                          prefix)
        p = _recompute_p(q, k, lse_row, mask, sm_scale)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), _QK, preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_row) * sm_scale
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, _PV, preferred_element_type=jnp.float32
        )

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq_ref[...] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, sm_scale, block_q, block_k, seq_q, seq_k, causal, prefix, num_q_blocks,
):
    ki = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    live = _live(qi, ki, block_q, block_k, causal, prefix)

    @pl.when(live)
    def _compute():
        q = q_ref[...]
        k = k_ref[...]
        v = v_ref[...]
        do = do_ref[...].astype(jnp.float32)
        lse_row = jnp.swapaxes(lse_ref[:, :1, :], 1, 2)
        delta_row = jnp.swapaxes(delta_ref[:, :1, :], 1, 2)

        mask = _band_mask(qi, ki, block_q, block_k, seq_q, seq_k, causal,
                          prefix)
        p = _recompute_p(q, k, lse_row, mask, sm_scale)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, _PT_DO, preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), _QK, preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_row) * sm_scale
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, _PT_DO, preferred_element_type=jnp.float32
        )

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[...] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[...] = dv_scr[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _plan(bh: int, sq: int, sk: int, block_q, block_k, group, s_budget=5 * 1024 * 1024):
    """Chooses (group, block_q, block_k, padded seqs).

    Prefers a single k block (the VPU-lean fast path) for sequences up to 768,
    then grows the (batch·head) group as far as a ~5MB budget for the f32
    score matrix allows — the rest of the ~16MB VMEM goes to double-buffered
    operand blocks and scratch.
    """

    def pick(seq):
        aligned = _ceil_to(seq, LANES)
        return aligned if aligned <= 768 else 512

    bq = block_q or pick(sq)
    bk = block_k or pick(sk)
    sq_p = _ceil_to(max(sq, bq), bq)
    sk_p = _ceil_to(max(sk, bk), bk)
    if group is None:
        budget = s_budget
        group = 1
        while bh % (group * 2) == 0 and (group * 2) * bq * bk * 4 <= budget:
            group *= 2
    assert bh % group == 0, (bh, group)
    return group, bq, bk, sq_p, sk_p


def _pad_flat(x, b, h, s_p, d):
    s = x.shape[2]
    return jnp.pad(x, ((0, 0), (0, 0), (0, s_p - s), (0, 0))).reshape(b * h, s_p, d)


def _fwd_impl(q, k, v, causal, prefix, sm_scale, block_q, block_k, group,
              interpret, save_lse=True):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    g, bq, bk, sq_p, sk_p = _plan(b * h, sq, sk, block_q, block_k, group)

    nq, nk = sq_p // bq, sk_p // bk
    grid = (b * h // g, nq, nk)
    single_k = nk == 1

    if single_k:
        # VPU-lean path: fold the scale into q (fuses into the projection).
        q = q * jnp.asarray(sm_scale, q.dtype)

    qf = _pad_flat(q, b, h, sq_p, d)
    kf = _pad_flat(k, b, h, sk_p, d)
    vf = _pad_flat(v, b, h, sk_p, v.shape[-1])
    dv = v.shape[-1]

    if single_k:
        kernel = functools.partial(
            _fwd_kernel_single_k if save_lse else _fwd_kernel_single_k_nolse,
            sm_scale=sm_scale, block_q=bq, block_k=bk,
            seq_q=sq, seq_k=sk, causal=causal, prefix=prefix,
        )
        scratch = []
    else:
        kernel = functools.partial(
            _fwd_kernel,
            sm_scale=sm_scale, block_q=bq, block_k=bk,
            seq_q=sq, seq_k=sk, causal=causal, prefix=prefix, num_k_blocks=nk,
        )
        scratch = [
            pltpu.VMEM((g, bq, LANES), jnp.float32),
            pltpu.VMEM((g, bq, LANES), jnp.float32),
            pltpu.VMEM((g, bq, d), jnp.float32),
        ]
    out_specs = [pl.BlockSpec((g, bq, dv), lambda b_, qi, ki: (b_, qi, 0))]
    out_shape = [jax.ShapeDtypeStruct((b * h, sq_p, dv), q.dtype)]
    if save_lse or not single_k:
        out_specs.append(pl.BlockSpec((g, 8, bq), lambda b_, qi, ki: (b_, 0, qi)))
        out_shape.append(jax.ShapeDtypeStruct((b * h, 8, sq_p), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, bq, d), lambda b_, qi, ki: (b_, qi, 0)),
            pl.BlockSpec((g, bk, d), lambda b_, qi, ki: (b_, ki, 0)),
            pl.BlockSpec((g, bk, dv), lambda b_, qi, ki: (b_, ki, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(qf, kf, vf)
    o = outs[0]
    lse = outs[1] if len(outs) > 1 else None

    o = o.reshape(b, h, sq_p, dv)[:, :, :sq, :d]
    return o, lse


def _bwd_impl(q, k, v, o, lse, do, causal, prefix, sm_scale, block_q,
              block_k, group, interpret):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    # Backward holds ~2 score-sized f32 intermediates plus dk/dv scratch,
    # so it runs with a smaller group than forward.
    g, bq, bk, sq_p, sk_p = _plan(
        b * h, sq, sk, block_q, block_k, group, s_budget=2 * 1024 * 1024
    )

    # delta_i = rowsum(do * o) — computed once in plain XLA (cheap, fusible).
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq))).reshape(b * h, 1, sq_p)
    delta = jnp.broadcast_to(delta, (b * h, 8, sq_p))

    qf = _pad_flat(q, b, h, sq_p, d)
    kf = _pad_flat(k, b, h, sk_p, d)
    vf = _pad_flat(v, b, h, sk_p, d)
    dof = _pad_flat(do, b, h, sq_p, d)

    nq, nk = sq_p // bq, sk_p // bk

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel,
            sm_scale=sm_scale, block_q=bq, block_k=bk,
            seq_q=sq, seq_k=sk, causal=causal, prefix=prefix, num_k_blocks=nk,
        ),
        grid=(b * h // g, nq, nk),
        in_specs=[
            pl.BlockSpec((g, bq, d), lambda b_, qi, ki: (b_, qi, 0)),
            pl.BlockSpec((g, bk, d), lambda b_, qi, ki: (b_, ki, 0)),
            pl.BlockSpec((g, bk, d), lambda b_, qi, ki: (b_, ki, 0)),
            pl.BlockSpec((g, bq, d), lambda b_, qi, ki: (b_, qi, 0)),
            pl.BlockSpec((g, 8, bq), lambda b_, qi, ki: (b_, 0, qi)),
            pl.BlockSpec((g, 8, bq), lambda b_, qi, ki: (b_, 0, qi)),
        ],
        out_specs=pl.BlockSpec((g, bq, d), lambda b_, qi, ki: (b_, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((g, bq, d), jnp.float32)],
        interpret=interpret,
    )(qf, kf, vf, dof, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel,
            sm_scale=sm_scale, block_q=bq, block_k=bk,
            seq_q=sq, seq_k=sk, causal=causal, prefix=prefix, num_q_blocks=nq,
        ),
        grid=(b * h // g, nk, nq),
        in_specs=[
            pl.BlockSpec((g, bq, d), lambda b_, ki, qi: (b_, qi, 0)),
            pl.BlockSpec((g, bk, d), lambda b_, ki, qi: (b_, ki, 0)),
            pl.BlockSpec((g, bk, d), lambda b_, ki, qi: (b_, ki, 0)),
            pl.BlockSpec((g, bq, d), lambda b_, ki, qi: (b_, qi, 0)),
            pl.BlockSpec((g, 8, bq), lambda b_, ki, qi: (b_, 0, qi)),
            pl.BlockSpec((g, 8, bq), lambda b_, ki, qi: (b_, 0, qi)),
        ],
        out_specs=[
            pl.BlockSpec((g, bk, d), lambda b_, ki, qi: (b_, ki, 0)),
            pl.BlockSpec((g, bk, d), lambda b_, ki, qi: (b_, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, sk_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, bk, d), jnp.float32),
            pltpu.VMEM((g, bk, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, dof, lse, delta)

    dq = dq.reshape(b, h, sq_p, d)[:, :, :sq, :]
    dk = dk.reshape(b, h, sk_p, d)[:, :, :sk, :]
    dv = dv.reshape(b, h, sk_p, d)[:, :, :sk, :]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flash(q, k, v, causal, prefix, sm_scale, block_q, block_k, group,
           interpret):
    o, _ = _fwd_impl(
        q, k, v, causal, prefix, sm_scale, block_q, block_k, group, interpret,
        save_lse=False,
    )
    return o


def _flash_fwd(q, k, v, causal, prefix, sm_scale, block_q, block_k, group,
               interpret):
    o, lse = _fwd_impl(
        q, k, v, causal, prefix, sm_scale, block_q, block_k, group, interpret)
    return o, (q, k, v, o, lse)


def _flash_bwd(causal, prefix, sm_scale, block_q, block_k, group, interpret,
               res, do):
    q, k, v, o, lse = res
    return _bwd_impl(
        q, k, v, o, lse, do, causal, prefix, sm_scale, block_q, block_k,
        group, interpret
    )


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    prefix_len: int = 0,
    sm_scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    group: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention over `(batch, length, heads, head_dim)` inputs.

    Differentiable (custom VJP), supports causal and prefix-LM masking
    (`causal=True, prefix_len=p`: key j visible to query i iff
    j <= max(i, p-1) — the concat-fusion caption-decoder mask, reference
    src/models/text_decoder.py:482-520) and arbitrary sequence lengths.
    `group` batches that many (batch·head) slices per grid step (auto-tuned
    by default). `interpret=True` runs the Pallas interpreter (CPU tests).
    """
    assert q.ndim == 4, f"expected (B, L, H, D), got {q.shape}"
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if prefix_len and not causal:
        prefix_len = 0  # dense attention already sees everything
    qt, kt, vt = (jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v))
    o = _flash(qt, kt, vt, causal, int(prefix_len), sm_scale, block_q,
               block_k, group, interpret)
    return jnp.transpose(o, (0, 2, 1, 3))
