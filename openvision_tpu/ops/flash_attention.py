"""Custom Pallas TPU flash-attention kernel (forward + backward).

An online-softmax attention kernel built from scratch for this framework
(the reference imports JAX's stock flash/splash kernels instead —
src/models/common.py:36-38; here we own the kernel so block shapes, masking,
and the backward pass are tuned for OpenVision's shapes: head_dim 64-128 and
sequence lengths like 197/257/577 that are NOT multiples of the MXU tile).

Design:
- Layout (B*H, L, D); grid (BH, q_blocks, k_blocks) with the k axis innermost,
  so VMEM scratch accumulators legally carry across k steps (TPU grids are
  sequential over the innermost dimension).
- Arbitrary (non-tile-aligned) sequence lengths via padding + in-kernel iota
  masks; padded rows/cols contribute exactly zero, forward and backward.
- Causal support with block-level skipping (upper-triangle blocks do no work).
- f32 accumulation regardless of input dtype (bf16 inputs use the MXU in bf16
  with f32 accumulate via preferred_element_type).
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


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    sm_scale: float,
    block_q: int,
    block_k: int,
    seq_q: int,
    seq_k: int,
    causal: bool,
    num_k_blocks: int,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # A causal block is dead if its first key column exceeds its last query row.
    live = (ki * block_k <= qi * block_q + block_q - 1) if causal else True

    @pl.when(live)
    def _compute():
        q = q_ref[0]  # (block_q, D)
        k = k_ref[0]  # (block_k, D)
        v = v_ref[0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * sm_scale

        rows = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        cols = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = (cols < seq_k) & (rows < seq_q)
        if causal:
            mask &= cols <= rows
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:, :1]  # (block_q, 1)
        l_prev = l_scr[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        # Rows with every key masked: keep p exactly zero (exp(NEG_INF-NEG_INF)=1).
        p = jnp.where(mask, p, 0.0)
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + pv

    if causal:
        last_k = jnp.minimum(
            num_k_blocks - 1, (qi * block_q + block_q - 1) // block_k
        )
    else:
        last_k = num_k_blocks - 1

    @pl.when(ki == last_k)
    def _finalize():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse = m_scr[:, :1] + jnp.log(l_safe)
        lse_ref[0] = jnp.broadcast_to(lse.T, lse_ref.shape[1:]).astype(lse_ref.dtype)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _recompute_p(q, k, lse_row, *, sm_scale, qi, ki, block_q, block_k, seq_q, seq_k, causal):
    """Recomputes the softmax probability block P = exp(S - lse)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * sm_scale
    rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    cols = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = (cols < seq_k) & (rows < seq_q)
    if causal:
        mask &= cols <= rows
    p = jnp.exp(s - lse_row)
    return jnp.where(mask, p, 0.0)


def _dq_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    delta_ref,
    dq_ref,
    dq_scr,
    *,
    sm_scale: float,
    block_q: int,
    block_k: int,
    seq_q: int,
    seq_k: int,
    causal: bool,
    num_k_blocks: int,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    live = (ki * block_k <= qi * block_q + block_q - 1) if causal else True

    @pl.when(live)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse_row = lse_ref[0][:1, :].T  # (block_q, 1)
        delta_row = delta_ref[0][:1, :].T

        p = _recompute_p(
            q, k, lse_row,
            sm_scale=sm_scale, qi=qi, ki=ki, block_q=block_q, block_k=block_k,
            seq_q=seq_q, seq_k=seq_k, causal=causal,
        )
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_row) * sm_scale
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref,
    k_ref,
    v_ref,
    do_ref,
    lse_ref,
    delta_ref,
    dk_ref,
    dv_ref,
    dk_scr,
    dv_scr,
    *,
    sm_scale: float,
    block_q: int,
    block_k: int,
    seq_q: int,
    seq_k: int,
    causal: bool,
    num_q_blocks: int,
):
    ki = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    live = (ki * block_k <= qi * block_q + block_q - 1) if causal else True

    @pl.when(live)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse_row = lse_ref[0][:1, :].T
        delta_row = delta_ref[0][:1, :].T

        p = _recompute_p(
            q, k, lse_row,
            sm_scale=sm_scale, qi=qi, ki=ki, block_q=block_q, block_k=block_k,
            seq_q=seq_q, seq_k=seq_k, causal=causal,
        )
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_row) * sm_scale
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _pick_blocks(seq_q: int, seq_k: int, block_q: int | None, block_k: int | None):
    bq = block_q or min(512, _ceil_to(seq_q, LANES))
    bk = block_k or min(512, _ceil_to(seq_k, LANES))
    return bq, bk


def _pad_len(length: int, block: int) -> int:
    return _ceil_to(max(length, block), block)


def _fwd_impl(q, k, v, causal, sm_scale, block_q, block_k, interpret):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq, bk = _pick_blocks(sq, sk, block_q, block_k)
    sq_p, sk_p = _pad_len(sq, bq), _pad_len(sk, bk)

    qf = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0))).reshape(b * h, sq_p, d)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))).reshape(b * h, sk_p, d)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))).reshape(b * h, sk_p, d)

    nq, nk = sq_p // bq, sk_p // bk
    grid = (b * h, nq, nk)

    kernel = functools.partial(
        _fwd_kernel,
        sm_scale=sm_scale,
        block_q=bq,
        block_k=bk,
        seq_q=sq,
        seq_k=sk,
        causal=causal,
        num_k_blocks=nk,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b_, qi, ki: (b_, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, qi, ki: (b_, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, qi, ki: (b_, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b_, qi, ki: (b_, qi, 0)),
            pl.BlockSpec((1, 8, bq), lambda b_, qi, ki: (b_, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, 8, sq_p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)

    o = o.reshape(b, h, sq_p, d)[:, :, :sq, :]
    return o, lse


def _bwd_impl(q, k, v, o, lse, do, causal, sm_scale, block_q, block_k, interpret):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    bq, bk = _pick_blocks(sq, sk, block_q, block_k)
    sq_p, sk_p = _pad_len(sq, bq), _pad_len(sk, bk)

    # delta_i = rowsum(do * o) — computed once in plain XLA (cheap, fusible).
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq))).reshape(b * h, 1, sq_p)
    delta = jnp.broadcast_to(delta, (b * h, 8, sq_p))

    qf = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0))).reshape(b * h, sq_p, d)
    kf = jnp.pad(k, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))).reshape(b * h, sk_p, d)
    vf = jnp.pad(v, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0))).reshape(b * h, sk_p, d)
    dof = jnp.pad(do, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0))).reshape(b * h, sq_p, d)

    nq, nk = sq_p // bq, sk_p // bk

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel,
            sm_scale=sm_scale, block_q=bq, block_k=bk,
            seq_q=sq, seq_k=sk, causal=causal, num_k_blocks=nk,
        ),
        grid=(b * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b_, qi, ki: (b_, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, qi, ki: (b_, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, qi, ki: (b_, ki, 0)),
            pl.BlockSpec((1, bq, d), lambda b_, qi, ki: (b_, qi, 0)),
            pl.BlockSpec((1, 8, bq), lambda b_, qi, ki: (b_, 0, qi)),
            pl.BlockSpec((1, 8, bq), lambda b_, qi, ki: (b_, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b_, qi, ki: (b_, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        interpret=interpret,
    )(qf, kf, vf, dof, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel,
            sm_scale=sm_scale, block_q=bq, block_k=bk,
            seq_q=sq, seq_k=sk, causal=causal, num_q_blocks=nq,
        ),
        grid=(b * h, nk, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b_, ki, qi: (b_, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, ki, qi: (b_, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, ki, qi: (b_, ki, 0)),
            pl.BlockSpec((1, bq, d), lambda b_, ki, qi: (b_, qi, 0)),
            pl.BlockSpec((1, 8, bq), lambda b_, ki, qi: (b_, 0, qi)),
            pl.BlockSpec((1, 8, bq), lambda b_, ki, qi: (b_, 0, qi)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda b_, ki, qi: (b_, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b_, ki, qi: (b_, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, sk_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, dof, lse, delta)

    dq = dq.reshape(b, h, sq_p, d)[:, :, :sq, :]
    dk = dk.reshape(b, h, sk_p, d)[:, :, :sk, :]
    dv = dv.reshape(b, h, sk_p, d)[:, :, :sk, :]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, causal, sm_scale, block_q, block_k, interpret):
    o, _ = _fwd_impl(q, k, v, causal, sm_scale, block_q, block_k, interpret)
    return o


def _flash_fwd(q, k, v, causal, sm_scale, block_q, block_k, interpret):
    o, lse = _fwd_impl(q, k, v, causal, sm_scale, block_q, block_k, interpret)
    return o, (q, k, v, o, lse)


def _flash_bwd(causal, sm_scale, block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    return _bwd_impl(q, k, v, o, lse, do, causal, sm_scale, block_q, block_k, interpret)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention over `(batch, length, heads, head_dim)` inputs.

    Differentiable (custom VJP), supports causal masking and arbitrary
    sequence lengths. `interpret=True` runs the Pallas interpreter (CPU tests).
    """
    assert q.ndim == 4, f"expected (B, L, H, D), got {q.shape}"
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    # Kernel layout is (B, H, L, D).
    qt, kt, vt = (jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v))
    o = _flash(qt, kt, vt, causal, sm_scale, block_q, block_k, interpret)
    return jnp.transpose(o, (0, 2, 1, 3))
