"""Functional multi-head attention implementations + dispatcher.

Three interchangeable paths over `(batch, length, heads, head_dim)` tensors:

- `xla_attention`: plain einsum softmax attention — the numerics reference,
  and fastest for short sequences where materializing (L, L) is cheap.
- `blockwise_attention`: memory-efficient online-softmax attention as a
  lax.scan over query/key chunks (pure JAX; works on any backend). Capability
  parity with reference src/models/bpt.py:50 (BPT), written as a scan with a
  running (max, numerator, denominator) carry.
- `flash_attention` (ops/flash_attention.py): custom Pallas TPU kernel.

The module-level `dispatch_attention` picks a path by name so model code has
exactly one attention callsite (vs the reference's three near-duplicate MHDPA
classes — common.py:203, text_transformer.py:133, text_decoder.py:51).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    sm_scale: float | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dtype=None,
) -> jax.Array:
    """Reference einsum attention. `mask` broadcasts to (B, H, Lq, Lk); True=keep."""
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    q, k, v = (x.astype(dtype) if dtype is not None else x for x in (q, k, v))
    s = jnp.einsum("bqhd,bkhd->bhqk", q * sm_scale, k)
    if causal:
        lq, lk = s.shape[-2], s.shape[-1]
        causal_mask = jnp.tril(jnp.ones((lq, lk), dtype=bool))
        mask = causal_mask if mask is None else (mask & causal_mask)
    if mask is not None:
        s = jnp.where(mask, s, jnp.finfo(s.dtype).min)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, (1,) * (p.ndim - 2) + p.shape[-2:]
        )
        p = p * keep.astype(p.dtype) / (1.0 - dropout_rate)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def blockwise_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    q_chunk: int = 128,
    k_chunk: int = 128,
    dtype=None,
) -> jax.Array:
    """Online-softmax attention scanned over query and key chunks.

    O(L * chunk) attention memory instead of O(L^2); numerically identical to
    `xla_attention` (up to reassociation). Sequence lengths must not need to
    be chunk multiples — inputs are padded and padded keys masked out.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    b, lq, h, d = q.shape
    lk = k.shape[1]
    q_chunk = min(q_chunk, max(lq, 1))
    k_chunk = min(k_chunk, max(lk, 1))
    lq_p = -(-lq // q_chunk) * q_chunk
    lk_p = -(-lk // k_chunk) * k_chunk

    qp = jnp.pad(q, ((0, 0), (0, lq_p - lq), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, lk_p - lk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, lk_p - lk), (0, 0), (0, 0)))
    if dtype is not None:
        qp, kp, vp = (x.astype(dtype) for x in (qp, kp, vp))

    nq, nk = lq_p // q_chunk, lk_p // k_chunk
    # (n_chunks, B, chunk, H, D)
    qs = qp.reshape(b, nq, q_chunk, h, d).transpose(1, 0, 2, 3, 4) * sm_scale
    ks = kp.reshape(b, nk, k_chunk, h, d).transpose(1, 0, 2, 3, 4)
    vs = vp.reshape(b, nk, k_chunk, h, d).transpose(1, 0, 2, 3, 4)

    neg = jnp.finfo(jnp.float32).min

    def q_step(_, q_and_idx):
        qc, qi = q_and_idx

        def k_step(carry, k_and_idx):
            acc, row_max, row_sum = carry
            kc, vc, ki = k_and_idx
            s = jnp.einsum("bqhd,bkhd->bhqk", qc, kc).astype(jnp.float32)
            cols = ki * k_chunk + jax.lax.broadcasted_iota(
                jnp.int32, (q_chunk, k_chunk), 1
            )
            valid = cols < lk
            if causal:
                rows = qi * q_chunk + jax.lax.broadcasted_iota(
                    jnp.int32, (q_chunk, k_chunk), 0
                )
                valid = valid & (cols <= rows)
            s = jnp.where(valid[None, None], s, neg)
            cur_max = jnp.max(s, axis=-1, keepdims=True)
            new_max = jnp.maximum(row_max, cur_max)
            alpha = jnp.exp(row_max - new_max)
            p = jnp.exp(s - new_max)
            p = jnp.where(valid[None, None], p, 0.0)
            acc = acc * alpha.swapaxes(1, 2) + jnp.einsum(
                "bhqk,bkhd->bqhd", p.astype(vc.dtype), vc
            ).astype(jnp.float32)
            row_sum = row_sum * alpha + jnp.sum(p, axis=-1, keepdims=True)
            return (acc, new_max, row_sum), None

        init = (
            jnp.zeros((b, q_chunk, h, d), jnp.float32),
            jnp.full((b, h, q_chunk, 1), neg, jnp.float32),
            jnp.zeros((b, h, q_chunk, 1), jnp.float32),
        )
        (acc, _, row_sum), _ = jax.lax.scan(
            k_step, init, (ks, vs, jnp.arange(nk))
        )
        row_sum = jnp.where(row_sum == 0.0, 1.0, row_sum)
        out = acc / row_sum.swapaxes(1, 2)
        return None, out.astype(q.dtype)

    _, outs = jax.lax.scan(q_step, None, (qs, jnp.arange(nq)))
    out = outs.transpose(1, 0, 2, 3, 4).reshape(b, lq_p, h, d)
    return out[:, :lq]


def dispatch_attention(
    impl: str,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
    prefix_len: int = 0,
    sm_scale: float | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dtype=None,
    chunk: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Routes to an attention implementation by name.

    impl: "xla" | "scan" | "flash". Arbitrary masks are only supported by
    "xla"; "flash"/"scan" support the causal mask natively, and "flash"
    additionally the prefix-LM mask (causal=True, prefix_len>0).
    """
    if impl == "xla":
        if prefix_len > 0 and causal and mask is None:
            from openvision_tpu.models.encoder import prefix_lm_mask

            mask = prefix_lm_mask(q.shape[0], q.shape[1], prefix_len)
            causal = False
        return xla_attention(
            q, k, v, mask=mask, causal=causal, sm_scale=sm_scale,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng, dtype=dtype,
        )
    if mask is not None:
        raise NotImplementedError(
            f"attention impl {impl!r} supports only causal masks; use impl='xla'"
        )
    if prefix_len > 0 and impl != "flash":
        raise NotImplementedError(
            f"attention impl {impl!r} does not support prefix-LM masking; "
            "use impl='flash' or 'xla'"
        )
    if impl == "scan":
        return blockwise_attention(
            q, k, v, causal=causal, sm_scale=sm_scale,
            q_chunk=chunk, k_chunk=chunk, dtype=dtype,
        )
    if impl == "flash":
        from openvision_tpu.ops.flash_attention import flash_attention
        from openvision_tpu.ops.fused_attention import _shard_over_batch

        def _flash_call(q, k, v):
            return flash_attention(
                q, k, v, causal=causal, prefix_len=prefix_len,
                sm_scale=sm_scale, interpret=interpret
            )

        # GSPMD cannot partition the opaque pallas_call: under an active
        # mesh the batch dim must be shard_mapped over (data, fsdp) or the
        # sharded activations would be all-gathered onto every device.
        return _shard_over_batch(_flash_call, q, k, v, extra_batched=2)
    if impl == "ring":
        from openvision_tpu.ops.ring_attention import ring_attention_sharded
        from openvision_tpu.parallel import active_mesh

        mesh = active_mesh()
        if mesh is None or mesh.shape.get("seq", 1) <= 1:
            # no sequence sharding configured — plain attention
            return xla_attention(
                q, k, v, mask=mask, causal=causal, sm_scale=sm_scale,
                dropout_rate=dropout_rate, dropout_rng=dropout_rng,
                dtype=dtype,
            )
        return ring_attention_sharded(
            q, k, v, mesh, seq_axis="seq", causal=causal, sm_scale=sm_scale
        )
    raise ValueError(f"Unknown attention impl: {impl!r}")
