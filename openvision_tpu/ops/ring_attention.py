"""Ring attention: sequence-parallel attention over a mesh axis.

Beyond-reference capability (SURVEY §2.4 lists it as the optional stretch —
the reference only chunks sequences WITHIN a device via BPT). Each shard holds
a sequence slice (B, L/n, H, D); key/value blocks rotate around the ring with
`jax.lax.ppermute` (XLA collective-permute over ICI) while a running online
softmax accumulates, so no device ever materializes the full sequence.

`ring_attention` is the per-shard function (call under shard_map);
`ring_attention_sharded` wraps it over a mesh axis for convenience. Fully
differentiable (autodiff through the scan + ppermute).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    sm_scale: float | None = None,
    valid: int | None = None,
) -> jax.Array:
    """Per-shard ring attention. q, k, v: (B, chunk, H, D) sequence slices.

    `valid`: global number of real tokens — keys at positions >= valid are
    masked out (supports sequence lengths that don't divide the ring size;
    the wrapper pads and slices).
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, chunk, h, d = q.shape

    qf = (q * sm_scale).astype(jnp.float32)
    q_pos = my * chunk + jnp.arange(chunk)

    def step(carry, i):
        acc, row_max, row_sum, kv = carry
        k_i, v_i = kv
        src = (my - i) % n  # which shard's block we currently hold
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, k_i.astype(jnp.float32))
        k_pos = src * chunk + jnp.arange(chunk)
        mask = None
        if causal:
            mask = q_pos[:, None] >= k_pos[None, :]
        if valid is not None:
            kmask = jnp.broadcast_to(
                (k_pos < valid)[None, :], (chunk, chunk))
            mask = kmask if mask is None else (mask & kmask)
        if mask is not None:
            s = jnp.where(mask[None, None], s, NEG_INF)
        cur_max = jnp.max(s, axis=-1, keepdims=True)
        new_max = jnp.maximum(row_max, cur_max)
        alpha = jnp.exp(row_max - new_max)
        p = jnp.exp(s - new_max)
        if mask is not None:
            p = jnp.where(mask[None, None], p, 0.0)
        acc = acc * alpha.swapaxes(1, 2) + jnp.einsum(
            "bhqk,bkhd->bqhd", p, v_i.astype(jnp.float32)
        )
        row_sum = row_sum * alpha + jnp.sum(p, axis=-1, keepdims=True)
        # rotate the kv block to the next shard (ride ICI)
        perm = [(j, (j + 1) % n) for j in range(n)]
        kv = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, perm=perm), (k_i, v_i)
        )
        return (acc, new_max, row_sum, kv), None

    init = (
        jnp.zeros((b, chunk, h, d), jnp.float32),
        jnp.full((b, h, chunk, 1), NEG_INF, jnp.float32),
        jnp.zeros((b, h, chunk, 1), jnp.float32),
        (k, v),
    )
    (acc, _, row_sum, _), _ = jax.lax.scan(step, init, jnp.arange(n))
    row_sum = jnp.where(row_sum == 0.0, 1.0, row_sum)
    return (acc / row_sum.swapaxes(1, 2)).astype(q.dtype)


def ring_attention_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    seq_axis: str = "tensor",
    batch_axes=("data", "fsdp"),
    causal: bool = False,
    sm_scale: float | None = None,
) -> jax.Array:
    """Shards the sequence dim over `seq_axis` and runs ring attention.

    Inputs are global (B, L, H, D). Lengths that don't divide the axis size
    (e.g. the 257/577-token cls+patches vision sequences) are zero-padded and
    the pad keys masked inside the kernel.
    """
    n = mesh.shape[seq_axis]
    l = q.shape[1]
    lpad = (l + n - 1) // n * n
    valid = l if lpad != l else None
    if lpad != l:
        pad = ((0, 0), (0, lpad - l), (0, 0), (0, 0))
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    batch = tuple(a for a in batch_axes if a in mesh.axis_names)
    spec = P(batch if batch else None, seq_axis, None, None)
    fn = functools.partial(
        ring_attention, axis_name=seq_axis, causal=causal, sm_scale=sm_scale,
        valid=valid,
    )
    out = shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
    return out[:, :l] if lpad != l else out
