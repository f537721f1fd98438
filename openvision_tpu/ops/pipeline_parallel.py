"""GPipe-style pipeline parallelism over the `pipe` mesh axis.

Beyond-reference capability (SURVEY §2.4 lists PP as absent upstream): the
encoder depth is split into P contiguous stages, each holding its layers'
weights (stacked per-layer pytrees sharded over `pipe` on dim 0); M
microbatches flow through the stages with `jax.lax.ppermute` rotating
activations over ICI each tick. The schedule is the classic GPipe fill/
drain: M + P - 1 ticks, bubble fraction (P-1)/(M+P-1). Fully
differentiable — autodiff flows through the scan and the ppermutes, so the
backward pass is automatically the reverse pipeline.

Design notes (the "how to scale your model" recipe, done in shard_map):
- Every stage runs the SAME scan body; stage 0 injects microbatch t from
  the (replicated-over-pipe) input, the last stage emits its output into a
  time-indexed buffer, and `jnp.where` on `axis_index` keeps control flow
  static for XLA.
- Stage-local layers run under `lax.scan` over the stacked params, so the
  program size is constant in depth.

`stack_layer_params` converts a standard `{"encoderblock_i": tree}` dict
(our checkpoint layout, matching the reference's) into the stacked form.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_layer_params(params: dict, depth: int, prefix: str = "encoderblock_"):
    """{"<prefix>i": tree} → one tree with a stacked leading layer dim."""
    trees = [params[f"{prefix}{i}"] for i in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def pipeline_apply(
    block_fn: Callable,
    stacked_params,
    x: jax.Array,
    mesh: Mesh,
    *,
    num_microbatches: int,
    axis_name: str = "pipe",
):
    """Runs `depth` layers of `block_fn(layer_params, x)` as a P-stage
    pipeline over `axis_name`.

    x: (B, ...) global batch; B must divide by num_microbatches.
    stacked_params: per-layer-stacked pytree (dim 0 = depth, divisible by P).
    Returns block_fn applied depth times, identical math to the sequential
    loop (same layer order).
    """
    n_stages = mesh.shape[axis_name]
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    assert depth % n_stages == 0, (depth, n_stages)
    b = x.shape[0]
    m = num_microbatches
    assert b % m == 0, (b, m)
    mb = b // m

    mbs = x.reshape((m, mb) + x.shape[1:])

    def stage_fn(local_params, mbs):
        # local_params: (depth/P, ...) this stage's layers
        p = jax.lax.axis_index(axis_name)

        def run_local(xmb):
            def layer(h, prm):
                return block_fn(prm, h), None

            out, _ = jax.lax.scan(layer, xmb, local_params)
            return out

        zeros_mb = jnp.zeros_like(mbs[0])

        def tick(carry, t):
            buf = carry  # activation arriving at this stage
            # stage 0 injects microbatch t (clamped during drain)
            inject = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, m - 1), axis=0, keepdims=False)
            x_in = jnp.where(p == 0, inject, buf)
            y = run_local(x_in)
            # rotate to the next stage (last stage's y is the output)
            nxt = jax.lax.ppermute(
                y, axis_name,
                perm=[(i, (i + 1) % n_stages) for i in range(n_stages)])
            out = jnp.where(p == n_stages - 1, y, jnp.zeros_like(y))
            return nxt, out

        _, outs = jax.lax.scan(tick, zeros_mb, jnp.arange(m + n_stages - 1))
        # microbatch t exits the last stage at tick t + P - 1
        outs = outs[n_stages - 1:]
        # only the last stage holds real outputs; psum broadcasts them
        return jax.lax.psum(outs, axis_name) if n_stages > 1 else outs

    # microbatches also shard over the data axes (composes PP with DP)
    batch_axes = tuple(
        a for a in ("data", "fsdp") if a in mesh.axis_names
    )
    mb_spec = P(None, batch_axes) if batch_axes else P()
    out = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(axis_name), mb_spec),
        out_specs=mb_spec,
        check_vma=False,
    )(stacked_params, mbs)
    return out.reshape((b,) + x.shape[1:])


def pipeline_sharding(mesh: Mesh, axis_name: str = "pipe"):
    """NamedSharding for stacked layer params (dim 0 over the pipe axis)."""
    return NamedSharding(mesh, P(axis_name))
