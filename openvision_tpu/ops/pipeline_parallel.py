"""Pipeline parallelism over the `pipe` mesh axis: GPipe + interleaved.

Beyond-reference capability (SURVEY §2.4 lists PP as absent upstream): the
encoder depth is split over P stages holding their layers' weights (stacked
per-layer pytrees sharded over `pipe` on dim 0); M microbatches flow through
the stages with `jax.lax.ppermute` rotating activations over ICI each tick.
Fully differentiable — autodiff flows through the scan and the ppermutes, so
the backward pass is automatically the reverse pipeline.

Two schedules, selected by `interleave` (= v, the number of layer chunks per
stage — Megatron-LM's "virtual pipeline stages"):

- v=1 (default): classic GPipe fill/drain. M + P - 1 ticks of (depth/P)-layer
  stage work; bubble fraction (P-1)/(M+P-1).
- v>1: interleaved/circular schedule. Each stage holds v NON-CONTIGUOUS
  chunks of depth/(P*v) layers (chunk j on stage p covers global layers
  [(j*P+p)*c, (j*P+p+1)*c), c = depth/(P*v)); every microbatch circulates
  the ring v times, visiting chunk 0 of every stage, then chunk 1, etc. —
  the same global layer ORDER as the sequential loop. vM + P - 1 ticks of
  c-layer stage work; bubble fraction (P-1)/(vM+P-1). At P=4, M=8, v=2 that
  is 19/22 of the GPipe wall-clock; the limit v=depth/P approaches
  bubble-free at the cost of one ppermute per c layers.

Design notes (the "how to scale your model" recipe, done in shard_map):
- Every stage runs the SAME scan body; which chunk a stage applies at tick t
  is the STATIC function r = ((t - p) mod vP) // P of the tick and the stage
  index, so no round counter travels with the activations and control flow
  stays `jnp.where`/`dynamic_index` — compiler-friendly.
- Stage 0 injects microbatches in waves of P (ticks with t mod vP < P);
  microbatch k enters at tick (k//P)*vP + k%P and exits stage P-1 at
  tick_in + vP - 1. The exit ticks are Python-computed, so collecting the M
  real outputs is a static gather (clamped duplicate injections in a
  partial last wave are simply never gathered).
- Stage-local chunk layers run under `lax.scan` over the stacked params, so
  the program size is constant in depth.

`stack_layer_params` converts a standard `{"encoderblock_i": tree}` dict
(our checkpoint layout, matching the reference's) into the stacked form.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

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
    interleave: int = 1,
):
    """Runs `depth` layers of `block_fn(layer_params, x)` as a P-stage
    pipeline over `axis_name`.

    x: (B, ...) global batch; B must divide by num_microbatches.
    stacked_params: per-layer-stacked pytree (dim 0 = depth, divisible by
    P*interleave).
    interleave: chunks per stage (v). 1 = GPipe; >1 = interleaved schedule
    (see module docstring). Identical math to the sequential loop either way.
    """
    n_stages = mesh.shape[axis_name]
    v = int(interleave)
    assert v >= 1, v
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    assert depth % (n_stages * v) == 0, (depth, n_stages, v)
    c = depth // (n_stages * v)  # layers per chunk
    b = x.shape[0]
    m = num_microbatches
    assert b % m == 0, (b, m)
    mb = b // m

    mbs = x.reshape((m, mb) + x.shape[1:])

    # (depth, ...) layer-major → (P, v, c, ...): stage p, chunk j holds
    # global layers [(j*P+p)*c, (j*P+p+1)*c)
    def _rearrange(leaf):
        out = leaf.reshape((v, n_stages, c) + leaf.shape[1:])
        return jnp.swapaxes(out, 0, 1)

    staged_params = jax.tree.map(_rearrange, stacked_params)

    vp = v * n_stages
    # microbatch k: enters stage 0 at tick in_k, exits stage P-1 vP-1 later
    in_ticks = np.array([(k // n_stages) * vp + k % n_stages for k in range(m)])
    exit_ticks = in_ticks + vp - 1
    n_ticks = int(exit_ticks[-1]) + 1

    def stage_fn(local_params, mbs):
        # local_params: (1, v, c, ...) this stage's chunks
        local_params = jax.tree.map(lambda l: l[0], local_params)
        p = jax.lax.axis_index(axis_name)

        def run_chunk(prms, xmb):
            def layer(h, prm):
                return block_fn(prm, h), None

            out, _ = jax.lax.scan(layer, xmb, prms)
            return out

        zeros_mb = jnp.zeros_like(mbs[0])

        def tick(carry, t):
            buf = carry  # activation arriving at this stage over the ring
            # stage 0 injects a fresh microbatch in waves of P ticks
            phase = jnp.mod(t, vp)
            is_inject = phase < n_stages
            inj_idx = (t // vp) * n_stages + phase
            inject = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(inj_idx, 0, m - 1), axis=0, keepdims=False)
            x_in = jnp.where((p == 0) & is_inject, inject, buf)
            # which chunk this stage applies now (static in t and p)
            r = jnp.mod(t - p, vp) // n_stages
            prms = jax.tree.map(
                lambda l: jax.lax.dynamic_index_in_dim(
                    l, r, axis=0, keepdims=False),
                local_params)
            y = run_chunk(prms, x_in)
            # rotate to the next stage
            nxt = jax.lax.ppermute(
                y, axis_name,
                perm=[(i, (i + 1) % n_stages) for i in range(n_stages)])
            # the last stage on its last chunk emits the finished output
            done = (p == n_stages - 1) & (r == v - 1)
            out = jnp.where(done, y, jnp.zeros_like(y))
            return nxt, out

        _, outs = jax.lax.scan(tick, zeros_mb, jnp.arange(n_ticks))
        # microbatch k exits at exit_ticks[k]; static gather restores order
        # and drops clamped duplicate injections from a partial last wave
        outs = outs[exit_ticks]
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
    )(staged_params, mbs)
    return out.reshape((b,) + x.shape[1:])


def pipeline_sharding(mesh: Mesh, axis_name: str = "pipe"):
    """NamedSharding for stacked layer params (dim 0 over the pipe axis)."""
    return NamedSharding(mesh, P(axis_name))
