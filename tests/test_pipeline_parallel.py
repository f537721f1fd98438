"""GPipe pipeline parallelism over the `pipe` mesh axis (beyond-reference;
ops/pipeline_parallel.py): values and grads must equal the sequential layer
loop, composing with data parallelism on the same mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from openvision_tpu.ops.pipeline_parallel import (
    pipeline_apply,
    stack_layer_params,
)
from openvision_tpu.parallel import create_mesh


DEPTH, D = 8, 16


def _block_fn(prm, x):
    h = jnp.tanh(x @ prm["w"] + prm["b"])
    return x + h @ prm["w2"]


def _params(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), DEPTH * 3).reshape(DEPTH, 3, -1)
    return {
        f"encoderblock_{i}": {
            "w": jax.random.normal(ks[i, 0], (D, D)) * 0.3,
            "b": jax.random.normal(ks[i, 1], (D,)) * 0.1,
            "w2": jax.random.normal(ks[i, 2], (D, D)) * 0.3,
        }
        for i in range(DEPTH)
    }


def _sequential(params, x):
    for i in range(DEPTH):
        x = _block_fn(params[f"encoderblock_{i}"], x)
    return x


@pytest.mark.parametrize("mesh_kw,m,v,b", [
    (dict(data=1, pipe=8), 4, 1, 16),   # pure pipeline, 8 stages
    (dict(data=2, pipe=4), 8, 1, 16),   # PP x DP
    (dict(data=4, fsdp=2, pipe=1), 2, 1, 16),  # degenerate single stage
    (dict(data=2, pipe=4), 4, 2, 16),   # interleaved, 2 chunks/stage
    (dict(data=4, pipe=2), 8, 4, 32),   # interleaved, 4 chunks/stage, + DP
    (dict(data=2, pipe=4), 6, 2, 24),   # M not a multiple of P (partial wave)
    (dict(data=4, pipe=2), 3, 4, 24),   # fully circular (c=1), partial wave
])
def test_pipeline_matches_sequential(mesh_kw, m, v, b):
    params = _params()
    x = jax.random.normal(jax.random.PRNGKey(9), (b, 6, D))
    ref = _sequential(params, x)

    mesh = create_mesh(**mesh_kw)
    stacked = stack_layer_params(params, DEPTH)
    out = jax.jit(
        lambda s, x: pipeline_apply(
            _block_fn, s, x, mesh, num_microbatches=m, interleave=v)
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("v", [1, 2])
def test_pipeline_grads_match_sequential(v):
    params = _params()
    x = jax.random.normal(jax.random.PRNGKey(9), (8, 4, D))
    mesh = create_mesh(data=2, pipe=4)
    stacked = stack_layer_params(params, DEPTH)

    def loss_seq(params, x):
        return jnp.sum(_sequential(params, x) ** 2)

    def loss_pp(stacked, x):
        out = pipeline_apply(_block_fn, stacked, x, mesh,
                             num_microbatches=4, interleave=v)
        return jnp.sum(out ** 2)

    g_seq = jax.grad(loss_seq)(params, x)
    g_seq_stacked = stack_layer_params(g_seq, DEPTH)
    g_pp = jax.jit(jax.grad(loss_pp))(stacked, x)

    a, _ = ravel_pytree(jax.device_get(g_seq_stacked))
    b, _ = ravel_pytree(jax.device_get(g_pp))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-4)

    gx_seq = jax.grad(lambda x: loss_seq(params, x))(x)
    gx_pp = jax.jit(jax.grad(lambda x: loss_pp(stacked, x)))(x)
    np.testing.assert_allclose(np.asarray(gx_seq), np.asarray(gx_pp),
                               atol=1e-4, rtol=1e-4)


def test_pipeline_vit_encoder_blocks():
    """A real ViT EncoderBlock runs under the pipeline: same outputs as the
    standard Encoder stack (inference mode, shared config)."""
    from openvision_tpu.models.encoder import Encoder
    from openvision_tpu.parallel import unbox

    depth, width, heads = 4, 16, 2
    enc = Encoder(num_heads=heads, depth=depth, mlp_dim=width * 4)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 5, width))
    params = unbox(enc.init(jax.random.PRNGKey(1), x)["params"])
    ref = enc.apply({"params": params}, x)

    from openvision_tpu.models.encoder import EncoderBlock

    block = EncoderBlock(num_heads=heads, depth=depth, mlp_dim=width * 4)

    def block_fn(prm, h):
        return block.apply({"params": prm}, h)

    mesh = create_mesh(data=2, pipe=4)
    stacked = stack_layer_params(params, depth)
    out = jax.jit(
        lambda s, x: pipeline_apply(block_fn, s, x, mesh, num_microbatches=4)
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5, rtol=1e-5)
