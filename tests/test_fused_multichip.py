"""Fused kernels under an active multi-device mesh: values AND grads match."""

import jax
import jax.numpy as jnp
import numpy as np

from openvision_tpu.parallel import batch_sharding, create_mesh, use_mesh
from openvision_tpu.ops.fused_attention import fused_mhsa_block


def _args(b=8, l=20, d=16, heads=2):
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(ks[0], (b, l, d))
    wq, wk, wv, wo = (jax.random.normal(k, (d, d)) * 0.05 for k in ks[1:5])
    ln_s = jnp.ones((d,))
    ln_b = jnp.zeros((d,))
    return x, ln_s, ln_b, wq, wk, wv, wo


def _call(x, ln_s, ln_b, wq, wk, wv, wo):
    return fused_mhsa_block(
        x, ln_s, ln_b, wq, None, wk, None, wv, None, wo, None,
        num_heads=2, interpret=True,
    )


def test_fused_block_sharded_matches_unsharded():
    x, ln_s, ln_b, wq, wk, wv, wo = _args()
    ref = _call(x, ln_s, ln_b, wq, wk, wv, wo)

    mesh = create_mesh(data=4, fsdp=2, tensor=1)
    xs = jax.device_put(x, batch_sharding(mesh))
    with use_mesh(mesh):
        out = jax.jit(_call)(xs, ln_s, ln_b, wq, wk, wv, wo)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_fused_block_sharded_grads_match():
    x, ln_s, ln_b, wq, wk, wv, wo = _args()

    def loss(x, wq, wo):
        return jnp.sum(_call(x, ln_s, ln_b, wq, wk, wv, wo) ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(x, wq, wo)

    mesh = create_mesh(data=8, fsdp=1, tensor=1)
    xs = jax.device_put(x, batch_sharding(mesh))
    with use_mesh(mesh):
        g_sh = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(xs, wq, wo)

    for a, b in zip(g_sh, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
