import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.ops import xla_attention
from openvision_tpu.ops.ring_attention import ring_attention_sharded
from openvision_tpu.parallel import create_mesh


def _qkv(b=2, l=32, h=2, d=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, l, h, d)) for k in ks)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_full(causal):
    q, k, v = _qkv()
    ref = xla_attention(q, k, v, causal=causal)
    mesh = create_mesh(data=2, fsdp=1, tensor=4)
    out = jax.jit(
        lambda q, k, v: ring_attention_sharded(q, k, v, mesh, causal=causal)
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_ring_attention_grads_match_full():
    q, k, v = _qkv(l=16)
    mesh = create_mesh(data=1, fsdp=1, tensor=8)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention_sharded(q, k, v, mesh) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    g1 = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
