import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.ops import blockwise_attention, flash_attention, xla_attention


def _make_qkv(b=2, l=197, h=3, d=64, lk=None, seed=0, dtype=jnp.float32):
    rng = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(rng, 3)
    lk = lk or l
    q = jax.random.normal(kq, (b, l, h, d), dtype)
    k = jax.random.normal(kk, (b, lk, h, d), dtype)
    v = jax.random.normal(kv, (b, lk, h, d), dtype)
    return q, k, v


@pytest.mark.parametrize("l", [197, 128, 80])
@pytest.mark.parametrize("causal", [False, True])
def test_blockwise_matches_xla(l, causal):
    q, k, v = _make_qkv(l=l)
    ref = xla_attention(q, k, v, causal=causal)
    out = blockwise_attention(q, k, v, causal=causal, q_chunk=64, k_chunk=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("l,causal", [(197, False), (160, True), (257, False), (80, True)])
def test_flash_forward_matches_xla(l, causal):
    q, k, v = _make_qkv(l=l)
    ref = xla_attention(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_grads_match_xla(causal):
    q, k, v = _make_qkv(b=1, l=150, h=2, d=64)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=causal) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=causal, block_q=128, block_k=128, interpret=True) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_flash_cross_attention_shapes():
    # decoder-style cross attention: Lq != Lk
    q, k, v = _make_qkv(b=2, l=128, h=2, d=64, lk=208)
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_bf16():
    q, k, v = _make_qkv(l=197, dtype=jnp.bfloat16)
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )
