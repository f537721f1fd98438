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


def _prefix_mask(b, l, prefix):
    from openvision_tpu.models.encoder import prefix_lm_mask

    return prefix_lm_mask(b, l, prefix)


@pytest.mark.parametrize("l,prefix,bq,bk", [
    (200, 65, 256, 256),    # single-k fast path (decoder-at-465 analogue)
    (300, 129, 128, 128),   # multi-k online-softmax path, prefix mid-block
    (300, 256, 128, 128),   # prefix spans exactly two k blocks
    (150, 1, 128, 128),     # degenerate prefix (== causal with col 0 free)
])
def test_flash_prefix_lm_matches_xla(l, prefix, bq, bk):
    """Prefix-LM flash (causal=True, prefix_len>0) must equal xla attention
    under the explicit prefix_lm_mask, forward and gradients."""
    q, k, v = _make_qkv(b=2, l=l, h=2, d=64, seed=3)
    mask = _prefix_mask(2, l, prefix)

    ref = xla_attention(q, k, v, mask=mask)
    out = flash_attention(q, k, v, causal=True, prefix_len=prefix,
                          block_q=bq, block_k=bk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, mask=mask) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(
            q, k, v, causal=True, prefix_len=prefix,
            block_q=bq, block_k=bk, interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("impl", ["flash", "fused"])
def test_decoder_native_prefix_matches_xla(impl):
    """The caption decoder's concat-fusion stack must compute identically
    with attn_impl='flash'/'fused' (kernel-native prefix-LM mask) and 'xla'
    (explicit mask array) — outputs and parameter grads."""
    from openvision_tpu.models import decoder as dec_mod
    from openvision_tpu.parallel import unbox

    kw = dict(
        num_classes=64, variant="Ti", fusion_style="concat", causal=True,
        num_learnable_tokens=8, remat_policy="none", return_prelogits=True)
    m_x = dec_mod.Model(attn_impl="xla", **kw)
    m_f = dec_mod.Model(attn_impl=impl, **kw)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    img = jax.random.normal(ks[0], (2, 10, 32))
    txt = jax.random.normal(ks[1], (2, 6, 24))
    params = unbox(m_x.init(ks[2], img, txt, train=True)["params"])

    def loss(m, p):
        _, aux = m.apply({"params": p}, img, txt, train=True)
        return jnp.sum(jnp.sin(aux["prelogits"]))

    lx, gx = jax.value_and_grad(lambda p: loss(m_x, p))(params)
    lf, gf = jax.value_and_grad(lambda p: loss(m_f, p))(params)
    np.testing.assert_allclose(float(lx), float(lf), atol=1e-5, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
        gx, gf)
