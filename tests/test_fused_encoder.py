"""Transposed-stream fused encoder (attn_impl="fused_t") parity tests.

The fused_t path runs the whole ViT encoder with patch tokens transposed to
(B, D, Ppad) through Pallas kernels (interpret mode on CPU) while the cls
token rides XLA row ops. It must be a drop-in for the xla path: same param
tree, same outputs, same grads. Reference block semantics:
/root/reference/src/models/vit.py:245-335 (pre-LN MHSA + MLP).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from openvision_tpu.models import vit as vit_mod
from openvision_tpu.ops.fused_encoder import (
    from_transposed_stream,
    fused_encoder_tblock,
    to_transposed_stream,
    _tblock_reference,
)
from openvision_tpu.parallel import batch_sharding, create_mesh, unbox, use_mesh


def _build(impl, **kw):
    cfg = dict(
        num_classes=32, variant="mu/16", posemb="sincos2d", pool_type="gap",
        output_tokens=False, emb_head_bias=False, head_zeroinit=False,
        fast_gelu=True, attn_impl=impl,
    )
    cfg.update(kw)
    return vit_mod.Model(**cfg)


def _params_and_image(model, res=48, batch=2):
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, res, res, 3))
    params = unbox(model.init(jax.random.PRNGKey(0), img[:1])["params"])
    return params, img


def test_tblock_kernel_matches_reference():
    d, heads, p = 16, 2, 9  # padded to 128, exercises valid-key masking
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    x = jax.random.normal(ks[0], (2, 1 + p, d))
    wqkv = jax.random.normal(ks[1], (d, 3 * d)) * 0.2
    bqkv = jax.random.normal(ks[2], (3 * d,)) * 0.05
    wo = jax.random.normal(ks[3], (d, d)) * 0.2
    bo = jax.random.normal(ks[4], (d,)) * 0.05
    w1 = jax.random.normal(ks[5], (d, 4 * d)) * 0.2
    b1 = jax.random.normal(ks[6], (4 * d,)) * 0.05
    w2 = jax.random.normal(ks[7], (4 * d, d)) * 0.2
    b2 = jax.random.normal(ks[8], (d,)) * 0.05
    ln1s, ln1b = 1 + 0.1 * jax.random.normal(ks[9], (d,)), jnp.zeros((d,))
    ln2s, ln2b = 1 + 0.1 * jax.random.normal(ks[10], (d,)), jnp.zeros((d,))

    xT, cls, valid = to_transposed_stream(x)
    args = (wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b)
    oT, ocls = fused_encoder_tblock(
        xT, cls, *args, num_heads=heads, valid=valid, interpret=True)
    rT, rcls = _tblock_reference(
        xT, cls, *args, num_heads=heads, valid=valid, eps=1e-6)
    np.testing.assert_allclose(
        np.asarray(from_transposed_stream(oT, ocls, valid)),
        np.asarray(from_transposed_stream(rT, rcls, valid)),
        atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("batch,nomax", [(2, False), (3, False), (2, True)])
def test_tblock_pallas_backward_matches_reference(batch, nomax):
    """Every input's grad from the fused Pallas backward kernels must match
    the jnp reference VJP — incl. padded-key masking (9 valid of 128), the
    2-images-per-step path (even batch), and nomax softmax."""
    d, heads, p = 16, 2, 9
    ks = jax.random.split(jax.random.PRNGKey(2), 12)
    x = jax.random.normal(ks[0], (batch, 1 + p, d))
    args = (
        jax.random.normal(ks[1], (d, 3 * d)) * 0.2,   # wqkv
        jax.random.normal(ks[2], (3 * d,)) * 0.05,    # bqkv
        jax.random.normal(ks[3], (d, d)) * 0.2,       # wo
        jax.random.normal(ks[4], (d,)) * 0.05,        # bo
        1 + 0.1 * jax.random.normal(ks[9], (d,)),     # ln1s
        0.05 * jax.random.normal(ks[10], (d,)),       # ln1b
        jax.random.normal(ks[5], (d, 4 * d)) * 0.2,   # w1
        jax.random.normal(ks[6], (4 * d,)) * 0.05,    # b1
        jax.random.normal(ks[7], (4 * d, d)) * 0.2,   # w2
        jax.random.normal(ks[8], (d,)) * 0.05,        # b2
        1 + 0.1 * jax.random.normal(ks[11], (d,)),    # ln2s
        jnp.zeros((d,)),                              # ln2b
    )
    xT, cls, valid = to_transposed_stream(x)

    def loss_fused(xT, cls, *a):
        oT, ocls = fused_encoder_tblock(
            xT, cls, *a, num_heads=heads, valid=valid, nomax=nomax,
            interpret=True)
        out = from_transposed_stream(oT, ocls, valid)
        return jnp.sum(jnp.sin(out))

    def loss_ref(xT, cls, *a):
        rT, rcls = _tblock_reference(
            xT, cls, *a, num_heads=heads, valid=valid, eps=1e-6)
        out = from_transposed_stream(rT, rcls, valid)
        return jnp.sum(jnp.sin(out))

    gf = jax.grad(loss_fused, argnums=tuple(range(2 + len(args))))(
        xT, cls, *args)
    gr = jax.grad(loss_ref, argnums=tuple(range(2 + len(args))))(
        xT, cls, *args)
    names = ["xT", "cls", "wqkv", "bqkv", "wo", "bo", "ln1s", "ln1b",
             "w1", "b1", "w2", "b2", "ln2s", "ln2b"]
    for name, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"grad mismatch for {name}")


@pytest.mark.parametrize("res", [48, 64])  # 9 patches (padded) / 16 patches
def test_vit_fused_t_matches_xla(res):
    m_x, m_f = _build("xla"), _build("fused_t")
    params, img = _params_and_image(m_x, res=res)
    ox = m_x.apply({"params": params}, img)
    of = m_f.apply({"params": params}, img)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(of), atol=1e-4, rtol=1e-4)


def test_vit_fused_t_nomax_matches_xla():
    m_x = _build("xla")
    m_f = _build("fused_t", nomax_softmax=True)
    params, img = _params_and_image(m_x)
    ox = m_x.apply({"params": params}, img)
    of = m_f.apply({"params": params}, img)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(of), atol=1e-4, rtol=1e-4)


def test_vit_fused_t_grads_match_xla():
    m_x, m_f = _build("xla"), _build("fused_t")
    params, img = _params_and_image(m_x)

    def loss(model):
        return lambda p: jnp.sum(model.apply({"params": p}, img) ** 2)

    gx, _ = ravel_pytree(jax.grad(loss(m_x))(params))
    gf, _ = ravel_pytree(jax.grad(loss(m_f))(params))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gf), atol=1e-4, rtol=1e-3)


def test_vit_fused_t_falls_back_when_ineligible():
    # LayerScale (init_values) is unsupported by the transposed kernel; the
    # Encoder must silently fall back to the natural-layout fused path and
    # still match xla.
    m_x = _build("xla", init_values=1e-4)
    m_f = _build("fused_t", init_values=1e-4)
    params, img = _params_and_image(m_x)
    ox = m_x.apply({"params": params}, img)
    of = m_f.apply({"params": params}, img)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(of), atol=1e-4, rtol=1e-4)


def test_vit_fused_t_sharded_matches_unsharded():
    m_f = _build("fused_t")
    params, img = _params_and_image(m_f, batch=8)
    ref = m_f.apply({"params": params}, img)
    mesh = create_mesh(data=4, fsdp=2, tensor=1)
    imgs = jax.device_put(img, batch_sharding(mesh))
    with use_mesh(mesh):
        out = jax.jit(lambda p, x: m_f.apply({"params": p}, x))(params, imgs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-4, rtol=1e-4)


def test_vit_fused_t_odd_batch():
    # odd batches take the 1-image-per-grid-step path
    m_x, m_f = _build("xla"), _build("fused_t")
    params, img = _params_and_image(m_x, batch=3)
    ox = m_x.apply({"params": params}, img)
    of = m_f.apply({"params": params}, img)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(of), atol=1e-4, rtol=1e-4)


def test_tblock_so400m_style_geometry():
    """So400m/H-family geometries break two hidden assumptions a ViT kernel
    can silently make: mlp_dim = 4*width (So400m: 4304 vs 4*1152=4608) and
    head_dim a power of two (So400m: 1152/16 = 72). Exercise a scaled-down
    replica — d=24, heads=3 (head_dim 8), mlp=56 — through the fused
    forward AND backward kernels vs the jnp reference."""
    d, heads, mlp, p = 24, 3, 56, 9
    ks = jax.random.split(jax.random.PRNGKey(5), 12)
    x = jax.random.normal(ks[0], (2, 1 + p, d))
    args = (
        jax.random.normal(ks[1], (d, 3 * d)) * 0.2,   # wqkv
        jax.random.normal(ks[2], (3 * d,)) * 0.05,    # bqkv
        jax.random.normal(ks[3], (d, d)) * 0.2,       # wo
        jax.random.normal(ks[4], (d,)) * 0.05,        # bo
        1 + 0.1 * jax.random.normal(ks[9], (d,)),     # ln1s
        0.05 * jax.random.normal(ks[10], (d,)),       # ln1b
        jax.random.normal(ks[5], (d, mlp)) * 0.2,     # w1
        jax.random.normal(ks[6], (mlp,)) * 0.05,      # b1
        jax.random.normal(ks[7], (mlp, d)) * 0.2,     # w2
        jax.random.normal(ks[8], (d,)) * 0.05,        # b2
        1 + 0.1 * jax.random.normal(ks[11], (d,)),    # ln2s
        jnp.zeros((d,)),                              # ln2b
    )
    xT, cls, valid = to_transposed_stream(x)

    def loss_fused(xT, cls, *a):
        oT, ocls = fused_encoder_tblock(
            xT, cls, *a, num_heads=heads, valid=valid, interpret=True)
        return jnp.sum(jnp.sin(from_transposed_stream(oT, ocls, valid)))

    def loss_ref(xT, cls, *a):
        rT, rcls = _tblock_reference(
            xT, cls, *a, num_heads=heads, valid=valid, eps=1e-6)
        return jnp.sum(jnp.sin(from_transposed_stream(rT, rcls, valid)))

    oT, ocls = fused_encoder_tblock(
        xT, cls, *args, num_heads=heads, valid=valid, interpret=True)
    rT, rcls = _tblock_reference(
        xT, cls, *args, num_heads=heads, valid=valid, eps=1e-6)
    np.testing.assert_allclose(
        np.asarray(from_transposed_stream(oT, ocls, valid)),
        np.asarray(from_transposed_stream(rT, rcls, valid)),
        atol=1e-4, rtol=1e-4)

    gf = jax.grad(loss_fused, argnums=tuple(range(2 + len(args))))(xT, cls, *args)
    gr = jax.grad(loss_ref, argnums=tuple(range(2 + len(args))))(xT, cls, *args)
    for i, (a, b) in enumerate(zip(gf, gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=f"grad mismatch for arg {i}")


def test_mlp_t_hidden_chunking_matches_monolithic():
    """`hchunks` splits the MLP kernel's hidden dim (a perf knob measured
    neutral on v5e — PERF_NOTES round 5). fc1/GELU are bitwise unchanged by
    construction; fc2's f32 accumulation order moves, so allclose."""
    from openvision_tpu.ops.fused_encoder import _mlp_t_call

    d, mlp, lpat, b = 16, 64, 128, 4
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    xT = jax.random.normal(ks[0], (b, d, lpat))
    w1 = jax.random.normal(ks[1], (d, mlp)) * 0.2
    w2 = jax.random.normal(ks[2], (mlp, d)) * 0.2
    vecT = jnp.concatenate(
        [jnp.ones((d, 1)), jnp.zeros((d, 7))], axis=1).astype(jnp.float32)
    b1T = jnp.zeros((mlp, 1), jnp.float32)

    base = _mlp_t_call(xT, w1, w2, vecT, b1T, eps=1e-6, interpret=True,
                       hchunks=1)
    for hc in (2, 4):
        out = _mlp_t_call(xT, w1, w2, vecT, b1T, eps=1e-6, interpret=True,
                          hchunks=hc)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=1e-5, rtol=1e-5)
