"""Ring attention wired into the towers behind config.sharding.mesh.seq
(VERDICT r1 #9): attn_impl="ring" + seq>1 sequence-shards attention over the
`seq` mesh axis via ppermute, including non-divisible token counts (cls+
patches), and falls back to xla attention when no seq sharding is active."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.models import vit as vit_mod
from openvision_tpu.models import text as text_mod
from openvision_tpu.parallel import batch_sharding, create_mesh, unbox, use_mesh


def _vit(impl):
    return vit_mod.Model(
        num_classes=32, variant="mu/16", posemb="sincos2d", pool_type="gap",
        output_tokens=False, emb_head_bias=False, head_zeroinit=False,
        attn_impl=impl,
    )


def test_ring_vit_matches_xla_nondivisible_seq():
    # 48px/16 -> 9 patches + cls = 10 tokens on a 4-way ring (pad to 12)
    m_x, m_r = _vit("xla"), _vit("ring")
    img = jax.random.normal(jax.random.PRNGKey(1), (8, 48, 48, 3))
    params = unbox(m_x.init(jax.random.PRNGKey(0), img[:1])["params"])
    ref = m_x.apply({"params": params}, img)

    mesh = create_mesh(data=2, fsdp=1, tensor=1, seq=4)
    imgs = jax.device_put(img, batch_sharding(mesh))
    with use_mesh(mesh):
        out = jax.jit(lambda p, x: m_r.apply({"params": p}, x))(params, imgs)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5, rtol=1e-5)


def test_ring_vit_grads_match_xla():
    m_x, m_r = _vit("xla"), _vit("ring")
    img = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 3))
    params = unbox(m_x.init(jax.random.PRNGKey(0), img[:1])["params"])

    def loss(model):
        return lambda p, x: jnp.sum(model.apply({"params": p}, x) ** 2)

    gref = jax.grad(loss(m_x))(params, img)
    mesh = create_mesh(data=2, fsdp=1, tensor=1, seq=4)
    imgs = jax.device_put(img, batch_sharding(mesh))
    with use_mesh(mesh):
        gr = jax.jit(jax.grad(loss(m_r)))(params, imgs)
    from jax.flatten_util import ravel_pytree

    a, _ = ravel_pytree(jax.device_get(gref))
    b, _ = ravel_pytree(jax.device_get(gr))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-3)


def test_ring_causal_text_matches_xla():
    kw = dict(num_classes=32, variant="Ti", pool_type="last",
              vocab_size=128, causal=True, output_tokens=False)
    m_x = text_mod.Model(attn_impl="xla", **kw)
    m_r = text_mod.Model(attn_impl="ring", **kw)
    toks = jax.random.randint(jax.random.PRNGKey(2), (8, 12), 0, 128)
    params = unbox(m_x.init(jax.random.PRNGKey(0), toks[:1])["params"])
    ref = m_x.apply({"params": params}, toks)
    mesh = create_mesh(data=2, fsdp=1, tensor=1, seq=4)
    tok_s = jax.device_put(toks, batch_sharding(mesh))
    with use_mesh(mesh):
        out = jax.jit(lambda p, x: m_r.apply({"params": p}, x))(params, tok_s)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5, rtol=1e-5)


def test_ring_without_seq_axis_falls_back():
    m_r = _vit("ring")
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3))
    params = unbox(m_r.init(jax.random.PRNGKey(0), img[:1])["params"])
    out = m_r.apply({"params": params}, img)  # no active mesh at all
    ref = _vit("xla").apply({"params": params}, img)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_train_step_on_seq_sharded_mesh():
    from openvision_tpu.configs import openvision as cfg_mod
    from openvision_tpu.parallel import replicated_sharding
    from openvision_tpu.train import step as step_mod

    c = cfg_mod.get_config(
        "res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
        "output_token_len=8,vocab_size=64,runlocal=True,remat=none,"
        "attn_impl=ring,seq_parallelism=2"
    )
    c.input.batch_size = 16
    c.init_shapes = [(16, 32, 32, 3), (32, 16)]
    c.model.out_dim = (32, 32)
    c.schedule = [(".*", dict(decay_type="cosine", warmup_steps=1))]
    mesh = create_mesh(data=2, fsdp=2, tensor=1, seq=2)
    model = step_mod.build_model(c)
    state, sharding, tx, _ = step_mod.init_train_state(
        c, model, mesh, jax.random.PRNGKey(0), total_steps=10)
    update = step_mod.jit_update_fn(
        step_mod.make_update_fn(c, model, tx, mesh), sharding, mesh)
    rs = np.random.RandomState(0)
    batch = jax.device_put(
        {
            "image": rs.randint(0, 255, (16, 32, 32, 3)).astype(np.uint8),
            "labels1": rs.randint(0, 64, (16, 16)).astype(np.int32),
            "labels2": rs.randint(0, 64, (16, 16)).astype(np.int32),
            "autoreg_labels": rs.randint(0, 64, (16, 8)).astype(np.int32),
            "cap_loss_mask": np.ones((16, 8), np.float32),
        },
        batch_sharding(mesh),
    )
    rng = jax.device_put(jax.random.PRNGKey(1), replicated_sharding(mesh))
    state, meas = update(state, batch, rng)
    assert np.isfinite(float(meas["training_loss"]))
