import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from openvision_tpu import losses, optim
from openvision_tpu.parallel import batch_sharding, create_mesh


def _embeds(b=16, d=32, seed=0):
    r = jax.random.PRNGKey(seed)
    ki, k1, k2 = jax.random.split(r, 3)
    norm = lambda x: x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    return (
        norm(jax.random.normal(ki, (b, d))),
        norm(jax.random.normal(k1, (b, d))),
        norm(jax.random.normal(k2, (b, d))),
    )


def test_local_loss_matches_global_single_view():
    mesh = create_mesh(data=-1, fsdp=2, tensor=1)
    zimg, ztxt, _ = _embeds()
    t = jnp.float32(100.0)
    sh = batch_sharding(mesh)
    zimg_g, ztxt_g = jax.device_put(zimg, sh), jax.device_put(ztxt, sh)

    l_global, _ = losses.bidirectional_contrastive_loss(zimg, ztxt, t, mode="global")
    l_local, _ = jax.jit(
        lambda a, b: losses.bidirectional_contrastive_loss(
            a, b, t, mode="local", mesh=mesh
        )
    )(zimg_g, ztxt_g)
    np.testing.assert_allclose(float(l_local), float(l_global), rtol=1e-5)


def test_local_loss_matches_global_two_views():
    mesh = create_mesh(data=-1, fsdp=1, tensor=1)
    zimg, z1, z2 = _embeds()
    t = jnp.float32(1 / 0.07)
    sh = batch_sharding(mesh)

    l_g1, _ = losses.bidirectional_contrastive_loss(zimg, z1, t, mode="global")
    l_g2, _ = losses.bidirectional_contrastive_loss(zimg, z2, t, mode="global")
    expected = 0.5 * (float(l_g1) + float(l_g2))

    l_local, _ = jax.jit(
        lambda a, b, c: losses.bidirectional_contrastive_loss(
            a, [b, c], t, mode="local", mesh=mesh
        )
    )(*jax.device_put((zimg, z1, z2), sh))
    np.testing.assert_allclose(float(l_local), expected, rtol=1e-5)


def test_efficient_matches_global():
    zimg, ztxt, _ = _embeds()
    t = jnp.float32(10.0)
    l_g, _ = losses.bidirectional_contrastive_loss(zimg, ztxt, t, mode="global")
    l_e, _ = losses.bidirectional_contrastive_loss(zimg, ztxt, t, mode="efficient")
    np.testing.assert_allclose(float(l_e), float(l_g), rtol=1e-5)


def test_softmax_xent_mask():
    logits = jnp.zeros((2, 4, 10))
    labels = jnp.zeros((2, 4), jnp.int32)
    mask = jnp.array([[1, 1, 0, 0], [1, 0, 0, 0]], jnp.float32)
    l = losses.softmax_xent(logits=logits, labels=labels, mask=mask)
    np.testing.assert_allclose(float(l), np.log(10), rtol=1e-5)


def _toy_params():
    return {
        "img": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "txt": {"kernel": jnp.ones((4, 4))},
        "t": jnp.ones(()),
    }


class Cfg(dict):
    def get(self, k, d=None):
        return super().get(k, d)


def _cfg(**over):
    cfg = Cfg(
        schedule=[(".*", dict(decay_type="cosine", warmup_steps=2))],
        lr=0.1,
        wd=0.01,
        optax_name="scale_by_adam",
        optax=dict(mu_dtype="bfloat16", b1=0.9, b2=0.95),
    )
    cfg.update(over)
    return cfg


def test_optimizer_builds_and_steps():
    params = _toy_params()
    tx, scheds = optim.make(_cfg(), params, sched_kw=dict(total_steps=10))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert optim.get_count(state) == 1
    # updates should be finite and non-zero
    assert all(np.isfinite(np.asarray(u)).all() for u in jax.tree.leaves(new))
    # adam mu stored in bfloat16
    mus = optim.find_states(state, optax.ScaleByAdamState)
    assert jax.tree.leaves(mus[0].mu)[0].dtype == jnp.bfloat16


def test_optimizer_freeze_by_none():
    params = _toy_params()
    cfg = _cfg(
        schedule=[
            ("img/.*", None),
            (".*", dict(decay_type="linear")),
        ]
    )
    tx, _ = optim.make(cfg, params, sched_kw=dict(total_steps=10))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["img"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["txt"]["kernel"]).sum()) > 0.0
    # replace_frozen zeroes the same group
    rep = optim.replace_frozen(cfg["schedule"], grads, 0.0)
    assert rep["img"]["kernel"] == 0.0


def test_wd_applies_to_kernels_only():
    params = _toy_params()
    cfg = _cfg(schedule=[(".*", dict(decay_type="linear"))], lr=1.0, wd=0.5)
    tx, _ = optim.make(cfg, params, sched_kw=dict(total_steps=10))
    state = tx.init(params)
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, state, params)
    # zero grad + wd → kernels decay, biases don't
    assert float(jnp.abs(updates["img"]["kernel"]).sum()) > 0
    assert float(jnp.abs(updates["img"]["bias"]).sum()) == 0


def test_schedule_shapes():
    fn = optim.create_learning_rate_schedule(
        total_steps=100, base=1.0, decay_type="cosine",
        warmup_steps=10, min_lr=0.1, max_lr=1.0,
    )
    assert float(fn(0)) == 0.0
    np.testing.assert_allclose(float(fn(10)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(fn(100)), 0.1, rtol=1e-4)


def test_steps_conversion():
    cfg = Cfg(warmup_epochs=2)
    assert optim.steps("warmup", cfg, data_size=1000, batch_size=10) == 200
    assert optim.steps("x", Cfg(), default=7) == 7
    with pytest.raises(ValueError):
        optim.steps("x", Cfg())


def test_siglip_local_matches_global():
    from openvision_tpu.parallel import batch_sharding, create_mesh

    mesh = create_mesh(data=-1, fsdp=2, tensor=1)
    zimg, ztxt, _ = _embeds()
    t = jnp.float32(10.0)
    b = jnp.float32(-10.0)
    l_g, _ = losses.siglip_loss(zimg, ztxt, t, b, mode="global")
    sh = batch_sharding(mesh)
    l_l, _ = jax.jit(
        lambda a, c: losses.siglip_loss(a, c, t, b, mode="local", mesh=mesh)
    )(*jax.device_put((zimg, ztxt), sh))
    np.testing.assert_allclose(float(l_l), float(l_g), rtol=1e-5)


def test_siglip_prefers_matched_pairs():
    # identical embeddings → diagonal matched; loss lower than shuffled texts
    z = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    t, b = jnp.float32(10.0), jnp.float32(-10.0)
    l_match, _ = losses.siglip_loss(z, z, t, b, mode="global")
    l_shuf, _ = losses.siglip_loss(z, jnp.roll(z, 1, axis=0), t, b, mode="global")
    assert float(l_match) < float(l_shuf)


def test_linear_softmax_xent_matches_unfused():
    """Head-fused chunked caption xent == Dense(f32) + softmax_xent, for
    values AND grads (wrt prelogits and head kernel), incl. a ragged
    sequence length that needs padding."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    b, l, d, v = 4, 10, 16, 64  # l=10 with chunk=4 exercises padding
    h = jnp.asarray(rng.randn(b, l, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(d, v) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.randint(0, v, (b, l)), jnp.int32)
    mask = jnp.asarray((rng.rand(b, l) > 0.3), jnp.float32)

    def unfused(h, k):
        logits = jnp.einsum(
            "bld,dv->blv", h.astype(jnp.float32), k.astype(jnp.float32))
        return losses.softmax_xent(
            logits=logits, labels=labels, mask=mask, reduction=True)

    def fused(h, k):
        return losses.linear_softmax_xent(
            prelogits=h, kernel=k, labels=labels, mask=mask, chunk=4)

    lu, (ghu, gku) = jax.value_and_grad(unfused, argnums=(0, 1))(h, k)
    lf, (ghf, gkf) = jax.value_and_grad(fused, argnums=(0, 1))(h, k)
    np.testing.assert_allclose(np.asarray(lu), np.asarray(lf), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ghu, np.float32), np.asarray(ghf, np.float32),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gku), np.asarray(gkf),
                               rtol=1e-5, atol=1e-6)
