import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.configs import openvision as cfg_mod
from openvision_tpu.parallel import batch_sharding, create_mesh, replicated_sharding
from openvision_tpu.train import step as step_mod


def _tiny_config():
    c = cfg_mod.get_config(
        "res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
        "output_token_len=8,vocab_size=64,runlocal=True,remat=none"
    )
    c.input.batch_size = 16
    c.init_shapes = [(16, 32, 32, 3), (32, 16)]
    c.model.out_dim = (32, 32)
    c.lr = 1e-3
    c.schedule = [(".*", dict(decay_type="cosine", warmup_steps=1))]
    return c


def _fake_batch(c, rng=0):
    r = np.random.RandomState(rng)
    b = c.input.batch_size
    return {
        "image": r.randint(0, 255, (b, 32, 32, 3)).astype(np.uint8),
        "labels1": r.randint(0, 64, (b, 16)).astype(np.int32),
        "labels2": r.randint(0, 64, (b, 16)).astype(np.int32),
        "autoreg_labels": r.randint(0, 64, (b, 8)).astype(np.int32),
        "cap_loss_mask": np.ones((b, 8), np.float32),
    }


@pytest.mark.slow
@pytest.mark.parametrize("mesh_shape", [(8, 1, 1), (2, 2, 2)])
def test_train_step_runs_and_descends(mesh_shape):
    c = _tiny_config()
    d, f, t = mesh_shape
    mesh = create_mesh(data=d, fsdp=f, tensor=t)
    model = step_mod.build_model(c)
    rng = jax.random.PRNGKey(0)
    state, sharding, tx, _ = step_mod.init_train_state(
        c, model, mesh, rng, total_steps=10
    )
    update = step_mod.jit_update_fn(
        step_mod.make_update_fn(c, model, tx, mesh), sharding, mesh
    )
    batch = jax.device_put(_fake_batch(c), batch_sharding(mesh))
    rng_loop = jax.device_put(jax.random.PRNGKey(1), replicated_sharding(mesh))

    losses_seen = []
    for _ in range(3):
        state, meas = update(state, batch, rng_loop)
        losses_seen.append(float(meas["training_loss"]))

    assert np.isfinite(losses_seen).all()
    assert {"l2_grads", "l2_params", "l2_updates", "clip_loss", "caption_loss"} <= set(
        meas
    )
    # 3 steps on the same batch must reduce the loss
    assert losses_seen[-1] < losses_seen[0]


@pytest.mark.slow
def test_update_count_advances():
    from openvision_tpu import optim

    c = _tiny_config()
    mesh = create_mesh(data=8, fsdp=1, tensor=1)
    model = step_mod.build_model(c)
    state, sharding, tx, _ = step_mod.init_train_state(
        c, model, mesh, jax.random.PRNGKey(0), total_steps=10
    )
    update = step_mod.jit_update_fn(
        step_mod.make_update_fn(c, model, tx, mesh), sharding, mesh
    )
    batch = jax.device_put(_fake_batch(c), batch_sharding(mesh))
    rng = jax.device_put(jax.random.PRNGKey(1), replicated_sharding(mesh))
    state, _ = update(state, batch, rng)
    assert optim.get_count(state["opt"]) == 1


@pytest.mark.slow
def test_train_step_siglip_loss():
    c = _tiny_config()
    c.loss_type = "siglip"
    c.model.init_logit_bias = -10.0
    mesh = create_mesh(data=8, fsdp=1, tensor=1)
    model = step_mod.build_model(c)
    state, sharding, tx, _ = step_mod.init_train_state(
        c, model, mesh, jax.random.PRNGKey(0), total_steps=10
    )
    update = step_mod.jit_update_fn(
        step_mod.make_update_fn(c, model, tx, mesh), sharding, mesh
    )
    batch = jax.device_put(_fake_batch(c), batch_sharding(mesh))
    rng = jax.device_put(jax.random.PRNGKey(1), replicated_sharding(mesh))
    losses_seen = []
    for _ in range(3):
        state, meas = update(state, batch, rng)
        losses_seen.append(float(meas["training_loss"]))
    assert np.isfinite(losses_seen).all()
    assert losses_seen[-1] < losses_seen[0]


@pytest.mark.slow
def test_cap_xent_chunk_matches_full_logits_step():
    """One full train step with the head-fused chunked caption loss vs the
    materialized-logits path: identical loss and updated params (the param
    tree is identical too — return_prelogits must not change it)."""

    def run(chunk):
        c = _tiny_config()
        c.cap_xent_chunk = chunk
        c.model.text_decoder_config.return_prelogits = chunk > 0
        mesh = create_mesh(data=8, fsdp=1, tensor=1)
        model = step_mod.build_model(c)
        state, sharding, tx, _ = step_mod.init_train_state(
            c, model, mesh, jax.random.PRNGKey(0), total_steps=10
        )
        update = step_mod.jit_update_fn(
            step_mod.make_update_fn(c, model, tx, mesh), sharding, mesh
        )
        batch = jax.device_put(_fake_batch(c), batch_sharding(mesh))
        rng = jax.device_put(jax.random.PRNGKey(1), replicated_sharding(mesh))
        state, meas = update(state, batch, rng)
        return jax.device_get(state["params"]), float(meas["training_loss"])

    p_fused, l_fused = run(4)
    p_full, l_full = run(0)
    np.testing.assert_allclose(l_fused, l_full, rtol=1e-5)
    flat_a = jax.tree_util.tree_leaves_with_path(p_fused)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(p_full))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32),
            np.asarray(flat_b[path], np.float32),
            rtol=2e-4, atol=1e-6, err_msg=str(path))
