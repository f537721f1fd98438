"""Gradient accumulation (config.grad_accum) is EXACT to the big-batch step.

Plain microbatch-averaging is the wrong objective for contrastive losses
(the softmax runs over the whole batch's negatives); the framework instead
caches embeddings and backpropagates their full-batch cotangents through a
second microbatch scan (train/step.py:_make_update_fn_accum, GradCache).
These tests pin the exactness claim: one accumulated step == one big-batch
step on the same batch, for every loss type, on 1- and multi-axis meshes.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.configs import openvision as cfg_mod
from openvision_tpu.parallel import batch_sharding, create_mesh, replicated_sharding
from openvision_tpu.train import step as step_mod


def _tiny_config(**over):
    c = cfg_mod.get_config(
        "res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
        "output_token_len=8,vocab_size=64,runlocal=True,remat=none"
    )
    c.input.batch_size = 16
    c.init_shapes = [(16, 32, 32, 3), (32, 16)]
    c.model.out_dim = (32, 32)
    c.lr = 1e-3
    c.schedule = [(".*", dict(decay_type="cosine", warmup_steps=1))]
    for k, v in over.items():
        setattr(c, k, v)
    return c


def _fake_batch(c, rng=0):
    r = np.random.RandomState(rng)
    b = c.input.batch_size
    batch = {
        "image": r.randint(0, 255, (b, 32, 32, 3)).astype(np.uint8),
        "labels1": r.randint(0, 64, (b, 16)).astype(np.int32),
        "labels2": r.randint(0, 64, (b, 16)).astype(np.int32),
        "autoreg_labels": r.randint(0, 64, (b, 8)).astype(np.int32),
        "cap_loss_mask": (r.rand(b, 8) > 0.2).astype(np.float32),
    }
    return batch


def _one_step(c, mesh, batch):
    model = step_mod.build_model(c)
    rng = jax.random.PRNGKey(0)
    state, sharding, tx, _ = step_mod.init_train_state(
        c, model, mesh, rng, total_steps=10
    )
    update = step_mod.jit_update_fn(
        step_mod.make_update_fn(c, model, tx, mesh), sharding, mesh
    )
    batch = jax.device_put(batch, batch_sharding(mesh))
    rng_loop = jax.device_put(jax.random.PRNGKey(1), replicated_sharding(mesh))
    state, meas = update(state, batch, rng_loop)
    return jax.device_get(state), jax.device_get(meas)


def _assert_tree_close(a, b, rtol, atol):
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(a),
        jax.tree_util.tree_leaves_with_path(b),
    ):
        assert ka == kb
        np.testing.assert_allclose(
            np.asarray(va, np.float32),
            np.asarray(vb, np.float32),
            rtol=rtol,
            atol=atol,
            err_msg=jax.tree_util.keystr(ka),
        )


@pytest.mark.parametrize("loss_type", ["coca", "clip", "siglip"])
def test_accum_matches_bigbatch(loss_type):
    mesh = create_mesh(data=8, fsdp=1, tensor=1)
    c1 = _tiny_config(loss_type=loss_type)
    ca = _tiny_config(loss_type=loss_type, grad_accum=4)
    if loss_type == "siglip":
        c1.model.init_logit_bias = -10.0
        ca.model.init_logit_bias = -10.0
    batch = _fake_batch(c1)

    s1, m1 = _one_step(c1, mesh, copy.deepcopy(batch))
    sa, ma = _one_step(ca, mesh, copy.deepcopy(batch))

    np.testing.assert_allclose(
        m1["training_loss"], ma["training_loss"], rtol=2e-5, atol=1e-6
    )
    if loss_type == "coca":
        np.testing.assert_allclose(
            m1["caption_loss"], ma["caption_loss"], rtol=2e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            m1["clip_loss"], ma["clip_loss"], rtol=2e-5, atol=1e-6
        )
    np.testing.assert_allclose(
        m1["l2_grads"], ma["l2_grads"], rtol=5e-4, atol=1e-6
    )
    # post-step params identical => the accumulated GRADIENT was identical
    # (Adam at step 0 is grad-scale sensitive, so this is a strict check).
    _assert_tree_close(s1["params"], sa["params"], rtol=5e-4, atol=2e-6)


@pytest.mark.slow
def test_accum_matches_bigbatch_multiaxis_mesh():
    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    c1 = _tiny_config()
    ca = _tiny_config(grad_accum=2)
    batch = _fake_batch(c1)
    s1, m1 = _one_step(c1, mesh, copy.deepcopy(batch))
    sa, ma = _one_step(ca, mesh, copy.deepcopy(batch))
    np.testing.assert_allclose(
        m1["training_loss"], ma["training_loss"], rtol=2e-5, atol=1e-6
    )
    _assert_tree_close(s1["params"], sa["params"], rtol=5e-4, atol=2e-6)


def test_accum_descends_over_steps():
    mesh = create_mesh(data=8, fsdp=1, tensor=1)
    c = _tiny_config(grad_accum=4)
    model = step_mod.build_model(c)
    state, sharding, tx, _ = step_mod.init_train_state(
        c, model, mesh, jax.random.PRNGKey(0), total_steps=10
    )
    update = step_mod.jit_update_fn(
        step_mod.make_update_fn(c, model, tx, mesh), sharding, mesh
    )
    batch = jax.device_put(_fake_batch(c), batch_sharding(mesh))
    rng = jax.device_put(jax.random.PRNGKey(1), replicated_sharding(mesh))
    seen = []
    for _ in range(3):
        state, meas = update(state, batch, rng)
        seen.append(float(meas["training_loss"]))
    assert np.isfinite(seen).all()
    assert seen[-1] < seen[0]


def test_microbatch_is_strided_and_invertible():
    x = jnp.arange(24).reshape(12, 2)
    y = step_mod._microbatch(x, 3)
    assert y.shape == (3, 4, 2)
    np.testing.assert_array_equal(np.asarray(y[1]), np.asarray(x[1::3]))
