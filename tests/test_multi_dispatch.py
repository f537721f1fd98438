"""steps_per_dispatch: k scanned steps == k separate dispatches, exactly.

The multi-step program is the single-step `update_fn` under `lax.scan`, so
params/opt after k scanned steps must match k sequential jitted steps over
the same batches (same RNG: update_fn folds in the optimizer count).
Reference has no counterpart (it dispatches per step,
src/main_clip.py:399-493); this is a TPU-idiom dispatch-amortization knob.
"""

import copy

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


def _fake_batch(c, rng):
    r = np.random.RandomState(rng)
    b = c.input.batch_size
    return {
        "image": r.randint(0, 255, (b, 32, 32, 3)).astype(np.uint8),
        "labels1": r.randint(0, 64, (b, 16)).astype(np.int32),
        "labels2": r.randint(0, 64, (b, 16)).astype(np.int32),
        "autoreg_labels": r.randint(0, 64, (b, 8)).astype(np.int32),
        "cap_loss_mask": np.ones((b, 8), np.float32),
    }


@pytest.mark.parametrize("mesh_shape", [(8, 1, 1), (2, 2, 2)])
def test_multi_dispatch_matches_sequential(mesh_shape):
    c = _tiny_config()
    d, f, t = mesh_shape
    mesh = create_mesh(data=d, fsdp=f, tensor=t)
    model = step_mod.build_model(c)
    rng = jax.random.PRNGKey(0)
    state, sharding, tx, _ = step_mod.init_train_state(
        c, model, mesh, rng, total_steps=10
    )
    raw = step_mod.make_update_fn(c, model, tx, mesh)
    update = step_mod.jit_update_fn(raw, sharding, mesh)
    multi = step_mod.jit_multi_update_fn(raw, sharding, mesh)

    k = 3
    batches = [
        jax.device_put(_fake_batch(c, i), batch_sharding(mesh)) for i in range(k)
    ]
    rng_loop = jax.device_put(jax.random.PRNGKey(1), replicated_sharding(mesh))

    # jit donates the state; run each path from its own copy.
    state_seq = jax.tree.map(jnp.copy, state)
    meas_seq = None
    for b in batches:
        state_seq, meas_seq = update(state_seq, b, rng_loop)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    state_multi, meas_multi = multi(state, stacked, rng_loop)

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(state_seq["params"]),
        jax.tree_util.tree_leaves_with_path(state_multi["params"]),
        strict=True,
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a, np.float32),
            np.asarray(b, np.float32),
            rtol=2e-5,
            atol=2e-6,
            err_msg=str(pa),
        )

    # telemetry returned is the LAST step's
    np.testing.assert_allclose(
        float(meas_multi["training_loss"]),
        float(meas_seq["training_loss"]),
        rtol=1e-5,
    )

    from openvision_tpu import optim

    assert optim.get_count(state_multi["opt"]) == k
