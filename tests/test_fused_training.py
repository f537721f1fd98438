"""Full CoCa train step with attn_impl=fused on a sharded CPU mesh."""

import pytest
import jax
import numpy as np

from openvision_tpu.configs import openvision as cfg_mod
from openvision_tpu.parallel import batch_sharding, create_mesh, replicated_sharding
from openvision_tpu.train import step as step_mod


@pytest.mark.slow
def test_train_step_fused_attention_sharded():
    c = cfg_mod.get_config(
        "res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
        "output_token_len=8,vocab_size=64,runlocal=True,remat=none,"
        "attn_impl=fused"
    )
    c.input.batch_size = 16
    c.init_shapes = [(16, 32, 32, 3), (32, 16)]
    c.model.out_dim = (32, 32)
    c.lr = 1e-3
    c.schedule = [(".*", dict(decay_type="cosine", warmup_steps=1))]

    mesh = create_mesh(data=4, fsdp=2, tensor=1)
    model = step_mod.build_model(c)
    state, sharding, tx, _ = step_mod.init_train_state(
        c, model, mesh, jax.random.PRNGKey(0), total_steps=10
    )
    update = step_mod.jit_update_fn(
        step_mod.make_update_fn(c, model, tx, mesh), sharding, mesh
    )
    r = np.random.RandomState(0)
    batch = jax.device_put(
        {
            "image": r.randint(0, 255, (16, 32, 32, 3)).astype(np.uint8),
            "labels1": r.randint(0, 64, (16, 16)).astype(np.int32),
            "labels2": r.randint(0, 64, (16, 16)).astype(np.int32),
            "autoreg_labels": r.randint(0, 64, (16, 8)).astype(np.int32),
            "cap_loss_mask": np.ones((16, 8), np.float32),
        },
        batch_sharding(mesh),
    )
    rng = jax.device_put(jax.random.PRNGKey(1), replicated_sharding(mesh))

    losses = []
    for _ in range(3):
        state, meas = update(state, batch, rng)
        losses.append(float(meas["training_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
