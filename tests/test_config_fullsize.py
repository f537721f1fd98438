"""The production-size config constructs end-to-end under eval_shape.

Catches config/model/optimizer plumbing errors at real scale (ViT-L/14, 32k
batch, full vocab) without allocating memory — jax.eval_shape only.
"""

import jax
import jax.numpy as jnp

from openvision_tpu import optim
from openvision_tpu.configs import openvision as cfg_mod
from openvision_tpu.parallel import logical_axis_rules, unbox
from openvision_tpu.train import step as step_mod


def test_default_config_l14_eval_shape():
    c = cfg_mod.get_config("res=84,img=L/14,txt_name=L,txt_decoder_name=L")
    assert c.input.batch_size == 32768
    assert abs(c.lr - 8e-6 * 64 * 2) < 1e-12
    assert c.total_steps == 1281167 * 2000 // 32768

    model = step_mod.build_model(c)

    def init(rng):
        image = jnp.zeros((4, 84, 84, 3), jnp.float32)
        text = jnp.zeros((8, 80), jnp.int32)
        return model.init(rng, image, text, train=True)["params"]

    with logical_axis_rules():
        shapes = jax.eval_shape(init, jax.random.PRNGKey(0))
    shapes = unbox(shapes)

    n_params = sum(p.size for p in jax.tree.leaves(shapes))
    # ViT-L (304M) + text-L (~124M incl. 30k vocab embed) + decoder-L
    assert 450e6 < n_params < 700e6, n_params

    # optimizer chain constructs over the full tree (regex masks, schedules)
    tx, sched_fns = optim.make(
        c, shapes, sched_kw=dict(total_steps=c.total_steps, batch_size=32768)
    )
    opt_shapes = jax.eval_shape(tx.init, shapes)
    assert len(sched_fns) == 1
    assert jax.tree.leaves(opt_shapes)


def test_config_parallelism_args():
    c = cfg_mod.get_config("data_parallelism=64,fsdp_parallelism=4,tensor_parallelism=2")
    assert dict(c.sharding.mesh) == {"data": 64, "fsdp": 4, "tensor": 2, "seq": 1, "pipe": 1}


def test_auto_attn_impl_resolution():
    """attn_impl=auto: fused Pallas image attention everywhere (+19% at
    336px, ties bs32 / +22% bs64 at 224px minimal, +6% at remat=none —
    PERF_NOTES round-3 ladders); text towers always xla (VERDICT r2 #8)."""
    from openvision_tpu.configs import openvision as cfg_mod

    hi = cfg_mod.get_config("res=336,img=L/14,runlocal=True")
    assert hi.model.image.attn_impl == "fused"
    assert hi.model.text.attn_impl == "xla"

    lo = cfg_mod.get_config("res=224,img=L/14,runlocal=True")
    assert lo.model.image.attn_impl == "fused"
    assert lo.model.text.attn_impl == "xla"

    nr = cfg_mod.get_config("res=224,img=L/14,runlocal=True,remat=none")
    assert nr.model.image.attn_impl == "fused"
    assert nr.model.text.attn_impl == "xla"

    # explicit pick still wins at any res
    ex = cfg_mod.get_config("res=336,img=L/14,runlocal=True,attn_impl=flash")
    assert ex.model.image.attn_impl == "flash"
