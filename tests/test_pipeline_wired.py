"""Pipeline parallelism wired end-to-end (VERDICT r2 #4).

`config.pipe_parallelism > 1` must actually run the encoder stacks through
ops/pipeline_parallel.py from the TRAINER path (not just the op's own test):
the full CoCa train step on a (data x pipe) CPU mesh must match the
sequential (pipe=1) step's loss trajectory, with the SAME checkpoint layout
(`encoderblock_i` param trees) in both.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.configs import openvision as cfg_mod
from openvision_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    use_mesh,
)
from openvision_tpu.train import step as step_mod


def _cfg():
    c = cfg_mod.get_config(
        "res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
        "output_token_len=8,vocab_size=64,runlocal=True,remat=none,"
        "attn_impl=xla"
    )
    c.input.batch_size = 16
    c.model.image.depth = 4  # mu is depth 1; PP needs depth % pipe == 0
    c.init_shapes = [(16, 32, 32, 3), (32, 16)]
    c.model.out_dim = (32, 32)
    c.lr = 1e-3
    c.schedule = [(".*", dict(decay_type="cosine", warmup_steps=1))]
    return c


def _run_steps(mesh, n=3):
    c = _cfg()
    model = step_mod.build_model(c)
    with use_mesh(mesh):
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
        for _ in range(n):
            state, meas = update(state, batch, rng)
            losses.append(float(meas["training_loss"]))
    return losses, state


@pytest.mark.slow
def test_train_step_pipeline_matches_sequential():
    # Loss trajectory over 3 optimizer steps must agree to f32
    # reduction-order noise. (Params after several ADAM steps are NOT
    # compared: adam normalizes near-zero grads by ~eps, amplifying
    # reduction-order noise arbitrarily — raw grads are compared exactly in
    # test_vit_pipeline_grads_match_sequential below.)
    seq_losses, _ = _run_steps(create_mesh(data=8))
    pp_losses, _ = _run_steps(create_mesh(data=4, pipe=2))
    np.testing.assert_allclose(seq_losses, pp_losses, rtol=2e-4, atol=2e-4)


def test_vit_pipeline_grads_match_sequential():
    """Same params (proving checkpoint interchangeability), same grads:
    the pipelined ViT fwd/bwd == the sequential stack's, leaf-exact."""
    from openvision_tpu.models import vit as vit_mod
    from openvision_tpu.parallel import unbox

    m = vit_mod.Model(
        num_classes=32, variant="mu/16", depth=4, posemb="sincos2d",
        pool_type="gap", output_tokens=False, emb_head_bias=False,
        head_zeroinit=False)
    img = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    params = unbox(m.init(jax.random.PRNGKey(0), img[:1])["params"])

    def loss(p, x):
        return jnp.sum(m.apply({"params": p}, x) ** 2)

    ref = m.apply({"params": params}, img)
    gref = jax.grad(loss)(params, img)

    mesh = create_mesh(data=2, fsdp=1, tensor=1, pipe=4)
    imgs = jax.device_put(img, batch_sharding(mesh))
    with use_mesh(mesh):
        out = jax.jit(lambda p, x: m.apply({"params": p}, x))(params, imgs)
        gpp = jax.jit(jax.grad(loss))(params, imgs)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gref), jax.tree.leaves(gpp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_pipeline_path_engages():
    """The pipe>1 mesh must actually route through pipeline_apply (ppermute
    in the jaxpr), not silently fall back to the sequential stack."""
    from openvision_tpu.models import vit as vit_mod
    from openvision_tpu.parallel import unbox

    m = vit_mod.Model(
        num_classes=32, variant="mu/16", depth=4, posemb="sincos2d",
        pool_type="gap", output_tokens=False, emb_head_bias=False,
        head_zeroinit=False)
    img = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    params = unbox(m.init(jax.random.PRNGKey(0), img[:1])["params"])
    mesh = create_mesh(data=2, fsdp=1, tensor=1, pipe=4)
    with use_mesh(mesh):
        jaxpr = str(jax.make_jaxpr(
            lambda p, x: m.apply({"params": p}, x))(params, img))
    assert "ppermute" in jaxpr, "pipeline path did not engage on pipe>1 mesh"


def test_pipeline_small_batch_falls_back_sequential():
    """A batch that doesn't split over the data axes (e.g. a 2-row tool
    probe) must run the sequential stack, not die in microbatch sizing."""
    from openvision_tpu.models import vit as vit_mod
    from openvision_tpu.parallel import unbox

    m = vit_mod.Model(
        num_classes=32, variant="mu/16", depth=4, posemb="sincos2d",
        pool_type="gap", output_tokens=False, emb_head_bias=False,
        head_zeroinit=False)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = unbox(m.init(jax.random.PRNGKey(0), img[:1])["params"])
    ref = m.apply({"params": params}, img)

    mesh = create_mesh(data=4, fsdp=1, tensor=1, pipe=2)  # batch 2 < dp 4
    with use_mesh(mesh):
        out = m.apply({"params": params}, img)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_ineligible_impl_warns():
    """pipe>1 with a fused attn impl can't pipeline (nested shard_map);
    it must say so loudly instead of silently wasting the pipe axis."""
    import warnings

    from openvision_tpu.models import vit as vit_mod
    from openvision_tpu.parallel import unbox

    m = vit_mod.Model(
        num_classes=32, variant="mu/16", depth=4, posemb="sincos2d",
        pool_type="gap", output_tokens=False, emb_head_bias=False,
        head_zeroinit=False, attn_impl="fused")
    img = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    params = unbox(m.init(jax.random.PRNGKey(0), img[:1])["params"])
    mesh = create_mesh(data=2, fsdp=1, tensor=1, pipe=4)
    with use_mesh(mesh):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            m.apply({"params": params}, img)
    assert any("not pipeline-eligible" in str(x.message) for x in w)


def test_config_auto_attn_respects_pipe_parallelism():
    """attn_impl=auto must resolve to a pipe-eligible impl when pipeline
    stages are requested — 'fused' would silently disable PP."""
    c = cfg_mod.get_config(
        "res=336,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
        "output_token_len=8,runlocal=True,remat=none,attn_impl=auto,"
        "pipe_parallelism=2"
    )
    assert c.model.image.attn_impl == "xla"
    # without pipe stages the perf-based resolution stands
    c = cfg_mod.get_config(
        "res=336,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
        "output_token_len=8,runlocal=True,remat=none,attn_impl=auto"
    )
    assert c.model.image.attn_impl == "fused"


def test_config_dec_attn_resolution():
    """dec_attn_impl=auto resolves the caption decoder to the fused MHSA
    block kernel (native prefix-LM mask), EXCEPT under pipeline parallelism
    (a pallas_call cannot ride the pipe shard_map ring)."""
    base = ("res=224,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
            "output_token_len=8,runlocal=True,remat=none,attn_impl=auto")
    c = cfg_mod.get_config(base)
    assert c.model.text_decoder_config.attn_impl == "fused"
    c = cfg_mod.get_config(base + ",pipe_parallelism=2")
    assert c.model.text_decoder_config.attn_impl == "xla"
    c = cfg_mod.get_config(base + ",dec_attn_impl=xla")
    assert c.model.text_decoder_config.attn_impl == "xla"
