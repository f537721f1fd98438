"""Tensor-parallel fused kernels: heads sharded over the `tensor` mesh axis.

VERDICT r1 #3: the fused Pallas paths must compose with tensor parallelism —
wq/wk/wv column-sharded, wo row-sharded, psum before the residual — instead
of entering each shard whole. Checks: values + grads vs the unsharded path,
no weight-sized all-gathers in the compiled HLO, and the full fused CoCa
train step on a 2x2x2 mesh matching the xla-attention step.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.configs import openvision as cfg_mod
from openvision_tpu.ops.fused_attention import (
    fused_mhsa_block,
    fused_qkv_attention,
)
from openvision_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    use_mesh,
)
from openvision_tpu.train import step as step_mod


def _args(b=8, l=20, d=16, heads=4, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 11)
    x = jax.random.normal(ks[0], (b, l, d))
    wq, wk, wv, wo = (jax.random.normal(k, (d, d)) * 0.2 for k in ks[1:5])
    bq, bk, bv, bo = (jax.random.normal(k, (d,)) * 0.05 for k in ks[5:9])
    lns = 1 + 0.1 * jax.random.normal(ks[9], (d,))
    lnb = 0.1 * jax.random.normal(ks[10], (d,))
    return x, (lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo)


def _block(x, p, heads=4):
    lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo = p
    return fused_mhsa_block(
        x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo,
        num_heads=heads, interpret=True)


@pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (1, 1, 8), (4, 1, 2)])
def test_tp_block_matches_unsharded(mesh_shape):
    x, p = _args()
    ref = _block(x, p)
    mesh = create_mesh(*mesh_shape)
    xs = jax.device_put(x, batch_sharding(mesh))
    with use_mesh(mesh):
        out = jax.jit(_block)(xs, p)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5, rtol=1e-5)


def test_tp_block_grads_match_unsharded():
    x, p = _args()

    def loss(x, p):
        return jnp.sum(_block(x, p) ** 2)

    gref = jax.grad(loss, argnums=(0, 1))(x, p)
    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    xs = jax.device_put(x, batch_sharding(mesh))
    with use_mesh(mesh):
        gtp = jax.jit(jax.grad(loss, argnums=(0, 1)))(xs, p)
    for a, b in zip(jax.tree.leaves(gref), jax.tree.leaves(gtp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_tp_qkv_matches_unsharded():
    x, p = _args()
    _, _, wq, bq, wk, bk, wv, bv, _, _ = p

    def call(x, wq, wk, wv):
        return fused_qkv_attention(
            x, wq, wk, wv, bq, bk, bv, num_heads=4, interpret=True)

    ref = call(x, wq, wk, wv)

    def loss(x, wq, wk, wv):
        return jnp.sum(call(x, wq, wk, wv) ** 2)

    gref = jax.grad(loss, argnums=(0, 1, 2, 3))(x, wq, wk, wv)
    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    xs = jax.device_put(x, batch_sharding(mesh))
    with use_mesh(mesh):
        out = jax.jit(call)(xs, wq, wk, wv)
        gtp = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(xs, wq, wk, wv)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5, rtol=1e-5)
    for a, b in zip(gref, gtp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_tp_block_hlo_has_no_weight_all_gather():
    x, p = _args()
    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    xs = jax.device_put(x, batch_sharding(mesh))
    with use_mesh(mesh):
        hlo = jax.jit(_block).lower(xs, p).compile().as_text()
    d = x.shape[-1]
    for line in hlo.splitlines():
        if "all-gather" not in line or "all-gather-start" in line:
            pass
        if re.search(r"all-gather[^(]*= f32\[(\d+),(\d+)\]", line):
            m = re.search(r"f32\[(\d+),(\d+)\]", line)
            shape = (int(m.group(1)), int(m.group(2)))
            assert shape != (d, d), f"weight all-gather found: {line.strip()}"


def test_tp_heads_indivisible_falls_back():
    # 3 heads on tensor=2: TP cannot shard; the batch-sharded path must run.
    x, p = _args(d=12, heads=3)
    ref = _block(x, p, heads=3)
    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    xs = jax.device_put(x, batch_sharding(mesh))
    with use_mesh(mesh):
        out = jax.jit(lambda x, p: _block(x, p, heads=3))(xs, p)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5, rtol=1e-5)


def _tiny_config(attn_impl):
    c = cfg_mod.get_config(
        "res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
        f"output_token_len=8,vocab_size=64,runlocal=True,remat=none,"
        f"attn_impl={attn_impl}"
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
def test_fused_coca_train_step_tp_matches_xla():
    """Full CoCa loss + grads, fused kernels, 2x2x2 mesh == xla path.

    Compares the raw gradients elementwise (the reported l2_grads telemetry
    is f32-accumulation-order sensitive at the ~1% level across mesh layouts
    — verified pre-existing on the pure-xla path — so it is not a valid
    cross-impl equality probe)."""
    from openvision_tpu import losses, optim
    from openvision_tpu.parallel import use_mesh

    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    results = {}
    for impl in ("xla", "fused"):
        c = _tiny_config(impl)
        model = step_mod.build_model(c)
        state, sharding, _, _ = step_mod.init_train_state(
            c, model, mesh, jax.random.PRNGKey(0), total_steps=10)
        batch = jax.device_put(_fake_batch(c), batch_sharding(mesh))
        rng0 = jax.device_put(jax.random.PRNGKey(1), replicated_sharding(mesh))

        def gfn(train_state, batch, rng):
            with use_mesh(mesh):
                images = step_mod.normalize_uint8(batch["image"])
                labels = jnp.concatenate(
                    [batch["labels1"], batch["labels2"]], axis=0)
                rng = jax.random.fold_in(
                    rng, optim.get_count(train_state["opt"], jittable=True))

                def loss_fn(params):
                    zimg, ztxt, out = model.apply(
                        {"params": params}, images, labels, train=True,
                        rngs={"dropout": rng, "drop_path": rng,
                              "random_mask": rng})
                    half = ztxt.shape[0] // 2
                    l, _ = losses.bidirectional_contrastive_loss(
                        zimg, [ztxt[:half], ztxt[half:]], out["t"],
                        mode="local", mesh=mesh)
                    cap = losses.linear_softmax_xent(
                        prelogits=out["cap_prelogits"],
                        kernel=params["txt_decoder"]["head"]["kernel"],
                        labels=batch["autoreg_labels"],
                        mask=batch["cap_loss_mask"])
                    return l + 2.0 * cap

                return jax.value_and_grad(loss_fn)(train_state["params"])

        l, g = jax.jit(
            gfn,
            in_shardings=(sharding, batch_sharding(mesh),
                          replicated_sharding(mesh)),
        )(state, batch, rng0)
        results[impl] = (float(l), jax.device_get(g))

    np.testing.assert_allclose(results["xla"][0], results["fused"][0],
                               rtol=1e-5)
    from jax.tree_util import keystr, tree_leaves_with_path

    for (k, a), (_, b) in zip(tree_leaves_with_path(results["xla"][1]),
                              tree_leaves_with_path(results["fused"][1])):
        if keystr(k).endswith("['key']['bias']"):
            continue  # true gradient is exactly 0 (softmax shift-invariance)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-3,
            err_msg=keystr(k))


def test_tp_block_backward_is_pallas():
    """VERDICT r2 #3: the TP fused backward must run the Pallas partial-block
    backward kernel per shard, not the jnp reference VJP. The grad jaxpr of
    the TP block therefore contains (at least) two pallas_calls — the forward
    partial kernel and the backward kernel — and no reference-VJP einsum
    chain (the unfused path would show `exp`+`dot_general` outside any
    pallas_call with zero bwd pallas_calls)."""
    x, p = _args()

    def loss(x, p):
        return jnp.sum(_block(x, p) ** 2)

    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    xs = jax.device_put(x, batch_sharding(mesh))
    with use_mesh(mesh):
        jaxpr = str(jax.make_jaxpr(jax.grad(loss, argnums=(0, 1)))(xs, p))
    n_pallas = jaxpr.count("pallas_call")
    assert n_pallas >= 2, (
        f"expected fwd+bwd Pallas kernels in the TP grad jaxpr, found "
        f"{n_pallas} pallas_call(s)"
    )


def test_tp_block_prefix_lm_matches_unsharded():
    """Head-sharded TP fused block with the native prefix-LM mask: values +
    grads must match the unsharded kernel (the caption decoder under TP)."""
    x, p = _args()

    def block(x, p):
        lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo = p
        return fused_mhsa_block(
            x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo,
            num_heads=4, causal=True, prefix_len=7, interpret=True)

    def loss(x, p):
        return jnp.sum(block(x, p) ** 2)

    ref = block(x, p)
    gref = jax.grad(loss, argnums=(0, 1))(x, p)
    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    xs = jax.device_put(x, batch_sharding(mesh))
    with use_mesh(mesh):
        out = jax.jit(block)(xs, p)
        gtp = jax.jit(jax.grad(loss, argnums=(0, 1)))(xs, p)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gref), jax.tree.leaves(gtp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_tp_qkv_bwd_is_pallas_not_reference_vjp():
    """ADVICE r4: the TP qkv backward must run the fused Pallas kernel per
    shard (`_qkv_bwd_impl` inside `_tp_qkv_bwd`), not `jax.vjp` of the jnp
    reference — the old fallback would reappear in the grad jaxpr as
    top-level `exp` / `reduce_max` softmax primitives outside pallas_call."""
    x, p = _args()
    _, _, wq, bq, wk, bk, wv, bv, _, _ = p

    def loss(x, wq, wk, wv):
        return jnp.sum(
            fused_qkv_attention(
                x, wq, wk, wv, bq, bk, bv, num_heads=4, interpret=True
            ).astype(jnp.float32)
            ** 2
        )

    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    xs = jax.device_put(x, batch_sharding(mesh))
    with use_mesh(mesh):
        jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2, 3)))(
            xs, wq, wk, wv
        )

    def prims(jpr):
        for eqn in jpr.eqns:
            name = eqn.primitive.name
            if name == "pallas_call":
                continue  # softmax inside the kernel is the point
            yield name
            for sub in jax.core.jaxprs_in_params(eqn.params):
                yield from prims(sub)

    seen = set(prims(jaxpr.jaxpr))
    assert "pallas_call" not in seen  # sanity: we skipped them
    assert not seen & {"exp", "reduce_max"}, sorted(seen)


def test_fused_t_under_tensor_parallel_degrades_to_tp_fused(caplog):
    """VERDICT r4 #4: `attn_impl=fused_t` under tensor>1 must degrade to the
    TP-aware natural-layout fused Pallas path — values AND grads matching
    the unsharded fused_t model — and must SAY so (a logged warning, not a
    silent perf cliff)."""
    import logging

    from openvision_tpu.models import vit as vit_mod
    from openvision_tpu.parallel import unbox

    m = vit_mod.Model(
        num_classes=32, variant="mu/16", posemb="sincos2d", pool_type="gap",
        output_tokens=False, emb_head_bias=False, head_zeroinit=False,
        fast_gelu=True, attn_impl="fused_t",
    )
    img = jax.random.normal(jax.random.PRNGKey(1), (8, 48, 48, 3))
    params = unbox(m.init(jax.random.PRNGKey(0), img[:1])["params"])
    ref = m.apply({"params": params}, img)

    def loss(p, x):
        return jnp.sum(m.apply({"params": p}, x).astype(jnp.float32) ** 2)

    gref = jax.grad(loss)(params, img)

    mesh = create_mesh(data=2, fsdp=2, tensor=2)
    imgs = jax.device_put(img, batch_sharding(mesh))
    with use_mesh(mesh), caplog.at_level(logging.WARNING):
        out = jax.jit(lambda p, x: m.apply({"params": p}, x))(params, imgs)
        gtp = jax.jit(jax.grad(loss))(params, imgs)
    assert any(
        "fused_t is batch-sharded only" in r.getMessage()
        for r in caplog.records
    ), [r.getMessage() for r in caplog.records][:5]

    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-4, rtol=1e-4)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(gref),
        jax.tree_util.tree_leaves_with_path(gtp),
        strict=True,
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(pa),
        )
