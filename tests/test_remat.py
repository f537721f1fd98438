"""Remat policies compile and train (covers the flax static_argnums quirk)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.models import vit as vit_mod


@pytest.mark.parametrize("policy", ["minimal", "full"])
def test_vit_remat_policies_forward_and_grad(policy):
    model = vit_mod.Model(
        num_classes=16, variant="mu/16", posemb="sincos2d", pool_type="gap",
        output_tokens=False, emb_head_bias=False, remat_policy=policy,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]

    def loss(p):
        return jnp.sum(model.apply({"params": p}, x, train=True,
                                   rngs={"dropout": jax.random.PRNGKey(2),
                                         "drop_path": jax.random.PRNGKey(3)}) ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))

    # remat output == no-remat output
    ref = vit_mod.Model(
        num_classes=16, variant="mu/16", posemb="sincos2d", pool_type="gap",
        output_tokens=False, emb_head_bias=False, remat_policy="none",
    )
    np.testing.assert_allclose(
        np.asarray(model.apply({"params": params}, x)),
        np.asarray(ref.apply({"params": params}, x)),
        atol=1e-6,
    )


def test_decoder_remat():
    from openvision_tpu.models import decoder as decoder_mod

    dec = decoder_mod.Model(variant="Ti", num_classes=64, fusion_style="cross_attn",
                            casual_mask=True, num_learnable_tokens=4,
                            remat_policy="minimal")
    img = jnp.zeros((1, 4, 32))
    txt = jnp.zeros((1, 5, 192))
    params = dec.init(jax.random.PRNGKey(0), img, txt)["params"]

    def loss(p):
        logits, _ = dec.apply({"params": p}, img, txt, train=True,
                              rngs={"dropout": jax.random.PRNGKey(1),
                                    "drop_path": jax.random.PRNGKey(2)})
        return jnp.sum(logits ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


def test_remat_with_fused_attention():
    """remat(EncoderBlock) wrapping the Pallas custom_vjp path."""
    model = vit_mod.Model(
        num_classes=16, variant="mu/16", posemb="sincos2d", pool_type="gap",
        output_tokens=False, emb_head_bias=False, remat_policy="minimal",
        attn_impl="fused",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]

    def loss(p):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))

    # matches the unfused no-remat model on the same params
    ref = vit_mod.Model(
        num_classes=16, variant="mu/16", posemb="sincos2d", pool_type="gap",
        output_tokens=False, emb_head_bias=False,
    )
    g_ref = jax.grad(lambda p: jnp.sum(ref.apply({"params": p}, x) ** 2))(params)
    a = jax.tree.leaves(g)[0]
    b = jax.tree.leaves(g_ref)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)
