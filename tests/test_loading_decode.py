import jax
import jax.numpy as jnp
import numpy as np

from openvision_tpu.models import clip as clip_mod
from openvision_tpu.models import loading
from openvision_tpu.parallel import unbox
from openvision_tpu.train import checkpoint as ckpt_lib


def _tiny_clip_params():
    model = clip_mod.Model(
        out_dim=(32, 32),
        image=dict(variant="mu/16", posemb="learn", pool_type="gap",
                   output_tokens=True, emb_head_bias=False),
        text=dict(variant="Ti", pool_type="last", vocab_size=128,
                  output_tokens=True),
        text_decoder="none",
    )
    image = jnp.zeros((1, 32, 32, 3))
    text = jnp.zeros((1, 8), jnp.int32)
    params = unbox(model.init(jax.random.PRNGKey(0), image, text)["params"])
    return model, params


def test_load_two_towers_from_single_npz(tmp_path):
    model, params = _tiny_clip_params()
    path = str(tmp_path / "ckpt.npz")
    ckpt_lib.save_npz(path, params)

    zeroed = jax.tree.map(jnp.zeros_like, params)
    restored = loading.load_two_towers(zeroed, path)
    np.testing.assert_allclose(
        np.asarray(restored["img"]["cls"]), np.asarray(params["img"]["cls"])
    )
    np.testing.assert_allclose(np.asarray(restored["t"]), np.asarray(params["t"]))


def test_load_vit_resamples_posemb(tmp_path):
    from openvision_tpu.models import vit as vit_mod

    small = vit_mod.ViT(num_classes=8, patch_size=(16, 16), width=32, depth=1,
                        mlp_dim=64, num_heads=2, posemb="learn",
                        pool_type="gap", emb_head_bias=False)
    big = vit_mod.ViT(num_classes=8, patch_size=(16, 16), width=32, depth=1,
                      mlp_dim=64, num_heads=2, posemb="learn",
                      pool_type="gap", emb_head_bias=False)
    p_small = unbox(small.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"])
    p_big = unbox(big.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))["params"])

    path = str(tmp_path / "small.npz")
    ckpt_lib.save_npz(path, p_small)
    restored = loading.load_vit(p_big, path)
    assert restored["pos_embedding"].shape == p_big["pos_embedding"].shape
    # the loaded model must run at the new resolution
    out = big.apply({"params": restored}, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 8)


def test_kv_cache_decode_matches_full_forward():
    """Autoregressive KV-cache path == full causal attention, step by step."""
    from openvision_tpu.models.attention_module import MultiHeadAttention

    d, l = 16, 6
    x = jax.random.normal(jax.random.PRNGKey(0), (2, l, d))

    full = MultiHeadAttention(num_heads=2, causal=True)
    params = full.init(jax.random.PRNGKey(1), x, x)["params"]
    ref = full.apply({"params": params}, x, x)

    dec = MultiHeadAttention(num_heads=2, causal=True, decode=True)
    cache = dec.init(jax.random.PRNGKey(1), x, x)["cache"]

    outs = []
    for i in range(l):
        step = x[:, i : i + 1]
        out, vars_ = dec.apply(
            {"params": params, "cache": cache}, step, step, mutable=["cache"]
        )
        cache = vars_["cache"]
        outs.append(out)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)
