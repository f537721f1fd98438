import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.models import clip as clip_mod
from openvision_tpu.models import decoder as decoder_mod
from openvision_tpu.models import text as text_mod
from openvision_tpu.models import vit as vit_mod
from openvision_tpu.parallel import unbox
from openvision_tpu.utils import tree_flatten_with_names


def tree_flatten_with_names_flat(tree):
    return tree_flatten_with_names(tree)[0]

IMG_CFG = dict(
    variant="mu/16",
    posemb="sincos2d",
    pool_type="gap",
    output_tokens=True,
    emb_head_bias=False,
    head_zeroinit=False,
)
TXT_CFG = dict(
    variant="Ti",
    pool_type="last",
    casual_mask=False,
    vocab_size=128,
    output_tokens=True,
)
DEC_CFG = dict(
    variant="Ti",
    num_classes=128,
    fusion_style="concat",
    casual_mask=True,
    num_learnable_tokens=8,
)


def _tiny_clip(**over):
    cfg = dict(
        out_dim=(32, 32),
        image=IMG_CFG,
        text=TXT_CFG,
        text_decoder_config=DEC_CFG,
        temperature_init=1 / 0.07,
    )
    cfg.update(over)
    return clip_mod.Model(**cfg)


def test_vit_param_names_match_model_zoo_layout():
    model = vit_mod.Model(num_classes=32, **{**IMG_CFG, "variant": "mu/16"})
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    names = {n for n, _ in tree_flatten_with_names_flat(unbox(params))}
    expected = {
        "embedding/kernel",
        "cls",
        "Transformer/encoderblock_0/LayerNorm_0/scale",
        "Transformer/encoderblock_0/LayerNorm_0/bias",
        "Transformer/encoderblock_0/LayerNorm_1/scale",
        "Transformer/encoderblock_0/MultiHeadDotProductAttention_0/query/kernel",
        "Transformer/encoderblock_0/MultiHeadDotProductAttention_0/query/bias",
        "Transformer/encoderblock_0/MultiHeadDotProductAttention_0/key/kernel",
        "Transformer/encoderblock_0/MultiHeadDotProductAttention_0/value/kernel",
        "Transformer/encoderblock_0/MultiHeadDotProductAttention_0/out/kernel",
        "Transformer/encoderblock_0/MlpBlock_0/Dense_0/kernel",
        "Transformer/encoderblock_0/MlpBlock_0/Dense_1/kernel",
        "encoder_norm/scale",
        "encoder_norm/bias",
        "head/kernel",
    }
    assert expected <= names, expected - names
    # sincos2d posemb and emb_head_bias=False mean no such params:
    assert "pos_embedding" not in names
    assert "embedding/bias" not in names
    assert "head/bias" not in names


def test_vit_qkv_kernel_shape_plain_dense():
    model = vit_mod.Model(num_classes=32, **IMG_CFG)
    params = unbox(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    )
    k = params["Transformer"]["encoderblock_0"]["MultiHeadDotProductAttention_0"][
        "query"
    ]["kernel"]
    assert k.shape == (32, 32)  # rank-2 (use_dense_general=False)


def test_vit_dense_general_shapes():
    model = vit_mod.Model(num_classes=32, **{**IMG_CFG, "use_dense_general": True})
    params = unbox(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    )
    blk = params["Transformer"]["encoderblock_0"]["MultiHeadDotProductAttention_0"]
    assert blk["query"]["kernel"].shape == (32, 2, 16)
    assert blk["out"]["kernel"].shape == (2, 16, 32)


def test_text_param_names_match_model_zoo_layout():
    model = text_mod.Model(num_classes=32, **TXT_CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16), jnp.int32))["params"]
    names = {n for n, _ in tree_flatten_with_names_flat(unbox(params))}
    assert "Embed_0/embedding" in names
    assert "pos_embedding" in names
    assert "encoder_norm/scale" in names
    assert "head/kernel" in names
    assert "head/bias" not in names
    assert "Transformer/encoderblock_11/MlpBlock_0/Dense_1/kernel" in names


def test_vit_forward_shapes_and_tokens():
    model = vit_mod.Model(num_classes=32, **IMG_CFG)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    pooled, tokens = model.apply({"params": params}, x)
    assert pooled.shape == (2, 32)
    assert tokens.shape == (2, 4, 32)  # 32/16=2 → 4 patches (cls dropped)


def test_vit_post_norm_matches_external_normalization():
    # post_norm normalizes inside the model (reference vit.py:448-451,658-663);
    # must equal normalizing the pixels outside and running post_norm=False.
    model = vit_mod.Model(num_classes=32, post_norm=True, **IMG_CFG)
    base = vit_mod.Model(num_classes=32, post_norm=False, **IMG_CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mean = jnp.asarray(model.mean)[None, None, None, :]
    std = jnp.asarray(model.std)[None, None, None, :]
    got, _ = model.apply({"params": params}, x)
    want, _ = base.apply({"params": params}, (x - mean) / std)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_text_forward_pool_last():
    model = text_mod.Model(num_classes=32, **TXT_CFG)
    x = jnp.ones((2, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    pooled, tokens = model.apply({"params": params}, x)
    assert pooled.shape == (2, 32)
    assert tokens.shape == (2, 15, 192)  # last position dropped


def test_decoder_concat_and_cross_attn():
    img_tok = jnp.zeros((2, 4, 32))
    txt_tok = jnp.zeros((2, 15, 192))
    for fusion in ("concat", "cross_attn"):
        model = decoder_mod.Model(**{**DEC_CFG, "fusion_style": fusion})
        params = model.init(jax.random.PRNGKey(0), img_tok, txt_tok)["params"]
        logits, _ = model.apply({"params": params}, img_tok, txt_tok)
        assert logits.shape == (2, 8, 128)
        names = {n for n, _ in tree_flatten_with_names_flat(unbox(params))}
        assert "learnable_tokens" in names
        assert "image_projection_layer/kernel" in names
        assert "decoder_norm/scale" in names
        if fusion == "cross_attn":
            assert any("crossattn_encoderblock_0" in n for n in names)


def test_clip_two_towers_end_to_end():
    model = _tiny_clip()
    image = jnp.zeros((2, 32, 32, 3))
    text = jnp.zeros((4, 16), jnp.int32)  # two views per image
    params = model.init(jax.random.PRNGKey(0), image, text, train=True)["params"]
    names = {n for n, _ in tree_flatten_with_names_flat(unbox(params))}
    assert "t" in names
    assert any(n.startswith("img/") for n in names)
    assert any(n.startswith("txt/") for n in names)
    assert any(n.startswith("txt_decoder/") for n in names)

    zimg, ztxt, out = model.apply(
        {"params": params}, image, text, train=True,
        rngs={"dropout": jax.random.PRNGKey(1), "drop_path": jax.random.PRNGKey(2)},
    )
    assert zimg.shape == (2, 32)
    assert ztxt.shape == (4, 32)
    np.testing.assert_allclose(np.linalg.norm(zimg, axis=1), 1.0, atol=1e-3)
    assert out["logits"].shape == (2, 8, 128)  # caption logits on view 1 only
    np.testing.assert_allclose(float(out["t"][0]), 1 / 0.07, rtol=1e-5)


def test_clip_eval_mode_no_decoder_halving():
    model = _tiny_clip()
    image = jnp.zeros((2, 32, 32, 3))
    text = jnp.zeros((2, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), image, text, train=False)["params"]
    zimg, ztxt, out = model.apply({"params": params}, image, text, train=False)
    assert out["logits"].shape == (2, 8, 128)


def test_resample_posemb():
    old = jnp.ones((1, 1 + 4, 8))
    new = vit_mod.resample_posemb(old, 1 + 16)
    assert new.shape == (1, 17, 8)


def test_bench_speed_flags_stay_inside_deviation_budget():
    """Pin the bench's opt-in speed flags to their measured deviation budget.

    `fast_gelu` (tanh GELU) and `nomax_softmax` (no max-subtraction, clamp 80)
    are what bench.py runs with; measured deviation on TPU is ~5e-6 output
    cosine (docs/PERF_NOTES.md), 200x inside the 1e-3 parity budget
    (BASELINE.json). This pins the combined deviation at 1e-4 so a regression
    cannot silently widen it past the defensible range.
    """
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 32, 32, 3))
    exact = vit_mod.Model(num_classes=32, **IMG_CFG)
    params = exact.init(jax.random.PRNGKey(0), x)["params"]
    out_exact, _ = exact.apply({"params": params}, x)
    fast = vit_mod.Model(
        num_classes=32,
        **{**IMG_CFG, "fast_gelu": True, "nomax_softmax": True},
    )
    out_fast, _ = fast.apply({"params": params}, x)
    a = np.asarray(out_exact, np.float64)
    b = np.asarray(out_fast, np.float64)
    cos = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert cos.min() >= 1 - 1e-4, f"speed-flag deviation widened: {1 - cos.min()}"


@pytest.mark.parametrize("impl", ["xla", "scan"])
def test_vit_attention_impls_agree(impl):
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    ref = vit_mod.Model(num_classes=32, **IMG_CFG)
    params = ref.init(jax.random.PRNGKey(0), x)["params"]
    out_ref, _ = ref.apply({"params": params}, x)
    alt = vit_mod.Model(num_classes=32, **{**IMG_CFG, "attn_impl": impl})
    out_alt, _ = alt.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(out_alt), np.asarray(out_ref), atol=1e-4, rtol=1e-4
    )
