import jax
import jax.numpy as jnp
import numpy as np

from openvision_tpu.models import vit as vit_mod
from openvision_tpu.parallel import unbox
from openvision_tpu.serving.quant import quantize_vit_params, quantized_encode


def test_w8a8_encode_close_to_bf16():
    model = vit_mod.Model(
        num_classes=64, variant="Ti/16", posemb="sincos2d", pool_type="gap",
        output_tokens=False, emb_head_bias=False, fast_gelu=True,
    )
    img1 = jnp.zeros((1, 64, 64, 3))
    params = unbox(model.init(jax.random.PRNGKey(0), img1)["params"])
    image = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3)) * 0.5

    ref = model.apply({"params": params}, image)
    ref = ref / jnp.linalg.norm(ref, axis=-1, keepdims=True)

    qp = quantize_vit_params(params)
    out = quantized_encode(qp, image, patch_size=16, num_heads=3, depth=12)

    cos = jnp.sum(out * ref, -1)
    assert float(jnp.min(cos)) > 0.995, float(jnp.min(cos))


def test_quantized_params_are_int8():
    model = vit_mod.Model(
        num_classes=16, variant="mu/16", posemb="sincos2d", pool_type="gap",
        output_tokens=False, emb_head_bias=False,
    )
    params = unbox(model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"])
    qp = quantize_vit_params(params)
    blk = qp["Transformer"]["encoderblock_0"]
    assert blk["query"]["q"].dtype == jnp.int8
    assert blk["mlp0"]["q"].dtype == jnp.int8
    # int8 weights are ~2x smaller than f32... (4x) — sanity on shapes
    assert blk["query"]["q"].shape == (32, 32)
    assert blk["query"]["s"].shape == (32,)


def test_fused_int8_encode_matches_naive_quant():
    """The in-kernel W8A8 path must agree closely with the XLA-composed one
    (same per-token/per-channel quantization math; bf16 attention; nomax vs
    max-subtracted softmax and tanh GELU are the only deltas)."""
    from openvision_tpu.serving.quant import quantized_encode_fused

    model = vit_mod.Model(
        num_classes=64, variant="Ti/16", posemb="sincos2d", pool_type="gap",
        output_tokens=False, emb_head_bias=False, fast_gelu=True,
    )
    img1 = jnp.zeros((1, 64, 64, 3))
    params = unbox(model.init(jax.random.PRNGKey(0), img1)["params"])
    image = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3)) * 0.5

    qp = quantize_vit_params(params)
    naive = quantized_encode(qp, image, patch_size=16, num_heads=3, depth=12)
    fused = quantized_encode_fused(
        qp, image, patch_size=16, num_heads=3, depth=12, interpret=True)
    cos = jnp.sum(naive * fused, -1)
    assert float(jnp.min(cos)) > 0.999, float(jnp.min(cos))

    # and against the bf16 reference
    ref = model.apply({"params": params}, image)
    ref = ref / jnp.linalg.norm(ref, axis=-1, keepdims=True)
    cos_ref = jnp.sum(fused * ref, -1)
    assert float(jnp.min(cos_ref)) > 0.995, float(jnp.min(cos_ref))
