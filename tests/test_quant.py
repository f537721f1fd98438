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


def test_serving_encode_cli(tmp_path):
    """End-to-end serving CLI on a tiny converted model dir (bf16 + int8)."""
    import json
    import os

    import pytest

    torch = pytest.importorskip("torch")
    from PIL import Image

    from openvision_tpu.convert.openclip import jax_to_openclip
    from openvision_tpu.models import text as text_mod
    from openvision_tpu.serving import encode as encode_cli

    W, L, H, E, RES, P, CTX, V = 64, 2, 2, 32, 32, 16, 16, 30522
    vision = vit_mod.ViT(
        num_classes=E, patch_size=(P, P), width=W, depth=L, mlp_dim=W * 4,
        num_heads=H, posemb="learn", pool_type="gap", emb_head_bias=False)
    text = text_mod.TextTransformer(
        num_classes=E, width=W, depth=L, mlp_dim=W * 4, num_heads=H,
        vocab_size=V, posemb="learn", pool_type="last")
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "img": unbox(vision.init(k1, jnp.zeros((1, RES, RES, 3)))["params"]),
        "txt": unbox(text.init(k2, jnp.zeros((1, CTX), jnp.int32))["params"]),
        "t": np.log(1 / 0.07) * np.ones((1,), np.float32),
    }
    d = tmp_path / "model"
    d.mkdir()
    sd = {k: torch.tensor(np.asarray(v)) for k, v in jax_to_openclip(params).items()}
    torch.save(sd, os.path.join(d, "open_clip_pytorch_model.bin"))
    cfg = {
        "model_cfg": {
            "embed_dim": E,
            "vision_cfg": {"layers": L, "width": W, "head_width": W // H,
                           "patch_size": P, "image_size": RES,
                           "pool_type": "avg", "final_ln_after_pool": True,
                           "no_ln_pre": True},
            "text_cfg": {"layers": L, "width": W, "heads": H, "vocab_size": V,
                         "context_length": CTX, "pool_type": "last",
                         "no_causal_mask": True},
        },
    }
    (d / "open_clip_config.json").write_text(json.dumps(cfg))

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.RandomState(0)
    for i in range(5):
        Image.fromarray(rng.randint(0, 255, (48, 48, 3), np.uint8)).save(
            imgs / f"im{i}.png")

    out = tmp_path / "emb.npz"
    encode_cli.main(["--use_model", str(d), "--img_folder", str(imgs),
                     "--batch", "4", "--out", str(out), "--dtype", "float32"])
    z = np.load(out)
    assert z["embeddings"].shape == (5, E)
    np.testing.assert_allclose(
        np.linalg.norm(z["embeddings"], axis=-1), 1.0, rtol=1e-4)
    assert list(z["files"]) == [f"im{i}.png" for i in range(5)]

    out8 = tmp_path / "emb8.npz"
    encode_cli.main(["--use_model", str(d), "--img_folder", str(imgs),
                     "--batch", "4", "--int8", "--out", str(out8),
                     "--dtype", "float32"])
    z8 = np.load(out8)["embeddings"]
    cos = np.sum(z8 * z["embeddings"], -1)
    assert cos.min() > 0.99, cos.min()


def test_static_calibration_close_to_dynamic():
    """calibrate_vit static per-tensor scales ≈ per-token dynamic quant
    (VERDICT r2 #6): same-distribution eval images stay ≥0.99 cosine to the
    bf16 reference and the serving program loses its per-token reduces."""
    from openvision_tpu.serving.quant import calibrate_vit

    model = vit_mod.Model(
        num_classes=64, variant="Ti/16", posemb="sincos2d", pool_type="gap",
        output_tokens=False, emb_head_bias=False, fast_gelu=True,
    )
    img1 = jnp.zeros((1, 64, 64, 3))
    params = unbox(model.init(jax.random.PRNGKey(0), img1)["params"])
    calib = jax.random.normal(jax.random.PRNGKey(1), (16, 64, 64, 3)) * 0.5
    image = jax.random.normal(jax.random.PRNGKey(2), (4, 64, 64, 3)) * 0.5

    qp = quantize_vit_params(params)
    geom = dict(patch_size=16, num_heads=3, depth=12)
    scales = calibrate_vit(qp, calib, **geom)

    # sane scale tree: finite, positive, one scalar per site per block
    flat = jax.tree.leaves(scales)
    assert len(flat) == 12 * 4 + 1
    assert all(np.isfinite(s) and s > 0 for s in map(float, flat))

    ref = model.apply({"params": params}, image)
    ref = ref / jnp.linalg.norm(ref, axis=-1, keepdims=True)
    stat = quantized_encode(qp, image, **geom, act_scales=scales)
    dyn = quantized_encode(qp, image, **geom)

    cos_stat = float(jnp.min(jnp.sum(stat * ref, -1)))
    cos_dyn = float(jnp.min(jnp.sum(dyn * ref, -1)))
    assert cos_stat > 0.99, (cos_stat, cos_dyn)
    # static costs at most a little accuracy vs dynamic on in-distribution data
    assert cos_stat > cos_dyn - 0.01


def test_disclf_int8_flag():
    """disclf(int8=True) runs the W8A8 image path end-to-end and stays close
    to the bf16 evaluator's prediction stream (VERDICT r2 #6)."""
    from openvision_tpu.data import pipeline as pipe
    from openvision_tpu.evaluators import disclf
    from openvision_tpu.models import clip as clip_mod
    from openvision_tpu.parallel import create_mesh, use_mesh

    model = clip_mod.Model(
        out_dim=(32, 32),
        image=dict(variant="Ti/16", posemb="sincos2d", pool_type="gap",
                   output_tokens=True, emb_head_bias=False),
        text=dict(variant="Ti", pool_type="last", vocab_size=30522,
                  output_tokens=True),
        text_decoder="none",
        temperature_init=1 / 0.07,
    )
    image = jnp.zeros((2, 64, 64, 3))
    text = jnp.zeros((2, 16), jnp.int32)
    params = unbox(model.init(jax.random.PRNGKey(0), image, text)["params"])

    rng = np.random.RandomState(0)
    src = pipe.DictSource({
        "image": rng.randint(0, 255, (24, 64, 64, 3), np.uint8),
        "label": rng.randint(0, 1000, (24,)),
    })
    mesh = create_mesh(data=-1)
    kw = dict(
        pp_img="|vgg_value_range",
        pp_txt=(
            'my_eval_bert_tokenize(inkey="texts", max_len=16, '
            'vocab_path="assets/bert_base_vocab_bos_eos.txt", '
            "add_bos=True, add_eos=True)"
        ),
        batch_size=8, prompt_templates="none", source=src,
    )
    with use_mesh(mesh):
        ev_bf16 = disclf.Evaluator(model, mesh, **kw)
        ev_int8 = disclf.Evaluator(model, mesh, int8=True,
                                   int8_calibration=16, **kw)
        ((k1, acc1),) = ev_bf16.run({"params": params})
        ((k2, acc2),) = ev_int8.run({"params": params})
        # the int8 path must match the bf16 tower's GELU flavor, so the
        # measured delta is quantization error alone (this model: exact GELU)
        assert ev_int8._vit_geometry()["fast_gelu"] is False
        model_fg = model.clone(image=dict(model.image, fast_gelu=True))
        ev_fg = disclf.Evaluator(model_fg, mesh, int8=True, **kw)
        assert ev_fg._vit_geometry()["fast_gelu"] is True
    assert k1 == k2
    assert 0.0 <= acc2 <= 1.0
    # random tiny model: quantization may flip borderline argmaxes, but the
    # two paths must not diverge wholesale
    assert abs(acc1 - acc2) <= 0.25, (acc1, acc2)


def test_int8_uint8_input_encode_matches_float_input():
    """build_encode_fn(int8=True, uint8_input=True): the raw-pixel serving
    path fuses /255+mean/std INTO the quantized program — outputs must
    match feeding the same normalization computed on the host into the
    float-input int8 program (round 5 tensor endpoint, int8 daemon mode)."""
    from openvision_tpu.serving.encode import build_encode_fn
    from openvision_tpu.tools.model_io import LoadedModel
    from openvision_tpu.models import text as text_mod

    vision = vit_mod.Model(
        num_classes=64, variant="Ti/16", posemb="sincos2d", pool_type="gap",
        output_tokens=False, emb_head_bias=False, fast_gelu=True,
    )
    text = text_mod.Model(
        num_classes=64, variant="Ti", pool_type="last", vocab_size=64,
        output_tokens=False,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "img": unbox(vision.init(k1, jnp.zeros((1, 64, 64, 3)))["params"]),
        "txt": unbox(text.init(k2, jnp.zeros((1, 8), jnp.int32))["params"]),
        "t": np.zeros((1,), np.float32),
    }
    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)
    model = LoadedModel(
        vision=vision, text=text, params=params, image_size=64,
        context_length=8, vocab_size=64, mean=mean, std=std,
        vocab_path="assets/bert_base_vocab_bos_eos.txt",
    )

    raw = np.random.default_rng(7).integers(
        0, 256, (4, 64, 64, 3), dtype=np.uint8)
    pre = ((raw.astype(np.float32) / 255.0
            - np.asarray(mean, np.float32))
           / np.asarray(std, np.float32))

    enc_f = build_encode_fn(model, int8=True, on_tpu=False)
    enc_u8 = build_encode_fn(model, int8=True, on_tpu=False,
                             uint8_input=True)
    zf = np.asarray(enc_f(jnp.asarray(pre)))
    zu = np.asarray(enc_u8(jnp.asarray(raw)))
    np.testing.assert_allclose(zu, zf, atol=1e-4)
