"""Neuron capture, PGD probes, and the cliptools aug/loss additions
(VERDICT r1 #7; reference cliptoolsoptimized.py:360-527, 1333-1597)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from openvision_tpu.convert.openclip import jax_to_openclip
from openvision_tpu.models import text as text_mod
from openvision_tpu.models import vit as vit_mod
from openvision_tpu.parallel import unbox
from openvision_tpu.tools import augment

VOCAB_PATH = "assets/bert_base_vocab_bos_eos.txt"
W, L, H, E, RES, P, CTX, V = 64, 2, 2, 32, 32, 16, 16, 30522


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_model_interp")
    vision = vit_mod.ViT(
        num_classes=E, patch_size=(P, P), width=W, depth=L, mlp_dim=W * 4,
        num_heads=H, posemb="learn", pool_type="gap", emb_head_bias=False,
    )
    text = text_mod.TextTransformer(
        num_classes=E, width=W, depth=L, mlp_dim=W * 4, num_heads=H,
        vocab_size=V, posemb="learn", pool_type="last",
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "img": unbox(vision.init(k1, jnp.zeros((1, RES, RES, 3)))["params"]),
        "txt": unbox(text.init(k2, jnp.zeros((1, CTX), jnp.int32))["params"]),
        "t": np.log(1 / 0.07) * np.ones((1,), np.float32),
    }
    sd = {k: torch.tensor(np.asarray(v)) for k, v in jax_to_openclip(params).items()}
    torch.save(sd, os.path.join(d, "open_clip_pytorch_model.bin"))
    cfg = {
        "model_cfg": {
            "embed_dim": E,
            "vision_cfg": {
                "layers": L, "width": W, "head_width": W // H,
                "patch_size": P, "image_size": RES, "pool_type": "avg",
                "final_ln_after_pool": True, "no_ln_pre": True,
            },
            "text_cfg": {
                "layers": L, "width": W, "heads": H, "vocab_size": V,
                "context_length": CTX, "pool_type": "last",
                "no_causal_mask": True,
            },
        },
        "preprocess_cfg": {
            "mean": [0.48145466, 0.4578275, 0.40821073],
            "std": [0.26862954, 0.26130258, 0.27577711],
        },
    }
    with open(os.path.join(d, "open_clip_config.json"), "w") as f:
        json.dump(cfg, f)
    return str(d)


@pytest.fixture(scope="module")
def cat_png(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    arr = np.random.RandomState(0).randint(0, 255, (48, 48, 3), np.uint8)
    path = os.path.join(d, "cat.png")
    Image.fromarray(arr).save(path)
    return path


# ---- neuron capture ----


def test_capture_gelu_all_layers(model_dir, cat_png):
    from PIL import Image

    from openvision_tpu.tools import neuron_capture as nc
    from openvision_tpu.tools.model_io import load_model

    model = load_model(model_dir)
    image = np.asarray(Image.open(cat_png).convert("RGB"))
    acts = nc.capture_gelu(model, image)
    assert set(acts) == {0, 1}
    n_tokens = (RES // P) ** 2 + 1
    assert acts[0].shape == (n_tokens, W * 4)

    tops = nc.top_neurons(acts, topk=3)
    f, v, t = tops[0][0]
    assert v == pytest.approx(acts[0].max(axis=0).max())
    assert acts[0][:, f].max() == pytest.approx(v)
    assert 0 <= t < n_tokens
    # descending order
    assert tops[0][0][1] >= tops[0][1][1] >= tops[0][2][1]


def test_neuron_capture_cli(model_dir, cat_png, capsys):
    from openvision_tpu.tools import neuron_capture as nc

    nc.main(["--use_model", model_dir, "--image", cat_png, "--topk", "2"])
    out = capsys.readouterr().out
    assert "layer  0:" in out and "layer  1:" in out
    assert "top neuron overall:" in out


def test_neuron_capture_visualize_end_to_end(model_dir, cat_png, tmp_path,
                                             capsys, monkeypatch):
    from openvision_tpu.tools import feature_viz, neuron_capture as nc

    monkeypatch.setattr(feature_viz, "STEPS", 3)
    nc.main([
        "--use_model", model_dir, "--image", cat_png, "--layer", "0",
        "--visualize", "--deterministic", "--out", str(tmp_path / "viz"),
    ])
    out = capsys.readouterr().out
    assert "saved" in out
    pngs = list((tmp_path / "viz").glob("*.png"))
    assert len(pngs) == 1 and "_L0_F" in pngs[0].name


# ---- adversarial probes ----


def test_pgd_respects_eps_and_changes_loss(model_dir, cat_png):
    from openvision_tpu.tools import adversarial as advmod
    from openvision_tpu.tools.model_io import load_model, tokenize_labels

    model = load_model(model_dir)
    labels = ["a cat", "a dog"]
    tokens = tokenize_labels(labels, VOCAB_PATH, model.context_length)
    ztxt = model.encode_text(jnp.asarray(tokens))
    image01 = jnp.asarray(advmod._load_image01(model, cat_png))

    probs0 = advmod.classify(model, image01, ztxt)
    pred = int(probs0.argmax())
    eps = 8 / 255
    out = advmod.pgd(model, image01, ztxt, pred, eps=eps, iters=5)
    assert float(jnp.max(jnp.abs(out - image01))) <= eps + 1e-6
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    # untargeted attack must not increase the predicted-class prob
    probs1 = advmod.classify(model, out, ztxt)
    assert probs1[pred] <= probs0[pred] + 1e-5


def test_targeted_pgd_moves_towards_target(model_dir, cat_png):
    from openvision_tpu.tools import adversarial as advmod
    from openvision_tpu.tools.model_io import load_model, tokenize_labels

    model = load_model(model_dir)
    labels = ["a cat", "a dog"]
    tokens = tokenize_labels(labels, VOCAB_PATH, model.context_length)
    ztxt = model.encode_text(jnp.asarray(tokens))
    image01 = jnp.asarray(advmod._load_image01(model, cat_png))

    probs0 = advmod.classify(model, image01, ztxt)
    target = int(probs0.argmin())
    out = advmod.pgd(model, image01, ztxt, target, eps=16 / 255, iters=8,
                     targeted=True)
    probs1 = advmod.classify(model, out, ztxt)
    assert probs1[target] >= probs0[target]


def test_adversarial_cli(model_dir, cat_png, tmp_path, capsys):
    from openvision_tpu.tools import adversarial as advmod

    out_png = str(tmp_path / "adv.png")
    advmod.main([
        "--use_model", model_dir, "--image", cat_png,
        "--labels", "a cat,a dog", "--iters", "3", "--out", out_png,
    ])
    out = capsys.readouterr().out
    assert "clean prediction:" in out and "L-inf perturbation" in out
    assert os.path.exists(out_png)


# ---- aug-stack additions ----


def test_tile():
    x = jnp.arange(2 * 2 * 2 * 1, dtype=jnp.float32).reshape(2, 2, 2, 1)
    out = augment.tile(x, 3)
    assert out.shape == (2, 6, 6, 1)
    np.testing.assert_array_equal(out[:, :2, :2], x)
    np.testing.assert_array_equal(out[:, 2:4, 4:6], x)


def test_zoom_and_centering_shapes():
    x = jnp.ones((2, 16, 16, 3))
    assert augment.zoom(x, 32).shape == (2, 32, 32, 3)
    out = augment.centering(jax.random.PRNGKey(0), x, 8, std=4.0)
    assert out.shape == (2, 8, 8, 3)


def test_flip():
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 8, 1)
    flipped = augment.flip(jax.random.PRNGKey(0), x, p=1.0)
    np.testing.assert_array_equal(np.asarray(flipped[0, 0, :, 0]),
                                  np.arange(8)[::-1])
    same = augment.flip(jax.random.PRNGKey(0), x, p=0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))


def test_repeat_batch_and_losses():
    x = jnp.ones((2, 4, 4, 3))
    assert augment.repeat_batch(x, 3).shape == (6, 4, 4, 3)
    assert float(augment.activation_norm_loss(2 * jnp.ones((3, 5)))) == 4.0
    same = jnp.tile(jnp.asarray([[1.0, 0.0]]), (4, 1))
    assert float(augment.diversity_loss(same)) == pytest.approx(1.0)
    orth = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    assert float(augment.diversity_loss(orth)) == pytest.approx(0.0)


def test_color_jitter_affine_differentiable():
    x = jnp.ones((2, 4, 4, 3))

    def f(x):
        return jnp.sum(
            augment.color_jitter_affine(jax.random.PRNGKey(0), x) ** 2
        )

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
