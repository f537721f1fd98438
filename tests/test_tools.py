"""End-to-end tests of the three local tools on a tiny converted model."""

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

VOCAB_PATH = "assets/bert_base_vocab_bos_eos.txt"
W, L, H, E, RES, P, CTX, V = 64, 2, 2, 32, 32, 16, 16, 30522


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_model")
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
def img_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for name in ("cat1.png", "cat2.jpg"):
        arr = rng.randint(0, 255, (40, 40, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(d, name))
    return str(d)


def test_model_io_roundtrip(model_dir):
    from openvision_tpu.tools.model_io import load_model

    m = load_model(model_dir, vocab_path=VOCAB_PATH)
    z = m.encode_image(jnp.zeros((2, RES, RES, 3)))
    assert z.shape == (2, E)
    np.testing.assert_allclose(np.linalg.norm(z, axis=-1), 1.0, atol=1e-5)
    assert m.logit_scale == pytest.approx(1 / 0.07, rel=1e-4)


def test_zero_shot_tool(model_dir, img_dir, capsys):
    from openvision_tpu.tools import zero_shot

    results = zero_shot.run(model_dir, img_dir)
    out = capsys.readouterr().out
    assert len(results) == 2
    assert "Best Image Per Text" in out
    assert "cat1.png" in out


def test_gradient_ascent_tool(model_dir, img_dir, tmp_path, monkeypatch):
    from openvision_tpu.tools import gradient_ascent as ga

    monkeypatch.setattr(ga, "ITERATIONS", 3)
    monkeypatch.chdir(tmp_path)
    from openvision_tpu.tools.model_io import load_model

    model = load_model(model_dir, vocab_path="/root/repo/" + VOCAB_PATH)
    img_path = os.path.join(img_dir, "cat1.png")
    tx = ga.run_for_image(model, img_path, batch_size=2, rng=jax.random.PRNGKey(0))
    assert tx.shape == (2, E)
    assert os.path.exists("opinion-tokens/tokens_cat1.txt")
    assert os.path.exists("txtembeds/cat1_text_embedding.pt")


def test_feature_viz_tool(model_dir, monkeypatch):
    from openvision_tpu.tools import feature_viz as fv

    monkeypatch.setattr(fv, "STEPS", 3)
    from openvision_tpu.tools.model_io import load_model

    model = load_model(model_dir, vocab_path=VOCAB_PATH)
    img = fv.visualize(model, layer=1, feature=5, size=RES, rng=jax.random.PRNGKey(0))
    assert img.shape == (RES, RES, 3)
    assert np.isfinite(img).all()
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_feature_viz_parse_range():
    from openvision_tpu.tools.feature_viz import parse_range

    assert parse_range("0-3", 10) == [0, 1, 2, 3]
    assert parse_range("5,6,8", 10) == [5, 6, 8]
    assert parse_range("7", 5) == []


def test_model_io_fused_t_matches_xla(model_dir):
    """The serving fast path (attn_impl=fused_t + tanh gelu) stays within
    serving tolerance of the default path on a converted checkpoint."""
    import numpy as np

    from openvision_tpu.tools.model_io import load_model

    m_x = load_model(model_dir)
    m_f = load_model(model_dir, attn_impl="fused_t", fast_gelu=True)
    img = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    zx = np.asarray(m_x.encode_image(img))
    zf = np.asarray(m_f.encode_image(img))
    cos = (zx * zf).sum(-1)
    assert cos.min() > 0.999, cos.min()


def test_resolve_model_dir_passthrough_and_hf_tag(monkeypatch, tmp_path):
    """Local paths pass through untouched; hf-hub: tags resolve through
    snapshot_download (monkeypatched — no network) incl. @revision."""
    from openvision_tpu.tools import model_io

    assert model_io.resolve_model_dir("/some/dir") == "/some/dir"

    calls = {}

    def fake_snapshot(repo_id, revision=None, allow_patterns=None):
        calls["repo_id"], calls["revision"] = repo_id, revision
        return str(tmp_path)

    import sys, types
    fake_mod = types.SimpleNamespace(snapshot_download=fake_snapshot)
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake_mod)
    out = model_io.resolve_model_dir("hf-hub:org/name@abc123")
    assert out == str(tmp_path)
    assert calls == {"repo_id": "org/name", "revision": "abc123"}
    model_io.resolve_model_dir("hf-hub:org/name")
    assert calls["revision"] is None
