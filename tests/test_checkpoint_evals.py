import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.data import pipeline as pipe
from openvision_tpu.models import clip as clip_mod
from openvision_tpu.parallel import create_mesh, unbox
from openvision_tpu.train import checkpoint as ckpt_lib

VOCAB = "assets/bert_base_vocab_bos_eos.txt"


def _tiny_model():
    return clip_mod.Model(
        out_dim=(32, 32),
        image=dict(variant="mu/16", posemb="sincos2d", pool_type="gap",
                   output_tokens=True, emb_head_bias=False),
        text=dict(variant="Ti", pool_type="last", vocab_size=30522,
                  output_tokens=True),
        text_decoder="none",
        temperature_init=1 / 0.07,
    )


@pytest.fixture(scope="module")
def tiny():
    model = _tiny_model()
    image = jnp.zeros((2, 32, 32, 3))
    text = jnp.zeros((2, 16), jnp.int32)
    params = unbox(model.init(jax.random.PRNGKey(0), image, text)["params"])
    return model, params


def test_npz_roundtrip(tmp_path, tiny):
    _, params = tiny
    path = str(tmp_path / "ckpt.npz")
    ckpt_lib.save_npz(path, params)
    loaded = ckpt_lib.load_npz(path)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), b)


def test_npz_subtree_select(tmp_path, tiny):
    _, params = tiny
    path = str(tmp_path / "ckpt.npz")
    ckpt_lib.save_npz(path, params)
    img = ckpt_lib.load_npz(path + ":img")
    assert "embedding" in img


def test_orbax_roundtrip_and_params_restore(tmp_path, tiny):
    _, params = tiny
    state = {"params": params, "opt": {"count": jnp.zeros((), jnp.int32)}}
    mngr = ckpt_lib.create_checkpoint_manager(str(tmp_path / "ckpt"), async_save=False)
    assert ckpt_lib.save_train_state(mngr, 3, state)
    mngr.wait_until_finished()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    restored = ckpt_lib.restore_train_state(mngr, abstract)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["t"]), np.asarray(params["t"])
    )
    mngr.close()

    # params-only restore (Model-Zoo / ft_from path)
    abstract_params = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    p2 = ckpt_lib.restore_params(str(tmp_path / "ckpt"), abstract_params)
    np.testing.assert_allclose(np.asarray(p2["t"]), np.asarray(params["t"]))


def _eval_pp_txt():
    return (
        f'my_eval_bert_tokenize(inkey="texts", max_len=16, vocab_path="{VOCAB}", '
        "add_bos=True, add_eos=True)"
    )


def test_disclf_evaluator_smoke(tiny):
    from openvision_tpu.evaluators import disclf

    model, params = tiny
    mesh = create_mesh(data=8)
    images = np.random.randint(0, 255, (10, 32, 32, 3), np.uint8)
    labels = np.random.randint(0, 1000, (10,))
    src = pipe.DictSource({"image": images, "label": labels})
    ev = disclf.Evaluator(
        model, mesh,
        pp_img="|vgg_value_range", pp_txt=_eval_pp_txt(),
        batch_size=8, prompt_templates="none", source=src,
    )
    metrics = dict(ev.run({"params": params}))
    assert 0.0 <= metrics["imagenet2012_accuracy"] <= 1.0


def test_retrieval_evaluator_smoke(tiny):
    from openvision_tpu.evaluators import retrieval

    model, params = tiny
    mesh = create_mesh(data=8)
    images = np.random.randint(0, 255, (6, 32, 32, 3), np.uint8)
    caps = np.array(["a cat\na feline", "a dog", "a bird", "a fish", "a horse", "a cow"])
    src = pipe.DictSource({"image": images, "captions": caps})
    ev = retrieval.Evaluator(
        model, mesh, pp_img="|vgg_value_range", pp_txt=_eval_pp_txt(),
        batch_size=8, source=src,
    )
    metrics = dict(ev.run({"params": params}))
    assert set(metrics) == {
        f"{d}_recall@{k}" for d in ("txt2img", "img2txt") for k in (1, 5, 10)
    }
    assert metrics["img2txt_recall@5"] >= metrics["img2txt_recall@1"]


def test_recall_at_k_exact():
    from openvision_tpu.evaluators.retrieval import recall_at_k

    # 2 images, 3 texts; text 0,1 → img0; text 2 → img1
    sim = np.array([[0.9, 0.1, 0.2], [0.0, 0.8, 0.7]])
    t2i = np.array([0, 0, 1])
    m = recall_at_k(sim, t2i, ks=(1,))
    # txt0→img0 ✓, txt1→img1 ✗, txt2→img1 ✓ → 2/3
    np.testing.assert_allclose(m["txt2img_recall@1"], 2 / 3)
    # img0's best text is txt0 (img0) ✓; img1's best is txt1 (img0) ✗ → 1/2
    np.testing.assert_allclose(m["img2txt_recall@1"], 1 / 2)


def test_retrieval_device_norm_matches_host_pp(tiny):
    """retrieval with device_norm (uint8 ship + on-device vgg normalize)
    must produce identical recalls to host-side vgg_value_range pp."""
    from openvision_tpu.evaluators import retrieval

    model, params = tiny
    mesh = create_mesh(data=8)
    images = np.random.randint(0, 255, (6, 32, 32, 3), np.uint8)
    caps = np.array(["a cat", "a dog", "a bird", "a fish", "a horse", "a cow"])
    src = pipe.DictSource({"image": images, "captions": caps})
    common = dict(pp_txt=_eval_pp_txt(), batch_size=8, source=src)
    ev_host = retrieval.Evaluator(
        model, mesh, pp_img="|vgg_value_range", **common)
    ev_dev = retrieval.Evaluator(
        model, mesh, pp_img="", device_norm="vgg", **common)
    assert dict(ev_host.run({"params": params})) == dict(
        ev_dev.run({"params": params}))
