"""End-to-end test of the caption CLI (tools/caption.py, beyond-reference:
the reference trains the CoCa decoder but ships no generation tool)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CFG = ("res=32,img=mu/16,txt_name=Ti,txt_decoder_name=Ti,token_len=16,"
       "output_token_len=8,vocab_size=30522")


@pytest.fixture(scope="module")
def ckpt_and_image(tmp_path_factory):
    from openvision_tpu.configs import openvision as cfg_mod
    from openvision_tpu.parallel import unbox
    from openvision_tpu.train import checkpoint as ckpt_lib
    from openvision_tpu.train import step as step_mod

    d = tmp_path_factory.mktemp("caption")
    config = cfg_mod.get_config(CFG)
    model = step_mod.build_model(config)
    params = unbox(model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16), jnp.int32),
        train=False)["params"])
    npz = os.path.join(d, "ckpt.npz")
    ckpt_lib.save_npz(npz, {"params": params})

    from PIL import Image

    img_path = os.path.join(d, "img.png")
    rs = np.random.RandomState(0)
    Image.fromarray(rs.randint(0, 255, (48, 40, 3), np.uint8)).save(img_path)
    return npz, img_path


def test_caption_cli_end_to_end(ckpt_and_image, capsys):
    from openvision_tpu.tools import caption

    npz, img_path = ckpt_and_image
    caption.main([
        "--checkpoint", npz, "--config", CFG, "--image", img_path,
    ])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and out[0].startswith(img_path + "\t")


def test_caption_greedy_deterministic_sampling_varies(ckpt_and_image):
    from openvision_tpu.configs import openvision as cfg_mod
    from openvision_tpu.tools import caption

    npz, img_path = ckpt_and_image
    config = cfg_mod.get_config(CFG)
    fn, tok = caption.build_captioner(config, npz)
    images = jnp.asarray(np.stack([caption._load_image(img_path, 32)]))

    g1 = np.asarray(fn(images, jax.random.PRNGKey(0), 0.0))
    g2 = np.asarray(fn(images, jax.random.PRNGKey(7), 0.0))
    np.testing.assert_array_equal(g1, g2)  # greedy ignores the rng

    # output_token_len query positions, ids within the head's vocab
    assert g1.shape == (1, 8)
    assert (g1 >= 0).all() and (g1 < 30522).all()

    s1 = np.asarray(fn(images, jax.random.PRNGKey(0), 5.0))
    s2 = np.asarray(fn(images, jax.random.PRNGKey(1), 5.0))
    assert (s1 != s2).any()  # hot sampling varies with the seed

    # eos masking: everything after the first eos is pad
    row = g1[0]
    eos_pos = np.where(row == tok.eos_id)[0]
    if eos_pos.size:
        assert (row[eos_pos[0] + 1:] == tok.pad_id).all()
    assert isinstance(tok.decode(row.tolist()), str)
