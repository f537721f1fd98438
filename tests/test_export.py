import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from openvision_tpu.convert import export as export_mod
from openvision_tpu.models import clip as clip_mod
from openvision_tpu.parallel import unbox
from openvision_tpu.train import checkpoint as ckpt_lib


def test_export_roundtrip(tmp_path, monkeypatch):
    # Ti-variant towers so the synthesized config tables apply.
    model = clip_mod.Model(
        out_dim=(192, 192),
        image=dict(variant="Ti/16", posemb="sincos2d", pool_type="gap",
                   output_tokens=True, emb_head_bias=False),
        text=dict(variant="Ti", pool_type="last", vocab_size=30522,
                  output_tokens=True),
        text_decoder="none",
        temperature_init=1 / 0.07,
    )
    image = jnp.zeros((1, 32, 32, 3))
    text = jnp.zeros((1, 16), jnp.int32)
    params = unbox(model.init(jax.random.PRNGKey(0), image, text)["params"])

    ckpt = str(tmp_path / "ckpt.npz")
    ckpt_lib.save_npz(ckpt, {"params": params})

    out_dir = str(tmp_path / "export")
    monkeypatch.chdir("/root/repo")  # for the vocab asset copy
    export_mod.export(
        ckpt, out_dir, img="Ti/16", txt="Ti", res=32, out_dim=192,
        context_length=16, vocab_size=30522,
    )
    assert os.path.exists(os.path.join(out_dir, "open_clip_pytorch_model.bin"))
    assert os.path.exists(os.path.join(out_dir, "open_clip_config.json"))
    assert os.path.exists(os.path.join(out_dir, "vocab.txt"))

    # the exported dir loads through the tools' inference core
    from openvision_tpu.tools.model_io import load_model

    m = load_model(out_dir)
    z = m.encode_image(jnp.ones((1, 32, 32, 3)) * 0.1)
    assert z.shape == (1, 192)

    # numeric parity: exported-and-reloaded vision tower == original tower
    zimg_orig, _, _ = model.apply({"params": params}, jnp.ones((1, 32, 32, 3)) * 0.1, None)
    np.testing.assert_allclose(np.asarray(z), np.asarray(zimg_orig), atol=1e-4)
