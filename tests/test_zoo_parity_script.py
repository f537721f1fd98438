"""The live zoo-parity gate's SCRIPT BODY runs in-suite (VERDICT r4 Weak #2).

`scripts/zoo_parity.py` is the network-gated Model-Zoo north-star check.
Its hf-hub download can't run offline, but everything after the download —
torch-free load, testcat preprocessing, JAX vs independent torch open_clip
logits, cosine + bit-faithful top-1 asserts — can, by pointing `--model` at
a locally exported model dir (the same path a downloaded snapshot takes).
This keeps `main()` from rotting: any drift in load_model/export/open_clip
interop fails here, in the default suite.
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from openvision_tpu.convert import export as export_mod
from openvision_tpu.models import clip as clip_mod
from openvision_tpu.parallel import unbox
from openvision_tpu.train import checkpoint as ckpt_lib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "zoo_parity", os.path.join(REPO, "scripts", "zoo_parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_zoo_parity_main_on_local_export(tmp_path, monkeypatch, capsys):
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
    monkeypatch.chdir(REPO)  # vocab asset copy + testcat/ default folder
    export_mod.export(
        ckpt, out_dir, img="Ti/16", txt="Ti", res=32, out_dim=192,
        context_length=16, vocab_size=30522,
    )

    zp = _load_script()
    monkeypatch.setattr(
        sys, "argv", ["zoo_parity.py", "--model", out_dir]
    )
    zp.main()  # asserts cosine >= 1-1e-3 and bit-faithful top-1 inside

    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    result = json.loads(out)
    assert result["n_images"] > 0
    assert result["top1_bitfaithful"] is True
    assert result["min_logits_cosine"] >= 1 - 1e-3
