"""Torch-free `.bin` reader (convert/torch_pickle.py; VERDICT r3 #9).

The restricted unpickler must reproduce `torch.load(weights_only=True)`
byte-for-byte on real torch-zip state dicts (all common dtypes,
non-contiguous views, storage offsets), refuse anything that is not a plain
tensor state dict, and keep `tools.load_model` working when torch cannot be
imported at all (torch-less TPU serving VMs).
"""

import builtins
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from openvision_tpu.convert.torch_pickle import load_torch_bin


def _roundtrip(tmp_path, sd):
    path = str(tmp_path / "model.bin")
    torch.save(sd, path)
    return load_torch_bin(path)


def test_all_dtypes_bitexact(tmp_path):
    g = torch.Generator().manual_seed(0)
    sd = {
        "f32": torch.randn(5, 7, generator=g),
        "f16": torch.randn(3, 4, generator=g).half(),
        "bf16": torch.randn(8, 2, generator=g).bfloat16(),
        "f64": torch.randn(2, 2, generator=g).double(),
        "i64": torch.randint(-5, 5, (4, 3), generator=g),
        "i32": torch.randint(0, 9, (6,), generator=g).int(),
        "u8": torch.randint(0, 255, (3, 3), generator=g).byte(),
        "bool": torch.randint(0, 2, (4,), generator=g).bool(),
        "scalar": torch.tensor(2.5),
    }
    out = _roundtrip(tmp_path, sd)
    assert set(out) == set(sd)
    for k, v in sd.items():
        ref = v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
        got = out[k]
        if k == "bf16":
            got = got.astype(np.float32)
        np.testing.assert_array_equal(got, ref, err_msg=k)


def test_noncontiguous_and_shared_storage(tmp_path):
    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    sd = {
        "transposed": base.t(),       # stride (1, 6)
        "sliced": base[1:3, ::2],     # offset + stride
        "full": base,
    }
    out = _roundtrip(tmp_path, sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(out[k], v.numpy(), err_msg=k)


def test_refuses_non_tensor_globals(tmp_path):
    path = str(tmp_path / "evil.bin")
    # torch.save any picklable object; os.system-style globals must be
    # rejected by find_class instead of executing.
    torch.save({"f": np.testing.assert_allclose}, path)
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        load_torch_bin(path)


def test_load_model_without_torch(tmp_path, monkeypatch):
    """End-to-end: export a model dir with torch, reload with torch BLOCKED."""
    import jax
    import jax.numpy as jnp

    from openvision_tpu.convert import export as export_mod
    from openvision_tpu.models import clip as clip_mod
    from openvision_tpu.parallel import unbox
    from openvision_tpu.train import checkpoint as ckpt_lib

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
    monkeypatch.chdir("/root/repo")
    export_mod.export(
        ckpt, out_dir, img="Ti/16", txt="Ti", res=32, out_dim=192,
        context_length=16, vocab_size=30522,
    )

    # Simulate a torch-less VM: any `import torch` now fails.
    import sys

    real_import = builtins.__import__

    def no_torch(name, *args, **kwargs):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch masked out for this test")
        return real_import(name, *args, **kwargs)

    monkeypatch.delitem(sys.modules, "torch", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_torch)

    from openvision_tpu.tools.model_io import load_model

    m = load_model(out_dir)
    z = m.encode_image(jnp.ones((1, 32, 32, 3)) * 0.1)
    assert z.shape == (1, 192)
    monkeypatch.setattr(builtins, "__import__", real_import)
    zimg, _, _ = model.apply(
        {"params": params}, jnp.ones((1, 32, 32, 3)) * 0.1, None
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(zimg), atol=1e-4)


def test_zip_without_data_pkl_raises_unpickling_error(tmp_path):
    """ADVICE r4: a valid zip that is not a torch archive must raise
    pickle.UnpicklingError (not a bare StopIteration) so callers get a
    clear 'not a torch-zip state dict' message."""
    import zipfile

    p = tmp_path / "mislabeled.bin"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("readme.txt", "not a torch archive")
    with pytest.raises(pickle.UnpicklingError, match="data.pkl"):
        load_torch_bin(str(p))
