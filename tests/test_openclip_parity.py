"""Numeric parity: JAX towers vs an OpenCLIP torch model via weight convert.

Builds a tiny randomly-initialized OpenCLIP CLIP (using the vendored
open_clip package in the read-only reference checkout, skipped when absent),
converts its state_dict into openvision_tpu params with
convert.openclip.openclip_to_jax, and checks that image/text encodes match
the torch forward path hand-unrolled exactly as the reference's local tools
do (ov-zero-shot-test.py:103-155): conv1 → cls+posemb → ln_pre → transformer
→ mean(patch tokens) → ln_post → proj, and token+pos → transformer →
ln_final → last token → proj.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/src/convert_upload"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "open_clip")):
    pytest.skip("vendored open_clip not available", allow_module_level=True)
sys.path.insert(0, REF)

# torchvision isn't installed; open_clip only imports FrozenBatchNorm2d from it.
if "torchvision" not in sys.modules:
    import importlib.machinery
    import types
    from unittest import mock

    class _Stub(types.ModuleType):
        """Permissive module stub: unknown attributes become MagicMocks."""

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            val = mock.MagicMock(name=f"{self.__name__}.{name}")
            setattr(self, name, val)
            return val

    def _stub(name):
        mod = _Stub(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        mod.__path__ = []  # mark as package
        sys.modules[name] = mod
        return mod

    for name in (
        "torchvision",
        "torchvision.ops",
        "torchvision.ops.misc",
        "torchvision.transforms",
        "torchvision.transforms.functional",
        "ftfy",
        "timm",
        "timm.layers",
        "timm.models",
    ):
        if name not in sys.modules:
            _stub(name)
    sys.modules["torchvision.ops.misc"].FrozenBatchNorm2d = torch.nn.BatchNorm2d

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from openvision_tpu.convert.openclip import jax_to_openclip, openclip_to_jax  # noqa: E402
from openvision_tpu.models import text as text_mod  # noqa: E402
from openvision_tpu.models import vit as vit_mod  # noqa: E402
from openvision_tpu.parallel import unbox  # noqa: E402

WIDTH, LAYERS, HEADS = 64, 2, 2
EMBED = 32
VOCAB, CTX = 128, 12
RES, PATCH = 32, 16


@pytest.fixture(scope="module")
def torch_clip():
    from open_clip.model import CLIP, CLIPTextCfg, CLIPVisionCfg

    torch.manual_seed(0)
    model = CLIP(
        embed_dim=EMBED,
        vision_cfg=CLIPVisionCfg(
            layers=LAYERS, width=WIDTH, head_width=WIDTH // HEADS,
            patch_size=PATCH, image_size=RES, pool_type="avg",
            final_ln_after_pool=True, no_ln_pre=True,
        ),
        text_cfg=CLIPTextCfg(
            context_length=CTX, vocab_size=VOCAB, width=WIDTH, heads=HEADS,
            layers=LAYERS, pool_type="last", no_causal_mask=True,
            act_kwargs={"approximate": "tanh"},
        ),
        quick_gelu=False,
    )
    model.eval()
    # Perturb params away from init so the comparison is meaningful.
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.02 * torch.randn_like(p))
    return model


def _torch_encode_image(model, image):
    """Hand-unrolled open_clip vision forward (ov-zero-shot-test.py:103-126)."""
    v = model.visual
    x = v.conv1(image)
    x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
    cls = v.class_embedding.to(x.dtype) + torch.zeros(
        x.shape[0], 1, x.shape[-1], dtype=x.dtype
    )
    x = torch.cat([cls, x], dim=1)
    x = x + v.positional_embedding.to(x.dtype)
    x = v.transformer(x)
    x = x[:, 1:, :].mean(dim=1)
    x = v.ln_post(x)
    return x @ v.proj


def _torch_encode_text(model, text):
    """Hand-unrolled open_clip text forward (ov-zero-shot-test.py:129-155)."""
    x = model.token_embedding(text)
    x = x + model.positional_embedding[: x.shape[1]]
    x = model.transformer(x)
    x = model.ln_final(x)
    x = x[:, -1]
    return x @ model.text_projection


def test_vision_tower_parity(torch_clip):
    sd = {k: v.detach().numpy() for k, v in torch_clip.state_dict().items()}
    params = openclip_to_jax(sd, num_heads_vision=HEADS, num_heads_text=HEADS)

    model = vit_mod.ViT(
        num_classes=EMBED, patch_size=(PATCH, PATCH), width=WIDTH, depth=LAYERS,
        mlp_dim=WIDTH * 4, num_heads=HEADS, posemb="learn", pool_type="gap",
        emb_head_bias=False, output_tokens=False,
    )
    rng = np.random.RandomState(0)
    img = rng.randn(2, RES, RES, 3).astype(np.float32)

    out_jax = model.apply({"params": params["img"]}, jnp.asarray(img))
    out_torch = (
        _torch_encode_image(torch_clip, torch.tensor(img).permute(0, 3, 1, 2))
        .detach()
        .numpy()
    )
    cos = np.sum(out_jax * out_torch, -1) / (
        np.linalg.norm(out_jax, axis=-1) * np.linalg.norm(out_torch, axis=-1)
    )
    np.testing.assert_allclose(np.asarray(out_jax), out_torch, atol=2e-4, rtol=1e-3)
    assert np.all(cos > 1 - 1e-5)


def test_text_tower_parity(torch_clip):
    sd = {k: v.detach().numpy() for k, v in torch_clip.state_dict().items()}
    params = openclip_to_jax(sd, num_heads_vision=HEADS, num_heads_text=HEADS)

    model = text_mod.TextTransformer(
        num_classes=EMBED, width=WIDTH, depth=LAYERS, mlp_dim=WIDTH * 4,
        num_heads=HEADS, vocab_size=VOCAB, posemb="learn", pool_type="last",
        causal=False, output_tokens=False,
    )
    rng = np.random.RandomState(1)
    tokens = rng.randint(0, VOCAB, (2, CTX)).astype(np.int32)

    out_jax = model.apply({"params": params["txt"]}, jnp.asarray(tokens))
    out_torch = (
        _torch_encode_text(torch_clip, torch.tensor(tokens).long())
        .detach()
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(out_jax), out_torch, atol=2e-4, rtol=1e-3)


def test_roundtrip_jax_openclip_jax(torch_clip):
    sd = {k: v.detach().numpy() for k, v in torch_clip.state_dict().items()}
    params = openclip_to_jax(sd, num_heads_vision=HEADS, num_heads_text=HEADS)
    sd2 = jax_to_openclip(params)
    missing = set(sd) - set(sd2)
    assert not missing, missing
    for k in sd2:
        np.testing.assert_allclose(sd2[k], sd[k], atol=1e-6, err_msg=k)
