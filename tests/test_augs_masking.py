import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openvision_tpu.data.pp import build_pp_fn, import_pp_modules
from openvision_tpu.models.vit import random_token_masking


@pytest.fixture(autouse=True)
def _ops():
    import_pp_modules()


def test_randaug_and_erasing():
    fn = build_pp_fn("randaug(2, 10)|random_erasing(probability=1.0)")
    img = np.random.randint(0, 255, (48, 48, 3), np.uint8)
    out = fn({"image": img}, np.random.default_rng(0))["image"]
    assert out.shape == (48, 48, 3)


def test_three_aug_all_branches():
    fn = build_pp_fn("three_aug")
    img = np.random.randint(0, 255, (32, 32, 3), np.uint8)
    for seed in range(6):
        out = fn({"image": img}, np.random.default_rng(seed))["image"]
        assert out.shape == (32, 32, 3)


def test_color_jitter_timm():
    fn = build_pp_fn("color_jitter_timm(strength=0.4)")
    img = np.random.randint(0, 255, (32, 32, 3), np.uint8)
    out = fn({"image": img}, np.random.default_rng(0))["image"]
    assert out.shape == (32, 32, 3)


def test_mixup_cutmix():
    from openvision_tpu.data.ops_aug import mixup_cutmix

    imgs = np.random.rand(8, 16, 16, 3).astype(np.float32)
    labels = np.random.randint(0, 10, (8,))
    out_img, out_lab = mixup_cutmix(
        imgs, labels, np.random.default_rng(0), num_classes=10
    )
    assert out_img.shape == imgs.shape
    assert out_lab.shape == (8, 10)
    np.testing.assert_allclose(out_lab.sum(axis=1), 1.0, atol=1e-5)


@pytest.mark.parametrize(
    "mode,ratio",
    [("random", 0.75), ("square", 0.75), ("square", 0.5),
     ("per2x2_random_grid", 0.75), ("per2x2_random_grid", 0.5)],
)
def test_token_masking_modes(mode, ratio):
    x = jnp.arange(2 * 196 * 4, dtype=jnp.float32).reshape(2, 196, 4)
    kept, mask, ids_restore = random_token_masking(
        x, ratio, jax.random.PRNGKey(0), mask_mode=mode, height=14, width=14
    )
    len_keep = int(196 * (1 - ratio))
    assert kept.shape == (2, len_keep, 4)
    assert mask.shape == (2, 196)
    np.testing.assert_allclose(np.asarray(mask).sum(axis=1), 196 - len_keep)


def test_square_masking_keeps_contiguous_window():
    x = jnp.arange(1 * 196 * 1, dtype=jnp.float32).reshape(1, 196, 1)
    _, mask, _ = random_token_masking(
        x, 0.75, jax.random.PRNGKey(1), mask_mode="square", height=14, width=14
    )
    keep = 1 - np.asarray(mask).reshape(14, 14)
    ys, xs = np.where(keep)
    # kept region is a full 7x7 rectangle
    assert keep.sum() == 49
    assert ys.max() - ys.min() == 6 and xs.max() - xs.min() == 6


def test_vit_stem_embedding():
    from openvision_tpu.models import vit as vit_mod

    model = vit_mod.ViT(
        num_classes=16, width=64, depth=1, mlp_dim=128, num_heads=2,
        patch_embedding="stem", posemb="learn", pool_type="gap",
        output_tokens=False,
    )
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    assert "stem_0" in params and "embedding" in params
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 16)
