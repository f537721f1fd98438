"""AutoAugment policy ops, reference-parity randaug, plain color_jitter,
and mixup wiring (VERDICT r1 #6; reference autoaugment.py / ops_image.py:344 /
mixup.py:29)."""

import numpy as np
import pytest

from openvision_tpu.data import ops_autoaugment as aa
from openvision_tpu.data.pp import build_pp_fn, import_pp_modules

import_pp_modules()


def _img(seed=0, h=32, w=32):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), np.uint8)


# ---- primitive golden values ----


def test_posterize_zeroes_low_bits():
    img = np.full((4, 4, 3), 0b10110111, np.uint8)
    out = aa.posterize(img, 3)
    assert (out == 0b10110000).all()
    assert (aa.posterize(img, 0) == img).all()


def test_solarize_threshold():
    img = np.array([[[100, 200, 127]]], np.uint8)
    out = aa.solarize(img, 128)
    assert out.tolist() == [[[100, 55, 127]]]


def test_solarize_add_only_below_threshold():
    img = np.array([[[100, 200, 250]]], np.uint8)
    out = aa.solarize_add(img, addition=60, threshold=128)
    assert out.tolist() == [[[160, 200, 250]]]
    out2 = aa.solarize_add(np.array([[[240]]], np.uint8), addition=60)
    assert out2.tolist() == [[[240]]]


def test_invert():
    assert (aa.invert(np.zeros((2, 2, 3), np.uint8)) == 255).all()


def test_translate_fills_with_replace():
    img = np.zeros((8, 8, 3), np.uint8)
    # positive pixels shifts content left (ref :262 "PIL translate"):
    # fill appears on the right edge
    out = aa.translate_x(img, 4, replace=(128, 128, 128))
    assert (out[:, -4:] == 128).all() and (out[:, :4] == 0).all()


def test_cutout_patch():
    rng = np.random.default_rng(0)
    img = np.full((16, 16, 3), 200, np.uint8)
    out = aa.cutout(img, 4, rng, replace=(0, 0, 0))
    n_zero = (out == 0).all(-1).sum()
    assert 0 < n_zero <= 64  # clipped at borders


def test_level_args_ranges():
    rng = np.random.default_rng(0)
    kw = dict(increase=False, cutout_const=100, translate_const=250)
    assert aa.level_args("Equalize", 5, rng, **kw) == ()
    (deg,) = aa.level_args("Rotate", 10, rng, **kw)
    assert abs(deg) == 30.0
    assert aa.level_args("Posterize", 10, rng, **kw) == (4,)
    assert aa.level_args("Posterize", 10, rng, increase=True,
                         cutout_const=100, translate_const=250) == (0,)
    assert aa.level_args("Solarize", 5, rng, **kw) == (128,)
    (f,) = aa.level_args("Color", 10, rng, **kw)
    assert f == pytest.approx(1.9)
    (px,) = aa.level_args("TranslateX", 10, rng, **kw)
    assert abs(px) == 250.0


# ---- policy application ----


def test_autoaugment_v0_runs_and_is_deterministic():
    fn = build_pp_fn("autoaugment(policy='v0')")
    img = _img()
    a = fn({"image": img.copy()}, np.random.default_rng(7))["image"]
    b = fn({"image": img.copy()}, np.random.default_rng(7))["image"]
    c = fn({"image": img.copy()}, np.random.default_rng(8))["image"]
    assert a.shape == img.shape and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c) or True  # different seed may still collide


def test_autoaugment_test_policy_exact():
    # test policy: TranslateX(p=1, lvl 4) then Equalize(p=1): deterministic
    # up to the translate sign; both ops always fire.
    rng = np.random.default_rng(3)
    img = _img(1)
    out = aa.apply_autoaugment(img, rng, policy="test")
    rng2 = np.random.default_rng(3)
    _ = rng2.integers(0, 1)  # policy pick
    (px,) = aa.level_args("TranslateX", 4, rng2, increase=False,
                          cutout_const=100, translate_const=250)
    _ = rng2.random()  # prob draw for op 1
    expected = aa.translate_x(img, px, replace=aa.GRAY)
    _ = rng2.random()  # prob draw for op 2
    expected = aa.equalize(expected)
    np.testing.assert_array_equal(out, expected)


def test_autoaugment_rejects_unknown_policy():
    with pytest.raises(AssertionError):
        build_pp_fn("autoaugment(policy='v9')")


# ---- randaug (reference-parity) + color_jitter ----


@pytest.mark.parametrize("timm", [False, True])
def test_randaug_parity_args(timm):
    fn = build_pp_fn(f"randaug(num_layers=2, magnitude=9, timm={timm})")
    img = _img(2)
    out = fn({"image": img.copy()}, np.random.default_rng(11))["image"]
    out2 = fn({"image": img.copy()}, np.random.default_rng(11))["image"]
    assert out.shape == img.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out, out2)


def test_color_jitter_plain():
    fn = build_pp_fn("color_jitter(0.4)")
    img = _img(4)
    out = fn({"image": img.copy()}, np.random.default_rng(5))["image"]
    assert out.shape == img.shape and out.dtype == np.uint8
    gray = np.full((8, 8, 3), 128, np.uint8)  # jitter-invariant image
    out_g = fn({"image": gray.copy()}, np.random.default_rng(5))["image"]
    np.testing.assert_allclose(out_g, gray, atol=2)


def test_reference_pp_string_parses_and_runs():
    """A pp string in the reference's training style runs unchanged."""
    s = ("decode|resize(48)|inception_crop(32)|flip_lr"
         "|randaug(2, 9)|autoaugment(policy='v0')|vgg_value_range")
    fn = build_pp_fn(s)
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(_img(9, 64, 64)).save(buf, format="PNG")
    out = fn({"image": buf.getvalue()}, np.random.default_rng(0))["image"]
    assert out.shape == (32, 32, 3) and out.dtype == np.float32


# ---- mixup wiring ----


def test_mixup_transform_in_training_pipeline():
    import jax

    from openvision_tpu.data import pipeline as pipe
    import ml_collections

    cfg = ml_collections.ConfigDict(dict(
        batch_size=8,
        pp='decode(inkey="jpg", outkey="image")|resize(16)|value_range(-1, 1)'
           '|keep("image", "label")',
        data=dict(name="synthetic", num_examples=32, res=24),
        mixup=dict(enabled=True, mixup_alpha=0.8, cutmix_alpha=1.0,
                   switch_prob=0.5, image_key="image", label_key="label",
                   num_classes=4),
    ))
    # synthetic source has no labels — inject via a wrapper source
    src = pipe.SyntheticClipSource(32, 24, 24)

    class Labeled(type(src).__mro__[1]):  # grain.RandomAccessDataSource
        def __len__(self):
            return len(src)

        def __getitem__(self, i):
            d = dict(src[i])
            d["image"] = d.pop("jpg")
            d["label"] = i % 4
            return d

    pp = pipe.build_pp_fn('value_range(-1, 1)|keep("image", "label")')
    loader = pipe.grain.DataLoader(
        data_source=Labeled(),
        sampler=pipe.grain.IndexSampler(
            num_records=32,
            shard_options=pipe.grain.ShardByJaxProcess(drop_remainder=True),
            shuffle=False, num_epochs=1, seed=0),
        operations=[
            pipe.PpTransform(pp),
            pipe.grain.Batch(batch_size=8, drop_remainder=True),
            pipe.MixupCutmixTransform(
                image_key="image", label_key="label", num_classes=4),
        ],
        worker_count=0,
    )
    batch = next(iter(loader))
    assert batch["image"].shape == (8, 24, 24, 3)
    assert batch["label"].shape == (8, 4)  # one-hot soft labels
    np.testing.assert_allclose(batch["label"].sum(-1), 1.0, rtol=1e-5)


def test_training_pipeline_respects_mixup_config():
    from openvision_tpu.data import pipeline as pipe
    import ml_collections

    cfg = ml_collections.ConfigDict(dict(
        batch_size=8,
        pp='decode(inkey="jpg", outkey="image")|value_range(-1, 1)'
           '|keep("image")',
        data=dict(name="synthetic", num_examples=32, res=24),
        mixup=dict(enabled=False),
    ))
    loader, n = pipe.training(cfg)
    assert n == 32
    batch = next(iter(loader))
    assert batch["image"].shape == (8, 24, 24, 3)
