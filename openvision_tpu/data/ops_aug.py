"""Heavy augmentation ops: RandAugment, random erasing, 3-aug, mixup/cutmix.

Capability parity with reference autoaugment.py (RandAugment policy ops),
random_erasing.py, three_aug.py (DeiT-III), and mixup.py (MixupAndCutmix
batch op), implemented in numpy/PIL under the per-record RNG contract.
"""

from __future__ import annotations

import numpy as np

from openvision_tpu.data.pp import inkey_outkey, pp_op

# ---------------------------------------------------------------------------
# RandAugment primitive transforms (PIL-based)
# ---------------------------------------------------------------------------


def _pil(img):
    from PIL import Image

    return Image.fromarray(np.asarray(img, np.uint8))


def _np(img):
    return np.asarray(img)


def _autocontrast(img, _):
    from PIL import ImageOps

    return _np(ImageOps.autocontrast(_pil(img)))


def _equalize(img, _):
    from PIL import ImageOps

    return _np(ImageOps.equalize(_pil(img)))


def _invert(img, _):
    return 255 - np.asarray(img)


def _rotate(img, mag):
    return _np(_pil(img).rotate(mag * 30.0, fillcolor=(128, 128, 128)))


def _posterize(img, mag):
    from PIL import ImageOps

    bits = 8 - int(mag * 4)
    return _np(ImageOps.posterize(_pil(img), max(1, bits)))


def _solarize(img, mag):
    from PIL import ImageOps

    return _np(ImageOps.solarize(_pil(img), int(256 - mag * 256)))


def _solarize_add(img, mag):
    img = np.asarray(img, np.int32)
    add = int(mag * 110)
    out = np.where(img < 128, np.clip(img + add, 0, 255), img)
    return out.astype(np.uint8)


def _enhance(kind):
    def fn(img, mag):
        from PIL import ImageEnhance

        factor = 0.1 + mag * 1.8
        return _np(getattr(ImageEnhance, kind)(_pil(img)).enhance(factor))

    return fn


def _shear(axis):
    def fn(img, mag):
        from PIL import Image

        amount = mag * 0.3
        coeffs = (1, amount, 0, 0, 1, 0) if axis == "x" else (1, 0, 0, amount, 1, 0)
        return _np(
            _pil(img).transform(
                _pil(img).size, Image.AFFINE, coeffs, fillcolor=(128, 128, 128)
            )
        )

    return fn


def _translate(axis):
    def fn(img, mag):
        from PIL import Image

        h, w = np.asarray(img).shape[:2]
        amount = int(mag * 0.45 * (w if axis == "x" else h))
        coeffs = (1, 0, amount, 0, 1, 0) if axis == "x" else (1, 0, 0, 0, 1, amount)
        return _np(
            _pil(img).transform((w, h), Image.AFFINE, coeffs, fillcolor=(128, 128, 128))
        )

    return fn


RANDAUG_OPS = {
    "AutoContrast": _autocontrast,
    "Equalize": _equalize,
    "Invert": _invert,
    "Rotate": _rotate,
    "Posterize": _posterize,
    "Solarize": _solarize,
    "SolarizeAdd": _solarize_add,
    "Color": _enhance("Color"),
    "Contrast": _enhance("Contrast"),
    "Brightness": _enhance("Brightness"),
    "Sharpness": _enhance("Sharpness"),
    "ShearX": _shear("x"),
    "ShearY": _shear("y"),
    "TranslateX": _translate("x"),
    "TranslateY": _translate("y"),
}


@pp_op("randaug")
@inkey_outkey(indefault="image", outdefault="image")
def get_randaug(num_layers: int = 2, magnitude: int = 10,
                increase: bool = True, timm: bool = False):
    """Reference-parity RandAugment (ops_image.py:401, autoaugment.py:720):
    per layer one uniformly-chosen op at the shared magnitude with the
    reference level→arg mappings; `increase=True` uses the monotonic variants;
    `timm=True` adds the 50% skip gate + N(m, 0.5) magnitude jitter."""
    from openvision_tpu.data.ops_autoaugment import randaug_layers

    def op(image, rng):
        return randaug_layers(
            image, rng, num_layers=num_layers, magnitude=magnitude,
            increase=increase, timm=timm,
        )

    return op


@pp_op("color_jitter")
@inkey_outkey(indefault="image", outdefault="image")
def get_color_jitter(color_jitter=0.4):
    """Plain color jitter (reference ops_image.py:344): random contrast then
    random saturation in [max(0,1-s), 1+s] (brightness is disabled in the
    reference too)."""
    if isinstance(color_jitter, (list, tuple)):
        assert len(color_jitter) == 3
        _, b, c = color_jitter
    else:
        b = c = float(color_jitter)

    def op(image, rng):
        from PIL import ImageEnhance

        img = _pil(image)
        img = ImageEnhance.Contrast(img).enhance(
            rng.uniform(max(0.0, 1 - b), 1 + b))
        img = ImageEnhance.Color(img).enhance(
            rng.uniform(max(0.0, 1 - c), 1 + c))
        return _np(img)

    return op


@pp_op("random_erasing")
@inkey_outkey(indefault="image", outdefault="image")
def get_random_erasing(probability=0.25, min_area=0.02, max_area=1 / 3,
                       min_aspect=0.3):
    def op(image, rng):
        img = np.array(image)
        if rng.random() > probability:
            return img
        h, w = img.shape[:2]
        area = h * w
        for _ in range(10):
            target = rng.uniform(min_area, max_area) * area
            aspect = np.exp(rng.uniform(np.log(min_aspect), np.log(1 / min_aspect)))
            eh = int(round(np.sqrt(target * aspect)))
            ew = int(round(np.sqrt(target / aspect)))
            if eh < h and ew < w:
                top = int(rng.integers(0, h - eh))
                left = int(rng.integers(0, w - ew))
                patch_shape = (eh, ew) + img.shape[2:]
                img[top : top + eh, left : left + ew] = rng.normal(
                    128, 50, patch_shape
                ).clip(0, 255).astype(img.dtype)
                return img
        return img

    return op


@pp_op("three_aug")
@inkey_outkey(indefault="image", outdefault="image")
def get_three_aug(blur_prob=1.0):
    """DeiT-III 3-augment: pick one of grayscale / solarize / blur."""

    def op(image, rng):
        img = np.asarray(image, np.uint8)
        choice = int(rng.integers(0, 3))
        if choice == 0:
            from openvision_tpu.data.ops_image import _rgb_to_gray

            return _rgb_to_gray(img.astype(np.float32)).astype(np.uint8)
        if choice == 1:
            return _solarize(img, 0.5)
        from PIL import ImageFilter

        radius = rng.uniform(0.1, 2.0)
        return _np(_pil(img).filter(ImageFilter.GaussianBlur(radius)))

    return op


@pp_op("color_jitter_timm")
@inkey_outkey(indefault="image", outdefault="image")
def get_color_jitter_timm(strength=0.4):
    def op(image, rng):
        from PIL import ImageEnhance

        img = _pil(image)
        for kind in rng.permutation(["Brightness", "Contrast", "Color"]):
            factor = 1 + rng.uniform(-strength, strength)
            img = getattr(ImageEnhance, str(kind))(img).enhance(factor)
        return _np(img)

    return op


# ---------------------------------------------------------------------------
# Batch-level mixup / cutmix (applied after batching, like cpu_mixup)
# ---------------------------------------------------------------------------


def mixup_cutmix(
    batch_images: np.ndarray,
    batch_labels: np.ndarray,
    rng: np.random.Generator,
    *,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    switch_prob: float = 0.5,
    num_classes: int | None = None,
):
    """Mixes a batch with its reversal; returns (images, soft_labels).

    Capability parity with reference mixup.py:29 (MixupAndCutmix).
    """
    b = batch_images.shape[0]
    if num_classes is not None and batch_labels.ndim == 1:
        one_hot = np.zeros((b, num_classes), np.float32)
        one_hot[np.arange(b), batch_labels] = 1.0
        batch_labels = one_hot

    use_cutmix = rng.random() < switch_prob
    alpha = cutmix_alpha if use_cutmix else mixup_alpha
    lam = float(rng.beta(alpha, alpha))

    flipped_img = batch_images[::-1]
    flipped_lab = batch_labels[::-1]
    if use_cutmix:
        h, w = batch_images.shape[1:3]
        cut = np.sqrt(1 - lam)
        ch, cw = int(h * cut), int(w * cut)
        cy = int(rng.integers(0, h))
        cx = int(rng.integers(0, w))
        y0, y1 = np.clip([cy - ch // 2, cy + ch // 2], 0, h)
        x0, x1 = np.clip([cx - cw // 2, cx + cw // 2], 0, w)
        out = np.array(batch_images)
        out[:, y0:y1, x0:x1] = flipped_img[:, y0:y1, x0:x1]
        lam = 1 - (y1 - y0) * (x1 - x0) / (h * w)
    else:
        out = lam * batch_images.astype(np.float32) + (1 - lam) * flipped_img.astype(
            np.float32
        )
    labels = lam * batch_labels + (1 - lam) * flipped_lab
    return out, labels
