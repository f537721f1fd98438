"""Image preprocessing ops (numpy + PIL).

Capability parity with reference src/transforms/ops_image.py: decode, resize,
resize_small, central_crop, random_crop, inception_crop, flip_lr,
vgg_value_range, value-range handling, SimCLR color jitter + grayscale.
Randomness comes from the per-record np.random.Generator, so pipelines are
deterministic given a seed (unlike the reference's tf.data graph RNG).
"""

from __future__ import annotations

import io

import numpy as np

from openvision_tpu.data.pp import inkey_outkey, pp_op

# ImageNet mean/std in 0..255 units (reference ops_image.py vgg_value_range).
VGG_MEAN = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
VGG_STD = np.array([0.229, 0.224, 0.225], np.float32) * 255.0


def _to_image_array(x) -> np.ndarray:
    """Decodes bytes to HWC uint8 if needed; passes arrays through."""
    if isinstance(x, (bytes, bytearray, np.bytes_)):
        from PIL import Image

        img = Image.open(io.BytesIO(x))
        return np.asarray(img.convert("RGB"))
    return np.asarray(x)


def _resize(image: np.ndarray, h: int, w: int, method: str = "bilinear",
            antialias: bool = True) -> np.ndarray:
    from PIL import Image

    resample = {
        "bilinear": Image.BILINEAR,
        "bicubic": Image.BICUBIC,
        "nearest": Image.NEAREST,
        "lanczos": Image.LANCZOS,
        "area": Image.BOX,
    }[method]
    dtype = image.dtype
    arr = image
    if arr.dtype != np.uint8:
        pil = Image.fromarray(arr.astype(np.float32), mode="F") if arr.ndim == 2 else None
        # PIL float multi-channel unsupported; resize per channel.
        if arr.ndim == 3:
            chans = [
                np.asarray(
                    Image.fromarray(arr[..., c].astype(np.float32), mode="F").resize(
                        (w, h), resample
                    )
                )
                for c in range(arr.shape[-1])
            ]
            return np.stack(chans, axis=-1).astype(dtype)
        return np.asarray(pil.resize((w, h), resample)).astype(dtype)
    out = Image.fromarray(arr).resize((w, h), resample)
    return np.asarray(out)


@pp_op("decode")
@inkey_outkey(indefault="image", outdefault="image")
def get_decode(channels=3):
    def op(x, rng):
        return _to_image_array(x)

    return op


@pp_op("resize")
@inkey_outkey(indefault="image", outdefault="image")
def get_resize(size, method="bilinear", antialias=True):
    size = (size, size) if isinstance(size, int) else tuple(size)

    def op(image, rng):
        image = _to_image_array(image)
        return _resize(image, size[0], size[1], method, antialias)

    return op


@pp_op("resize_small")
@inkey_outkey(indefault="image", outdefault="image")
def get_resize_small(smaller_size, method="bilinear", antialias=True):
    def op(image, rng):
        image = _to_image_array(image)
        h, w = image.shape[:2]
        ratio = smaller_size / min(h, w)
        nh, nw = round(h * ratio), round(w * ratio)
        return _resize(image, nh, nw, method, antialias)

    return op


@pp_op("central_crop")
@inkey_outkey(indefault="image", outdefault="image")
def get_central_crop(crop_size):
    ch, cw = (crop_size, crop_size) if isinstance(crop_size, int) else crop_size

    def op(image, rng):
        image = _to_image_array(image)
        h, w = image.shape[:2]
        top, left = (h - ch) // 2, (w - cw) // 2
        return image[top : top + ch, left : left + cw]

    return op


@pp_op("random_crop")
@inkey_outkey(indefault="image", outdefault="image")
def get_random_crop(crop_size):
    ch, cw = (crop_size, crop_size) if isinstance(crop_size, int) else crop_size

    def op(image, rng):
        image = _to_image_array(image)
        h, w = image.shape[:2]
        top = int(rng.integers(0, h - ch + 1))
        left = int(rng.integers(0, w - cw + 1))
        return image[top : top + ch, left : left + cw]

    return op


def _sample_inception_box(rng, h, w, area_min, area_max=100, min_aspect=3 / 4,
                          max_aspect=4 / 3, max_attempts=10):
    area = h * w
    for _ in range(max_attempts):
        target_area = rng.uniform(area_min / 100, area_max / 100) * area
        aspect = np.exp(rng.uniform(np.log(min_aspect), np.log(max_aspect)))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if ch <= h and cw <= w:
            top = int(rng.integers(0, h - ch + 1))
            left = int(rng.integers(0, w - cw + 1))
            return top, left, ch, cw
    # fallback: centered square crop
    s = min(h, w)
    return (h - s) // 2, (w - s) // 2, s, s


@pp_op("inception_crop")
@inkey_outkey(indefault="image", outdefault="image")
def get_inception_crop(size=None, area_min=5, area_max=100, method="bilinear",
                       antialias=True):
    def op(image, rng):
        image = _to_image_array(image)
        h, w = image.shape[:2]
        top, left, ch, cw = _sample_inception_box(rng, h, w, area_min, area_max)
        crop = image[top : top + ch, left : left + cw]
        if size:
            crop = _resize(crop, size, size, method, antialias)
        return crop

    return op


@pp_op("decode_jpeg_and_inception_crop")
@inkey_outkey(indefault="image", outdefault="image")
def get_decode_jpeg_and_inception_crop(size=None, area_min=5, area_max=100,
                                       method="bilinear", antialias=True):
    inner = get_inception_crop.__wrapped__(size, area_min, area_max, method, antialias)

    def op(data_bytes, rng):
        return inner(_to_image_array(data_bytes), rng)

    return op


@pp_op("flip_lr")
@inkey_outkey(indefault="image", outdefault="image")
def get_flip_lr():
    def op(image, rng):
        if rng.random() < 0.5:
            return image[:, ::-1]
        return image

    return op


@pp_op("vgg_value_range")
@inkey_outkey(indefault="image", outdefault="image")
def get_vgg_value_range():
    def op(image, rng):
        image = np.asarray(image, np.float32)
        return (image - VGG_MEAN) / VGG_STD

    return op


def _rgb_to_gray(image: np.ndarray) -> np.ndarray:
    gray = image @ np.array([0.2989, 0.587, 0.114], np.float32)
    return np.repeat(gray[..., None], 3, axis=-1)


def _adjust_brightness(img, factor):
    return img * factor


def _adjust_contrast(img, factor):
    mean = _rgb_to_gray(img).mean()
    return (img - mean) * factor + mean


def _adjust_saturation(img, factor):
    gray = _rgb_to_gray(img)
    return gray + (img - gray) * factor


def _adjust_hue(img, delta):
    # cheap hue rotation in YIQ space (delta in turns, like tf's fraction)
    theta = delta * 2 * np.pi
    u, w_ = np.cos(theta), np.sin(theta)
    t_yiq = np.array(
        [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]],
        np.float32,
    )
    t_rgb = np.linalg.inv(t_yiq)
    rot = np.array([[1, 0, 0], [0, u, -w_], [0, w_, u]], np.float32)
    m = t_rgb @ rot @ t_yiq
    return img @ m.T


@pp_op("simclr_jitter_gray")
@inkey_outkey(indefault="image", outdefault="image")
def get_simclr_jitter_gray(jitter_strength=0.4, p_jitter=0.8, p_gray=0.2):
    """SimCLR-style random color jitter + random grayscale (uint8 in/out)."""
    b = 0.8 * jitter_strength
    c = 0.8 * jitter_strength
    s = 0.8 * jitter_strength
    hu = 0.2 * jitter_strength

    def op(image, rng):
        img = np.asarray(image, np.float32)
        if rng.random() < p_jitter:
            fns = [
                lambda x: _adjust_brightness(x, 1 + rng.uniform(-b, b)),
                lambda x: _adjust_contrast(x, 1 + rng.uniform(-c, c)),
                lambda x: _adjust_saturation(x, 1 + rng.uniform(-s, s)),
                lambda x: _adjust_hue(x, rng.uniform(-hu, hu)),
            ]
            for i in rng.permutation(4):
                img = np.clip(fns[i](img), 0, 255)
        if rng.random() < p_gray:
            img = _rgb_to_gray(img)
        return img.astype(image.dtype if hasattr(image, "dtype") else np.uint8)

    return op
