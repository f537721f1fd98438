"""Differentiable JAX image augmentations for the interpretability tools.

JAX equivalents of the torch/kornia augmentation stacks the reference tools
use (kornia RandomAffine in ov-gradient-ascent.py:374; Tile/Jitter/ColorJitter
/GaussianNoise in cliptoolsoptimized.py:1333-1597). Everything is pure and
jittable; randomness comes from explicit PRNG keys.
Images are (B, H, W, C) float.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _affine_grid(h: int, w: int, angle, tx, ty):
    """Sampling coordinates for rotation by `angle` (rad) + translation."""
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    y0, x0 = yy - cy, xx - cx
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    src_y = cos * y0 + sin * x0 + cy - ty * h
    src_x = -sin * y0 + cos * x0 + cx - tx * w
    return src_y, src_x


def _sample_bilinear(img: jax.Array, src_y, src_x) -> jax.Array:
    """Bilinear sampling of (H, W, C) at fractional coords, edge-clamped."""
    h, w, _ = img.shape
    y0 = jnp.clip(jnp.floor(src_y).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(src_x).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(src_y - y0, 0.0, 1.0)[..., None]
    wx = jnp.clip(src_x - x0, 0.0, 1.0)[..., None]
    p00, p01 = img[y0, x0], img[y0, x1]
    p10, p11 = img[y1, x0], img[y1, x1]
    return (
        p00 * (1 - wy) * (1 - wx)
        + p01 * (1 - wy) * wx
        + p10 * wy * (1 - wx)
        + p11 * wy * wx
    )


def random_affine(
    rng: jax.Array,
    images: jax.Array,
    *,
    degrees: float = 10.0,
    translate: float = 0.1,
    p: float = 0.8,
) -> jax.Array:
    """Per-sample random rotation+translation, applied with probability p."""
    b, h, w, _ = images.shape
    k_ang, k_tx, k_ty, k_p = jax.random.split(rng, 4)
    max_rad = jnp.deg2rad(degrees)
    angles = jax.random.uniform(k_ang, (b,), minval=-max_rad, maxval=max_rad)
    txs = jax.random.uniform(k_tx, (b,), minval=-translate, maxval=translate)
    tys = jax.random.uniform(k_ty, (b,), minval=-translate, maxval=translate)
    apply = jax.random.bernoulli(k_p, p, (b,))

    def one(img, angle, tx, ty, on):
        src_y, src_x = _affine_grid(h, w, angle, tx, ty)
        warped = _sample_bilinear(img, src_y, src_x)
        return jnp.where(on, warped, img)

    return jax.vmap(one)(images, angles, txs, tys, apply)


def pixel_jitter(rng: jax.Array, images: jax.Array, lim: int = 8) -> jax.Array:
    """Random integer translation (the classic feature-viz 'Jitter')."""
    b, h, w, _ = images.shape
    shifts = jax.random.randint(rng, (b, 2), -lim, lim + 1)

    def one(img, sh):
        return jnp.roll(img, shift=(sh[0], sh[1]), axis=(0, 1))

    return jax.vmap(one)(images, shifts)


def color_jitter(
    rng: jax.Array, images: jax.Array, brightness: float = 0.1, contrast: float = 0.1
) -> jax.Array:
    b = images.shape[0]
    kb, kc = jax.random.split(rng)
    bf = 1 + jax.random.uniform(kb, (b, 1, 1, 1), minval=-brightness, maxval=brightness)
    cf = 1 + jax.random.uniform(kc, (b, 1, 1, 1), minval=-contrast, maxval=contrast)
    mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
    return (images * bf - mean) * cf + mean


def gaussian_noise(rng: jax.Array, images: jax.Array, std: float = 0.01) -> jax.Array:
    return images + std * jax.random.normal(rng, images.shape)


def total_variation(images: jax.Array) -> jax.Array:
    """Isotropic TV penalty (cliptoolsoptimized.py:840)."""
    dy = jnp.abs(images[:, 1:] - images[:, :-1]).mean()
    dx = jnp.abs(images[:, :, 1:] - images[:, :, :-1]).mean()
    return dx + dy


# ---------------------------------------------------------------------------
# cliptools aug-stack parity: Tile / Zoom / Centering / Flip / RepeatBatch
# (reference cliptoolsoptimized.py:1333-1597), as pure jittable functions.
# ---------------------------------------------------------------------------


def tile(images: jax.Array, rep: int) -> jax.Array:
    """Tiles each image rep x rep (reference Tile, :1333)."""
    b, h, w, c = images.shape
    x = images[:, None, :, None, :, :]
    x = jnp.broadcast_to(x, (b, rep, h, rep, w, c))
    return x.reshape(b, rep * h, rep * w, c)


def zoom(images: jax.Array, out_size: int) -> jax.Array:
    """Bilinear upsample to (out_size, out_size) (reference Zoom, :1640)."""
    b, _, _, c = images.shape
    return jax.image.resize(
        images, (b, out_size, out_size, c), method="bilinear"
    )


def centering(rng: jax.Array, images: jax.Array, size: int, std: float) -> jax.Array:
    """Center crop of `size` with a random ±std offset (reference Centering).

    The offset is shared across the batch (matching the reference) so the
    output shape stays static under jit.
    """
    b, h, w, _ = images.shape
    pert = (jax.random.uniform(rng, (2,)) * 2.0 - 1.0) * std
    y = jnp.clip(pert[0] + h // 2 - size // 2, 0, h - size).astype(jnp.int32)
    x = jnp.clip(pert[1] + w // 2 - size // 2, 0, w - size).astype(jnp.int32)
    return jax.lax.dynamic_slice(
        images, (0, y, x, 0), (b, size, size, images.shape[-1])
    )


def flip(rng: jax.Array, images: jax.Array, p: float = 0.5) -> jax.Array:
    """Horizontal flip of the whole batch with probability p (reference Flip)."""
    do = jax.random.bernoulli(rng, p)
    return jnp.where(do, images[:, :, ::-1, :], images)


def repeat_batch(images: jax.Array, repeat: int) -> jax.Array:
    """Repeats the batch `repeat` times (reference RepeatBatch, :1672)."""
    return jnp.tile(images, (repeat, 1, 1, 1))


def color_jitter_affine(rng: jax.Array, images: jax.Array, mean: float = 1.0,
                        std: float = 1.0) -> jax.Array:
    """(img - m) / s with per-sample random m and log-uniform s — the
    reference's feature-viz ColorJitter (:1369), distinct from the photometric
    color_jitter above."""
    b = images.shape[0]
    km, ks = jax.random.split(rng)
    m = (jax.random.uniform(km, (b, 1, 1, 3)) - 0.5) * 2.0 * mean
    s = jnp.exp((jax.random.uniform(ks, (b, 1, 1, 3)) - 0.5) * 2.0 * std)
    return (images - m) / s


# ---------------------------------------------------------------------------
# Feature-viz loss zoo (reference LossArray members, :656-1332). The BN-
# matching losses target CNN backbones; the ViT-applicable analogues here are
# activation-norm and batch-diversity regularizers.
# ---------------------------------------------------------------------------


def activation_norm_loss(acts: jax.Array) -> jax.Array:
    """Mean squared activation magnitude (reference activation-norm losses,
    :908-1000) — penalizes runaway feature amplitudes during image opt."""
    return jnp.mean(acts.astype(jnp.float32) ** 2)


def diversity_loss(embeds: jax.Array) -> jax.Array:
    """Negative mean pairwise cosine distance across the batch — encourages
    the repeated-batch copies to explore distinct optima (reference batch-
    diversity regularizer)."""
    z = embeds / (jnp.linalg.norm(embeds, axis=-1, keepdims=True) + 1e-8)
    sim = z @ z.T
    b = sim.shape[0]
    off_diag = (jnp.sum(sim) - jnp.trace(sim)) / (b * (b - 1) + 1e-8)
    return off_diag
