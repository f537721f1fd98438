"""Feature-activation-maximization visualization — jitted JAX optimization.

Capability parity with reference ov-feature-visualization.py +
cliptoolsoptimized.py: optimizes an input image to maximize a chosen GELU
feature activation of a chosen encoder layer (the ClipOVGeLUHook target),
with a total-variation penalty, differentiable pre-augmentations
(repeat-batch, color jitter, gaussian noise, pixel jitter) and post-step
clipping — Adamax lr=1.0 with cosine annealing for 400 steps, all inside one
jitted update. Activations are captured with flax `sow` intermediates instead
of torch forward hooks.

Saves `<out>/<model>_L{layer}_F{feature}.png`.

Usage:
  python -m openvision_tpu.tools.feature_viz --use_model <dir> \
      [--layer 0-23] [--feature 5,6,8] [--size 224] [--out ovFeatureViz]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openvision_tpu.tools import augment
from openvision_tpu.tools.model_io import load_model

STEPS = 400
LR = 1.0
TV_WEIGHT = 0.0005
REPEAT = 8


def parse_range(spec: str, upper: int) -> list[int]:
    """Parses "0-23" / "5,6,8" / "7" into a list of ints."""
    out: list[int] = []
    for part in spec.split(","):
        part = part.strip()
        if "-" in part:
            lo, hi = part.split("-")
            out.extend(range(int(lo), int(hi) + 1))
        elif part:
            out.append(int(part))
    return [i for i in out if 0 <= i < upper]


def new_init(rng, size: int) -> jax.Array:
    """Small random image init (reference cliptoolsoptimized.py:136)."""
    return 0.06 * jax.random.normal(rng, (1, size, size, 3)) + 0.5


def build_step(model, layer: int, feature: int):
    vision = model.vision
    params = model.params["img"]
    optimizer = optax.adamax(
        optax.cosine_decay_schedule(LR, STEPS)
    )

    def loss_fn(image01, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        imgs = jnp.tile(image01, (REPEAT, 1, 1, 1))
        imgs = augment.color_jitter(k1, imgs, brightness=0.1, contrast=0.1)
        imgs = augment.gaussian_noise(k2, imgs, std=0.01)
        imgs = augment.pixel_jitter(k3, imgs, lim=max(1, image01.shape[1] // 28))
        norm = (imgs - jnp.asarray(model.mean)) / jnp.asarray(model.std)

        _, mods = vision.apply(
            {"params": params}, norm, mutable=["intermediates"]
        )
        acts = mods["intermediates"]["Transformer"][f"encoderblock_{layer}"][
            "MlpBlock_0"
        ]["gelu"][0]
        target = acts[..., feature]
        tv = augment.total_variation(imgs)
        return -jnp.mean(target) + TV_WEIGHT * tv

    @jax.jit
    def step(image01, opt_state, rng):
        loss, grads = jax.value_and_grad(loss_fn)(image01, rng)
        updates, opt_state = optimizer.update(grads, opt_state, image01)
        image01 = optax.apply_updates(image01, updates)
        image01 = jnp.clip(image01, 0.0, 1.0)
        return image01, opt_state, loss

    return step, optimizer


def visualize(model, layer: int, feature: int, size: int, rng) -> np.ndarray:
    step, optimizer = build_step(model, layer, feature)
    rng, k_init = jax.random.split(rng)
    image01 = new_init(k_init, size)
    opt_state = optimizer.init(image01)
    for i in range(STEPS):
        rng, k = jax.random.split(rng)
        image01, opt_state, loss = step(image01, opt_state, k)
        if i % 100 == 0:
            print(f"  L{layer} F{feature} step {i}: act-loss {float(loss):.4f}")
    return np.asarray(image01[0])


def save_image(img01: np.ndarray, path: str):
    from PIL import Image

    arr = np.clip(img01 * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--use_model", required=True)
    parser.add_argument("--layer", default="0")
    parser.add_argument("--feature", default="0")
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--out", default="ovFeatureViz")
    parser.add_argument("--deterministic", action="store_true")
    args = parser.parse_args(argv)

    model = load_model(args.use_model)
    model_name = os.path.basename(os.path.normpath(args.use_model))
    os.makedirs(args.out, exist_ok=True)

    depth = model.vision.depth
    mlp_dim = model.vision.mlp_dim or model.vision.width * 4
    rng = jax.random.PRNGKey(6247423 if args.deterministic else 0)

    for layer in parse_range(args.layer, depth):
        for feature in parse_range(args.feature, mlp_dim):
            rng, k = jax.random.split(rng)
            img = visualize(model, layer, feature, args.size, k)
            path = os.path.join(args.out, f"{model_name}_L{layer}_F{feature}.png")
            save_image(img, path)
            print(f"saved {path}")


if __name__ == "__main__":
    main()
