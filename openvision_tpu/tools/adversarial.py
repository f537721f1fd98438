"""PGD / adversarial probes on the JAX inference core.

Capability parity with reference cliptoolsoptimized.py:360-438 (`make_pgd`,
`make_target_pgd`, `make_adv`), rebuilt as ONE jitted `lax.fori_loop`
optimization instead of eager per-step backward passes:

- `pgd`: L∞ projected gradient ascent on the zero-shot classification loss
  (signed gradient, step 2/255, eps-ball projection, [0,1] clamp). Untargeted
  maximizes the true-label loss; `targeted=True` minimizes the target-label
  loss (reference make_target_pgd's descent).
- `adv`: the unsigned-gradient variant (reference make_adv, lr=0.1).

The loss is the CLIP zero-shot cross-entropy: cosine(img, text-embeds) ×
logit_scale vs a label index — the exact attack surface of the testcat
typographic set.

Usage:
  python -m openvision_tpu.tools.adversarial --use_model <dir> \
      --image testcat/catcat.png --labels "a cat,a dog,text" \
      [--target "a dog"] [--eps 0.0314] [--iters 10] [--out adv.png]
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from openvision_tpu.tools.model_io import load_model


def _zero_shot_loss(model_apply, params, image01, mean, std, ztxt, scale,
                    label):
    """Cross-entropy of the cosine zero-shot logits at `label`."""
    norm = (image01 - mean) / std
    zimg = model_apply({"params": params}, norm)
    zimg = zimg / (jnp.linalg.norm(zimg, axis=-1, keepdims=True) + 1e-8)
    logits = scale * zimg @ ztxt.T  # (1, n_labels)
    return -jax.nn.log_softmax(logits, axis=-1)[0, label]


@functools.partial(jax.jit, static_argnames=("apply_fn", "iters", "targeted",
                                             "signed"))
def _attack(apply_fn, params, image01, mean, std, ztxt, scale, label, *,
            eps, step_size, iters, targeted, signed):
    sign = -1.0 if targeted else 1.0  # descend on the target's loss

    grad_fn = jax.grad(
        lambda img: _zero_shot_loss(
            apply_fn, params, img, mean, std, ztxt, scale, label)
    )

    def body(_, img):
        g = grad_fn(img)
        g = jnp.sign(g) if signed else g
        adv = img + sign * step_size * g
        perturb = jnp.clip(adv - image01, -eps, eps)
        return jnp.clip(image01 + perturb, 0.0, 1.0)

    return jax.lax.fori_loop(0, iters, body, image01)


def pgd(model, image01, ztxt, label, *, eps=8 / 255, step_size=2 / 255,
        iters=10, targeted=False):
    """L∞ PGD on the zero-shot loss. image01: (1,H,W,3) in [0,1]."""
    return _attack(
        model.vision.apply, model.params["img"], image01,
        jnp.asarray(model.mean), jnp.asarray(model.std),
        ztxt, model.logit_scale, label,
        eps=eps, step_size=step_size, iters=iters, targeted=targeted,
        signed=True,
    )


def adv(model, image01, ztxt, label, *, eps=8 / 255, lr=0.1, iters=10):
    """Unsigned-gradient attack (reference make_adv, :416-438)."""
    return _attack(
        model.vision.apply, model.params["img"], image01,
        jnp.asarray(model.mean), jnp.asarray(model.std),
        ztxt, model.logit_scale, label,
        eps=eps, step_size=lr, iters=iters, targeted=False, signed=False,
    )


def classify(model, image01, ztxt):
    norm = (image01 - jnp.asarray(model.mean)) / jnp.asarray(model.std)
    zimg = model.encode_image(norm)
    logits = model.logit_scale * zimg @ ztxt.T
    return np.asarray(jax.nn.softmax(logits, axis=-1)[0])


def _load_image01(model, path):
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"))
    s = model.image_size
    h, w = img.shape[:2]
    from openvision_tpu.data.ops_image import _resize, _to_image_array

    arr = _to_image_array(img)
    ratio = s / min(h, w)
    arr = _resize(arr, round(h * ratio), round(w * ratio), "bicubic", True)
    h, w = arr.shape[:2]
    top, left = (h - s) // 2, (w - s) // 2
    return arr[top:top + s, left:left + s][None].astype(np.float32) / 255.0


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--use_model", required=True)
    parser.add_argument("--image", required=True)
    parser.add_argument("--labels", required=True,
                        help="comma-separated candidate texts")
    parser.add_argument("--target", default=None,
                        help="targeted attack towards this label text")
    parser.add_argument("--eps", type=float, default=8 / 255)
    parser.add_argument("--step_size", type=float, default=2 / 255)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--unsigned", action="store_true",
                        help="use the unsigned-gradient variant (make_adv)")
    parser.add_argument("--out", default=None, help="save adversarial png")
    args = parser.parse_args(argv)

    model = load_model(args.use_model)
    labels = [s.strip() for s in args.labels.split(",")]
    tokens = model.tokenize(labels)
    ztxt = model.encode_text(jnp.asarray(tokens))

    image01 = jnp.asarray(_load_image01(model, args.image))
    probs = classify(model, image01, ztxt)
    pred = int(probs.argmax())
    print("clean prediction:")
    for i, (l, p) in enumerate(zip(labels, probs)):
        print(f"  {'->' if i == pred else '  '} {l}: {p:.4f}")

    if args.target is not None:
        label = labels.index(args.target)
        targeted = True
    else:
        label = pred
        targeted = False

    attack_fn = adv if args.unsigned else pgd
    kwargs = dict(eps=args.eps, iters=args.iters)
    if args.unsigned:
        adv_img = attack_fn(model, image01, ztxt, label, **kwargs)
    else:
        adv_img = attack_fn(model, image01, ztxt, label,
                            step_size=args.step_size, targeted=targeted,
                            **kwargs)

    probs2 = classify(model, adv_img, ztxt)
    pred2 = int(probs2.argmax())
    mode = f"targeted->{args.target}" if targeted else "untargeted"
    print(f"after {mode} {'adv' if args.unsigned else 'pgd'} "
          f"(eps={args.eps:.4f}, {args.iters} iters):")
    for i, (l, p) in enumerate(zip(labels, probs2)):
        print(f"  {'->' if i == pred2 else '  '} {l}: {p:.4f}")
    linf = float(jnp.max(jnp.abs(adv_img - image01)))
    print(f"L-inf perturbation: {linf:.5f} (eps {args.eps:.5f})")

    if args.out:
        from PIL import Image

        arr = np.clip(np.asarray(adv_img[0]) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(args.out)
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
