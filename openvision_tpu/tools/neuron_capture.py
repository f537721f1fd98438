"""Top-activating neuron finder (+ optional visualization) on the JAX core.

Capability parity with reference `ClipNeuronCaptureHook`
(cliptoolsoptimized.py:480-527): for an input image, capture every encoder
block's GELU activations in ONE forward pass (flax `sow` intermediates
replace torch forward hooks) and report the maximally-activated feature per
layer — then optionally feature-visualize the winners, reproducing the
"find the top neuron for an image, then draw what it wants to see" loop
end-to-end.

Usage:
  python -m openvision_tpu.tools.neuron_capture --use_model <dir> \
      --image testcat/catcat.png [--layer 0-23] [--topk 3] [--visualize] \
      [--out ovNeurons]
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from openvision_tpu.tools.model_io import load_model


def capture_gelu(model, image: np.ndarray):
    """One forward pass; returns {layer_idx: (tokens, mlp_dim) activations}."""
    norm = model.preprocess(image)[None]
    _, mods = model.vision.apply(
        {"params": model.params["img"]}, norm, mutable=["intermediates"]
    )
    blocks = mods["intermediates"]["Transformer"]
    out = {}
    for name, sub in blocks.items():
        if not name.startswith("encoderblock_"):
            continue
        idx = int(name.split("_")[-1])
        out[idx] = np.asarray(sub["MlpBlock_0"]["gelu"][0][0])  # (L, mlp_dim)
    return dict(sorted(out.items()))


def top_neurons(acts: dict[int, np.ndarray], topk: int = 1):
    """Per layer: the top-k features by max-over-tokens activation.

    Returns {layer: [(feature, value, token), ...]} — the reference hook's
    flat argmax (:498-516) corresponds to the k=1 entry.
    """
    result = {}
    for layer, a in acts.items():
        per_feature = a.max(axis=0)  # (mlp_dim,)
        order = np.argsort(per_feature)[::-1][:topk]
        result[layer] = [
            (int(f), float(per_feature[f]), int(a[:, f].argmax()))
            for f in order
        ]
    return result


def main(argv=None):
    from openvision_tpu.tools.feature_viz import parse_range

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--use_model", required=True)
    parser.add_argument("--image", required=True)
    parser.add_argument("--layer", default=None,
                        help='layers to report, e.g. "0-23" (default: all)')
    parser.add_argument("--topk", type=int, default=3)
    parser.add_argument("--visualize", action="store_true",
                        help="feature-visualize each layer's top neuron")
    parser.add_argument("--out", default="ovNeurons")
    parser.add_argument("--deterministic", action="store_true")
    args = parser.parse_args(argv)

    model = load_model(args.use_model)
    from PIL import Image

    image = np.asarray(Image.open(args.image).convert("RGB"))
    acts = capture_gelu(model, image)
    if args.layer:
        keep = set(parse_range(args.layer, max(acts) + 1))
        acts = {k: v for k, v in acts.items() if k in keep}

    tops = top_neurons(acts, args.topk)
    global_best = (None, -np.inf, None)  # (layer, value, feature)
    for layer, feats in tops.items():
        desc = ", ".join(f"F{f} ({v:.3f} @tok{t})" for f, v, t in feats)
        print(f"layer {layer:>2}: {desc}")
        if feats and feats[0][1] > global_best[1]:
            global_best = (layer, feats[0][1], feats[0][0])
    layer, value, feature = global_best
    print(f"top neuron overall: layer {layer} feature {feature} ({value:.3f})")

    if args.visualize:
        from openvision_tpu.tools.feature_viz import save_image, visualize

        os.makedirs(args.out, exist_ok=True)
        model_name = os.path.basename(os.path.normpath(args.use_model))
        rng = jax.random.PRNGKey(6247423 if args.deterministic else 0)
        for lyr, feats in tops.items():
            f0 = feats[0][0]
            rng, k = jax.random.split(rng)
            img = visualize(model, lyr, f0, model.image_size, k)
            path = os.path.join(args.out, f"{model_name}_L{lyr}_F{f0}.png")
            save_image(img, path)
            print(f"saved {path}")


if __name__ == "__main__":
    main()
