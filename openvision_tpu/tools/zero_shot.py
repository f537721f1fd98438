"""Zero-shot classification CLI over a folder of images (testcat set).

Capability parity with reference ov-zero-shot-test.py: loads a converted
OpenVision checkpoint dir, encodes the 9 fixed probe labels, scores each
image in the folder (cosine + softmax with the model's logit scale), prints
per-image rankings and the best image per text — on the JAX inference core.

Usage:
  python -m openvision_tpu.tools.zero_shot --use_model <dir> [--img_folder testcat]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from openvision_tpu.tools.model_io import load_model

TEXTS = [
    "a photo of a cat", "a photo of a dog", "a photo of a bat",
    "a photo of a text", "cat", "dog", "bat", "hey", "text",
]

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp")


def preprocess_square(model, image) -> np.ndarray:
    """Direct (size, size) resize + normalize (the reference tool's transform)."""
    from openvision_tpu.data.ops_image import _resize, _to_image_array

    img = _to_image_array(image)
    s = model.image_size
    img = _resize(img, s, s, "bilinear", True).astype(np.float32) / 255.0
    return (img - np.asarray(model.mean)) / np.asarray(model.std)


def run(model_dir: str, img_folder: str, texts=tuple(TEXTS)) -> list:
    model = load_model(model_dir)
    tokens = model.tokenize(list(texts))

    encode_text = jax.jit(model.encode_text)
    encode_image = jax.jit(model.encode_image)

    text_features = np.asarray(encode_text(jnp.asarray(tokens)))

    results = []
    print("\n=== Cosine Similarities and Predictions ===")
    for filename in sorted(os.listdir(img_folder)):
        if not filename.lower().endswith(IMAGE_EXTS):
            continue
        with open(os.path.join(img_folder, filename), "rb") as f:
            img = preprocess_square(model, f.read())
        zimg = np.asarray(encode_image(jnp.asarray(img)[None]))[0]
        cosine = text_features @ zimg
        logits = model.logit_scale * cosine
        probs = np.exp(logits - logits.max())
        probs = probs / probs.sum()

        print(f"\n--- {filename} ---")
        for idx in np.argsort(-cosine):
            print(
                f"{texts[idx]:<25} cosine: {cosine[idx]:+.4f}  "
                f"prob: {probs[idx]:.4%}"
            )
        best = int(np.argmax(probs))
        results.append((filename, texts[best], float(probs[best]), probs.tolist()))

    print("\n=== Best Image Per Text ===")
    best_images = [(None, -float("inf"))] * len(texts)
    for filename, _, _, prob_list in results:
        for i, p in enumerate(prob_list):
            if p > best_images[i][1]:
                best_images[i] = (filename, p)
    for i, (fname, p) in enumerate(best_images):
        print(f"{texts[i]:<25} → {fname}  (prob: {p:.4%})")
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--use_model", required=True, help="converted model dir")
    parser.add_argument("--img_folder", default="testcat")
    args = parser.parse_args(argv)
    run(args.use_model, args.img_folder)


if __name__ == "__main__":
    main()
