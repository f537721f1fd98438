"""Batch image-encode serving CLI.

Production entry point for the encode path (the framework's headline
workload): loads a converted OpenVision checkpoint directory (the same
`open_clip_config.json` + `open_clip_pytorch_model.bin` artifacts the local
tools use), encodes a folder of images at a chosen batch size on the fused
transposed-stream kernels, and writes L2-normalized embeddings + filenames
to an npz. `--int8` switches to the fused W8A8 kernels (serving accuracy:
≥0.995 output cosine vs bf16 — see serving/quant.py).

Usage:
  python -m openvision_tpu.serving.encode --use_model <dir> \
      --img_folder images/ [--batch 256] [--int8] [--out embeddings.npz]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from openvision_tpu.parallel import on_accelerator


IMG_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def build_encode_fn(model, *, int8: bool, on_tpu: bool,
                    uint8_input: bool = False):
    # params ride as jit ARGUMENTS (a closure would embed hundreds of MB of
    # weights as program constants — oversized executables/compile requests)
    #
    # uint8_input=True: the program takes RAW uint8 pixels and fuses the
    # /255 + mean/std normalization into the graph (XLA folds it into the
    # patch-embed read) — 4x less host→device transfer and zero host-side
    # float conversion, the same device_norm idiom the evaluators use
    # (docs/PERF_NOTES.md "Zero-shot eval at scale"). The serving daemon's
    # raw-tensor endpoint rides this path.
    vision = model.vision
    if uint8_input:
        mean = jnp.asarray(model.mean, jnp.float32).reshape(1, 1, 1, 3)
        std = jnp.asarray(model.std, jnp.float32).reshape(1, 1, 1, 3)

        def _norm(x):
            return (x.astype(jnp.float32) / 255.0 - mean) / std
    else:
        def _norm(x):
            return x

    if not int8:
        @jax.jit
        def encode_p(params, images):
            z = vision.apply({"params": params}, _norm(images))
            return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)

        params = model.params["img"]
        return lambda images: encode_p(params, images)

    from openvision_tpu.serving.quant import (
        quantize_vit_params,
        quantized_encode_fused,
    )

    qp = jax.jit(quantize_vit_params)(model.params["img"])
    patch = vision.patch_size[0]
    posemb = vision.posemb

    @jax.jit
    def encode_q(qp, images):
        return quantized_encode_fused(
            qp, _norm(images), patch_size=patch, num_heads=vision.num_heads,
            depth=vision.depth, posemb=posemb, interpret=not on_tpu)

    return lambda images: encode_q(qp, images)


def main(argv=None):
    from openvision_tpu.tools.model_io import load_model

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--use_model", required=True)
    parser.add_argument("--img_folder", required=True)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--int8", action="store_true",
                        help="fused W8A8 kernels (serving accuracy mode)")
    parser.add_argument("--out", default="embeddings.npz")
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--attn_impl", default=None,
                        help="attention backend for the bf16 path; defaults "
                             "to the fused_t flagship on TPU, xla elsewhere")
    parser.add_argument("--exact_gelu", action="store_true",
                        help="disable tanh-approx GELU (slower, bit-exact)")
    args = parser.parse_args(argv)

    on_tpu = on_accelerator()
    attn_impl = args.attn_impl or ("fused_t" if on_tpu else "xla")
    model = load_model(args.use_model, dtype=jnp.dtype(args.dtype),
                       attn_impl=attn_impl,
                       fast_gelu=not args.exact_gelu and attn_impl == "fused_t")
    encode = build_encode_fn(model, int8=args.int8, on_tpu=on_tpu)

    from PIL import Image

    files = sorted(
        f for f in os.listdir(args.img_folder)
        if f.lower().endswith(IMG_EXTS)
    )
    if not files:
        raise SystemExit(f"no images in {args.img_folder}")

    embeds, times = [], []
    for i in range(0, len(files), args.batch):
        chunk = files[i : i + args.batch]
        imgs = np.stack([
            model.preprocess(
                np.asarray(Image.open(os.path.join(args.img_folder, f)).convert("RGB"))
            )
            for f in chunk
        ]).astype(args.dtype)
        pad = args.batch - len(chunk)
        if pad:
            imgs = np.pad(imgs, ((0, pad), (0, 0), (0, 0), (0, 0)))
        t0 = time.perf_counter()
        z = np.asarray(jax.device_get(encode(jnp.asarray(imgs))))
        times.append(time.perf_counter() - t0)
        embeds.append(z[: len(chunk)])

    z = np.concatenate(embeds).astype(np.float32)
    np.savez(args.out, embeddings=z, files=np.asarray(files))
    # first batch includes compile; report steady-state when possible
    steady = times[1:] or times
    print(f"encoded {len(files)} images -> {args.out} "
          f"(dim {z.shape[1]}, {'int8' if args.int8 else args.dtype})")
    print(f"throughput: {args.batch * len(steady) / sum(steady):.1f} img/s "
          f"({'steady-state' if times[1:] else 'incl. compile'})")


if __name__ == "__main__":
    main()
