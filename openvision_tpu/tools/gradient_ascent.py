"""Gradient-ascent "model opinion" text mining — jitted JAX optimization.

Capability parity with reference ov-gradient-ascent.py: a learnable
[batch, n_tokens, vocab] logit tensor selects hard tokens via straight-through
Gumbel-softmax (τ=1000); the soft one-hot sequence [PAD…PAD, tokens] flows
through the text tower's embedding matrix; the loss is −100 · cosine between
the text embedding and the (affine-augmented) image embedding; Adam lr=5 for
340 iterations. The per-step update is ONE jitted function instead of the
reference's eager AMP loop.

Outputs (identical layout): `opinion-tokens/tokens_<img>.txt` with the best
decoded unique tokens, and `txtembeds/<img>_text_embedding.pt` holding the
best text embeddings (torch-saved for drop-in compat).

Usage:
  python -m openvision_tpu.tools.gradient_ascent --use_model <dir> \
      --use_image img.png [--deterministic] [--img_folder dir] [--batch_size 8]
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

DETERMINISTIC_SEED = 6247423  # reference cliptoolsoptimized.py:84
ITERATIONS = 340
N_TOKENS = 4
GUMBEL_TAU = 1000.0
LR = 5.0
LOSS_SCALE = -100.0
IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".gif")


def gumbel_softmax_hard(rng, logits, tau):
    """Straight-through hard Gumbel-softmax."""
    g = jax.random.gumbel(rng, logits.shape)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=-1)
    idx = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y_soft.dtype)
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


def build_step(model, context_length, n_tokens, pad_id):
    """Returns a jitted (normu, opt_state, image, rng) → updated + stats fn."""
    tx_fn = model.text.apply
    params_txt = model.params["txt"]
    vocab = model.vocab_size
    n_pad = context_length - n_tokens
    optimizer = optax.adam(LR)

    def loss_fn(normu, image, rng):
        k_gumbel, k_aug = jax.random.split(rng)
        soft = gumbel_softmax_hard(k_gumbel, normu, GUMBEL_TAU)
        pad = jax.nn.one_hot(
            jnp.full((normu.shape[0], n_pad), pad_id), vocab, dtype=soft.dtype
        )
        tokens = jnp.concatenate([pad, soft], axis=1)  # learned tokens LAST

        tx = tx_fn({"params": params_txt}, tokens)
        tx_n = tx / (jnp.linalg.norm(tx, axis=-1, keepdims=True) + 1e-8)

        imgs = jnp.tile(image[None], (normu.shape[0], 1, 1, 1))
        imgs = augment.random_affine(k_aug, imgs, degrees=10.0, translate=0.1, p=0.8)
        iii = jax.lax.stop_gradient(model.encode_image(imgs))

        cos = tx_n @ iii.T  # (B_text, B_img)
        per_sample = LOSS_SCALE * jnp.mean(cos, axis=1)
        return jnp.mean(per_sample), (per_sample, tx, tokens)

    @jax.jit
    def step(normu, opt_state, image, rng):
        (loss, (per_sample, tx, tokens)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(normu, image, rng)
        updates, opt_state = optimizer.update(grads, opt_state, normu)
        normu = optax.apply_updates(normu, updates)
        return normu, opt_state, loss, per_sample, tx, tokens

    return step, optimizer


def run_for_image(model, img_path, *, batch_size, rng, checkin_step=50):
    from openvision_tpu.data.tokenizer import get_tokenizer

    tok = get_tokenizer(model.vocab_path)
    img_name = os.path.splitext(os.path.basename(img_path))[0]
    print(f"\nRunning gradient ascent for {img_name}...")

    with open(img_path, "rb") as f:
        from openvision_tpu.data.ops_image import _resize, _to_image_array

        raw = _to_image_array(f.read())
    s = model.image_size
    img = _resize(raw, s, s, "bilinear", True).astype(np.float32) / 255.0
    img = (img - np.asarray(model.mean)) / np.asarray(model.std)
    image = jnp.asarray(img)

    rng, k_init = jax.random.split(rng)
    normu = jax.random.normal(k_init, (batch_size, N_TOKENS, model.vocab_size))
    step, optimizer = build_step(model, model.context_length, N_TOKENS, pad_id=0)
    opt_state = optimizer.init(normu)

    best_loss = float("inf")
    best_tx = None
    bests: dict[float, str] = {}

    for j in range(ITERATIONS):
        rng, k = jax.random.split(rng)
        normu, opt_state, loss, per_sample, tx, tokens = step(
            normu, opt_state, image, k
        )
        cur = float(loss)
        if cur < best_loss or j % checkin_step == 0:
            ids = np.asarray(jnp.argmax(tokens, axis=-1))
            per = np.asarray(per_sample)
            for b in range(batch_size):
                text = tok.decode(ids[b].tolist())
                text = "".join(c if c.isprintable() else " " for c in text)
                bests[float(per[b])] = text
            bests = dict(sorted(bests.items())[:6])
        if cur < best_loss:
            best_loss = cur
            best_tx = np.asarray(tx)
            print(f"New best loss: {best_loss:.3f}")
        if j % checkin_step == 0:
            print(f"Iteration {j}: Average Loss: {cur:.3f}")

    unique_tokens: set[str] = set()
    for text in list(bests.values())[:5]:
        for ch in ".;_-\\'\"^&#(),":
            text = text.replace(ch, "")
        unique_tokens.update(text.split())

    os.makedirs("opinion-tokens", exist_ok=True)
    with open(f"opinion-tokens/tokens_{img_name}.txt", "w", encoding="utf-8") as f:
        f.write(" ".join(sorted(unique_tokens)))

    os.makedirs("txtembeds", exist_ok=True)
    try:
        import torch

        torch.save(
            torch.tensor(best_tx), f"txtembeds/{img_name}_text_embedding.pt"
        )
    except ImportError:
        np.save(f"txtembeds/{img_name}_text_embedding.npy", best_tx)
    print("\nBest text embedding saved to 'txtembeds'. "
          "Tokens (CLIP 'opinion') saved to 'opinion-tokens'.\n")
    return best_tx


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--use_model", required=True)
    parser.add_argument("--use_image", default=None)
    parser.add_argument("--img_folder", default="None")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--deterministic", action="store_true")
    args = parser.parse_args(argv)

    seed = DETERMINISTIC_SEED if args.deterministic else 0
    rng = jax.random.PRNGKey(seed)

    model = load_model(args.use_model)
    if args.img_folder != "None":
        files = [
            os.path.join(args.img_folder, f)
            for f in sorted(os.listdir(args.img_folder))
            if f.lower().endswith(IMAGE_EXTS)
        ]
        for path in files:
            rng, k = jax.random.split(rng)
            run_for_image(model, path, batch_size=args.batch_size, rng=k)
            print(f"Done processing image: {path}")
    else:
        assert args.use_image, "--use_image or --img_folder required"
        run_for_image(model, args.use_image, batch_size=args.batch_size, rng=rng)
        print(f"Done processing image: {args.use_image}")


if __name__ == "__main__":
    main()
