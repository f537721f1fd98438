"""Image captioning CLI over the trained CoCa decoder.

Beyond-reference tool: the reference trains the caption decoder
(src/models/text_decoder.py:414) but ships no generation CLI — the closest
analogue is the vendored open_clip `coca_model.generate`. Here the decoder's
fixed learnable query tokens condition on [image tokens ++ text tokens]
under the prefix-LM mask, so caption logits for every position come from
ONE jitted forward pass (`models/decoder.py:generate`); at generation time
the text prefix is just [bos] + pads, i.e. the caption is read off the
image alone.

Usage:
  python -m openvision_tpu.tools.caption \
      --checkpoint /path/to/workdir/checkpoints \
      --config "res=224,img=L/14,txt_name=L,txt_decoder_name=L" \
      --image photo.jpg [--image_folder shots/] [--temperature 0.7]

The checkpoint may be any of the three reference formats (Orbax train
state / flat npz / legacy tensorstore) — `train/checkpoint.py` routes them.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")
_DEFAULT_VOCAB = "assets/bert_base_vocab_bos_eos.txt"


def _load_image(path: str, res: int) -> np.ndarray:
    """The framework's eval-time image pp (configs/openvision.py eval_img_pp
    + vgg device-norm), run through the same registered ops the evaluators
    use — one source of truth for inference preprocessing."""
    from openvision_tpu.data.pp import build_pp_fn, import_pp_modules
    from PIL import Image

    import_pp_modules(["ops_image"])
    pp = build_pp_fn(
        f'resize_small({res}, method="bilinear", antialias=True)'
        f"|central_crop({res})|vgg_value_range"
    )
    img = np.asarray(Image.open(path).convert("RGB"))
    return pp({"image": img}, np.random.default_rng(0))["image"]


def build_captioner(config, checkpoint: str, step: int | None = None,
                    vocab_path: str = _DEFAULT_VOCAB):
    """Returns (jitted caption_fn(images, rng, temperature) -> ids, tokenizer)."""
    from openvision_tpu.data.tokenizer import get_tokenizer
    from openvision_tpu.parallel import unbox
    from openvision_tpu.train import checkpoint as ckpt_lib
    from openvision_tpu.train import step as step_mod

    model = step_mod.build_model(config)
    res = config.init_shapes[0][1]
    token_len = config.input.txt_token_length
    tok = get_tokenizer(vocab_path)

    image0 = jnp.zeros((1, res, res, 3), jnp.float32)
    text0 = jnp.zeros((1, token_len), jnp.int32)
    abstract = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), image0, text0, train=False)
    )["params"]
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), unbox(abstract)
    )
    if os.path.isfile(checkpoint) and checkpoint.endswith(".npz"):
        tree = ckpt_lib.load_npz(checkpoint)
        params = tree.get("params", tree)
    else:
        params = ckpt_lib.restore_params(checkpoint, abstract, step=step)
    params = unbox(params)

    bos = tok.bos_id if tok.bos_id is not None else tok.cls_id
    eos = tok.eos_id if tok.eos_id is not None else tok.sep_id

    def caption_fn(images: jax.Array, rng: jax.Array, temperature: float,
                   top_k: int = 0, top_p: float = 0.0):
        from openvision_tpu.models.decoder import warp_logits

        b = images.shape[0]
        text = jnp.full((b, token_len), tok.pad_id, jnp.int32)
        text = text.at[:, 0].set(bos)
        _, _, out = model.apply({"params": params}, images, text, train=False)
        logits = out["logits"]
        if temperature > 0.0:
            logits = warp_logits(logits / temperature, top_k=top_k, top_p=top_p)
            ids = jax.random.categorical(rng, logits, axis=-1)
        else:
            ids = jnp.argmax(logits, axis=-1)
        is_eos = (ids == eos).astype(jnp.int32)
        seen = jnp.cumsum(is_eos, axis=1) - is_eos
        return jnp.where(seen > 0, tok.pad_id, ids)

    return jax.jit(
        caption_fn, static_argnames=("temperature", "top_k", "top_p")
    ), tok


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="Orbax checkpoint dir, npz file, or legacy ts dir")
    p.add_argument("--config", default="res=224,img=L/14,txt_name=L,"
                   "txt_decoder_name=L",
                   help="config arg string (configs/openvision.py)")
    p.add_argument("--image", action="append", default=[])
    p.add_argument("--image_folder", default=None)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--temperature", type=float, default=0.0,
                   help="0 = greedy; >0 = sampled")
    p.add_argument("--top_k", type=int, default=0,
                   help="sample from the k most probable tokens (0 = off; "
                   "implies --temperature 1.0 when temperature is unset)")
    p.add_argument("--top_p", type=float, default=0.0,
                   help="nucleus sampling: sample from the smallest token set "
                   "with cumulative probability >= top_p (0 = off; implies "
                   "--temperature 1.0 when temperature is unset)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--vocab", default=_DEFAULT_VOCAB)
    args = p.parse_args(argv)
    if (args.top_k or args.top_p) and args.temperature <= 0.0:
        # top_k/top_p are sampling warpers; greedy would silently ignore them
        args.temperature = 1.0

    from openvision_tpu.configs import openvision as cfg_mod

    config = cfg_mod.get_config(args.config)

    paths = list(args.image)
    if args.image_folder:
        paths += sorted(
            os.path.join(args.image_folder, f)
            for f in os.listdir(args.image_folder)
            if f.lower().endswith(_IMG_EXTS)
        )
    assert paths, "no images given (--image / --image_folder)"

    caption_fn, tok = build_captioner(
        config, args.checkpoint, args.step, vocab_path=args.vocab)
    res = config.init_shapes[0][1]
    images = jnp.asarray(np.stack([_load_image(f, res) for f in paths]))
    ids = np.asarray(
        caption_fn(images, jax.random.PRNGKey(args.seed), args.temperature,
                   args.top_k, args.top_p)
    )
    for path, row in zip(paths, ids):
        print(f"{path}\t{tok.decode(row.tolist())}")


if __name__ == "__main__":
    main()
