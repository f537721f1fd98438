"""End-to-end learnability demonstration on one chip.

The offline counterpart of the Model-Zoo quality gate (BASELINE.md): with no
network, we can't load published checkpoints — but we CAN prove the framework
*learns* end to end. This script builds a synthetic-but-learnable image↔caption
dataset (each class is a distinctive upsampled 4x4 pattern; captions name the
class), trains a small CLIP+CoCa model through the real trainer (grain JSONL
source → pp DSL → my_bert_tokenize dual captions → jitted update step →
contrastive + caption loss → Orbax checkpoints), and runs the real zero-shot
disclf evaluator on a held-out `data/prepare.py` TFRecord fixture.

Success = zero-shot top-1 far above chance (1/classes) and both loss terms
falling. Mirrors the reference's full train→eval path (src/main_clip.py:78,
discriminative_classifier.py:178) at demo scale.

Usage: python scripts/train_demo.py [--steps 600] [--classes 32] [--res 64]
       [--img Ti/16] [--batch 256] [--root /tmp/train_demo]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CLASS_WORDS = [
    "cat", "dog", "car", "tree", "house", "fish", "bird", "boat",
    "clock", "train", "horse", "apple", "chair", "table", "shoe", "phone",
    "river", "mountain", "flower", "bread", "cloud", "star", "moon", "sun",
    "book", "door", "window", "bridge", "garden", "island", "castle", "engine",
]


def render(cls: int, rng: np.random.Generator, res: int) -> np.ndarray:
    """A class-identifying image: fixed 4x4 pattern per class, upsampled,
    plus per-sample brightness/noise so the task isn't pure memorization."""
    from PIL import Image

    base = np.random.default_rng(1000 + cls).integers(
        16, 240, (4, 4, 3), np.uint8
    )
    img = np.asarray(
        Image.fromarray(base).resize((res, res), Image.BILINEAR), np.float32
    )
    img = img * rng.uniform(0.8, 1.2) + rng.normal(0, 8.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def build_dataset(root: str, classes: int, n_train: int, n_eval: int, res: int):
    """Writes train JPEGs + train.jsonl and an eval TFRecord dir.

    Returns (jsonl_path, eval_tfrecord_dir, class_words).
    """
    from PIL import Image

    from openvision_tpu.data import prepare

    words = CLASS_WORDS[:classes]
    assert len(words) == classes, f"need <= {len(CLASS_WORDS)} classes"
    train_dir = os.path.join(root, "train")
    jsonl_path = os.path.join(root, "train.jsonl")
    eval_raw = os.path.join(root, "eval_raw")
    eval_out = os.path.join(root, "eval_tfrecord")

    if not os.path.exists(jsonl_path):
        os.makedirs(train_dir, exist_ok=True)
        rng = np.random.default_rng(0)
        rows = []
        for i in range(n_train):
            c = i % classes
            rel = f"{i:06d}.jpg"
            Image.fromarray(render(c, rng, res)).save(
                os.path.join(train_dir, rel), quality=90
            )
            rows.append(
                {
                    "jpg": rel,
                    "txt": f"a photo of a {words[c]}",
                    "llava_caption": f"an image showing the {words[c]}",
                }
            )
        with open(jsonl_path + ".tmp", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.replace(jsonl_path + ".tmp", jsonl_path)

    if not os.path.exists(os.path.join(eval_out, "label.labels.txt")):
        rng = np.random.default_rng(1)
        for c, w in enumerate(words):
            d = os.path.join(eval_raw, f"{c:03d}_{w}")
            os.makedirs(d, exist_ok=True)
            for i in range(n_eval // classes):
                Image.fromarray(render(c, rng, res)).save(
                    os.path.join(d, f"img{i}.jpg"), quality=90
                )
        prepare.prepare(eval_raw, eval_out, split="validation", shards=4)

    return jsonl_path, eval_out, words


def demo_config(args, jsonl_path: str, eval_dir: str, words):
    from openvision_tpu.configs import openvision as cfg_mod

    c = cfg_mod.get_config(
        f"res={args.res},img={args.img},txt_name={args.txt},"
        f"txt_decoder_name={args.txt},token_len=16,output_token_len=16,"
        f"vocab_size=30522,remat=none,color_jitter=False,"
        f"attn_impl=xla,dec_attn_impl=xla,dec_fusion={args.dec_fusion},"
        f"dtype={args.dtype}"
    )
    c.input.data = dict(
        name="jsonl", path=jsonl_path,
        image_root=os.path.join(os.path.dirname(jsonl_path), "train"),
        image_key="jpg",
    )
    c.input.batch_size = args.batch
    c.input.shuffle_buffer_size = 10_000
    c.init_shapes = [(args.batch, args.res, args.res, 3), (args.batch * 2, 16)]
    c.model.out_dim = (192, 192)
    c.total_steps = args.steps
    c.lr = args.lr
    c.wd = 1e-4  # the recipe's 0.2 is tuned for 32k batches, too heavy here
    c.schedule = [
        (".*", dict(decay_type="cosine",
                    warmup_steps=max(20, args.steps // 20), min_lr=0.0,
                    max_lr=args.lr))
    ]
    c.log_training_steps = 25
    c.ckpt_steps = max(100, args.steps // 2)
    c.evals = type(c.evals)()  # clear defaults; demo wires its own disclf
    c.evals.disclf = dict(
        type="discriminative_classifier",
        dataset_names=["demo"],
        class_names=list(words),
        split="validation",
        data_dir=eval_dir,
        pp_img=f'decode|resize({args.res})|keep("image","label")',
        pp_txt=(
            'my_eval_bert_tokenize(inkey="texts", max_len=16, '
            'vocab_path="assets/bert_base_vocab_bos_eos.txt", '
            "add_bos=True, add_eos=True)"
        ),
        device_norm="vgg",  # must match the trainer's cpu_unit8 prologue
        prompt_templates="simple",
        batch_size=min(args.batch, 256),
        prefix="z/0shot/",
        log_steps=args.steps,  # final eval only
    )
    return c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--classes", type=int, default=32)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--img", default="Ti/16")
    ap.add_argument("--txt", default="Ti")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--dec_fusion", default="concat",
                    choices=["concat", "cross_attn"])
    ap.add_argument("--n_train", type=int, default=8192)
    ap.add_argument("--n_eval", type=int, default=1024)
    ap.add_argument("--root", default="/tmp/train_demo")
    args = ap.parse_args()

    from openvision_tpu.train import trainer

    jsonl_path, eval_dir, words = build_dataset(
        args.root, args.classes, args.n_train, args.n_eval, args.res
    )

    workdir = os.path.join(args.root, "run")
    trainer.train(demo_config(args, jsonl_path, eval_dir, words), workdir)

    rows = [
        json.loads(l) for l in open(os.path.join(workdir, "metrics.jsonl"))
    ]
    losses = [
        (r["step"], r["training_loss"]) for r in rows if "training_loss" in r
    ]
    accs = [
        r["z/0shot/demo_accuracy"] for r in rows if "z/0shot/demo_accuracy" in r
    ]
    clip_losses = [r["clip_loss"] for r in rows if "clip_loss" in r]
    cap_losses = [r["caption_loss"] for r in rows if "caption_loss" in r]
    result = {
        "steps": args.steps,
        "dec_fusion": args.dec_fusion,
        "classes": args.classes,
        "chance_top1": round(1.0 / args.classes, 4),
        "zero_shot_top1": round(accs[-1], 4) if accs else None,
        "loss_first": round(losses[0][1], 3) if losses else None,
        "loss_last": round(losses[-1][1], 3) if losses else None,
        "clip_loss_first": round(clip_losses[0], 3) if clip_losses else None,
        "clip_loss_last": round(clip_losses[-1], 3) if clip_losses else None,
        "caption_loss_first": round(cap_losses[0], 3) if cap_losses else None,
        "caption_loss_last": round(cap_losses[-1], 3) if cap_losses else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
