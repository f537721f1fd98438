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


# hard mode (--colors N): classes become (color, word) pairs — the color is
# a channel tint on the word's pattern, so the model must separate two
# partially-confusable axes instead of 32 orthogonal patterns. This shrinks
# the zero-shot logit margins to a non-degenerate regime, which is what the
# int8 budget measurement needs (VERDICT r4 Weak #6 / #8-stretch).
COLOR_TINTS = {
    "red": (1.0, 0.45, 0.45),
    "green": (0.45, 1.0, 0.45),
    "blue": (0.45, 0.55, 1.0),
    "yellow": (1.0, 1.0, 0.4),
}


def render(cls: int, rng: np.random.Generator, res: int,
           tint: tuple | None = None, noise: float = 8.0) -> np.ndarray:
    """A class-identifying image: fixed 4x4 pattern per class, upsampled,
    plus per-sample brightness/noise so the task isn't pure memorization."""
    from PIL import Image

    base = np.random.default_rng(1000 + cls).integers(
        16, 240, (4, 4, 3), np.uint8
    )
    img = np.asarray(
        Image.fromarray(base).resize((res, res), Image.BILINEAR), np.float32
    )
    if tint is not None:
        img = img * np.asarray(tint, np.float32)
    img = img * rng.uniform(0.8, 1.2) + rng.normal(0, noise, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def build_dataset(root: str, classes: int, n_train: int, n_eval: int,
                  res: int, colors: int = 0, noise: float = 8.0):
    """Writes train JPEGs + train.jsonl and an eval TFRecord dir.

    `colors > 0` activates hard mode: the label set becomes the cross
    product {color} × {word} (e.g. 24 words × 4 colors = 96 classes) and
    captions name both attributes, so the embedding must separate two
    partially-shared visual axes instead of `classes` orthogonal patterns.

    Returns (jsonl_path, eval_tfrecord_dir, class_names).
    """
    from PIL import Image

    from openvision_tpu.data import prepare

    words = CLASS_WORDS[:classes]
    assert len(words) == classes, f"need <= {len(CLASS_WORDS)} classes"
    if colors:
        color_names = list(COLOR_TINTS)[:colors]
        # label id c -> (pattern word c // colors, tint c % colors)
        labels = [f"{cn} {w}" for w in words for cn in color_names]
        tints = [COLOR_TINTS[cn] for _ in words for cn in color_names]
        patterns = [wi for wi in range(classes) for _ in color_names]
    else:
        labels, tints, patterns = words, [None] * classes, list(range(classes))
    n_classes = len(labels)

    train_dir = os.path.join(root, "train")
    jsonl_path = os.path.join(root, "train.jsonl")
    eval_raw = os.path.join(root, "eval_raw")
    eval_out = os.path.join(root, "eval_tfrecord")

    if not os.path.exists(jsonl_path):
        os.makedirs(train_dir, exist_ok=True)
        rng = np.random.default_rng(0)
        rows = []
        for i in range(n_train):
            c = i % n_classes
            rel = f"{i:06d}.jpg"
            Image.fromarray(
                render(patterns[c], rng, res, tint=tints[c], noise=noise)
            ).save(os.path.join(train_dir, rel), quality=90)
            rows.append(
                {
                    "jpg": rel,
                    "txt": f"a photo of a {labels[c]}",
                    "llava_caption": f"an image showing the {labels[c]}",
                }
            )
        with open(jsonl_path + ".tmp", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.replace(jsonl_path + ".tmp", jsonl_path)

    if not os.path.exists(os.path.join(eval_out, "label.labels.txt")):
        rng = np.random.default_rng(1)
        for c, name in enumerate(labels):
            d = os.path.join(eval_raw, f"{c:03d}_{name}")
            os.makedirs(d, exist_ok=True)
            for i in range(max(1, n_eval // n_classes)):
                Image.fromarray(
                    render(patterns[c], rng, res, tint=tints[c], noise=noise)
                ).save(os.path.join(d, f"img{i}.jpg"), quality=90)
        prepare.prepare(eval_raw, eval_out, split="validation", shards=4)

    return jsonl_path, eval_out, labels


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
    if getattr(args, "stage2_res", 0):
        # learned posemb so the stage-2 load_transform exercises the real
        # resample path (sincos2d is shape-free and would hide it)
        c.model.image.posemb = "learn"
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
    ap.add_argument("--colors", type=int, default=0,
                    help=">0: hard mode — label set = colors x words "
                    "(shrinks zero-shot margins; int8-budget regime)")
    ap.add_argument("--noise", type=float, default=8.0,
                    help="per-sample pixel noise sigma (higher = harder)")
    ap.add_argument("--stage2_res", type=int, default=0,
                    help=">0: on-hardware curriculum stage 2 — "
                    "load_transform into this resolution with "
                    "grad_accum=2 + steps_per_dispatch=2")
    ap.add_argument("--stage2_steps", type=int, default=200)
    args = ap.parse_args()

    from openvision_tpu.train import trainer

    jsonl_path, eval_dir, words = build_dataset(
        args.root, args.classes, args.n_train, args.n_eval, args.res,
        colors=args.colors, noise=args.noise,
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
    n_classes = len(words)
    result = {
        "steps": args.steps,
        "dec_fusion": args.dec_fusion,
        "classes": n_classes,
        "chance_top1": round(1.0 / n_classes, 4),
        "zero_shot_top1": round(accs[-1], 4) if accs else None,
        "loss_first": round(losses[0][1], 3) if losses else None,
        "loss_last": round(losses[-1][1], 3) if losses else None,
        "clip_loss_first": round(clip_losses[0], 3) if clip_losses else None,
        "clip_loss_last": round(clip_losses[-1], 3) if clip_losses else None,
        "caption_loss_first": round(cap_losses[0], 3) if cap_losses else None,
        "caption_loss_last": round(cap_losses[-1], 3) if cap_losses else None,
    }

    if args.stage2_res:
        # ON-HARDWARE curriculum rehearsal (the CPU-mesh version is
        # tests/test_production_soak.py): load_transform the stage-1 state
        # into a higher resolution — posemb resample through the REAL
        # trainer on the real chip — composed with grad_accum=2 and
        # steps_per_dispatch=2, then re-run the zero-shot eval at the new
        # geometry (same eval TFRecord; the pp resizes).
        import copy

        args2 = copy.copy(args)
        args2.res = args.stage2_res
        c2 = demo_config(args2, jsonl_path, eval_dir, words)
        c2.total_steps = args.stage2_steps
        c2.lr = args.lr * 0.1
        c2.grad_accum = 2
        c2.steps_per_dispatch = 2
        c2.ckpt_steps = args.stage2_steps
        c2.evals.disclf.log_steps = args.stage2_steps
        c2.load_transform = os.path.join(workdir, "checkpoints")
        wd2 = os.path.join(args.root, f"run_ft{args.stage2_res}")
        trainer.train(c2, wd2)
        rows2 = [
            json.loads(l) for l in open(os.path.join(wd2, "metrics.jsonl"))
        ]
        losses2 = [r["training_loss"] for r in rows2 if "training_loss" in r]
        accs2 = [
            r["z/0shot/demo_accuracy"] for r in rows2
            if "z/0shot/demo_accuracy" in r
        ]
        result["stage2"] = {
            "res": args.stage2_res,
            "steps": args.stage2_steps,
            "grad_accum": 2,
            "steps_per_dispatch": 2,
            "loss_first": round(losses2[0], 3) if losses2 else None,
            "loss_last": round(losses2[-1], 3) if losses2 else None,
            "zero_shot_top1": round(accs2[-1], 4) if accs2 else None,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
