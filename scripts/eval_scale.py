"""Scale-test the zero-shot eval path + measure the int8 accuracy budget.

VERDICT r2 #6/#7: runs the disclf evaluator END TO END (grain workers →
decode/resize pp → device-side accumulation) over a `data/prepare.py`-built
TFRecord fixture at 10k+ images, in bf16 and in W8A8 (static calibrated
scales), and reports wall-clock, img/s, and the zero-shot top-1 delta.
Matches the reference evaluator loop
/root/reference/src/evaluators/proj/image_text/discriminative_classifier.py:355-357.

Usage: python scripts/eval_scale.py [--n 10000] [--res 224] [--img L/14]
       [--classes 100] [--batch 256] [--templates simple]
Prints one JSON line.
"""

import argparse
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openvision_tpu.configs import openvision as cfg_mod
    from openvision_tpu.evaluators import disclf
    from openvision_tpu.parallel import create_mesh, unbox, use_mesh
    from openvision_tpu.train import step as step_mod

    data_dir = build_fixture(args.root, args.n, args.classes, args.res)

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
                    jnp.zeros((2, 80), jnp.int32),
                    train=False,
                )
            )(jax.random.PRNGKey(0))["params"]
        )

        # classify against the FIXTURE's own label names (chance = 1/classes)
        # rather than the IN-1K set — random-init accuracy then sits at a
        # meaningful baseline instead of ~1/1000.
        with open(os.path.join(data_dir, "label.labels.txt")) as f:
            fixture_names = [ln.strip() for ln in f if ln.strip()]

        kw = dict(
            dataset_names=("imagenet2012",),
            class_names=fixture_names,
            data_dir=data_dir,
            # normalization runs ON DEVICE (device_norm): batches cross the
            # host->device boundary as uint8, 4x less transfer than f32
            pp_img=f"decode|resize({args.res})|keep('image','label')",
            device_norm="value_range(-1,1)",
            pp_txt=(
                'my_eval_bert_tokenize(inkey="texts", max_len=80, '
                'vocab_path="assets/bert_base_vocab_bos_eos.txt", '
                "add_bos=True, add_eos=True)"
            ),
            batch_size=args.batch,
            prompt_templates=args.templates,
            num_workers=args.workers,
        )
        result = {"n_images": args.n, "res": args.res, "img": args.img}
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
            result[f"img_per_s_{mode}"] = round(args.n / dt, 1)
        result["top1_delta"] = round(
            abs(result["top1_bf16"] - result["top1_int8"]), 5
        )
        # the int8 accuracy budget that doesn't need trained weights: on how
        # many images does W8A8 flip the argmax class vs the bf16 tower?
        n = min(len(preds["bf16"]), len(preds["int8"]))
        result["pred_agreement"] = round(
            float(np.mean(preds["bf16"][:n] == preds["int8"][:n])), 5
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
