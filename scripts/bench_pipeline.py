"""Input-pipeline scaling bench: decode+pp throughput, NO device (VERDICT r4 #7).

The r4 10k-image eval runs were host-bound at ~38-44 img/s on this 1-core
harness; that left the PIPELINE's own budget unmeasured. This times the
REAL production input path in isolation — JsonlImageSource (JPEG bytes) →
the exact `c.input.pp` string the trainer uses (inception_crop + bilinear
resize + BERT dual-caption tokenize + autoregressive labels) → grain
batching — across `--workers` settings, so a pod's input budget
(imgs/s/worker × workers ÷ chips ≥ chip img/s) is predictable from one
number. Reference equivalent: tf.data with threadpool 48
(src/datasets/input_pipeline.py:185).

Usage: python scripts/bench_pipeline.py [--workers 0,1,2,4,8]
       [--batch 256] [--batches 8] [--res 224] [--n 2048]
Prints one JSON line per worker count + a summary line.
"""

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(root: str, n: int, src_res: int = 288) -> str:
    """n random JPEGs + train.jsonl with the dual-caption keys the
    production pp consumes (txt / llava_caption)."""
    from PIL import Image

    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    jsonl = os.path.join(root, "train.jsonl")
    if os.path.exists(jsonl):
        return jsonl
    rng = np.random.default_rng(0)
    rows = []
    words = ["cat", "dog", "car", "tree", "house", "bird", "boat", "road"]
    for i in range(n):
        arr = rng.integers(0, 256, (src_res, src_res, 3), dtype=np.uint8)
        Image.fromarray(arr).save(
            os.path.join(root, "train", f"img{i}.jpg"), quality=90)
        w = words[i % len(words)]
        rows.append({"jpg": f"img{i}.jpg", "txt": f"a photo of a {w}",
                     "llava_caption": f"an image showing a {w} in detail"})
    with open(jsonl + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.replace(jsonl + ".tmp", jsonl)
    return jsonl


def bench_workers(input_cfg, workers: int, batches: int) -> dict:
    from openvision_tpu.data import pipeline

    loader, _ = pipeline.training(input_cfg, seed=0, num_workers=workers)
    it = iter(loader)
    first = next(it)  # worker spin-up + first prefetch outside the clock
    bs = int(next(iter(first.values())).shape[0])
    t0 = time.perf_counter()
    for _ in range(batches):
        next(it)
    dt = time.perf_counter() - t0
    imgs = batches * bs
    return {
        "workers": workers,
        "img_per_s": round(imgs / dt, 1),
        "img_per_s_per_worker": round(imgs / dt / max(1, workers), 1),
        "ms_per_batch": round(dt / batches * 1e3, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="0,1,2,4,8")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--root", default="/tmp/bench_pipeline")
    args = ap.parse_args()

    from openvision_tpu.configs import openvision as cfg_mod

    jsonl = make_dataset(args.root, args.n)
    c = cfg_mod.get_config(
        f"res={args.res},img=Ti/16,txt_name=Ti,txt_decoder_name=Ti,"
        "token_len=80,output_token_len=80,"
        "vocab_path=assets/bert_base_vocab_bos_eos.txt"
    )
    c.input.data = dict(
        name="jsonl", path=jsonl,
        image_root=os.path.join(args.root, "train"), image_key="jpg",
    )
    c.input.batch_size = args.batch

    results = []
    for w in [int(x) for x in args.workers.split(",")]:
        r = bench_workers(c.input, w, args.batches)
        results.append(r)
        print(json.dumps(r), flush=True)

    best = max(results, key=lambda r: r["img_per_s"])
    print(json.dumps({
        "host_cores": os.cpu_count(),
        "batch": args.batch,
        "pp": "production inception_crop+bert_tokenize chain",
        "peak_img_per_s": best["img_per_s"],
        "peak_workers": best["workers"],
    }), flush=True)


if __name__ == "__main__":
    main()
