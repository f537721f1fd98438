"""Serving daemon load test: concurrency sweep + steady-state recompile count.

VERDICT r3 #7: docs/SERVING.md had p50/p95 plumbing but no measured
concurrency sweep. This drives the REAL HTTP daemon (serving/server.py —
ThreadingHTTPServer + DynamicBatcher + jitted encode buckets) end to end:

- builds the flagship ViT-L/14-224 + text-B two-tower (random weights; the
  batching machinery and kernels don't care),
- `warmup()` precompiles every power-of-two bucket,
- for each concurrency level, fires `--requests` HTTP POSTs of a real JPEG
  from that many client threads and records client-side req/s and p50/p95,
  plus the batcher's occupancy stats,
- counts XLA compiles DURING the sweep via jax.log_compiles: steady state
  must be 0 (the bucket-padding design's whole point).

Usage: python scripts/bench_serving.py [--levels 1,4,16,64] [--requests 256]
       [--max_batch 64] [--mesh N]  (mesh>1: batch-parallel multi-chip mode)
Prints one JSON line per level + a summary line.
"""

import argparse
import http.client
import io
import json
import logging
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.count = 0

    def emit(self, record):
        if "Compiling" in record.getMessage():
            self.count += 1


def build_model(res, variant, txt_variant, vocab_path, attn_impl="xla"):
    import jax
    import jax.numpy as jnp

    from openvision_tpu.models import text as text_mod
    from openvision_tpu.models import vit as vit_mod
    from openvision_tpu.parallel import unbox
    from openvision_tpu.tools.model_io import LoadedModel

    vision = vit_mod.Model(
        num_classes=768, variant=variant, posemb="sincos2d", pool_type="gap",
        emb_head_bias=False, output_tokens=False, dtype=jnp.bfloat16,
        attn_impl=attn_impl, fast_gelu=attn_impl == "fused_t",
    )
    text = text_mod.Model(
        num_classes=768, variant=txt_variant, pool_type="last",
        vocab_size=30522, output_tokens=False, dtype=jnp.bfloat16,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        "img": unbox(
            jax.jit(vision.init)(k1, jnp.zeros((1, res, res, 3)))["params"]
        ),
        "txt": unbox(
            jax.jit(text.init)(k2, jnp.zeros((1, 16), jnp.int32))["params"]
        ),
        "t": np.log(1 / 0.07) * np.ones((1,), np.float32),
    }
    return LoadedModel(
        vision=vision, text=text, params=params, image_size=res,
        context_length=16, vocab_size=30522,
        mean=(0.48145466, 0.4578275, 0.40821073),
        std=(0.26862954, 0.26130258, 0.27577711), vocab_path=vocab_path,
    )


def jpeg_bytes(res) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (res, res, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def sweep(port, payload, concurrency, n_requests, *, path="/v1/embed/image",
          headers=None, rows_per_request=1):
    lat = []
    lock = threading.Lock()
    per = max(1, n_requests // concurrency)
    hdrs = headers or {"Content-Type": "image/jpeg"}

    def client():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        mine = []
        for _ in range(per):
            t0 = time.perf_counter()
            conn.request("POST", path, body=payload, headers=hdrs)
            resp = conn.getresponse()
            body = resp.read()
            assert resp.status == 200, body[:200]
            mine.append(time.perf_counter() - t0)
        conn.close()
        with lock:
            lat.extend(mine)

    threads = [threading.Thread(target=client) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()
    pct = lambda p: lat[min(len(lat) - 1, int(p * len(lat)))]
    rps = len(lat) / wall
    return {
        "concurrency": concurrency,
        "requests": len(lat),
        "req_per_s": round(rps, 1),
        "img_per_s": round(rps * rows_per_request, 1),
        "p50_ms": round(pct(0.50) * 1e3, 1),
        "p95_ms": round(pct(0.95) * 1e3, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,4,16,64")
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--max_batch", type=int, default=64)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--img", default="L/14")
    ap.add_argument("--txt", default="B")
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--attn", default="xla",
                    help="vision attn_impl (fused_t = the flagship encode)")
    ap.add_argument("--port", type=int, default=18231)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument(
        "--payload", default="jpeg", choices=["jpeg", "tensor"],
        help="jpeg: one JPEG per request (PIL decode in HTTP workers — the "
        "r4 host-bound mode). tensor: raw uint8 pixel rows via "
        "/v1/embed/tensor with octet-stream replies — no decode, the "
        "device-saturation mode (VERDICT r4 #2)",
    )
    ap.add_argument(
        "--rows", type=int, default=8,
        help="rows per tensor request (amortizes HTTP per-request overhead)",
    )
    ap.add_argument(
        "--mesh", type=int, default=0,
        help=">1: batch-parallel multi-chip serving over an N-device mesh "
        "(run under JAX_PLATFORMS=cpu + xla_force_host_platform_device_count "
        "when real chips aren't attached)",
    )
    args = ap.parse_args()

    import jax

    from openvision_tpu.parallel import create_mesh, on_accelerator
    from openvision_tpu.serving import server as srv

    mesh = create_mesh(data=args.mesh) if args.mesh > 1 else None
    model = build_model(
        args.res, args.img, args.txt, "assets/bert_base_vocab_bos_eos.txt",
        attn_impl=args.attn,
    )
    svc = srv.EmbedService(
        model, int8=args.int8, on_tpu=on_accelerator(),
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms, mesh=mesh,
    )
    httpd = srv.make_server(svc, port=args.port)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()

    t0 = time.perf_counter()
    svc.warmup()
    warmup_s = time.perf_counter() - t0
    if args.payload == "tensor":
        rng = np.random.default_rng(0)
        rows = rng.integers(
            0, 256, (args.rows, args.res, args.res, 3), dtype=np.uint8
        )
        payload = rows.tobytes()
        sweep_kw = dict(
            path="/v1/embed/tensor",
            headers={
                "Content-Type": "application/octet-stream",
                "Accept": "application/octet-stream",
                "X-Tensor-Shape": ",".join(map(str, rows.shape)),
                "X-Tensor-Dtype": "uint8",
            },
            rows_per_request=args.rows,
        )
    else:
        payload = jpeg_bytes(args.res)
        sweep_kw = {}

    counter = _CompileCounter()
    # compile logs propagate up to the "jax" logger regardless of which
    # submodule emits them (dispatch vs pxla across jax versions)
    logger = logging.getLogger("jax")
    logger.addHandler(counter)
    results = []
    try:
        with jax.log_compiles(True):
            for level in [int(x) for x in args.levels.split(",")]:
                r = sweep(args.port, payload, level, args.requests,
                          **sweep_kw)
                r["stats"] = svc.stats()["image"]
                results.append(r)
                print(json.dumps(r), flush=True)
    finally:
        logger.removeHandler(counter)
        httpd.shutdown()
        svc.stop()

    summary = {
        "backend": jax.default_backend(),
        "mesh": args.mesh or 1,
        "int8": bool(args.int8),
        "max_batch": args.max_batch,
        "payload": args.payload,
        "rows_per_request": args.rows if args.payload == "tensor" else 1,
        "warmup_s": round(warmup_s, 1),
        "steady_state_recompiles": counter.count,
        "peak_req_per_s": max(r["req_per_s"] for r in results),
        "peak_img_per_s": max(r["img_per_s"] for r in results),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
